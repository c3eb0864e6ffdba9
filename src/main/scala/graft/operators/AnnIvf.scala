package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over an
  * `array<float>` embedding column — the scale path for similarity
  * search (SURVEY.md §2.4 d11), recall-tested against the brute-force
  * baseline (d10) in AnnSpec.
  *
  * Shape, and why it survives 100 TB:
  *   1. centroid build: C seed vectors (deterministic: lowest vec_ids),
  *      one Lloyd refinement — assignment is a broadcast C-way compare
  *      per vector (one pass over the data, no shuffle of embeddings);
  *      the element-wise centroid mean is a (cluster, dim) partial
  *      aggregate, shuffling C×dim doubles, not vectors.
  *   2. index: each vector is assigned to its nearest centroid; the
  *      "inverted file" is just a cluster_id column — at scale this is
  *      the partitioning/bucketing key, so a probe touches only
  *      nprobe/C of the data.
  *   3. search: rank centroids per query (broadcast C rows), search the
  *      nprobe best clusters, per-cluster local top-k merges to a
  *      global top-k via one window — TakeOrdered semantics, no full
  *      sort of the corpus.
  *
  * All cosine math is the codegen'd vec_dot expression.
  */
object AnnIvf {

  /** (cluster_id, centroid: array<float>) after one Lloyd step. */
  def centroids(spark: SparkSession, embeddings: DataFrame, numClusters: Int): DataFrame = {
    import spark.implicits._
    val seeds = embeddings.orderBy($"vec_id").limit(numClusters)
      .orderBy($"vec_id")
      .select(
        row_number().over(Window.orderBy($"vec_id")).cast("long").minus(1).as("cluster_id"),
        $"embedding".as("centroid"))
    val assigned = assign(spark, embeddings, seeds)
    // element-wise mean: (cluster, dim) partial agg, then rebuild arrays
    val mean = assigned
      .select($"cluster_id", posexplode($"embedding"))
      .groupBy($"cluster_id", $"pos")
      .agg(avg($"col").as("m"))
      .groupBy($"cluster_id")
      .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
        e => e.getField("m").cast("float")).as("centroid"))
    mean
  }

  /** Nearest-centroid assignment: broadcast the C centroids, one codegen
    * compare pass per vector. Ties break to the lowest cluster_id. */
  def assign(spark: SparkSession, embeddings: DataFrame, cents: DataFrame): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cluster_id")
    embeddings.crossJoin(broadcast(cents))
      .withColumn("sim", Vectors.dot($"embedding", $"centroid") /
        (Vectors.norm($"embedding") * Vectors.norm($"centroid")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"embedding", $"cluster_id")
  }

  /** Top-k neighbors for each query vector, probing `nprobe` clusters. */
  def search(spark: SparkSession, embeddings: DataFrame, queries: DataFrame,
             numClusters: Int, nprobe: Int, k: Int): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, embeddings, numClusters)
    val indexed = assign(spark, embeddings, cents)

    // rank centroids per query, keep nprobe
    val wq = Window.partitionBy($"q_id").orderBy($"csim".desc, $"cluster_id")
    val probed = queries
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", Vectors.dot($"qe", $"centroid") /
        (Vectors.norm($"qe") * Vectors.norm($"centroid")))
      .withColumn("crn", row_number().over(wq))
      .filter($"crn" <= nprobe)
      .select($"q_id", $"qe", $"cluster_id")

    // search only the probed clusters; same tie-break as the exact d10
    val wk = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id")
    probed.join(indexed, "cluster_id")
      .filter($"q_id" =!= $"vec_id")
      .withColumn("cos", Vectors.dot($"qe", $"embedding") /
        (Vectors.norm($"qe") * Vectors.norm($"embedding")))
      .select($"q_id", $"vec_id".as("neighbor_id"), $"cos")
      .withColumn("rk", row_number().over(wk).cast("long"))
      .filter($"rk" <= k)
      .select($"q_id", $"neighbor_id", round($"cos", 6).as("cos"), $"rk")
  }
}
