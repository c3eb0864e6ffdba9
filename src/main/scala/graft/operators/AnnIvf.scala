package graft.operators

import graft.functions.{GraftFunctions, Vectors}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  *   2. index: each vector is assigned to its nearest centroid as a
  *      MAP-SIDE argmax over a literal array of the C centroids — a
  *      pure projection with NO exchange (the r2 crossJoin+window form
  *      shuffled n×C rows each carrying the full embedding; at 100 TB
  *      with C=16 that was a 16× amplified shuffle of the corpus).
  *      The "inverted file" is just a cluster_id column — at scale this
  *      is the partitioning/bucketing key, so a probe touches only
  *      nprobe/C of the data.
  *   3. search: rank centroids per query map-side too (sort the same
  *      literal array per row, slice nprobe), then search only the
  *      probed clusters; per-cluster local top-k merges to a global
  *      top-k via one window — TakeOrdered semantics, no full sort of
  *      the corpus.
  *
  * All cosine math is the codegen'd vec_dot expression; centroid norms
  * are folded in as driver-side literals (same index-ascending double
  * accumulation as vec_dot, so scores agree to the last ulp).
  */
object AnnIvf {

  /** Collect the (small: C rows) centroid table into a literal
    * `array<struct<cid,centroid,cnorm>>` column, ascending cluster_id,
    * norms precomputed driver-side. This is what makes assignment and
    * probing exchange-free: the centroids ride into every task as a
    * codegen'd literal, like a broadcast without a join. */
  private def centroidLiteral(cents: DataFrame): Column = {
    val rows: Array[Row] = cents
      .select(col("cluster_id").cast("long"), col("centroid"))
      .orderBy(col("cluster_id"))
      .collect()
    require(rows.nonEmpty, "centroid table is empty")
    array(rows.map { r =>
      val vec = r.getSeq[Float](1)
      val nrm = math.sqrt(vec.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      struct(
        lit(r.getLong(0)).as("cid"),
        typedLit(vec).as("centroid"),
        lit(nrm).as("cnorm"))
    }.toSeq: _*)
  }

  /** (cluster_id, centroid: array<float>) after one Lloyd step. */
  def centroids(spark: SparkSession, embeddings: DataFrame, numClusters: Int): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
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

  /** Nearest-centroid assignment: a single projection — fold over the
    * literal centroid array, keep the argmax. Ascending cid with a
    * strict `>` keeps the lowest cluster_id on ties (same tie-break as
    * the r2 row_number form). No Exchange anywhere in this stage. */
  def assign(spark: SparkSession, embeddings: DataFrame, cents: DataFrame): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val centArr = centroidLiteral(cents)
    val best = aggregate(
      centArr,
      struct(lit(Double.NegativeInfinity).as("sim"), lit(-1L).as("cid")),
      (acc, c) => {
        val sim = Vectors.dot($"embedding", c.getField("centroid")) /
          (Vectors.norm($"embedding") * c.getField("cnorm"))
        when(sim > acc.getField("sim"),
          struct(sim.as("sim"), c.getField("cid").as("cid")))
          .otherwise(acc)
      })
    embeddings.select($"vec_id", $"embedding", best.getField("cid").as("cluster_id"))
  }

  /** Multi-probe index: every vector assigned to its `nprobe` nearest
    * centroids (exploded — one row per (vector, probed cluster)). This
    * is the candidate-generation side of semantic dedup's scale path
    * (SemDedup.annEdges): two vectors can meet only inside a shared
    * probed cluster, so the quadratic pair/verify work is bounded per
    * bucket instead of per corpus. Same map-side literal-sort shape as
    * [[search]]'s probe stage — no Exchange. */
  def assignTop(spark: SparkSession, embeddings: DataFrame, cents: DataFrame,
                nprobe: Int): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val centArr = centroidLiteral(cents)
    val scored = transform(centArr, c => struct(
      (Vectors.dot($"embedding", c.getField("centroid")) * lit(-1.0) /
        (Vectors.norm($"embedding") * c.getField("cnorm"))).as("neg_csim"),
      c.getField("cid").as("cid")))
    embeddings
      .select($"vec_id", $"embedding",
        explode(slice(array_sort(scored), 1, nprobe)).as("pc"))
      .select($"vec_id", $"embedding", $"pc.cid".as("cluster_id"))
  }

  /** Top-k neighbors for each query vector, probing `nprobe` clusters. */
  def search(spark: SparkSession, embeddings: DataFrame, queries: DataFrame,
             numClusters: Int, nprobe: Int, k: Int): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cents = centroids(spark, embeddings, numClusters)
    val indexed = assign(spark, embeddings, cents)

    // rank centroids per query map-side via the ONE probe-ranking
    // implementation (assignTop) — csim desc with cid-asc ties,
    // matching the r2 window tie-break; no exchange on the query side.
    // A second inlined copy of the scoring block once lived here; any
    // tie-break fix would have had to land twice.
    val probed = assignTop(spark, queries.select($"vec_id", $"embedding"),
        cents, nprobe)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"cluster_id")

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
