package graft.operators

import graft.functions.{GraftFunctions, Vectors}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH ANN over `array<float>` embeddings — the
  * bucket-join alternative to IVF (SURVEY.md §2.4 d11/d16): sign
  * patterns against L fixed hyperplanes form an L-bit bucket code;
  * P(bit agrees) = 1 − θ/π, so cosine-close vectors collide.
  *
  * Scale shape: the code is one codegen pass per vector (L dot
  * products against broadcast literal planes), the candidate join is a
  * plain equi-join on an 8-byte bucket key, and multiprobe (flipping
  * each bit of the query's code) trades L extra lookups for recall
  * instead of widening buckets. Versus IVF: no centroid build pass and
  * pure data-independence, in exchange for weaker recall at moderate
  * cosine — the classic tradeoff, measured in AnnSpec.
  */
object AnnLsh {

  val NumBits = 6 // 2^6 buckets; fewer bits = wider buckets = higher recall
  val Dim = 64
  private val Seed = 4242

  /** Deterministic hyperplanes (java.util.Random's LCG is specified, so
    * codes are stable across JVMs). */
  lazy val planes: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(Seed)
    Seq.fill(NumBits)(Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** L-bit sign-pattern bucket code for an embedding column. */
  def bucketCode(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(Vectors.dot(v, typedlit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Top-k neighbors per query via bucket join with 1-bit multiprobe. */
  def search(spark: SparkSession, embeddings: DataFrame, queries: DataFrame,
             k: Int): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark) // operators must work standalone (no Tables.load side effect)
    val coded = embeddings.select($"vec_id", $"embedding",
      bucketCode($"embedding").as("bucket"))
    // query probes its own bucket and every 1-bit neighbor
    val probes = (0 until NumBits).foldLeft(Seq(col("code"))) { (acc, i) =>
      acc :+ col("code").bitwiseXOR(lit(1L << i))
    }
    val probed = queries.select($"vec_id".as("q_id"), $"embedding".as("qe"),
        bucketCode($"embedding").as("code"))
      .select($"q_id", $"qe", explode(array(probes: _*)).as("bucket"))
    val wk = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id")
    probed.join(coded, "bucket")
      .filter($"q_id" =!= $"vec_id")
      .withColumn("cos", Vectors.dot($"qe", $"embedding") /
        (Vectors.norm($"qe") * Vectors.norm($"embedding")))
      .select($"q_id", $"vec_id".as("neighbor_id"), $"cos")
      .distinct() // a neighbor can surface via several probes
      .withColumn("rk", row_number().over(wk).cast("long"))
      .filter($"rk" <= k)
      .select($"q_id", $"neighbor_id", round($"cos", 6).as("cos"), $"rk")
  }
}
