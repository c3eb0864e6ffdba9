package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe main — ad-hoc diagnostics (not part of the contract).
  * Currently: DedupClusters fixed-cost study — 9 suite entries pay the
  * contraction engine's per-round overhead, so measure rounds × wall
  * at d13-like edge counts under different shuffle-partition settings
  * (earlier probes — d51 PQ recall grid, r6 d44 adaptive-C, r4 d18
  * stages — live in git history). */
object Probe {
  def main(args: Array[String]): Unit = {
    val parts = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // d13-like graph at sf0.1: ~50k docs, a few thousand near-dup
    // edges in chains/stars of mixed length plus one long path.
    val docs = spark.range(0, n).toDF("doc_id")
    val edges = spark.range(0, n / 20).flatMap { c =>
      val base = c * 20
      (1 to 3).map(i => (base + (i * 37) % 17, base + (i * 53) % 19 + 1))
    }.toDF("a_id", "b_id").filter($"a_id" =!= $"b_id")
      .union(spark.range(0, 200).select(($"id" * 7 % n).as("a_id"),
        (($"id" + 1) * 7 % n).as("b_id")))
    edges.persist().count()

    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val out = graft.operators.DedupClusters.assign(docs, edges)
      val cnt = out.count()
      println(f"parts=$parts rep=$rep assign wall = ${(System.nanoTime() - t0) / 1e9}%.2f s (rows $cnt)")
    }
    spark.stop()
  }
}
