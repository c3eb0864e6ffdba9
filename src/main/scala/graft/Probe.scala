package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe main — ad-hoc diagnostics (not part of the contract).
  * Currently: d44 ANN-edge recall + component parity vs the exact
  * cosine graph at the given SF, under the adaptive constant-occupancy
  * cluster sizing (r6 sf1 study; r4's d18 stage probe lives in git
  * history). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.4)
    val nprobe = 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.SemDedup
    val nv = Tables.load(spark, dir, "embeddings")
    val n = nv.count()
    println(s"n=$n adaptiveC=${SemDedup.adaptiveClusters(n, nprobe)}")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val exact = timed("exactEdges") {
      SemDedup.exactEdges(spark, nv, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val c = args.lift(2).map(_.toInt).getOrElse(-1)
    val ann = timed(s"annEdges(C=${if (c > 0) c else "adaptive"})") {
      SemDedup.annEdges(spark, nv, threshold, numClusters = c, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    require(ann.subsetOf(exact), "ANN edges must be exact-verified")
    println(f"edges exact=${exact.size} ann=${ann.size} recall=${ann.size.toDouble / exact.size}%.4f")

    def comps(edges: Set[(Long, Long)]): Map[Long, Long] = {
      val df = spark.createDataFrame(edges.toSeq).toDF("a_id", "b_id")
      SemDedup.components(spark, nv, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val (ce, ca) = (comps(exact), comps(ann))
    val diff = ce.keys.count(k => ce(k) != ca(k))
    println(s"component labels differing: $diff of ${ce.size}")
    spark.stop()
  }
}
