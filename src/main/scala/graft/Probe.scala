package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe main — ad-hoc diagnostics (not part of the contract).
  * Currently: d51 PQ shortlist recall vs exact lattice-L2 under
  * varying Lloyd rounds and shortlist depths (r6 parameter study;
  * earlier probes — r6 d44 adaptive-C, r4 d18 stages — live in git
  * history). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{KMeans, PqAnn}

    val e = Tables.load(spark, dir, "embeddings")
    val vecs = e.select($"vec_id", KMeans.quantize($"embedding").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val exact = vecs.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (nid, nv) =>
          (qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum, nid)
        }.sortBy(identity).take(5).map(_._2).toSet
    }.toMap

    for ((m, k) <- Seq((8, 16), (8, 32), (16, 16), (16, 32))) {
      val cb = PqAnn.train(spark, e, m = m, k = k, iters = 3)
      for (s <- Seq(25, 50, 100)) {
        val short = PqAnn.topK(spark, e, cb, $"vec_id" < 10, k = s)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
        val recall = exact.map { case (q, ex) =>
          (short(q) intersect ex).size.toDouble / ex.size }.sum / exact.size
        println(f"m=$m k=$k shortlist=$s%3d recall-of-exact-top5 = $recall%.3f")
      }
    }
    spark.stop()
  }
}
