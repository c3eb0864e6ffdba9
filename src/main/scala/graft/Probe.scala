package graft

import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe main — ad-hoc diagnostics (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val sh = Tables.load(spark, dir, "documents")
      .select($"doc_id", Text.wordShingles($"text", 3).as("sh"))
    val sims = sh.select($"doc_id", call_function("simhash64", Text.hashed($"sh")).as("sim"))
    val bandCols = (0 until 8).map(i => shiftright($"sim", i * 8).bitwiseAND(lit(0xffL)))
    val banded = sims.select($"doc_id", posexplode(array(bandCols: _*)))
      .toDF("doc_id", "band_idx", "band_val")
    val sizes = banded.groupBy($"band_idx", $"band_val").agg(count(lit(1)).as("bn"))
    println("=== bucket size distribution ===")
    sizes.groupBy().agg(max($"bn"), expr("percentile(bn, 0.99)"), expr("percentile(bn, 0.9)"),
      count(lit(1))).show(false)
    println("=== top buckets ===")
    sizes.orderBy($"bn".desc).show(10, false)
    println("=== sum of bn^2 (pair rows) by cap ===")
    Seq(1000L, 300L, 150L, 100L).foreach { cap =>
      val s = sizes.filter($"bn".between(2L, cap))
        .agg(sum($"bn" * $"bn")).collect()(0).getLong(0)
      println(s"cap=$cap pairRows~=$s")
    }
    spark.stop()
  }
}
