package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: print every table's schema + a row, so we catch
  * reader incompatibilities (e.g. parquet ns timestamps) early. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    Tables.all.foreach { n =>
      try {
        val df = Tables.load(spark, dir, n)
        println(s"=== $n: ${df.count()} rows")
        df.printSchema()
        df.show(2, 60)
      } catch { case e: Throwable => println(s"=== $n FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
