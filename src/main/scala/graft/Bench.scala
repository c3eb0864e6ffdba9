package graft
import java.lang.management.ManagementFactory
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

object Bench {
  private def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated subset for targeted local timing.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.view.filterKeys(ks).toMap)
    // Warm-up pass at the smallest SF: steady-state timing, not a
    // measurement of JVM/JIT/codegen cold start (which otherwise lands
    // arbitrarily on whichever queries run first). Disable with
    // SPARK_GRAFT_WARMUP=0.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory) {
        selected.foreach { case (_, fn) =>
          try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
      }
    }
    val gc0 = gcMillis
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // free caches a query may have persisted so later timings are clean
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val gcSec = (gcMillis - gc0) / 1e3
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"gc_sec":$gcSec,"sf":"$sfDir"}"""
    println(json)
    // stdout goes through sbt's [info] prefix, which can defeat a
    // line-oriented JSON parse downstream — drop a clean copy on disk too
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
