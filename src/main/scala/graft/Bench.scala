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
    // Median-of-N per query (default 3): a single-shot in-suite number
    // can swing 5x under co-tenant load (r3's d20 artifact: 20.9 s
    // recorded vs 3.7 s isolated), so the recorded figure is the median
    // and the min/max band is published alongside as the noise bound.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // free caches a query may have persisted so later timings are clean
        spark.catalog.clearCache()
        if (ok) dt else -1.0
      }.sorted
      name -> times
    }
    def fmt(v: Double) = if (v < 0) "-1" else f"$v%.4f"
    val med = results.view.mapValues(ts => ts(ts.length / 2)).toMap
    val qs = med.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, ts) => "\"" + k + "\":" + fmt(ts.head) }
      .mkString("{", ",", "}")
    val qsMax = results.map { case (k, ts) => "\"" + k + "\":" + fmt(ts.last) }
      .mkString("{", ",", "}")
    val total = if (med.nonEmpty) med.values.sum else 0.0
    val gcSec = (gcMillis - gc0) / 1e3
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"queries_max":$qsMax,"reps":$reps,"gc_sec":$gcSec,"sf":"$sfDir"}"""
    println(json)
    // stdout goes through sbt's [info] prefix, which can defeat a
    // line-oriented JSON parse downstream — drop a clean copy on disk too
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
