package graft

import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe main — ad-hoc diagnostics (not part of the contract).
  * Currently: stage-by-stage cardinalities of the d18 similarity-join
  * pipeline, to attribute scaling behavior (r4 sf1 study). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val p = 32
    val sets = Tables.load(spark, dir, "documents").repartition(p)
      .select($"doc_id", Text.wordShingles($"text", 3).as("sh"))
    val sized = sets.select($"doc_id".as("id"),
        array_sort(transform($"sh", x => xxhash64(x))).as("hset"))
      .withColumn("n", size($"hset"))
      .persist()
    val toks = sized.select($"id", $"n", explode($"hset").as("g"))
    val freq = toks.groupBy($"g").agg(count(lit(1)).as("df")).persist()
    println(s"docs=${sized.count()} tokenInstances=${toks.count()} distinctTokens=${freq.count()}")
    println("df distribution:")
    freq.agg(max($"df"), expr("percentile(df, 0.99)"), expr("percentile(df, 0.5)")).show(false)
    val w = Window.partitionBy($"id").orderBy($"df", $"g")
    val prefix = toks.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n" - ceil(lit(threshold) * $"n") + 1)
      .select($"g", $"id", $"n", $"rn")
      .persist()
    println(s"prefixTokens=${prefix.count()}")
    println("prefix bucket sizes:")
    val buckets = prefix.groupBy($"g").agg(count(lit(1)).as("bn")).persist()
    buckets.agg(max($"bn"), expr("percentile(bn, 0.99)"), sum($"bn" * $"bn")).show(false)
    val l = prefix.select($"g", $"id".as("a_id"), $"n".as("na"), $"rn".as("ra"))
    val r = prefix.select($"g", $"id".as("b_id"), $"n".as("nb"), $"rn".as("rb"))
    val joined = l.join(r, "g").filter($"a_id" < $"b_id")
    val lenOk = joined
      .filter($"nb" >= ceil(lit(threshold) * $"na") && $"nb" <= floor($"na" / threshold))
    val posOk = lenOk
      .filter(lit(1) + least($"na" - $"ra", $"nb" - $"rb") >=
        ceil(lit(threshold / (1.0 + threshold)) * ($"na" + $"nb")))
    println(s"rawPairRows=${joined.count()} afterLen=${lenOk.count()} afterPos=${posOk.count()}")
    val cands = posOk.groupBy($"a_id", $"b_id").agg(count(lit(1)).as("k"))
    println(s"candidatePairs=${cands.count()}")
    spark.stop()
  }
}
