package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterated corpus-level BPE merge training (word-level analog of
  * Sennrich et al. 2016): k rounds of [count adjacent symbol pairs with
  * multiplicity across the whole corpus → take the most frequent pair
  * (count desc, pair asc total order) → merge every non-overlapping
  * occurrence greedily left-to-right, '+'-joined], recounting the
  * corpus between rounds — the iteration d36 (a single round's pair
  * count) leads into, completing the tokenizer-training story
  * (d25 vocab → d36 pair stats → here → d41 coverage).
  *
  * The greedy rewrite is ONE literal string replace per round via the
  * double-space trick: in `' ' + s.replace(" ", "  ") + ' '` every
  * token owns a space on each side, so the pattern `' x  y '` matches
  * each adjacent (x, y) occurrence with no boundary sharing, and the
  * engine's standard left-to-right non-overlapping replace IS greedy
  * BPE ("a a a" merges once, "a b a b" twice). The identical expression
  * runs in DuckDB, which is what makes the whole k-round loop
  * oracle-checkable — and BpeSpec re-derives the merge sequence with a
  * plain-Scala list fold as a second independent implementation.
  *
  * Scale shape (DedupClusters' loop discipline): each round is one
  * map-side-combined pair count (the d36 shuffle, keyed by pair) plus
  * one projection pass; the driver receives exactly ONE (pair, n) row
  * per round — never token data — and the rewritten corpus is
  * localCheckpoint-materialized so plan depth stays constant across
  * rounds. k rounds = k bounded jobs, no driver-side corpus state.
  */
object BpeTrain {

  /** One greedy merge of `pair` applied to a single-space-tokenized
    * string column — the double-space replace (see scaladoc above),
    * usable standalone to APPLY a trained merge sequence (d47) with
    * the exact semantics training used. */
  def applyMerge(s: Column, pair: String): Column = {
    val doubled = " " + pair.replace(" ", "  ") + " "
    val merged = " " + pair.replace(" ", "+") + " "
    trim(replace(replace(
      concat(lit(" "), replace(s, lit(" "), lit("  ")), lit(" ")),
      lit(doubled), lit(merged)),
      lit("  "), lit(" ")))
  }

  /** @param docs    corpus with a whitespace-tokenized text column
    *                (tokens must not contain spaces; empty rows are
    *                ignored)
    * @param normCol the column name
    * @param k       number of merge rounds
    * @return (step, pair, n, n_corpus_tokens): per round, the merged
    *         pair, its pre-merge corpus count, and the corpus token
    *         total AFTER the merge — step-ascending. */
  def train(spark: SparkSession, docs: DataFrame, normCol: String, k: Int): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k=$k: need at least one merge round")
    var cur = docs.select(col(normCol).as("s")).filter(length($"s") > 0)
    val steps = Seq.newBuilder[(Long, String, Long, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val toks = cur.select(split($"s", " ").as("toks"))
      // adjacent pairs with multiplicity — d36's bound-array idiom
      val top = toks.filter(size($"toks") >= 2)
        .select(explode(transform(
          sequence(lit(0), size($"toks") - 2),
          i => concat_ws(" ",
            element_at($"toks", i + 1), element_at($"toks", i + 2)))).as("pair"))
        .groupBy($"pair").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"pair").limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // corpus fully merged (degenerate)
      else {
        val (bestPair, bestN) = (top(0).getString(0), top(0).getLong(1))
        cur = cur.select(applyMerge($"s", bestPair).as("s"))
          .localCheckpoint(true) // constant plan depth across rounds
        val nTok = cur.select(sum(size(split($"s", " ")))).head().getLong(0)
        steps += ((step.toLong, bestPair, bestN, nTok))
        step += 1
      }
    }
    spark.createDataFrame(steps.result())
      .toDF("step", "pair", "n", "n_corpus_tokens")
  }
}
