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

  /** JVM-lifetime memo of trained merge sequences, keyed by the CALLER's
    * corpus identity (data directory + normalization column + k). A
    * training run is deterministic over an immutable corpus, and two
    * entries share one pipeline (d45 trains, d47 applies the trained
    * merges), so a session that runs both would otherwise pay the
    * k-round corpus recount twice for byte-identical output. The cached
    * value is k tiny driver-side rows (pair + counts), never corpus
    * data; Spark-level cache clearing between queries cannot invalidate
    * it and does not need to. Keys should be derived via
    * [[graft.util.CorpusId.key]] (dir + file fingerprint): an in-place
    * corpus rewrite then yields a NEW key and the stale entry is simply
    * never read again. Callers with anonymous corpora must use
    * [[train]] directly. */
  private val trainedCache =
    new graft.util.KeyedOnce[Array[(Long, String, Long, Long)]]

  /** [[train]] memoized on `corpusKey` — ALWAYS token-tracking, so every
    * consumer (pair-only appliers and token-accounting reporters alike)
    * can share one entry. Deliberate tradeoff: when a pair-only
    * consumer is the one that populates the cache, it pays the final
    * token-sum pass its old trackTokens=false call skipped (~one corpus
    * projection) — strictly cheaper than the alternative, where a
    * token-tracking consumer arriving second would have to RETRAIN the
    * whole k rounds because the cached entry lacks the last total.
    * `docs` is by-name: a cache hit never builds the corpus plan.
    * KeyedOnce runs the training outside any map bin lock, so
    * concurrent callers of unrelated keys never queue behind a
    * multi-second merge-round loop. */
  def trainCached(spark: SparkSession, docs: => DataFrame, normCol: String,
                  k: Int, corpusKey: String): DataFrame = {
    val rows = trainedCache.getOrCompute(s"$corpusKey|$normCol|$k") {
      train(spark, docs, normCol, k, trackTokens = true)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("step", "pair", "n", "n_corpus_tokens")
  }

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
    * @param trackTokens when false, the LAST recorded round's
    *                n_corpus_tokens is -1 instead of being measured
    *                with a dedicated final pass — for consumers that
    *                only need the merge PAIR sequence (d47's apply
    *                path). Rounds before the last are exact either way
    *                (their totals fall out of the next round's pair
    *                count, see below).
    * @return (step, pair, n, n_corpus_tokens): per round, the merged
    *         pair, its pre-merge corpus count, and the corpus token
    *         total AFTER the merge — step-ascending. */
  def train(spark: SparkSession, docs: DataFrame, normCol: String, k: Int,
            trackTokens: Boolean = true): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k=$k: need at least one merge round")
    var cur = docs.select(col(normCol).as("s")).filter(length($"s") > 0)
    // Token accounting rides the pair count for free: a doc with
    // m >= 1 tokens contributes exactly m - 1 adjacent pairs, so
    // total_pairs = n_tok - n_docs, i.e. n_tok = total_pairs + n_docs —
    // and n_docs (non-empty docs) is INVARIANT under merging (a merge
    // rewrites two tokens into one, never to zero). One count up
    // front, then each round's pair aggregate yields the PREVIOUS
    // round's post-merge token total as its rollup grand-total row:
    // the loop runs ONE job per round (the rollup'd pair count, which
    // also materializes the pending lazy checkpoint) instead of three
    // (count-top-pair, eager-checkpoint, token-sum).
    val nDocs = cur.count()
    val steps = Seq.newBuilder[(Long, String, Long, Long)]
    // the last merged round, waiting for its post-merge token total
    // (delivered by the NEXT round's grand total, or the final pass)
    var pending: Option[(Long, String, Long)] = None
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val toks = cur.select(split($"s", " ").as("toks"))
      // adjacent pairs with multiplicity — d36's bound-array idiom;
      // rollup adds the (null, total_pairs) grand-total row, which is
      // >= every per-pair count, so top-2 always holds the total AND
      // the best pair (identified by null-ness, not position)
      val top2 = toks.filter(size($"toks") >= 2)
        .select(explode(transform(
          sequence(lit(0), size($"toks") - 2),
          i => concat_ws(" ",
            element_at($"toks", i + 1), element_at($"toks", i + 2)))).as("pair"))
        .rollup($"pair").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"pair".asc_nulls_first).limit(2)
        .collect()
      // The rollup grand-total row is >= every per-pair count, so top-2
      // MUST contain it whenever any pair row exists; if it ever doesn't
      // (an engine contract change, a refactor dropping the rollup), the
      // previous round's n_corpus_tokens would silently become nDocs —
      // fail loudly instead. The 0L path stays for the genuinely-empty
      // corpus (no pair rows at all).
      val totalPairs = top2.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse {
        require(top2.forall(_.isNullAt(0)),
          s"rollup grand-total row missing from top-2 while pair rows exist: ${top2.mkString(", ")}")
        0L
      }
      pending.foreach { case (st, p, n) => steps += ((st, p, n, totalPairs + nDocs)) }
      pending = None
      top2.find(!_.isNullAt(0)) match {
        case None => exhausted = true // corpus fully merged (degenerate)
        case Some(row) =>
          val (bestPair, bestN) = (row.getString(0), row.getLong(1))
          // lazy checkpoint: the next round's pair count (or the final
          // token pass) materializes the rewrite and truncates lineage
          // in the same job — plan depth stays constant across rounds
          cur = cur.select(applyMerge($"s", bestPair).as("s")).localCheckpoint(false)
          pending = Some((step.toLong, bestPair, bestN))
          step += 1
      }
    }
    pending.foreach { case (st, p, n) =>
      val nTok =
        if (!trackTokens) -1L
        else cur.select(sum(size(split($"s", " ")))).head().getLong(0)
      steps += ((st, p, n, nTok))
    }
    spark.createDataFrame(steps.result())
      .toDF("step", "pair", "n", "n_corpus_tokens")
  }
}
