package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join (AllPairs/PPJoin family, Bayardo et al.
  * WWW'07): all pairs of documents whose shingle-set Jaccard meets a
  * threshold — no LSH false negatives, so the output is deterministic
  * and oracle-checkable (d13/d17 build their dedup graph on it).
  *
  * Why this scales where the naive inverted index does not:
  *   - ordering: every set is sorted by GLOBAL token frequency,
  *     rarest first. Only the first |s| - ceil(t*|s|) + 2 tokens (the
  *     theoretical +1 prefix widened by the one-unit float-rounding
  *     guard band justified at the prefix filter in `jaccard`) are
  *     indexed — two sets with J >= t MUST share a prefix
  *     token (pigeonhole on the overlap bound), so recall stays exact
  *     while boilerplate tokens (the quadratic buckets) land in the
  *     un-indexed tail of nearly every document.
  *   - length filter: J(A,B) >= t forces t*|A| <= |B| <= |A|/t; applied
  *     inside the candidate join before any pair materializes.
  *   - positional filter (PPJoin, Xiao et al. WWW'08): a candidate from
  *     prefix token at positions (i, j) can overlap at most
  *     1 + min(|A|-i, |B|-j); J >= t needs overlap >= t/(1+t)*(|A|+|B|),
  *     so pairs whose bound falls short are pruned BEFORE the verify
  *     shuffle. Lossless: for a qualifying pair the first shared token
  *     in the global order satisfies the bound (the tokens before it on
  *     each side are disjoint by construction).
  *   - verify: exact Jaccard runs only on surviving candidates, joining
  *     the full sets back by id — the full sets cross the wire once per
  *     candidate, never per bucket row. The intersection size is the
  *     native sorted-merge expression (sets are sorted once at the
  *     scan), NOT array_intersect: the built-in allocates a hash set and
  *     a result array per pair, which the r4 sf1 scaling run measured as
  *     the whole operator's cost on a low-entropy corpus whose candidate
  *     count grows quadratically. |A∪B| = |A|+|B|−|A∩B| — no union
  *     materialization either.
  *
  * Execution shape: every set is collapsed ONCE to its 8-byte xxhash64
  * token ids, sorted ascending — the frequency aggregate, prefix window,
  * candidate join AND the verify merge all run on long arrays, so
  * shingle STRINGS never leave the scan projection (a 64-bit collision
  * between two distinct corpus shingles could in principle perturb a
  * count; at ~1e-7 for millions of distinct shingles this is far below
  * any operational concern — set sizes and intersections over distinct
  * hashes equal those over the strings). The hashed-set table and the
  * prefix table are persisted: each feeds two plan branches, which
  * would otherwise re-run the upstream shingle pipeline per branch.
  * Those caches live until the application clears them — a driver
  * sweeping many corpora per session should `spark.catalog.clearCache()`
  * between calls (Bench/Verify do exactly that per query).
  */
object SimilarityJoin {

  /** Broadcast the hashed-set table into the verify join while it's
    * under this many documents (~hundreds of MB of packed longs for
    * shingle-sized sets — comfortably executor-resident).
    *
    * The SAME decision gates the frequency-table broadcast, and that
    * safety argument is about BYTES, not rows: freq's cardinality is the
    * DISTINCT-TOKEN count, which can exceed this row guard by orders of
    * magnitude, but at ≤16 B/row the freq table is bounded by the packed
    * set arrays (every distinct token appears in at least one set, at
    * ≥8 B per occurrence there), so whenever the set broadcast fits, the
    * freq broadcast ships strictly fewer bytes. A future retuning of
    * this constant must preserve that byte relation — raising it until
    * the SET broadcast no longer fits also breaks the freq assumption. */
  val BroadcastSetRows = 200000L

  /** All pairs (a_id < b_id) with Jaccard(sh_a, sh_b) >= threshold.
    *
    * @param sets  (id, set) rows; `set` is an array of distinct string
    *              tokens, OR an `array<bigint>` of already-hashed tokens
    *              sorted ascending and duplicate-free (the contract
    *              `Text.shingleHashes` produces) — the hashed form skips
    *              the per-row hash+sort here
    * @param broadcastSetRows verify-join shape guard (default
    *              [[BroadcastSetRows]]); tests force 0 to exercise the
    *              shuffle fallback on small corpora
    * @return (a_id, b_id, jaccard) — jaccard exact, unrounded */
  def jaccard(sets: DataFrame, idCol: String, setCol: String,
              threshold: Double,
              broadcastSetRows: Long = BroadcastSetRows): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    require(threshold > 0.0 && threshold <= 1.0, s"threshold $threshold not in (0,1]")
    graft.functions.GraftFunctions.register(spark) // standalone-safe

    val preHashed = sets.schema(setCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    val hsetCol =
      if (preHashed) col(setCol)
      else array_sort(transform(col(setCol), x => xxhash64(x)))
    val sized = sets.select(col(idCol).as("id"), hsetCol.as("hset"))
      .withColumn("n", size($"hset"))
      .persist() // feeds the token pipeline AND both verify branches
    val toks = sized.select($"id", $"n", explode($"hset").as("g"))

    // one broadcast decision covers the freq join AND the verify join:
    // the freq table ((g, df) over distinct tokens, ≤16 B/row) is
    // strictly smaller than the packed set table the verify broadcast
    // ships, so whenever sets fit, freq fits a fortiori — and
    // broadcasting it turns the prefix stage's freq shuffle-join into a
    // map-side hash join, leaving the id-keyed window exchange as the
    // stage's only shuffle (measured 0.9 → 0.2 s per call at sf0.1).
    // Past the guard both fall back to shuffle joins together.
    val useBroadcast = sized.count() <= broadcastSetRows

    // global document frequency — the prefix order (rarest first)
    val freq0 = toks.groupBy($"g").agg(count(lit(1)).as("df"))
    val freq = if (useBroadcast) broadcast(freq0) else freq0

    // prefix: keep the (n - ceil(t*n) + 1) globally-rarest tokens per
    // doc — PLUS ONE: every ceil/floor pruning bound below carries a
    // one-unit guard band, because the double product t*n can land an
    // ulp above the exact rational (e.g. 0.07d * 200 = 14.000000000...1
    // → ceil 15, true 14) and a bound that rounds the wrong way drops a
    // pair whose true Jaccard EQUALS the threshold. |t_fp·n − t·n| <
    // n·ulp(t) ≪ 1 for any real document size, so ±1 provably covers
    // the error; the bounds stay candidate-pruning-only and the exact
    // verify restores precision, keeping the no-false-negatives
    // contract for EVERY threshold, representable or not.
    val w = Window.partitionBy($"id").orderBy($"df", $"g")
    val prefix = toks.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n" - ceil(lit(threshold) * $"n") + 2)
      .select($"g", $"id", $"n", $"rn")
      .persist() // both sides of the candidate self-join

    // candidate pairs: prefix-bucket join + length filter + positional
    // overlap bound, deduped by a partial aggregate BEFORE verify work
    val l = prefix.select($"g", $"id".as("a_id"), $"n".as("na"), $"rn".as("ra"))
    val r = prefix.select($"g", $"id".as("b_id"), $"n".as("nb"), $"rn".as("rb"))
    val candidates = l.join(r, "g")
      .filter($"a_id" < $"b_id")
      // length and positional bounds each loosened by the same one-unit
      // FP guard band as the prefix (see above)
      .filter($"nb" >= ceil(lit(threshold) * $"na") - 1 &&
        $"nb" <= floor($"na" / threshold) + 1)
      // PPJoin positional filter: best-possible overlap from this shared
      // token's positions must still reach the J>=t overlap requirement
      .filter(lit(1) + least($"na" - $"ra", $"nb" - $"rb") >=
        ceil(lit(threshold / (1.0 + threshold)) * ($"na" + $"nb")) - 1)
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("n_shared_prefix"))

    // verify: exact Jaccard on candidates only — one allocation-free
    // sorted-merge per pair (hashed sets — counts over distinct hashes
    // equal counts over the strings). Join shape matters here: a shuffle
    // join would move the FULL token array once per candidate pair
    // (pair-multiplicity amplification — ~22 GB at the r4 sf1 probe's
    // 9.2M candidates), where broadcasting the per-doc set table moves
    // it once per executor and the candidates stream through two
    // map-side hash joins. The set table is docs×tokens — far smaller
    // than the corpus text and independent of the candidate count — so
    // broadcast is the right shape well past this scale; the row-count
    // guard falls back to the shuffle join for corpora whose set table
    // outgrows executor memory (at which point candidates dwarf it
    // anyway and partition-aligned storage is the lever).
    val a = sized.select($"id".as("a_id"), $"hset".as("sh_a"))
    val b = sized.select($"id".as("b_id"), $"hset".as("sh_b"))
    val (ja, jb) =
      if (useBroadcast) (broadcast(a), broadcast(b))
      else (a, b)
    candidates
      .join(ja, "a_id").join(jb, "b_id")
      .withColumn("c", call_function("sorted_intersect_count", $"sh_a", $"sh_b"))
      .withColumn("jaccard", $"c".cast("double") /
        (size($"sh_a").cast("long") + size($"sh_b") - $"c").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"a_id", $"b_id", $"jaccard")
  }

  /** EXACT set-CONTAINMENT join: all ordered pairs (a, b), a != b, with
    * |A∩B| / |A| >= threshold — the asymmetric cousin of [[jaccard]]
    * that catches a document SUBSUMED by a larger one (a quoted page, a
    * boilerplate-wrapped copy), which symmetric Jaccard misses whenever
    * |B| >> |A| drags the union down.
    *
    * Prefix scheme (containment variant of AllPairs): the required
    * overlap o = ceil(t·|A|) depends only on the PROBE side, so only A
    * prefixes (its |A|−o+1 globally-rarest tokens) are probed, but the
    * index side must carry B's FULL token list — containment places no
    * upper bound on |B|, so a B-side prefix would lose pairs. Lossless
    * by pigeonhole: A's un-indexed tail holds o−1 tokens < o, so some
    * shared token — in particular the globally-rarest shared one — sits
    * in A's prefix and hits B's full index. The positional filter
    * 1 + min(|A|−ra, |B|−rb) >= o is safe for the same reason as
    * PPJoin's: at the first shared token in the global order, everything
    * earlier on both sides is disjoint.
    *
    * Scale shape: the full-index side is the corpus token table — the
    * SAME linear table the frequency aggregate already scans — keyed on
    * 8-byte hashes; bucket width per probe token is that token's global
    * df, and rarest-first prefix ordering makes probed buckets the
    * narrow ones. Verify is the allocation-free sorted-merge count on
    * broadcast sets, exactly as in [[jaccard]].
    *
    * Pass a threshold exactly representable in binary (0.5, 0.75,
    * 0.875…) and ceil(t·n) is exact integer math on every engine — the
    * d34 oracle relies on this.
    *
    * @return (a_id, b_id, inter, n_a) — a_id is the contained side;
    *         containment = inter / n_a, both exact longs. */
  def containment(sets: DataFrame, idCol: String, setCol: String,
                  threshold: Double,
                  broadcastSetRows: Long = BroadcastSetRows): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    require(threshold > 0.0 && threshold <= 1.0, s"threshold $threshold not in (0,1]")
    graft.functions.GraftFunctions.register(spark) // standalone-safe

    val preHashed = sets.schema(setCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    val hsetCol =
      if (preHashed) col(setCol)
      else array_sort(transform(col(setCol), x => xxhash64(x)))
    val sized = sets.select(col(idCol).as("id"), hsetCol.as("hset"))
      .withColumn("n", size($"hset"))
      .persist()
    val toks = sized.select($"id", $"n", explode($"hset").as("g"))
    // same single broadcast decision as [[jaccard]]: freq is strictly
    // smaller than the set table the verify broadcast ships
    val useBroadcast = sized.count() <= broadcastSetRows
    val freq0 = toks.groupBy($"g").agg(count(lit(1)).as("df"))
    val freq = if (useBroadcast) broadcast(freq0) else freq0

    // every token ranked in the shared global rarest-first order; the
    // probe side keeps only A's prefix, the index side keeps ALMOST
    // everything — it may drop each doc's ceil(t·minN)−1 most-frequent
    // tail positions, because any surviving candidate needs
    // 1 + (nb − rb) >= o >= ceil(t·minN) at its first-shared token
    // (which IS in the truncated range: everything earlier on B's side
    // is disjoint there, so the positional bound holds with the full
    // overlap). Those tail positions are precisely the globally
    // commonest tokens — the widest buckets — so the one tiny minN
    // aggregate buys the biggest index-side skew cut for free, and the
    // brute-force parity spec proves it stays lossless.
    val w = Window.partitionBy($"id").orderBy($"df", $"g")
    val ranked = toks.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .persist() // probe and index branches
    val minRow = sized.agg(min($"n")).head()
    val minN = if (minRow.isNullAt(0)) 0 else minRow.getInt(0)
    val oMin = math.ceil(threshold * minN).toLong
    val o = ceil(lit(threshold) * $"na") // required overlap, probe-side only
    val probe = ranked
      .filter($"rn" <= $"n" - ceil(lit(threshold) * $"n") + 1)
      .select($"g", $"id".as("a_id"), $"n".as("na"), $"rn".as("ra"))
    val index = ranked
      .filter($"rn" <= $"n" - oMin + 1)
      .select($"g", $"id".as("b_id"), $"n".as("nb"), $"rn".as("rb"))
    val candidates = probe.join(index, "g")
      .filter($"a_id" =!= $"b_id")
      .filter($"nb" >= o) // |B| < o can't hold o shared tokens
      .filter(lit(1) + least($"na" - $"ra", $"nb" - $"rb") >= o)
      .groupBy($"a_id", $"b_id")
      .agg(first($"na").as("na"))

    val a = sized.select($"id".as("a_id"), $"hset".as("sh_a"))
    val b = sized.select($"id".as("b_id"), $"hset".as("sh_b"))
    val (ja, jb) =
      if (useBroadcast) (broadcast(a), broadcast(b))
      else (a, b)
    candidates
      .join(ja, "a_id").join(jb, "b_id")
      .withColumn("inter",
        call_function("sorted_intersect_count", $"sh_a", $"sh_b").cast("long"))
      .filter($"inter" >= ceil(lit(threshold) * $"na"))
      .select($"a_id", $"b_id", $"inter", $"na".cast("long").as("n_a"))
  }
}
