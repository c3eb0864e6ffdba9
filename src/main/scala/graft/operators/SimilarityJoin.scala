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
  *     rarest first. Only the first |s| - ceil(t*|s|) + 1 tokens (the
  *     "prefix") are indexed — two sets with J >= t MUST share a prefix
  *     token (pigeonhole on the overlap bound), so recall stays exact
  *     while boilerplate tokens (the quadratic buckets) land in the
  *     un-indexed tail of nearly every document.
  *   - length filter: J(A,B) >= t forces t*|A| <= |B| <= |A|/t; applied
  *     inside the candidate join before any pair materializes.
  *   - verify: exact Jaccard runs only on surviving candidates, joining
  *     the full sets back by id — the full sets cross the wire once per
  *     candidate, never per bucket row.
  *
  * Execution shape: every set is collapsed ONCE to its 8-byte xxhash64
  * token ids — the frequency aggregate, prefix window, candidate join
  * AND the verify intersection all run on long arrays, so shingle
  * STRINGS never leave the scan projection (a 64-bit collision between
  * two distinct corpus shingles could in principle perturb a count; at
  * ~1e-7 for millions of distinct shingles this is far below any
  * operational concern — set sizes and intersections over distinct
  * hashes equal those over the strings). The hashed-set table and the
  * prefix table are persisted: each feeds two plan branches, which
  * would otherwise re-run the upstream shingle pipeline per branch.
  */
object SimilarityJoin {

  /** All pairs (a_id < b_id) with Jaccard(sh_a, sh_b) >= threshold.
    *
    * @param sets  (id, set) rows; `set` is an array of distinct tokens
    * @return (a_id, b_id, jaccard) — jaccard exact, unrounded */
  def jaccard(sets: DataFrame, idCol: String, setCol: String,
              threshold: Double): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    require(threshold > 0.0 && threshold <= 1.0, s"threshold $threshold not in (0,1]")

    val sized = sets.select(col(idCol).as("id"),
        transform(col(setCol), x => xxhash64(x)).as("hset"))
      .withColumn("n", size($"hset"))
      .persist() // feeds the token pipeline AND both verify branches
    val toks = sized.select($"id", $"n", explode($"hset").as("g"))

    // global document frequency — the prefix order (rarest first)
    val freq = toks.groupBy($"g").agg(count(lit(1)).as("df"))

    // prefix: keep the (n - ceil(t*n) + 1) globally-rarest tokens per doc
    val w = Window.partitionBy($"id").orderBy($"df", $"g")
    val prefix = toks.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n" - ceil(lit(threshold) * $"n") + 1)
      .select($"g", $"id", $"n")
      .persist() // both sides of the candidate self-join

    // candidate pairs: prefix-bucket join + length filter, deduped by a
    // partial aggregate BEFORE any verify work
    val l = prefix.select($"g", $"id".as("a_id"), $"n".as("na"))
    val r = prefix.select($"g", $"id".as("b_id"), $"n".as("nb"))
    val candidates = l.join(r, "g")
      .filter($"a_id" < $"b_id")
      .filter($"nb" >= ceil(lit(threshold) * $"na") && $"nb" <= floor($"na" / threshold))
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("n_shared_prefix"))

    // verify: exact Jaccard on candidates only (hashed sets — counts
    // over distinct hashes equal counts over the strings)
    val a = sized.select($"id".as("a_id"), $"hset".as("sh_a"))
    val b = sized.select($"id".as("b_id"), $"hset".as("sh_b"))
    candidates
      .join(a, "a_id").join(b, "b_id")
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")).cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"a_id", $"b_id", $"jaccard")
  }
}
