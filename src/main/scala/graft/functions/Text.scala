package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the document pipeline (SURVEY.md
  * §2.4), all composed from codegen'd built-ins. The DuckDB-oracle twins
  * of these expressions live next to the queries in graft.queries.Docs.
  */
object Text {

  /** Whitespace-collapsed, lower-cased, trimmed content — the canonical
    * form used for exact dedup and fingerprinting. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Stable 128-bit content fingerprint (hex md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — a deterministic proxy for subword count. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit(BpePattern), lit(0))).cast("long")

  /** Tokens as array (on normalized text). */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Count of tokens belonging to a fixed marker set. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*))).cast("long")

  /** Word k-shingles of normalized text (distinct, space-joined). Docs
    * shorter than k tokens yield their single partial shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** 64-bit hashes of an array of strings (shingles or tokens) — the
    * input representation for minhash_sig / simhash64. */
  def hashed(arr: Column): Column = transform(arr, x => xxhash64(x))

  /** Sorted distinct xxhash64 values of the word k-shingles — value-
    * identical to `hashed(wordShingles(text, k))` (same seed-42 hash of
    * the same shingle strings) but computed by the single-pass native
    * expression instead of interpreted HOF lambdas that materialize
    * every shingle string (the dominant scan cost of the r4 sf1 run).
    * Use this wherever only the hashes are needed (the whole near-dup
    * family); `wordShingles` remains for callers that need the strings. */
  def shingleHashes(text: Column, k: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    call_function("shingle_hashes", normalize(text), lit(k))
  }

  /** Every k-shingle hash in document order, duplicates kept — the
    * multiset twin of [[shingleHashes]] for per-gram counting
    * (repetition statistics). Same value identity guarantee. */
  def shingleHashesAll(text: Column, k: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    call_function("shingle_hashes_all", normalize(text), lit(k))
  }

  /** Punctuation character count on normalized text. */
  def punctCount(text: Column): Column =
    length(regexp_replace(normalize(text), "[a-z0-9 ]", "")).cast("long")

  /** PII patterns (d49/s18). Kept to the regex subset where Java
    * (Spark) and RE2 (DuckDB) agree exactly: character classes, bounded
    * quantifiers, and ASCII `\b` word boundaries — no backreferences,
    * no lookaround (RE2 has neither). Each pattern's redaction token is
    * paired with it so batch, stream, and oracle can't drift. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("name", "\\bcustomer\\b", "<NAME>"))

  /** Occurrences of one PII pattern (before redaction). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** All PII patterns redacted, in [[PiiPatterns]] order (email first so
    * the digit-bearing patterns never see an address's local part). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, lit(pat), lit(tok))
    }

  /** Composite quality score in [0,1]: rewards length (saturating at 100
    * tokens), penalizes punctuation density, rewards stopword ratio —
    * the heuristic mix used by web-scale corpus filters.
    *
    * Emitted UNROUNDED: the formula is a fixed-order chain of IEEE double
    * ops both engines evaluate identically, whereas engine-native
    * round-half-up at 4 places diverges on the decimal-exact .00005
    * boundaries this formula often lands on (round 1 hash mismatch). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = wsTokenCount(text)
    val stop = markerCount(text, stopwords)
    val punct = punctCount(text)
    val chars = length(normalize(text)).cast("long")
    // empty/whitespace-only text has chars = 0: an unguarded punct/chars
    // would NULL the whole score (Spark) or fail under ANSI — score the
    // density term 0 instead so the function is total (toks is never 0:
    // splitting an empty trim yields one empty token on both engines)
    least(toks / 100.0, lit(1.0)) * 0.3 +
      when(chars > 0, lit(1.0) - punct / chars).otherwise(lit(0.0)) * 0.3 +
      (stop / toks) * 0.4
  }
}
