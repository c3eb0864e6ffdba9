package graft.queries

import graft.functions.expressions.HashMix

/** DuckDB SQL combinators that re-derive the repo's hash primitives
  * bit-for-bit, so the deterministic near-dup family (d6 MinHash-LSH,
  * d7 SimHash, d8 exact-Jaccard refine) can carry FULL hash oracles
  * instead of rows-only checks. LSH is only *probabilistic about
  * recall*; given its seeds it is a pure function of the corpus, and
  * DuckDB can replay every stage exactly:
  *
  *  - 64-bit wrap-around arithmetic runs in HUGEINT mod 2^64 (Scala
  *    `Long` overflow semantics); a·c mod 2^64 for a 64-bit constant c
  *    splits c into 32-bit halves so no partial product exceeds 2^96.
  *  - xor / logical shifts run over UBIGINT (cast round-trips are
  *    loss-free for values < 2^64); rotl is two disjoint bit ranges so
  *    `+` replaces `|`.
  *  - XXH64 (Spark's `xxhash64`, seed 42 — the shingle hash of
  *    expressions.Shingle) is implemented for inputs UNDER 64 bytes:
  *    the tail path (< 32) plus ONE 32-byte stripe (xxh64Stages) —
  *    this corpus's 3-word shingles top out at 26 bytes and its
  *    8-grams at 60; at >= 64 bytes the 4-accumulator stripe loop
  *    would be needed and the CTE guards are sized to keep such
  *    inputs out rather than hash them wrong (see shingleCte's note).
  *  - Murmur3_x86_32 (Spark's `hash()` over the 4-slot signature
  *    bands) is 32-bit wrap arithmetic: HUGEINT mod 2^32 throughout.
  *  - Mins/comparisons happen on the SIGNED reinterpretation — the
  *    comparison the JVM's `Long <` performs (same rule d14's oracle
  *    follows).
  *
  * Validated end-to-end against the Spark outputs at sf0.01 before
  * being wired in (25/25 d6 pairs, 24/24 d7, 25/25 d8 including the
  * rounded double jaccard). Oracle scope assumes >= 3 tokens and
  * shingles < 64 bytes per doc, both true of the driver corpus by a
  * margin (min 10 tokens; 3-word shingles <= 26 bytes, 8-grams <= 60).
  */
private[queries] object OracleHash {
  private val M64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val M32 = "CAST(4294967296 AS HUGEINT)"
  private val Half = "CAST('9223372036854775808' AS HUGEINT)"

  /** (x·c) mod 2^64 — x a HUGEINT expr in [0,2^64), c a 64-bit const. */
  private def mulmod(x: String, c: BigInt): String = {
    val (ch, cl) = (c >> 32, c & 0xffffffffL)
    s"((($x)*$cl + ((($x)*$ch) % $M32)*$M32) % $M64)"
  }

  /** (x·c) mod 2^64 where one factor < 2^32 (no split needed). */
  private def mulmodSmall(x: String, c: BigInt): String =
    s"((($x)*$c) % $M64)"

  private def xor64(a: String, b: String): String =
    s"CAST(xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT)) AS HUGEINT)"

  private def shr(x: String, r: Int): String =
    s"(($x) // ${BigInt(1) << r})"

  private def rotl(x: String, r: Int): String =
    s"((($x)*${BigInt(1) << r}) % $M64 + ($x) // ${BigInt(1) << (64 - r)})"

  private def toSigned(x: String): String =
    s"CAST(CASE WHEN ($x) >= $Half THEN ($x) - $M64 ELSE ($x) END AS BIGINT)"

  private def toUnsigned(x: String): String =
    s"(CAST($x AS HUGEINT) + CASE WHEN ($x) < 0 THEN $M64 ELSE CAST(0 AS HUGEINT) END)"

  private val FmixC1 = BigInt("ff51afd7ed558ccd", 16)
  private val FmixC2 = BigInt("c4ceb9fe1a85ec53", 16)

  /** Full fmix64 over a HUGEINT expr (inline expression, no CTE). */
  private def fmix64(x: String): String = {
    val a = xor64(x, shr(x, 33))
    val b = mulmod(a, FmixC1)
    val c = xor64(b, shr(b, 33))
    val d = mulmod(c, FmixC2)
    xor64(d, shr(d, 33))
  }

  // XXH64 primes
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** XXH64(seed 42, n < 64) staged over sh0(doc_id, sid, bl, n):
    * per-byte list + length in, chained CTEs out, final table
    * xah(doc_id, sid, h BIGINT signed). Layout mirrors the reference
    * algorithm: at n >= 32 one 32-byte stripe primes the four
    * accumulators (unrolled once — longer input would need the stripe
    * LOOP, which no shingle in oracle scope reaches), then 8-byte
    * chunks, one 4-byte chunk, tail bytes, and the avalanche — each
    * step gated by a length CASE (conditions are data-independent
    * across rows, so DuckDB vectorizes them fine). */
  private def xxh64Stages: String = {
    def le(off: String, w: Int): String =
      (0 until w).map(j => s"bl[$off+${j + 1}]*${BigInt(1) << (8 * j)}").mkString(" + ")
    val seed = BigInt(42)
    val wrap = (BigInt(1) << 64) - 1
    val init = Seq((seed + P1 + P2) & wrap, (seed + P2) & wrap, seed, (seed - P1) & wrap)
    val ctes = Seq.newBuilder[String]
    // one stripe: v_i = rotl31(init_i + lane_i·P2)·P1, lanes at 0/8/16/24
    val vexprs = (0 until 4).map { i =>
      val lane = s"CAST((${le((8 * i).toString, 8)}) AS HUGEINT)"
      mulmod(rotl(s"((${init(i)} + ${mulmod(lane, P2)}) % $M64)", 31), P1)
    }
    ctes += "sv AS (SELECT doc_id, sid, bl, n, " +
      (0 until 4).map(i => s"CASE WHEN n >= 32 THEN ${vexprs(i)} " +
        s"ELSE CAST(0 AS HUGEINT) END AS v${i + 1}").mkString(", ") +
      " FROM sh0)"
    val hsum = s"((${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M64)"
    ctes += s"sm0 AS (SELECT doc_id, sid, bl, n, v1, v2, v3, v4, " +
      s"CASE WHEN n >= 32 THEN $hsum ELSE CAST(${(seed + P5) & wrap} AS HUGEINT) END AS h FROM sv)"
    for (i <- 0 until 4) {
      val vm = mulmod(rotl(mulmod(s"v${i + 1}", P2), 31), P1)
      val merged = s"(${mulmod(xor64("h", vm), P1)} + $P4) % $M64"
      ctes += s"sm${i + 1} AS (SELECT doc_id, sid, bl, n, v1, v2, v3, v4, " +
        s"CASE WHEN n >= 32 THEN $merged ELSE h END AS h FROM sm$i)"
    }
    // h += n; remaining bytes start at o = 32 (striped) or 0
    ctes += s"xa0 AS (SELECT doc_id, sid, bl, n, " +
      s"CASE WHEN n >= 32 THEN 32 ELSE 0 END AS o, " +
      s"n - CASE WHEN n >= 32 THEN 32 ELSE 0 END AS r, " +
      s"(h + n) % $M64 AS h FROM sm4)"
    for (i <- 0 until 3) {
      val k1 = s"CAST((${le(s"o+${8 * i}", 8)}) AS HUGEINT)"
      val k1c = mulmod(rotl(mulmod(k1, P2), 31), P1)
      val step = s"(${mulmod(rotl(xor64("h", k1c), 27), P1)} + $P4) % $M64"
      ctes += s"xa${i + 1} AS (SELECT doc_id, sid, bl, n, o, r, " +
        s"CASE WHEN r // 8 > $i THEN $step ELSE h END AS h FROM xa$i)"
    }
    val k4 = s"CAST((CASE WHEN r % 8 >= 4 THEN ${le("o+(r//8)*8", 4)} ELSE 0 END) AS HUGEINT)"
    val step4 = s"(${mulmod(rotl(xor64("h", mulmodSmall(k4, P1)), 23), P2)} + $P3) % $M64"
    ctes += s"xa4 AS (SELECT doc_id, sid, bl, n, o, r, " +
      s"CASE WHEN r % 8 >= 4 THEN $step4 ELSE h END AS h FROM xa3)"
    for (j <- 0 until 3) {
      val b = s"CAST(bl[o+(r//4)*4+$j+1] AS HUGEINT)"
      val step = mulmod(rotl(xor64("h", mulmodSmall(b, P5)), 11), P1)
      ctes += s"xa${5 + j} AS (SELECT doc_id, sid, bl, n, o, r, " +
        s"CASE WHEN r % 4 > $j THEN $step ELSE h END AS h FROM xa${4 + j})"
    }
    ctes += s"xa8 AS (SELECT doc_id, sid, ${mulmod(xor64("h", shr("h", 33)), P2)} AS h FROM xa7)"
    ctes += s"xa9 AS (SELECT doc_id, sid, ${mulmod(xor64("h", shr("h", 29)), P3)} AS h FROM xa8)"
    ctes += s"xah AS (SELECT doc_id, sid, ${toSigned(xor64("h", shr("h", 32)))} AS h FROM xa9)"
    ctes.result().mkString(",\n")
  }

  /** sh(doc_id, h): the distinct signed xxh64 k-word-shingle set —
    * DuckDB twin of Text.shingleHashes(normalize(text), k). Assumes
    * every doc has >= k tokens and every shingle is < 64 bytes (both
    * corpus-checked: 3-grams top out at 26 bytes, 8-grams at 60). */
  def shingleCte(k: Int): String =
    s"""nd AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents),
       |tok AS (SELECT doc_id, string_split(norm, ' ') AS ts FROM nd),
       |shs AS (
       |  SELECT doc_id, i AS sid, list_aggregate(ts[i+1:i+$k], 'string_agg', ' ') AS s
       |  FROM tok, UNNEST(generate_series(0, len(ts)-$k)) t(i)),
       |sh0 AS (
       |  SELECT doc_id, sid,
       |    list_transform(range(1, length(s)+1),
       |      i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT)) AS bl,
       |    length(s) AS n
       |  FROM shs),
       |""".stripMargin + xxh64Stages + ",\n" +
      "sh AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM xah)"

  /** sig(doc_id, j, slot): the 64-perm MinHash signature — signed min
    * over the shingle set of fmix64(h ^ S_j), S_j = HashMix.permSeed
    * (seeds inlined as literals straight from the Scala source of
    * truth, so the two sides cannot drift).
    *
    * fmix64 is STAGED through CTE columns rather than one inline
    * expression: DuckDB does no common-subexpression elimination, so
    * the nested form recomputes each chained step 2× per level (~16×
    * work over the numPerms × shingles hot table); staged, every step
    * reads a materialized column once. */
  def minhashCte(numPerms: Int, seed: Long): String = {
    val seeds = Array.tabulate(numPerms)(j =>
      java.lang.Long.toUnsignedString(HashMix.permSeed(seed, j)))
    val lits = seeds.map(s => s"CAST('$s' AS HUGEINT)").mkString(", ")
    s"""sds AS (SELECT CAST(j AS BIGINT) AS j, CAST(sl[j+1] AS HUGEINT) AS s
       |  FROM (SELECT [$lits] AS sl),
       |    UNNEST(generate_series(0, ${numPerms - 1})) t(j)),
       |ms0 AS (SELECT sh.doc_id, sd.j,
       |  ${xor64(toUnsigned("sh.h"), "sd.s")} AS x FROM sh, sds sd),
       |ms1 AS (SELECT doc_id, j, ${xor64("x", shr("x", 33))} AS x FROM ms0),
       |ms2 AS (SELECT doc_id, j, ${mulmod("x", FmixC1)} AS x FROM ms1),
       |ms3 AS (SELECT doc_id, j, ${xor64("x", shr("x", 33))} AS x FROM ms2),
       |ms4 AS (SELECT doc_id, j, ${mulmod("x", FmixC2)} AS x FROM ms3),
       |ms5 AS (SELECT doc_id, j, ${xor64("x", shr("x", 33))} AS x FROM ms4),
       |sig AS MATERIALIZED (
       |  SELECT doc_id, j, MIN(${toSigned("x")}) AS slot
       |  FROM ms5 GROUP BY doc_id, j)""".stripMargin
  }

  // ---- Murmur3_x86_32 over the 4-slot band (Spark hash(), seed 42) ----
  private def xor32(a: String, b: String): String =
    s"CAST(xor(CAST($a AS BIGINT), CAST($b AS BIGINT)) AS HUGEINT)"
  private def rotl32(x: String, r: Int): String =
    s"((($x)*${1L << r}) % $M32 + ($x) // ${1L << (32 - r)})"
  private def mul32(x: String, c: Long): String =
    s"((($x)*$c) % $M32)"
  private def mixK1(k: String): String =
    mul32(rotl32(mul32(k, 0xcc9e2d51L), 15), 0x1b873593L)
  private def mixH1(h: String, k: String): String =
    s"((${mul32(rotl32(xor32(h, k), 13), 5)} + 3864292196) % $M32)"
  private def fmix32(h: String): String = {
    val a = xor32(h, "8")
    val b = xor32(a, shr(a, 16))
    val c = mul32(b, 0x85ebca6bL)
    val d = xor32(c, shr(c, 13))
    val e = mul32(d, 0xc2b2ae35L)
    xor32(e, shr(e, 16))
  }

  /** bh(doc_id, band_idx, band_hash): Spark `hash(slice(sig, 4b+1, 4))`
    * re-derived — the running-seed Murmur3 fold over the band's four
    * longs (each long = two LE 32-bit blocks through mixK1/mixH1, then
    * the per-long fmix with len 8), int32 result sign-extended. */
  def bandsCte(rowsPerBand: Int): String = {
    require(rowsPerBand == 4, "band layout is pivoted to 4 slot columns")
    val ctes = Seq.newBuilder[String]
    ctes +=
      s"""bp AS (
         |  SELECT doc_id, j // 4 AS band_idx,
         |    MAX(CASE WHEN j % 4 = 0 THEN slot END) AS l0,
         |    MAX(CASE WHEN j % 4 = 1 THEN slot END) AS l1,
         |    MAX(CASE WHEN j % 4 = 2 THEN slot END) AS l2,
         |    MAX(CASE WHEN j % 4 = 3 THEN slot END) AS l3
         |  FROM sig GROUP BY doc_id, j // 4),
         |mb0 AS (SELECT doc_id, band_idx, l0, l1, l2, l3, CAST(42 AS HUGEINT) AS h FROM bp)""".stripMargin
    for (i <- 0 until 4) {
      val u = toUnsigned(s"l$i")
      val lo = s"(($u) % $M32)"
      val hi = s"(($u) // $M32)"
      ctes += s"mb${i}a AS (SELECT doc_id, band_idx, l0, l1, l2, l3, " +
        s"${mixH1("h", mixK1(lo))} AS h FROM mb$i)"
      ctes += s"mb${i + 1} AS (SELECT doc_id, band_idx, l0, l1, l2, l3, " +
        s"${fmix32(mixH1("h", mixK1(hi)))} AS h FROM mb${i}a)"
    }
    ctes += "bh AS MATERIALIZED (SELECT doc_id, band_idx, " +
      s"CAST(CASE WHEN h >= 2147483648 THEN h - $M32 ELSE h END AS BIGINT) AS band_hash FROM mb4)"
    ctes.result().mkString(",\n")
  }

  /** cand(a_id, b_id, n_shared_bands): the capped LSH bucket self-join
    * — d6's candidate set, shared verbatim by d8's refine oracle. */
  def candidateCte(maxBucket: Long): String =
    s"""buckets AS (SELECT band_idx, band_hash, count(*) AS bn FROM bh
       |  GROUP BY 1, 2 HAVING bn BETWEEN 2 AND $maxBucket),
       |inb AS MATERIALIZED (SELECT bh.band_idx, bh.band_hash, bh.doc_id
       |  FROM bh JOIN buckets USING (band_idx, band_hash)),
       |cand AS MATERIALIZED (
       |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS n_shared_bands
       |  FROM inb l JOIN inb r ON l.band_idx = r.band_idx
       |    AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** Spark BloomFilterImpl's sizing, replicated from the published
    * formulas (util.sketch.BloomFilter.optimalNumOfBits /
    * optimalNumOfHashFunctions) plus BitArray's round-up to whole
    * 64-bit words — probe indices are taken mod the ROUNDED size.
    * Cross-checked against a live BloomFilter.create(10000, 0.01):
    * bitSize 95872, k 7 (and against the serialized V2 header:
    * version 2, k 7, seed 0, 1498 words). The probe replica itself is
    * validated in bloomPositionsCte's scaladoc — note the r12 lesson
    * there: a replica that only ever sees true members validates the
    * NO-FALSE-NEGATIVE half of the contract; only false positives
    * exercise the scatter math, and they first appeared at sf1. */
  def bloomBitSize(expectedItems: Long, fpp: Double): Long = {
    val numBits = (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ((numBits + 63) / 64) * 64
  }
  def bloomNumHashes(expectedItems: Long, fpp: Double): Int = {
    val numBits = (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)
  }

  /** One Murmur3_x86_32 hashLong(l, seed) as staged CTEs over a table
    * carrying columns (h BIGINT gram hash, `seedCol` HUGEINT) — two LE
    * 32-bit blocks through mixK1/mixH1, then fmix with len 8. Emits
    * `outCol` (HUGEINT in [0,2^32)). */
  private def hashLongStages(src: String, keep: String, seedExpr: String,
                             outCol: String, tag: String): String = {
    val u = toUnsigned("h")
    val lo = s"(($u) % $M32)"
    val hi = s"(($u) // $M32)"
    s"""${tag}a AS (SELECT $keep, ${mixH1(seedExpr, mixK1(lo))} AS hh FROM $src),
       |${tag}b AS (SELECT $keep, ${fmix32(mixH1("hh", mixK1(hi)))} AS $outCol FROM ${tag}a)""".stripMargin
  }

  /** gp(h, pos): the k bloom bit positions of each distinct gram hash
    * in gd(h), replaying Spark 4's **BloomFilterImplV2** scatter
    * (`BloomFilterBase.hashLongToIntPair` + V2
    * `scatterHashAndGetAllBits`): hi = hashLong(h, seed=0),
    * lo = hashLong(h, hi) — the same Murmur3 pair as V1 — but the
    * combine runs in SIGNED 64-BIT math: position i =
    * (flip-if-negative (hi·Integer.MAX_VALUE + i·lo)) mod bitSize,
    * where hi/lo enter SIGN-EXTENDED and flip is the 64-bit `^ -1L`.
    *
    * The r8 replay used V1's int32 combine ((h1 + i·h2) as int32).
    * That matched every sf0.01 draw — true members hit under EITHER
    * scheme (their own insertion set their own positions), and the
    * small corpus produced zero false positives on either side — and
    * only diverged at sf1, where the V2 filter's 4 FP docs met a
    * V1-replay oracle with different FPs (r12; d62 6 rows vs 2). The
    * scatter was re-derived from the shipped spark-sketch 4.1.2
    * bytecode and the replica re-validated against a live filter over
    * the full sf1 disputed-doc gram set, FP behavior included.
    * |hi·2147483647 + i·lo| < 2^62 + 2^35, so BIGINT cannot overflow. */
  def bloomPositionsCte(numHashes: Int, bitSize: Long): String = {
    def signed(u: String): String =
      s"(CASE WHEN $u >= 2147483648 THEN CAST($u AS BIGINT) - 4294967296 " +
        s"ELSE CAST($u AS BIGINT) END)"
    val acc = s"(${signed("h1")} * 2147483647 + i * ${signed("h2")})"
    val flipped = s"(CASE WHEN $acc < 0 THEN -$acc - 1 ELSE $acc END)"
    s"""${hashLongStages("gd", "h", "CAST(0 AS HUGEINT)", "h1", "bg1")},
       |${hashLongStages("bg1b", "h, h1", "h1", "h2", "bg2")},
       |gp AS MATERIALIZED (
       |  SELECT h, CAST($flipped % $bitSize AS BIGINT) AS pos
       |  FROM bg2b, UNNEST(generate_series(1, $numHashes)) t(i))""".stripMargin
  }

  /** simt(doc_id, simu HUGEINT, sim BIGINT): SimHash64 over the
    * shingle set — bit b of the fingerprint is the majority vote
    * 2·(#hashes with bit b set) > |set|, integer-exact. */
  val simhashCte: String = {
    val pw = (0 until 64).map(b =>
      s"CAST('${BigInt(1) << b}' AS HUGEINT)").mkString(", ")
    s"""pw(pl) AS (SELECT [$pw]),
       |sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
       |bits AS (
       |  SELECT sh.doc_id, b,
       |    SUM(CAST((${toUnsigned("sh.h")} // pl[b+1]) % 2 AS BIGINT)) AS setc
       |  FROM sh, pw, UNNEST(generate_series(0, 63)) t(b)
       |  GROUP BY sh.doc_id, b),
       |simt AS (
       |  SELECT bits.doc_id,
       |    SUM(CASE WHEN 2*setc > sz.nsh THEN pl[b+1] ELSE CAST(0 AS HUGEINT) END) AS simu
       |  FROM bits JOIN sz USING (doc_id), pw
       |  GROUP BY bits.doc_id),
       |sims AS (SELECT doc_id, simu, ${toSigned("simu")} AS sim FROM simt)""".stripMargin
  }
}
