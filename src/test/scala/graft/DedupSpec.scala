package graft

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end semantics of the near-dup operators (d6/d7/d8) at sf0.001,
  * validated against brute-force exact Jaccard over all O(n²) pairs —
  * feasible at 500 docs, which is exactly why the small SF exists. */
class DedupSpec extends SparkSpec {

  /** All pairs with exact word-3-shingle jaccard, brute force. */
  private lazy val truth: Map[(Long, Long), Double] = {
    import spark.implicits._
    val sets = Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", Text.wordShingles($"text", 3).as("sh"))
    val a = sets.select($"doc_id".as("a_id"), $"sh".as("sh_a"))
    val b = sets.select($"doc_id".as("b_id"), $"sh".as("sh_b"))
    a.join(b, $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")).cast("double")).as("j"))
      .filter($"j" > 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d6 minhash-LSH: full recall on strong near-dups (j >= 0.8)") {
    val cand = pairs(SparkEntry.queries("d6_dedup_minhash")(spark, Sf0001))
    val strong = truth.filter(_._2 >= 0.8).keySet
    assert(strong.nonEmpty, "testdata should contain planted near-dups")
    val missed = strong -- cand
    assert(missed.isEmpty, s"LSH missed strong near-dup pairs: $missed")
  }

  test("d6 candidates are not noise: every candidate shares real shingles") {
    val cand = pairs(SparkEntry.queries("d6_dedup_minhash")(spark, Sf0001))
    val weak = cand.filter(p => truth.getOrElse(p, 0.0) < 0.05)
    // 16 bands × 4 rows: P(candidate) at j<0.05 is ~1e-4; a handful of
    // bucket collisions is tolerable, a flood is a banding bug.
    assert(weak.size <= cand.size / 4, s"too many spurious candidates: $weak")
  }

  /** Brute-force simhash fingerprints for every doc at sf0.001. */
  private lazy val fingerprints: Map[Long, Long] = {
    import spark.implicits._
    Tables.load(spark, Sf0001, "documents")
      .select($"doc_id",
        call_function("simhash64",
          Text.hashed(Text.wordShingles($"text", 3))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("d7 simhash: guarantee (hamming<=7 always found) + exact hamming values") {
    val got = SparkEntry.queries("d7_dedup_simhash")(spark, Sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // pigeonhole guarantee of the 8-band bucket join
    val ids = fingerprints.keys.toSeq.sorted
    val mustFind = for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(fingerprints(i) ^ fingerprints(j)) if h <= 7
    } yield (i, j)
    val missed = mustFind.toSet -- got.keySet
    assert(missed.isEmpty, s"banding missed guaranteed pairs: $missed")
    // reported hammings are exact and within threshold
    got.foreach { case ((a, b), h) =>
      assert(h === java.lang.Long.bitCount(fingerprints(a) ^ fingerprints(b)).toLong)
      assert(h <= 12)
    }
  }

  test("d7 simhash: full recall on strong near-dups, no weak-pair flood") {
    val got = pairs(SparkEntry.queries("d7_dedup_simhash")(spark, Sf0001))
    val strong = truth.filter(_._2 >= 0.8).keySet
    val missed = strong -- got
    assert(missed.isEmpty, s"simhash missed strong near-dup pairs: $missed")
    val weak = got.filter(p => truth.getOrElse(p, 0.0) < 0.05)
    assert(weak.isEmpty, s"hamming<=12 admitted dissimilar pairs: $weak")
  }

  test("d8 equals brute-force jaccard >= 0.5 restricted to LSH candidates, with exact values") {
    import spark.implicits._
    val got = SparkEntry.queries("d8_ngram_jaccard")(spark, Sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cand = pairs(SparkEntry.queries("d6_dedup_minhash")(spark, Sf0001))
    val expect = truth.filter { case (p, j) => j >= 0.5 && cand(p._1, p._2) }
    assert(got.keySet === expect.keySet)
    expect.foreach { case (p, j) =>
      assert(math.abs(got(p) - j) < 5e-7, s"pair $p jaccard ${got(p)} != $j")
    }
  }

  test("d18 exact similarity join equals brute-force jaccard >= 0.5 — zero false negatives") {
    val got = SparkEntry.queries("d18_jaccard_join")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expect = truth.filter(_._2 >= 0.5)
    // the prefix filter must be LOSSLESS (this is what separates d18
    // from the LSH candidates): exact same pair set, exact same values
    assert(got.keySet === expect.keySet,
      s"missed=${expect.keySet -- got.keySet} extra=${got.keySet -- expect.keySet}")
    expect.foreach { case (p, j) =>
      assert(math.abs(got(p) - j) < 5e-7, s"pair $p jaccard ${got(p)} != $j")
    }
  }

  test("jaccard pruning bounds survive a non-representable threshold at exact equality") {
    import spark.implicits._
    // 0.07d parses a hair ABOVE 7/100, so ceil(0.07*200) evaluates to 15
    // in doubles while the true bound is 14 — without the one-unit FP
    // guard band the length filter rejects this pair even though its
    // Jaccard equals the threshold (14/200, computed identically as a
    // double by the final verify)
    val a = (1 to 200).map(i => s"tok$i")
    val df = Seq((1L, a), (2L, a.take(14))).toDF("id", "set")
    val out = graft.operators.SimilarityJoin
      .jaccard(df, "id", "set", threshold = 0.07).collect()
    assert(out.length === 1, "the exactly-at-threshold pair was pruned")
    assert(out.head.getDouble(2) === 14.0 / 200.0)
  }

  test("d34 containment join equals brute-force |A∩B|/|A| >= 0.75 — zero false negatives") {
    import spark.implicits._
    val got = SparkEntry.queries("d34_containment_join")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // brute-force ORDERED-pair truth (containment is asymmetric)
    val sets = Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", Text.wordShingles($"text", 3).as("sh"))
    val a = sets.select($"doc_id".as("a_id"), $"sh".as("sh_a"))
    val b = sets.select($"doc_id".as("b_id"), $"sh".as("sh_b"))
    val expect = a.join(b, $"a_id" =!= $"b_id")
      .select($"a_id", $"b_id",
        size(array_intersect($"sh_a", $"sh_b")).cast("long").as("inter"),
        size($"sh_a").cast("long").as("n_a"))
      .filter($"inter" >= ceil(lit(0.75) * $"n_a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // the probe-prefix-vs-full-index scheme must be LOSSLESS, with
    // exact integer intersection sizes
    assert(got.keySet === expect.keySet,
      s"missed=${expect.keySet -- got.keySet} extra=${got.keySet -- expect.keySet}")
    expect.foreach { case (p, v) => assert(got(p) === v, s"pair $p") }
  }

  test("d13 cluster assignment equals driver-side union-find over the same edges") {
    val labels = SparkEntry.queries("d13_dedup_clusters")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = SparkEntry.queries("d18_jaccard_join")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // union-find truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    labels.foreach { case (doc, cluster) =>
      assert(cluster === find(doc), s"doc $doc: cluster $cluster != union-find ${find(doc)}")
    }
    // every cluster representative is its own representative
    labels.values.toSet.foreach { c: Long => assert(labels(c) === c) }
  }

  test("cluster assignment: adversarial chains converge in few rounds; cap guard still throws") {
    import spark.implicits._
    import graft.operators.DedupClusters
    // A 200-vertex path graph, ids laid out monotonically: diameter
    // 199 — plain label propagation needs ~100 rounds.
    val n = 200
    val docs = (0L until n.toLong).toDF("doc_id")
    val chain = (0L until n - 1L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // localFinishEdges = 0: these chains are small enough that the
    // hybrid cutover would solve them in the single-task finish — the
    // point HERE is the distributed contraction's round bound, so pin
    // the pure path
    val labels = DedupClusters.assign(docs, chain, maxIterations = 12,
        localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet === Set(0L), s"chain not fully labeled: $labels")
    // The HARD case: the same path with randomly permuted ids. Label
    // propagation + pointer jumping never converges here in any
    // reasonable round count (pointer chains stall at id-space local
    // minima — measured: >60 rounds at 400 vertices); star contraction
    // must land it within a dozen rounds. This is the guard that the
    // O(log² n) layout-independence claim stays true.
    val rnd = new scala.util.Random(42)
    val perm = rnd.shuffle((0L until n.toLong).toVector)
    val scattered = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
      .toDF("a_id", "b_id")
    val minId = perm.min
    val labels2 = DedupClusters.assign(docs, scattered, maxIterations = 12,
        localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels2.values.toSet === Set(minId),
      s"scattered chain not fully labeled: ${labels2.values.toSet}")
    // the non-convergence guard must still throw rather than silently
    // split a component when the cap is genuinely too small
    val e = intercept[IllegalStateException] {
      DedupClusters.assign(docs, chain, maxIterations = 1,
        localFinishEdges = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("cluster assignment: hybrid local finish equals pure contraction on a random graph") {
    import spark.implicits._
    import graft.operators.DedupClusters
    // random sparse graph: mixed component sizes, shuffled ids, self
    // loops and duplicate/reversed edges — everything the canonical
    // edge normalization has to absorb. The hybrid path (default:
    // cutover fires immediately at this size) and the pure contraction
    // (localFinishEdges = 0) must emit IDENTICAL labels for every doc.
    val rnd = new scala.util.Random(7)
    val n = 3000L
    val docs = (0L until n).toDF("doc_id")
    val edges = Seq.fill(4000)((rnd.nextLong().abs % n, rnd.nextLong().abs % n))
      .toDF("a_id", "b_id")
    val hybrid = DedupClusters.assign(docs, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pure = DedupClusters.assign(docs, edges, localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hybrid.size === n)
    assert(hybrid === pure)
    // and a mid-loop cutover (threshold between one round's output and
    // the input size) still agrees: contraction rounds run first, the
    // union-find finishes the shrunken set
    val mid = DedupClusters.assign(docs, edges, localFinishEdges = 2000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mid === pure)
  }

  test("LongLongMap equals java.util.HashMap over generative op sequences") {
    // the union-find's open-addressing parent table is new primitive
    // code — pin it against the reference map over random interleaved
    // put/putIfAbsent/get sequences with adversarial keys (negatives,
    // Long extremes, colliding lattice values) across growth cycles
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.frequency(
      4 -> Gen.choose(-100L, 100L),
      2 -> Gen.choose(Long.MinValue, Long.MaxValue),
      2 -> Gen.choose(0L, 15L).map(_ << 40), // same scramble-prefix collisions
      1 -> Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
    val opGen = Gen.zip(Gen.choose(0, 2), keyGen, Gen.choose(-5L, 5L))
    val seqGen = Gen.listOfN(400, opGen)
    var seed = Seed(11L)
    (0 until 50).foreach { _ =>
      seqGen.apply(Gen.Parameters.default, seed).foreach { ops =>
        val m = new graft.operators.DedupClusters.LongLongMap(4)
        val ref = new java.util.HashMap[Long, Long]()
        ops.foreach {
          case (0, k, v) => m.put(k, v); ref.put(k, v)
          case (1, k, v) =>
            m.putIfAbsent(k, v); ref.putIfAbsent(k, v)
          case (_, k, d) =>
            assert(m.getOrDefault(k, d) === ref.getOrDefault(k, d),
              s"get($k) diverged")
        }
        val keys = m.keysSnapshot()
        assert(keys.length === ref.size)
        keys.foreach(k => assert(m.getOrDefault(k, k - 1) === ref.get(k)))
      }
      seed = seed.next
    }
  }

  test("cluster assignment: generative graphs equal driver union-find (hybrid default)") {
    import spark.implicits._
    import graft.operators.DedupClusters
    val rnd = new scala.util.Random(19)
    (0 until 6).foreach { case shape =>
      val n = 400 + rnd.nextInt(400)
      val edges: Seq[(Long, Long)] = shape match {
        case 0 => (0L until n - 1L).map(i => (i, i + 1)) // path
        case 1 => (1L until n.toLong).map(i => (0L, i)) // star
        case 2 => // disjoint cliques of 5
          (0L until n.toLong).grouped(5).flatMap(g =>
            for (a <- g; b <- g if a < b) yield (a, b)).toSeq
        case _ => Seq.fill(n)((rnd.nextLong().abs % n, rnd.nextLong().abs % n))
      }
      val labels = DedupClusters.assign((0L until n.toLong).toDF("doc_id"),
          edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0L until n.toLong).foreach { d =>
        assert(labels(d) === find(d), s"shape $shape: doc $d mislabeled")
      }
    }
  }

  test("cluster assignment: reliable checkpoint mode yields identical labels") {
    import spark.implicits._
    import graft.operators.DedupClusters
    val docs = (0L until 60L).toDF("doc_id")
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // without a checkpoint dir the durable mode must refuse up front
    val err = intercept[IllegalStateException] {
      DedupClusters.assign(docs, chain, reliable = true)
    }
    assert(err.getMessage.contains("setCheckpointDir"))
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt-")
    // the shared session's checkpoint dir is a global: restore the prior
    // value (unset here) and remove the temp dir so nothing leaks into
    // later suites
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val durable = DedupClusters.assign(docs, chain, reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(durable.values.toSet === Set(0L))
      assert(durable === DedupClusters.assign(docs, chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    } finally {
      spark.sparkContext.setCheckpointDir(null) // Option(null) => unset
      import scala.jdk.CollectionConverters._
      // Files.walk holds a directory handle until closed (same class of
      // leak ShardedLog.withDirStream guards against)
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("d17 dedup corpus: kept+dropped partitions the corpus; kept = one per cluster") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = SparkEntry.queries("d17_dedup_corpus")(spark, Sf0001).collect()
    val (docs, kept) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val total = Tables.load(spark, Sf0001, "documents").count()
    assert(docs === total)
    rows.foreach(r => assert(r.getLong(1) - r.getLong(2) === r.getLong(3)))
    // kept count equals number of distinct clusters
    val clusters = SparkEntry.queries("d13_dedup_clusters")(spark, Sf0001)
      .select($"cluster_id").distinct().count()
    assert(kept === clusters)
  }

  test("d15 stratified sample: per-class proportions within binomial tolerance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val totals = Tables.load(spark, Sf0001, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the deterministic hash-threshold fractions at 8-bit resolution:
    // en 128/256, de/fr/es 77/256, zh 26/256
    val targets = Map("en" -> 128.0 / 256, "de" -> 77.0 / 256,
      "fr" -> 77.0 / 256, "es" -> 77.0 / 256, "zh" -> 26.0 / 256)
    val sampled = SparkEntry.queries("d15_stratified_sample")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (lang, f) =>
      val n = totals(lang).toDouble
      val got = sampled.getOrElse(lang, 0L) / n
      // 4 sigma of Binomial(n, f)
      val tol = 4 * math.sqrt(f * (1 - f) / n)
      assert(math.abs(got - f) <= tol,
        s"$lang sampled at $got, target $f +- $tol (n=$n)")
    }
  }

  test("d63 leak-free split: no similarity edge straddles train/val; masses partition the corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // recompute each doc's split exactly as d63 assigns it
    val lab = SparkEntry.queries("d13_dedup_clusters")(spark, Sf0001)
      .withColumn("split",
        when(substring(md5(concat(lit("d63|"), $"cluster_id".cast("string"))
          .cast("binary")), 1, 2) < "14", "val").otherwise("train"))
    val splitOf = lab.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    // every near-dup edge must connect same-split docs (the leak check)
    val edges = SparkEntry.queries("d8_ngram_jaccard")(spark, Sf0001)
      .filter($"jaccard" >= 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"edge ($a,$b) straddles the split")
    }
    // the reported masses partition the corpus
    val out = SparkEntry.queries("d63_leakfree_split")(spark, Sf0001).collect()
    val total = Tables.load(spark, Sf0001, "documents").count()
    assert(out.map(_.getLong(2)).sum === total)
    assert(out.map(_.getString(0)).toSet === Set("train", "val"))
  }

  test("d64 duplication weights preserve corpus mass: weights sum to the corpus size") {
    import spark.implicits._
    val out = SparkEntry.queries("d64_dup_weighting")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = Tables.load(spark, Sf0001, "documents").count()
    // global mass conservation (per-lang totals can shift: a cluster may
    // span languages and its whole mass follows the representative)
    assert(out.values.map(_._2).sum === total)
    // every kept doc carries weight >= 1, so kept <= weight per lang
    out.foreach { case (lang, (kept, wSum)) =>
      assert(kept <= wSum, s"$lang kept $kept > weight $wSum")
    }
    // representatives are a subset: kept count == number of clusters
    val clusters = SparkEntry.queries("d13_dedup_clusters")(spark, Sf0001)
      .select($"cluster_id").distinct().count()
    assert(out.values.map(_._1).sum === clusters)
  }

  test("e6/d1-style invariant: exact dedup groups cover all documents") {
    import spark.implicits._
    val d1 = SparkEntry.queries("d1_dedup_exact")(spark, Sf0001)
    val total = d1.agg(sum($"n_copies")).collect()(0).getLong(0)
    val docs = Tables.load(spark, Sf0001, "documents").count()
    assert(total === docs)
  }

  test("d27 substring-dup equals a driver-side window-hash recomputation") {
    import spark.implicits._
    // independent reimplementation: Scala-collections 16-token windows
    // over normalized text, cross-doc frequency, same 20% flag
    val raw = Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val windows: Map[Long, Seq[Seq[String]]] = raw.map { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      val n = math.max(toks.length - 15, 1)
      id -> (0 until n).map(i => toks.slice(i, i + 16))
    }.toMap
    val docFreq = windows.toSeq
      .flatMap { case (id, ws) => ws.distinct.map(w => w -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    val expected = windows.map { case (id, ws) =>
      val nDup = ws.count(w => docFreq(w) >= 2)
      id -> ((ws.size.toLong, nDup.toLong, if (5 * nDup >= ws.size) 1L else 0L))
    }
    val got = SparkEntry.queries("d27_substring_dup")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    // exact-dup twins (d1) must be fully duplicated and flagged
    assert(expected.values.exists(_._3 == 1L), "corpus has no flagged doc — spec is vacuous")
  }

  test("d30 packing equals a driver-side per-shard cumulative recomputation") {
    import spark.implicits._
    val raw = Tables.load(spark, Sf0001, "documents")
      .select($"source", $"lang", $"doc_id", $"text")
      .as[(String, String, Long, String)].collect()
    val expected = raw.groupBy(t => (t._1, t._2)).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._3).map { case (_, _, id, text) =>
        val n = text.toLowerCase.trim.split("\\s+").length.toLong
        val start = cum; cum += n
        val first = start / 256; val last = (start + n - 1) / 256
        id -> ((n, start, first, last, last - first + 1))
      }.toSeq
    }.toMap
    val got = SparkEntry.queries("d30_pack_sequences")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got === expected)
  }
}
