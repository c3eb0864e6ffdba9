package graft

/** Round-7 wave-13 additions: CDC boilerplate removal (d76), Heaps-law
  * vocabulary growth (d77), embedding hygiene gate (d78). Each operator
  * is re-derived driver-side in plain Scala (an implementation-
  * independent model) and compared exactly at sf0.001.
  */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toksOf(text: String): Vector[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim
      .split(" ").toVector.filter(_.nonEmpty)

  private lazy val docRows: Seq[(Long, Vector[String])] =
    spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), toksOf(r.getString(1)))).toSeq

  /** The CDC cut (d71's rule): chunk texts of one doc, in order. */
  private def chunksOf(toks: Vector[String]): Vector[String] = {
    if (toks.isEmpty) return Vector.empty
    val bnd = toks.indices.map { p =>
      p >= 3 && md5hex(toks.slice(p - 3, p + 1).mkString(" ")).head < '2'
    }
    val idx = bnd.scanLeft(0)((acc, b) => acc + (if (b) 1 else 0)).dropRight(1)
    toks.indices.groupBy(idx).toVector.sortBy(_._1)
      .map { case (_, ps) => ps.map(toks).mkString(" ") }
  }

  test("d76: chunk-frequency boilerplate removal matches the Scala model") {
    val got = SparkEntry.queries("d76_boilerplate_remove")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap

    val perDoc = docRows.filter(_._2.nonEmpty)
      .map { case (id, ts) => id -> chunksOf(ts) }
    val freq = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    perDoc.foreach { case (id, chunks) =>
      val removed = chunks.count(c => freq(c) >= 3)
      val kept = chunks.filter(c => freq(c) < 3)
      val model = (chunks.size.toLong, removed.toLong,
        chunks.map(_.split(" ").length.toLong).sum,
        kept.map(_.split(" ").length.toLong).sum,
        md5hex(kept.mkString(" ")))
      assert(got(id) === model, s"doc $id")
    }
    assert(got.keySet === perDoc.map(_._1).toSet)
    // the rule bites at sf0.001: at least one chunk crosses freq>=3
    // (exact-duplicate docs exist by generator design)
    assert(got.values.map(_._2).sum > 0, "no boilerplate removed — rule untested")
  }

  test("property: CDC boundaries are edit-local — an insertion shifts, never re-chunks") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def bnd(toks: Vector[String]): Vector[Boolean] =
      toks.indices.map(p =>
        p >= 3 && md5hex(toks.slice(p - 3, p + 1).mkString(" ")).head < '2').toVector
    val genCase = for {
      n <- Gen.choose(8, 120)
      toks <- Gen.listOfN(n, Gen.oneOf("key", "agg", "row", "scan", "hash",
        "table", "part", "value", "merge", "sort"))
      at <- Gen.choose(0, n)
      ins <- Gen.oneOf("spark", "line", "batch")
    } yield (toks.toVector, at, ins)
    var seed = Seed(23L)
    val params = Gen.Parameters.default
    (0 until 80).foreach { _ =>
      genCase.apply(params, seed).foreach { case (toks, at, ins) =>
        val before = bnd(toks)
        val after = bnd(toks.patch(at, Seq(ins), 0))
        // strictly before the edit: flags untouched (windows end < at)
        (0 until at).foreach(p => assert(after(p) === before(p),
          s"pre-edit boundary moved at $p (insert '$ins'@$at)"))
        // from 4 past the edit on: flags are the old flags shifted by one
        // (windows lie entirely after the inserted token)
        ((at + 4) to toks.size).foreach(q => assert(after(q) === before(q - 1),
          s"post-edit boundary not a pure shift at $q (insert '$ins'@$at)"))
      }
      seed = seed.next
    }
  }

  test("d77: vocabulary growth curve matches the Scala model") {
    val got = SparkEntry.queries("d77_vocab_growth")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    val allIds = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val nTotal = allIds.max + 1
    def dec(id: Long): Long = math.min(9L, id * 10 / nTotal)
    val withToks = docRows.filter(_._2.nonEmpty)
    val occ = withToks.groupBy(d => dec(d._1)).view
      .mapValues(_.map(_._2.size.toLong).sum).toMap
    val firstDoc = withToks.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val nw = firstDoc.values.groupBy(dec).view.mapValues(_.size.toLong).toMap
    val dn = allIds.groupBy(dec).view.mapValues(_.size.toLong).toMap

    var vocabCum = 0L; var toksCum = 0L
    val model = (0L to 9L).map { d =>
      val nt = nw.getOrElse(d, 0L); val tk = occ.getOrElse(d, 0L)
      vocabCum += nt; toksCum += tk
      (d, dn.getOrElse(d, 0L), nt, vocabCum, tk, toksCum,
        if (toksCum > 0) vocabCum * 1000000L / toksCum else 0L)
    }
    assert(got.toSeq === model)
    // Heaps shape: cumulative vocab is non-decreasing and novelty
    // falls off after the first decile (the sf0.001 word-soup corpus
    // exhausts its ~31-type vocabulary in decile 0 — the degenerate
    // extreme of the curve, which the operator must report faithfully)
    assert(model.sliding(2).forall(p => p(1)._4 >= p(0)._4))
    assert(model.last._3 < model.head._3)
  }

  test("d79: within-source calibration matches the Scala model") {
    val got = SparkEntry.queries("d79_quality_calibrate")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val rows = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val scored = rows.flatMap { case (id, src, text) =>
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      if (norm.isEmpty) None else {
        val toks = norm.split(" ").toVector
        val nTok = toks.size.toLong
        val chars = norm.length.toLong
        val punct = norm.count(c => !(c.isDigit || (c >= 'a' && c <= 'z') || c == ' ')).toLong
        val stop = toks.count(t => t == "the" || t == "a").toLong
        Some((id, src, 30L * math.min(nTok, 100L) +
          (chars - punct) * 3000L / chars + stop * 4000L / nTok))
      }
    }
    val bySrc = scored.groupBy(_._2)
    scored.foreach { case (id, src, q) =>
      val peers = bySrc(src).map(_._3)
      val cntLt = peers.count(_ < q).toLong
      val nS = peers.size.toLong
      val model = (src, q, cntLt * 10000 / nS, if (cntLt * 2 >= nS) 1L else 0L)
      assert(got(id) === model, s"doc $id")
    }
    assert(got.keySet === scored.map(_._1).toSet)
    // calibration is the point: identical cal_bp semantics across
    // sources even though raw score distributions differ — each source
    // must span the percentile range (min cal_bp = 0 per source)
    bySrc.keys.foreach { src =>
      val cals = scored.filter(_._2 == src)
        .map { case (id, _, _) => got(id)._3 }
      assert(cals.min === 0L, s"source $src: no 0-percentile doc")
    }
  }

  test("d78: hygiene gate matches the Scala model (fold order, median band)") {
    val got = SparkEntry.queries("d78_embedding_hygiene")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getLong(6))).toMap

    val vecs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector)).toSeq
    val base = vecs.map { case (id, e) =>
      val nBad = e.count(x => x.isNaN || x.isInfinite).toLong
      val isZero = if (e.forall(_ == 0.0f)) 1L else 0L
      // index-ascending double fold — the engine's documented order
      var acc = 0.0
      e.foreach(x => acc += x.toDouble * x.toDouble)
      val normBp = if (nBad > 0) -1L else math.floor(math.sqrt(acc) * 10000).toLong
      (id, e.size.toLong, nBad, isZero, normBp)
    }
    val valid = base.filter(b => b._3 == 0 && b._4 == 0).map(_._5).sorted
    // smallest value whose cumulative count covers half the population
    val med = valid.find(v => valid.count(_ <= v) * 2 >= valid.size).get
    base.foreach { case (id, dims, nBad, isZero, normBp) =>
      val status =
        if (nBad > 0) "nonfinite"
        else if (isZero == 1) "zero"
        else if (normBp * 2 < med || normBp > med * 2) "outlier"
        else "ok"
      val kept = if (status == "ok") 1L else 0L
      assert(got(id) === ((dims, nBad, isZero, normBp, status, kept)), s"vec $id")
    }
    assert(got.size === vecs.size)
  }
}
