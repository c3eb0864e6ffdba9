package graft

/** Round-8 wave-14 additions: event-trigram mining (e33), perceptual-
  * hash image near-dup (d80), hybrid RRF retrieval (d81), trigram-LM
  * fluency (d82), lattice-PCA outliers (d83), and the streaming shard-
  * skew monitor (s27). Each operator is re-derived driver-side in plain
  * Scala (an implementation-independent model) and compared exactly at
  * sf0.001; the DuckDB oracles check the same pipelines against a
  * second engine — this spec checks them against a second
  * IMPLEMENTATION.
  */
class Wave11Spec extends SparkSpec {
  import spark.implicits._

  private def toksOf(text: String): Vector[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toVector

  private lazy val docRows: Seq[(Long, String)] =
    spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private lazy val eventRows: Seq[(Long, Long, Long, String)] =
    spark.read.parquet(s"$Sf0001/events.parquet")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("e33: trigram counts and integer lift match a BigInt model") {
    val got = SparkEntry.queries("e33_event_trigrams")(spark, Sf0001)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4))))
    val byUser = eventRows.groupBy(_._3).view
      .mapValues(_.sortBy(e => (e._2, e._1)).map(_._4)).toMap
    val tris = byUser.values.flatMap(_.sliding(3).filter(_.size == 3))
      .map(s => (s(0), s(1), s(2))).toSeq
    val triCount = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = eventRows.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val n = BigInt(eventRows.size)
    val t = BigInt(tris.size)
    val model = triCount.toSeq
      .map { case (k @ (a, b, c), cnt) =>
        val lift = (BigInt(10000) * cnt * n * n * n) /
          (t * uni(a) * uni(b) * uni(c))
        (k, (cnt, lift.toLong))
      }
      .sortBy { case ((a, b, c), (cnt, _)) => (-cnt, a, b, c) }
      .take(15)
    assert(got.toSeq === model)
  }

  /** d80's model aHash: square wrap, 8×8 integer area pooling, mean
    * bit, band bytes — all integer math mirrored from the operator. */
  private def aHashBands(text: String): Array[Long] = {
    val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
    val n = bytes.length
    val s0 = math.floor(math.sqrt(n.toDouble)).toLong
    val side = (if ((s0 - 1) * (s0 - 1) >= n) s0 - 1
                else if (s0 * s0 >= n) s0 else s0 + 1).toInt
    def px(r: Int, c: Int): Long = {
      val p = r * side + c
      if (p < n) bytes(p) else 0L
    }
    val cells = for (i <- 0 until 8; j <- 0 until 8) yield {
      val (r0, r1) = (i * side / 8, math.max(i * side / 8 + 1, (i + 1) * side / 8))
      val (c0, c1) = (j * side / 8, math.max(j * side / 8 + 1, (j + 1) * side / 8))
      var sum = 0L
      for (r <- r0 until r1; c <- c0 until c1) sum += px(r, c)
      sum / ((r1 - r0).toLong * (c1 - c0))
    }
    val tot = cells.sum
    val bits = cells.map(v => if (64 * v > tot) 1L else 0L)
    (0 until 8).map(b =>
      (0 until 8).map(j => bits(8 * b + j) << j).sum).toArray
  }

  test("d80: banded-aHash near-dup pairs match the Scala model") {
    val got = SparkEntry.queries("d80_phash_neardup")(spark, Sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val imgs = docRows.filter(_._1 % 3 == 0)
      .map { case (id, text) => id -> aHashBands(text) }
    val bySize = imgs.flatMap { case (_, bs) =>
      bs.zipWithIndex.map { case (v, i) => (i, v) } }
      .groupBy(identity).view.mapValues(_.size).toMap
    val model = (for {
      (a, ba) <- imgs; (b, bb) <- imgs if a < b
      if (0 until 8).exists(i => ba(i) == bb(i) && bySize((i, ba(i))) <= 1000)
      ham = (0 until 8).map(i => java.lang.Long.bitCount(ba(i) ^ bb(i))).sum.toLong
      if ham <= 10
    } yield ((a, b), ham)).toMap
    assert(got === model)
  }

  test("d81: RRF fusion matches an independent ranking model") {
    val got = SparkEntry.queries("d81_hybrid_rrf")(spark, Sf0001)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
    val sets = docRows.map { case (id, t) => id -> toksOf(t).toSet }.toMap
    val vecs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val model = (0L until 10L).flatMap { q =>
      val lex = sets.keys.filter(_ != q).toSeq
        .map { d =>
          val i = (sets(q) & sets(d)).size
          (d, i.toDouble / (sets(q).size + sets(d).size - i))
        }
        .filter(_._2 > 0)
        .sortBy { case (d, j) => (-j, d) }.take(20).zipWithIndex
        .map { case ((d, _), i) => d -> (i + 1L) }.toMap
      val vec = vecs.keys.filter(_ != q).toSeq
        .map(d => (d, cos(vecs(q), vecs(d))))
        .sortBy { case (d, c) => (-c, d) }.take(20).zipWithIndex
        .map { case ((d, _), i) => d -> (i + 1L) }.toMap
      (lex.keySet ++ vec.keySet).toSeq
        .map { d =>
          val rrf = lex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            vec.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (d, lex.getOrElse(d, 0L), vec.getOrElse(d, 0L), rrf)
        }
        .sortBy { case (d, _, _, rrf) => (-rrf, d) }.take(10).zipWithIndex
        .map { case ((d, rl, rv, rrf), i) =>
          ((q, d), (rl, rv,
            BigDecimal(rrf).setScale(9, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, i + 1L))
        }
    }
    assert(got.toSeq.sortBy(_._1) === model.sortBy(_._1))
  }

  test("d82: interpolated trigram inverse probability matches a BigInt model") {
    val got = SparkEntry.queries("d82_trigram_lm")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val toks = docRows.map { case (id, t) => id -> toksOf(t) }.toMap
    val train = toks.filter(_._1 >= 100)
    val c1 = train.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = train.values.flatMap(_.sliding(2).filter(_.size == 2).map(s => (s(0), s(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c3 = train.values.flatMap(_.sliding(3).filter(_.size == 3).map(s => (s(0), s(1), s(2))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = BigInt(train.values.map(_.size).sum) + train.values.flatten.toSet.size + 1
    val model = toks.filter(_._1 < 100).flatMap { case (id, ts) =>
      val invs = ts.sliding(3).filter(_.size == 3).map { w =>
        val (w1, w2, w3) = (w(0), w(1), w(2))
        val c2ctx = BigInt(math.max(c2.getOrElse((w1, w2), 0L), 1L))
        val c1prev = BigInt(math.max(c1.getOrElse(w2, 0L), 1L))
        val t3 = BigInt(c3.getOrElse((w1, w2, w3), 0L))
        val b2 = BigInt(c2.getOrElse((w2, w3), 0L))
        val u1 = BigInt(c1.getOrElse(w3, 0L))
        (BigInt(10) * c2ctx * c1prev * m) /
          (BigInt(7) * t3 * c1prev * m + BigInt(2) * b2 * c2ctx * m +
            (u1 + 1) * c2ctx * c1prev)
      }.toSeq
      if (invs.isEmpty) None
      else Some(id -> (invs.size.toLong, (invs.sum / invs.size).toLong))
    }
    assert(got === model)
  }

  test("d83: lattice power iteration matches a BigInt model end-to-end") {
    val got = SparkEntry.queries("d83_pca_outliers")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val vecs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val q = vecs.map { case (_, e) =>
      e.map(x => math.floor((x.toDouble + 1.0) * 1048576.0).toLong)
    }
    val dim = q.head.length
    val n = q.length
    val mu = (0 until dim).map { j =>
      val s = q.map(_(j)).sum
      (2 * s + n) / (2L * n) // all lattice coords >= 0
    }
    val c = q.map(row => row.indices.map(j => row(j) - mu(j)).toArray)
    def fdiv(a: BigInt, b: BigInt): BigInt = {
      val r = a / b
      if (a % b != 0 && a.signum * b.signum < 0) r - 1 else r
    }
    var v = Array.fill(dim)(BigInt(1L << 20))
    for (_ <- 1 to 3) {
      val d = c.map(row => row.indices.map(j => BigInt(row(j)) * v(j)).sum)
      val w = (0 until dim).map(j =>
        c.indices.map(i => BigInt(c(i)(j)) * d(i)).sum)
      val mx = w.map(_.abs).max.max(BigInt(1))
      v = w.map(wj => fdiv(BigInt(1L << 20) * wj, mx)).toArray
    }
    val proj = vecs.indices.map(i =>
      vecs(i)._1 -> c(i).indices.map(j => BigInt(c(i)(j)) * v(j)).sum.toLong)
    val ranked = proj.sortBy { case (id, p) => (-math.abs(p), id) }
      .map(_._1).zipWithIndex.toMap
    val model = proj.map { case (id, p) =>
      id -> (p, if (ranked(id) + 1 <= n / 50) 1L else 0L)
    }.toMap
    assert(got === model)
  }

  test("s28: the streamed LM gate emits bit-identical rows to batch d82") {
    // the d62/s23 bit-parity contract applied to the LM gate: same
    // model (shared lmCounts), same arithmetic (shared lmScore), and
    // the trigram extraction (stream slices vs batch lags) must agree
    val batch = SparkEntry.queries("d82_trigram_lm")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stream = SparkEntry.queries("s28_stream_lm_gate")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream === batch)
  }

  test("d84: the dataset card matches a plain-Scala census") {
    val got = SparkEntry.queries("d84_corpus_report")(spark, Sf0001)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val raw = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"source", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ").trim
    val fpAll = raw.groupBy(r => norm(r._4)).view.mapValues(_.size).toMap
    val stop = Set("the", "a")
    val scored = raw.filter(r => norm(r._4).nonEmpty).map { case (_, src, _, t) =>
      val nm = norm(t)
      val toks = nm.split(" ").toVector
      val punct = nm.count(c => !(c.isDigit || c == ' ' || (c >= 'a' && c <= 'z')))
      val q = 30L * math.min(toks.size, 100) +
        (nm.length - punct) * 3000L / nm.length +
        toks.count(stop) * 4000L / toks.size
      (src, toks.size.toLong, q)
    }
    raw.groupBy(_._2).foreach { case (src, rs) =>
      val qs = scored.filter(_._1 == src)
      val hist = qs.map(_._3).sorted
      def pick(k: Int, of: Int): Long = {
        val n = hist.size
        hist.zipWithIndex.collectFirst {
          case (v, i) if (i + 1).toLong * of >= k.toLong * n => v
        }.get
      }
      val model = (rs.size.toLong, rs.map(_._3).distinct.size.toLong,
        rs.count(r => fpAll(norm(r._4)) > 1).toLong,
        qs.map(_._2).sum, pick(1, 4), pick(1, 2), pick(3, 4))
      assert(got(src) === model, s"source $src")
    }
  }

  test("e34: burst flags match a densified-grid Scala model") {
    val got = SparkEntry.queries("e34_burst_days")(spark, Sf0001)
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byDay = eventRows.groupBy { e =>
      (e._4, java.time.Instant.ofEpochSecond(Math.floorDiv(e._2, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    }.view.mapValues(_.size.toLong).toMap
    val days = byDay.keys.map(_._2).toSeq
    val (mn, mx) = (days.min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      days.max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val span = (mn.toEpochDay to mx.toEpochDay).map(java.time.LocalDate.ofEpochDay)
    val types = eventRows.map(_._4).distinct
    val model = (for {
      t <- types
      (d, i) <- span.zipWithIndex if i >= 7
      n = byDay.getOrElse((t, d), 0L)
      trail = (1 to 7).map(k => byDay.getOrElse((t, span(i - k)), 0L)).sum
    } yield ((t, d.toString), (n, trail, if (n * 7 > 2 * trail) 1L else 0L))).toMap
    assert(got === model)
  }

  test("d85: phash clusters are exactly the connected components of d80's pairs") {
    val pairs = SparkEntry.queries("d80_phash_neardup")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = docRows.map(_._1).filter(_ % 3 == 0)
    // driver-side union-find over the pair list
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = nodes.map(n => n -> find(n)).toMap
    val sizes = label.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("d85_phash_clusters")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val model = nodes.map { n =>
      n -> (label(n), sizes(label(n)), if (n == label(n)) 1L else 0L)
    }.toMap
    assert(got === model)
  }

  test("d86: the yield curve is monotone and ends at the histogram totals") {
    val rows = SparkEntry.queries("d86_quality_yield")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (2000L to 7000L by 500L))
    // admitted mass can only shrink as the cutoff rises
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4)
    }
    // model the sweep directly from the scored docs
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ").trim
    val stop = Set("the", "a")
    val scored = docRows.map(_._2).map(norm).filter(_.nonEmpty).map { nm =>
      val toks = nm.split(" ").toVector
      val punct = nm.count(c => !(c.isDigit || c == ' ' || (c >= 'a' && c <= 'z')))
      (toks.size.toLong,
        30L * math.min(toks.size, 100) + (nm.length - punct) * 3000L / nm.length +
          toks.count(stop) * 4000L / toks.size)
    }
    val totTok = scored.map(_._1).sum
    rows.foreach { case (c, nd, nt, bp) =>
      val kept = scored.filter(_._2 >= c)
      assert((nd, nt, bp) ===
        ((kept.size.toLong, kept.map(_._1).sum, kept.map(_._1).sum * 10000 / totTok)),
        s"cutoff $c")
    }
  }

  test("s29: the streamed burst report is bit-identical to batch e34") {
    val batch = SparkEntry.queries("e34_burst_days")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val stream = SparkEntry.queries("s29_stream_burst")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(stream === batch)
  }

  test("s27: the streamed skew report equals the batch computation") {
    val got = SparkEntry.queries("s27_shard_skew")(spark, Sf0001)
      .collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    val perDay = eventRows
      .map { e =>
        val day = java.time.Instant.ofEpochSecond(Math.floorDiv(e._2, 1000000L))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
        ((day, s"s${e._3 % 4}"), 1L)
      }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val totals = perDay.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val model = perDay.toSeq.map { case (k @ (day, _), cnt) =>
      (k, (cnt, cnt * 10000 / totals(day),
        if (cnt * 10000 > 5000 * totals(day)) 1L else 0L))
    }.sortBy(_._1)
    assert(got.toSeq.sortBy(_._1) === model)
  }
}
