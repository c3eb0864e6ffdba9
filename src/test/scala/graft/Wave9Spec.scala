package graft

import org.apache.spark.sql.functions._

/** Round-7 wave-9 additions: event-type transition matrix (e27/s24),
  * RFM segmentation (e28), DSIR importance weights (d65), CCNet rarity
  * terciles (d66), T5 span corruption (d67), cluster-balanced sampling
  * (d68). Each batch operator is re-derived driver-side in plain Scala
  * (an implementation-independent model) and compared exactly; the
  * streaming twin is pinned row-for-row against its batch matrix.
  */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toksOf(text: String): Vector[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim
      .split(" ").toVector.filter(_.nonEmpty)

  private lazy val docRows: Seq[(Long, String, Vector[String])] =
    spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), toksOf(r.getString(2)))).toSeq

  test("d65: DSIR importance weights match an independent BigInt model") {
    val got = SparkEntry.queries("d65_dsir_weights")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val buckets = docRows.flatMap { case (id, _, ts) =>
      ts.map(t => (id, md5hex(t).take(3)))
    }
    val cr = buckets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = buckets.filter(_._1 < 50).groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum; val tt = ct.values.sum
    val rppm = cr.keys.map { b =>
      val num = BigInt(ct.getOrElse(b, 0L) + 1) * BigInt(tr + 4096) * 1000000
      val den = BigInt(cr(b) + 1) * BigInt(tt + 4096)
      b -> (num / den).toLong
    }.toMap
    docRows.filter(_._3.nonEmpty).foreach { case (id, _, ts) =>
      val nTok = ts.size.toLong
      val sum = ts.map(t => rppm(md5hex(t).take(3))).sum
      val avg = sum / nTok
      assert(got(id) === ((nTok, sum, avg, if (avg >= 1000000L) 1L else 0L)),
        s"doc $id: got ${got(id)}, model (${nTok}, $sum, $avg)")
    }
    assert(got.keySet === docRows.filter(_._3.nonEmpty).map(_._1).toSet)
  }

  test("d66: tercile cuts re-derived from the output's own score bins") {
    val out = SparkEntry.queries("d66_ccnet_buckets")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // model the cut derivation: per lang, smallest bins with
    // 3·cum ≥ tot and 3·cum ≥ 2·tot over the score/1000 histogram
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val bins = rows.map(r => r._3 / 1000L)
      val hist = bins.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      val tot = bins.size
      var cum = 0
      var cut1 = Long.MaxValue; var cut2 = Long.MaxValue
      hist.foreach { case (b, n) =>
        cum += n
        if (cut1 == Long.MaxValue && 3 * cum >= tot) cut1 = b
        if (cut2 == Long.MaxValue && 3 * cum >= 2 * tot) cut2 = b
      }
      rows.foreach { case (id, _, score, bucket) =>
        val b = score / 1000L
        val expect = if (b <= cut1) "head" else if (b <= cut2) "middle" else "tail"
        assert(bucket === expect, s"doc $id lang $lang bin $b cuts ($cut1,$cut2)")
      }
      // the buckets are score-ordered and non-empty on this corpus
      val hMax = rows.filter(_._4 == "head").map(_._3 / 1000L).maxOption
      val mMin = rows.filter(_._4 == "middle").map(_._3 / 1000L).minOption
      val tMin = rows.filter(_._4 == "tail").map(_._3 / 1000L).minOption
      for (h <- hMax; m <- mMin) assert(h < m, s"$lang head/middle bins overlap")
      for (m <- rows.filter(_._4 == "middle").map(_._3 / 1000L).maxOption;
           t <- tMin) assert(m < t, s"$lang middle/tail bins overlap")
      assert(hMax.nonEmpty, s"$lang produced no head bucket")
    }
  }

  test("d67: masks, spans, and the corrupted fingerprint match the Scala model") {
    val got = SparkEntry.queries("d67_span_corruption")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    docRows.foreach { case (id, _, ts) =>
      val msk = ts.indices.map(i => md5hex(s"$id:$i").take(2) < "28")
      val nMasked = msk.count(identity).toLong
      val nSpans = ts.indices.count(i => msk(i) && (i == 0 || !msk(i - 1))).toLong
      val corrupted = ts.indices.flatMap { i =>
        if (!msk(i)) Some(ts(i))
        else if (i == 0 || !msk(i - 1)) Some("<X>")
        else None
      }.mkString(" ")
      assert(got(id) === ((ts.size.toLong, nMasked, nSpans, md5hex(corrupted))),
        s"doc $id diverged from the span-corruption model")
    }
  }

  test("d68: picks are the salted-hash minima of d46's own assignment") {
    val asg = SparkEntry.queries("d46_kmeans_embed")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = asg.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      members.map(_._1).sortBy(v => (md5hex(v.toString), v)).take(8)
        .zipWithIndex.map { case (v, i) => (v, cid, i + 1L) }
    }.toSet
    val got = SparkEntry.queries("d68_cluster_sample")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("e28: RFM quartiles match an independent rank model") {
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", unix_micros($"ts").as("us"), $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      val cents = rows.map(r => BigDecimal(r._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact).sum
      (u, rows.size.toLong, cents, rows.map(_._2).max)
    }.toSeq
    val glob = perUser.map(_._4).max
    val base = perUser.map { case (u, f, m, last) =>
      (u, (glob - last) / 86400000000L, f, m)
    }
    val n = base.size.toLong
    def quart(rank: Long): Long = (4 * (rank - 1)) / n + 1
    val rr = base.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> quart(i + 1L) }.toMap
    val fr = base.sortBy(r => (-r._3, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> quart(i + 1L) }.toMap
    val mr = base.sortBy(r => (-r._4, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> quart(i + 1L) }.toMap
    val got = SparkEntry.queries("e28_rfm_segments")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    base.foreach { case (u, rec, f, m) =>
      assert(got(u) === ((rec, f, m, rr(u), fr(u), mr(u))), s"user $u")
    }
  }

  test("s24 equals e27: the streaming transition matrix is bit-identical") {
    val batch = SparkEntry.queries("e27_transition_matrix")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("s24_stream_transitions")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
  }

  test("d69: longest contaminated run matches a Scala islands model") {
    val got = SparkEntry.queries("d69_contamination_runs")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // model on gram TEXT (the operator runs on position-ordered hashes;
    // membership agreement is the value identity being checked)
    def grams(ts: Vector[String]): Vector[String] =
      (0 to math.max(ts.size - 8, 0)).map(i => ts.slice(i, i + 8).mkString(" ")).toVector
    val evalSet = docRows.filter(_._1 < 25).flatMap(d => grams(d._3)).toSet
    docRows.filter(_._1 >= 25).foreach { case (id, _, ts) =>
      val gs = grams(ts)
      var run = 0L; var best = 0L
      gs.foreach { g =>
        if (evalSet(g)) { run += 1; best = math.max(best, run) } else run = 0
      }
      assert(got(id) === ((gs.size.toLong, best, if (best >= 6) 1L else 0L)),
        s"doc $id: got ${got(id)}, model (${gs.size}, $best)")
    }
  }

  test("d70: hard negatives are the true cross-label top-2 by cosine") {
    val vecs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toVector, r.getInt(2).toLong))
    def cos(a: Vector[Float], b: Vector[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = vecs.filter(_._1 < 20).flatMap { case (qid, qe, ql) =>
      vecs.filter(v => v._1 >= 20 && v._3 != ql)
        .map(v => (v._1, v._3, cos(qe, v._2)))
        .sortBy(v => (-v._3, v._1))
        .take(2).zipWithIndex
        .map { case ((nid, nl, _), i) => (qid, ql, nid, nl, i + 1L) }
    }.toSet
    val got = SparkEntry.queries("d70_hard_negatives")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expect)
  }

  test("e29: histogram quantiles match the rank definition on raw gaps") {
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"), $"event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(r => (r._1, r._2)).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._2, (b._3 - a._3) / 1000000L) }
    }
    val got = SparkEntry.queries("e29_gap_quantiles")(spark, Sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    gaps.groupBy(_._1).foreach { case (t, g) =>
      val vs = g.map(_._2).sorted
      val n = vs.size
      // smallest bin with k·cum ≥ m·tot == the ceil(m·n/k)-th order statistic
      def q(num: Int, den: Int): Long = vs((num * n + den - 1) / den - 1)
      assert(got(t) === ((n.toLong, q(1, 2), q(9, 10), vs.last)), s"type $t")
    }
  }

  // ---- wave 11 ----

  private def cdcBoundary(toks: Vector[String], i: Int): Boolean =
    i >= 3 && md5hex(toks.slice(i - 3, i + 1).mkString(" ")).head < '2'

  test("d71: chunks match the Scala model; boundaries are content-local (CDC property)") {
    val got = SparkEntry.queries("d71_cdc_chunks")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    def chunksOf(ts: Vector[String]): Vector[(Long, Long, Long, String)] = {
      val bnd = ts.indices.map(i => cdcBoundary(ts, i))
      val idx = ts.indices.map(i => (0 until i).count(bnd).toLong)
      idx.zip(ts.indices).groupBy(_._1).toVector.sortBy(_._1).map { case (c, ps) =>
        val positions = ps.map(_._2)
        (c, positions.min.toLong, positions.size.toLong,
          md5hex(positions.map(ts).mkString(" ")))
      }
    }
    var n = 0
    docRows.filter(_._3.nonEmpty).foreach { case (id, _, ts) =>
      chunksOf(ts).foreach { case (c, start, len, fp) =>
        assert(got((id, c)) === ((start, len, fp)), s"doc $id chunk $c")
        n += 1
      }
    }
    assert(n === got.size)
    // the CDC property: prepending a token re-derives ONLY the chunks
    // around the edit — boundaries ≥ 4 positions in shift by exactly
    // one (the same windows hash the same), unlike fixed-width d21
    docRows.filter(_._3.size >= 12).take(10).foreach { case (_, _, ts) =>
      val shifted = "zzz" +: ts
      val before = ts.indices.filter(i => cdcBoundary(ts, i)).filter(_ >= 4)
      val after = shifted.indices.filter(i => cdcBoundary(shifted, i)).filter(_ >= 5)
      assert(after.map(_ - 1) === before,
        "an edit at position 0 must not re-chunk the rest of the document")
    }
  }

  test("d72: bigram surprisal matches an independent BigInt model") {
    val got = SparkEntry.queries("d72_bigram_surprisal")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val allBigrams = docRows.flatMap(d => d._3.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
    val cbg = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw1 = allBigrams.map(_.split(" ")(0)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    docRows.filter(_._3.size >= 2).foreach { case (id, _, ts) =>
      val bgs = ts.sliding(2).map(_.mkString(" ")).toVector
      val sum = bgs.map { bg =>
        (BigInt(cw1(bg.split(" ")(0))) * 1000000 / cbg(bg))
      }.sum
      val score = (sum / bgs.size).toLong
      assert(got(id) === ((bgs.size.toLong, score, if (score > 4000000L) 1L else 0L)),
        s"doc $id")
    }
  }

  test("d73: VAD segments match the byte model and are non-degenerate") {
    val got = SparkEntry.queries("d73_audio_vad")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val texts = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._1 % 3 == 1)
    texts.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val nf = b.length / 160
      val voiced = (0 until nf).map { f =>
        val e = (f * 160 until (f + 1) * 160)
          .map { i => val d = (b(i) & 0xff) - 97; d.toLong * d }.sum
        e > 900L * 160
      }
      var run = 0L; var longest = 0L; var nSeg = 0L
      voiced.foreach { v =>
        if (v) { if (run == 0) nSeg += 1; run += 1; longest = math.max(longest, run) }
        else run = 0
      }
      assert(got(id) === ((nf.toLong, voiced.count(identity).toLong, nSeg, longest)),
        s"doc $id")
    }
    val (frames, voiced) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(voiced > 0 && voiced < frames,
      s"threshold must split the corpus ($voiced of $frames voiced)")
  }

  test("e30: cumulative LTV re-derives from the weekly revenue grid") {
    val out = SparkEntry.queries("e30_cohort_ltv")(spark, Sf0001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    out.groupBy(_._1).foreach { case (cohort, rows) =>
      val sorted = rows.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, _, rev, cumGot, nUsers, ltv) =>
        cum += rev
        assert(cumGot === cum, s"cohort $cohort cumulative drifted")
        assert(ltv === cum / nUsers, s"cohort $cohort per-user LTV")
      }
      assert(sorted.map(_._5).distinct.size === 1,
        s"cohort $cohort size must be constant across weeks")
    }
    assert(out.nonEmpty)
  }

  test("e31: stage quantiles equal the exact order statistics on raw delays") {
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(user: Long, tpe: String, after: Long): Option[Long] =
      byUser.get(user).flatMap(_.filter(e => e._2 == tpe && e._3 > after)
        .map(_._3).minOption)
    val v = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "view").map(_._3).minOption.map(u -> _) }.toMap
    val c = v.flatMap { case (u, vt) => firstAfter(u, "click", vt).map(u -> _) }
    val p = c.flatMap { case (u, ct) => firstAfter(u, "purchase", ct).map(u -> _) }
    val delays = Map(
      "view_to_click" -> c.map { case (u, ct) => (ct - v(u)) / 1000000L }.toVector.sorted,
      "click_to_purchase" -> p.map { case (u, pt) => (pt - c(u)) / 1000000L }.toVector.sorted)
    val got = SparkEntry.queries("e31_funnel_time")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    delays.foreach { case (stage, vs) =>
      // guard first: a regenerated corpus with no completions for a
      // stage should fail HERE, not as an index crash below
      assert(vs.nonEmpty, s"fixture has no $stage completions")
      assert(got.contains(stage), s"query emitted no $stage row")
      val n = vs.size
      def q(num: Int, den: Int): Long = vs((num * n + den - 1) / den - 1)
      assert(got(stage) === ((n.toLong, q(1, 2), q(9, 10))), s"stage $stage")
    }
  }

  test("e27: probabilities are exact basis points that sum to ≤10000 per row") {
    val rows = SparkEntry.queries("e27_transition_matrix")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      val tot = rs.map(_._2).sum
      rs.foreach { case (_, cnt, bps) =>
        assert(bps === cnt * 10000 / tot, s"$prev bps mismatch") }
      val s = rs.map(_._3).sum
      assert(s <= 10000 && s > 10000 - rs.size,
        s"$prev row bps sum $s out of floor-division range")
    }
  }
}
