package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** Round-6 additions: heavy hitters (d55), winsorized robust stats
  * (d56), truncated-kernel EWMA (e22), lag-1 autocorrelation flags
  * (e23). Each is re-derived driver-side in plain Scala and compared
  * exactly; the Misra-Gries sketch is additionally property-checked
  * against its theoretical guarantee on an adversarial layout.
  */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries guarantee holds across forced partial-merge trees") {
    // adversarial mix: two genuine heavy hitters buried in a long tail
    // of near-distinct tokens, shuffled and split over 8 partitions so
    // reduce AND merge both run. Guarantee (cap m): every token with
    // true count > N/(m+1) survives, and every surviving counter
    // undercounts by at most N/(m+1) and never overcounts.
    val rnd = new scala.util.Random(7)
    val items = rnd.shuffle(
      Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
        (1 to 480).map(i => s"rare_${i % 240}"))
    val n = items.size.toLong
    val cap = 7
    val sketch = items.toDF("token").repartition(8)
      .agg(HeavyHitters.sketch($"token", cap))
      .head().getMap[String, Long](0)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketch.size <= cap)
    val mustSurvive = exact.filter { case (_, c) => c * (cap + 1) > n }.keySet
    assert(mustSurvive.subsetOf(sketch.keySet),
      s"lost guaranteed heavy hitters: ${mustSurvive -- sketch.keySet}")
    sketch.foreach { case (k, est) =>
      val truth = exact(k)
      assert(est <= truth, s"$k overcounted: $est > $truth")
      assert(est * (cap + 1) >= truth * (cap + 1) - n,
        s"$k undercounted past the bound: est $est, truth $truth, N $n")
    }
  }

  test("Misra-Gries invariants hold on random streams under random merge trees (property)") {
    // pure-Scala property check of the add/merge algebra itself (no
    // Spark): for random token streams split into random segments and
    // merged in a random binary-tree order, the final summary must (a)
    // never overcount, (b) undercount by at most N/(cap+1), (c) retain
    // every item with true count > N/(cap+1), (d) hold ≤ cap counters.
    import graft.operators.HeavyHitters
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val agg = new HeavyHitters.MisraGries(5)
    val genStream: Gen[List[Int]] =
      Gen.listOf(Gen.frequency(4 -> Gen.choose(0, 2), 2 -> Gen.choose(3, 8),
        1 -> Gen.choose(9, 60)))
    val gen = Gen.zip(genStream, Gen.choose(1, 6), Gen.long)
    var seed = Seed(7L)
    val params = Gen.Parameters.default.withSize(120)
    (0 until 80).foreach { _ =>
      gen.apply(params, seed).foreach { case (xs, nSeg, shuf) =>
        val toks = xs.map(i => s"t$i")
        val n = toks.size.toLong
        val segs = if (toks.isEmpty) Seq(Nil)
          else toks.grouped(math.max(1, toks.size / nSeg)).toSeq
        val partials = segs.map(_.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)))
        // balanced BINARY tree over a rotated operand order: both merge
        // arguments can themselves be merged (already-subtracted)
        // summaries — the case a left-deep reduce never produces
        def treeMerge(ps: Seq[Map[String, Long]]): Map[String, Long] = ps match {
          case Seq(one) => one
          case _ =>
            val (a, b) = ps.splitAt(ps.size / 2)
            agg.merge(treeMerge(a), treeMerge(b))
        }
        val rot = (math.abs(shuf) % math.max(1, partials.size)).toInt
        val merged = treeMerge(partials.drop(rot) ++ partials.take(rot))
        val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        assert(merged.size <= 5)
        merged.foreach { case (k, est) =>
          assert(est <= exact(k), s"overcount of $k")
          assert((exact(k) - est) * 6 <= n, s"undercount of $k past N/6")
        }
        exact.foreach { case (k, c) =>
          if (c * 6 > n) assert(merged.contains(k), s"lost guaranteed $k")
        }
      }
      seed = seed.next
    }
  }

  test("d55 sketch-then-verify equals the exact frequency filter (sf0.001)") {
    val out = SparkEntry.queries("d55_heavy_hitters")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables.load(spark, Sf0001, "documents")
      .select($"text").as[String].collect()
      .flatMap(_.toLowerCase.replaceAll("\\s+", " ").trim.split(" "))
      .filter(_.nonEmpty)
    val n = toks.length.toLong
    val expected = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 32 > n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(out.nonEmpty, "corpus should contain heavy hitters at 1/32")
    assert(out === expected)
  }

  test("s21 streamed sketch + batch recount equals the per-source exact filter (sf0.001)") {
    // the GroupState sketch folds across 4 micro-batches; its final
    // candidates must form a superset per the MG bound, so after the
    // exact recount the output equals the plain per-source HAVING
    val out = SparkEntry.queries("s21_stream_heavy_hitters")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val bySource = Tables.load(spark, Sf0001, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.flatMap(
        _._2.toLowerCase.replaceAll("\\s+", " ").trim.split(" "))
        .filter(_.nonEmpty)).toMap
    val expected = bySource.toSeq.flatMap { case (src, toks) =>
      val n = toks.length.toLong
      toks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 32 > n }
        .map { case (t, c) => (src, t, c) }
    }.sortBy { case (s2, t, c) => (s2, -c, t) }
    assert(out.nonEmpty)
    assert(out === expected)
  }

  test("d56 winsorized stats equal a driver-side order-statistic re-derivation (sf0.001)") {
    val out = SparkEntry.queries("d56_winsorized_stats")(spark, Sf0001)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val bySource = Tables.load(spark, Sf0001, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(out.keySet === bySource.keySet)
    bySource.foreach { case (src, vs) =>
      val nn = vs.size
      // ceil(p·n)-th order statistic, 1-indexed
      def orderStat(num: Int, den: Int): Long =
        vs((nn * num + den - 1) / den - 1)
      val p05 = orderStat(1, 20)
      val p95 = orderStat(19, 20)
      val winMean = vs.map(v => BigDecimal(v.max(p05).min(p95)))
        .sum.toDouble / nn
      assert(out(src) === ((nn.toLong, p05, p95, winMean)), s"source $src")
    }
  }

  test("d57 equi-depth bins equal a sorted-order-statistic re-derivation (sf0.001)") {
    val out = SparkEntry.queries("d57_equidepth_shards")(spark, Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val lens = Tables.load(spark, Sf0001, "documents")
      .select($"text").as[String].collect()
      .map(_.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").length.toLong)
    val sorted = lens.sorted.toVector
    val n = sorted.size
    val cuts = (1 to 7).map(j => sorted((n * j + 7) / 8 - 1))
    val expected = lens.groupBy(v => cuts.count(_ < v).toLong).view.mapValues(vs =>
      (vs.length.toLong, vs.sum, vs.min, vs.max)).toMap
    assert(out === expected)
    // balance sanity: total docs conserved
    assert(out.values.map(_._1).sum === n.toLong)
  }

  test("d58 total-variation divergence equals an exact rational re-derivation (sf0.001)") {
    val out = SparkEntry.queries("d58_source_divergence")(spark, Sf0001)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val toks = Tables.load(spark, Sf0001, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .flatMap { case (src, t) =>
        t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
          .filter(_.nonEmpty).map(src -> _) }
    val corpus = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nc = BigInt(toks.length)
    toks.groupBy(_._1).foreach { case (src, ts) =>
      val cnt = ts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ns = BigInt(ts.length)
      // TV·2·ns·nc over the full union vocab (the closed form the
      // operator uses for source-absent tokens must agree with the
      // grid sum computed here); iterator, NOT .keys.map — keys is a
      // Set and mapping it would collapse equal |term| values
      val num = corpus.iterator.map { case (t, c) =>
        (BigInt(cnt.getOrElse(t, 0L)) * nc - BigInt(c) * ns).abs
      }.sum
      val tvBp = (num * 10000 / (2 * ns * nc)).toLong
      assert(out(src) === ((ts.length.toLong, tvBp)), s"source $src")
    }
    assert(out.keySet === toks.map(_._1).toSet)
  }

  test("d61 budget selection equals a sorted greedy re-derivation (sf0.001)") {
    // the histogram cutoff + straddling-bin prefix must pick EXACTLY
    // the same docs as the textbook plan: sort by (quality desc,
    // doc_id), admit while the running token sum fits the budget
    val out = SparkEntry.queries("d61_quality_budget")(spark, Sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
      .flatMap { case (id, src, text) =>
        val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
        if (norm.isEmpty) None else {
          val toks = norm.split(" ")
          val punct = norm.count(c => !(c.isDigit || c == ' ' || (c >= 'a' && c <= 'z')))
          val stop = toks.count(t => t == "the" || t == "a")
          val qBp = 30L * math.min(toks.length, 100) +
            (norm.length - punct).toLong * 3000 / norm.length +
            stop.toLong * 4000 / toks.length
          Some((id, src, toks.length.toLong, qBp))
        }
      }
    val budget = docs.map(_._3).sum * 2 / 5
    var run = 0L
    val admitted = docs.sortBy { case (id, _, _, q) => (-q, id) }
      .takeWhile { case (_, _, n, _) => run += n; run <= budget }
    val expected = admitted.groupBy(_._2).view.mapValues(ds =>
      (ds.length.toLong, ds.map(_._3).sum, ds.map(_._1).sum)).toMap
    assert(admitted.nonEmpty && admitted.length < docs.length)
    assert(out === expected)
  }

  test("d62 Bloom gate: superset of the exact d20 contamination set, bounded FPs (sf0.001)") {
    // no-false-negative guarantee: every doc d20 finds contaminated
    // must carry Bloom hits; the FP overhead (docs flagged only by the
    // filter) must stay within a loose multiple of the 1% gram-level
    // target (a doc-level flag fires if ANY of its grams collides)
    val bloom = SparkEntry.queries("d62_bloom_decontaminate")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = SparkEntry.queries("d20_decontaminate")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(bloom.keySet),
      s"Bloom lost contaminated docs: ${exact -- bloom.keySet}")
    val corpusDocs = Tables.load(spark, Sf0001, "documents")
      .filter($"doc_id" >= 25).count()
    val fps = bloom.keySet -- exact
    // each doc probes ~n_grams times at fpp=0.01 → doc-level FP rate
    // ≲ n_grams/100; with ~40-gram docs allow up to half the corpus
    // flagged before calling the filter broken
    assert(fps.size * 2 <= corpusDocs,
      s"false-positive flags exceed half the corpus: ${fps.size} of $corpusDocs")
    bloom.foreach { case (id, (n, h)) =>
      assert(h >= 1 && h <= n, s"doc $id: hits $h outside [1, $n]")
    }
  }

  test("e22 EWMA equals a per-user kernel fold (sf0.001)") {
    val out = SparkEntry.queries("e22_ewma_smooth")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_id", unix_micros($"ts"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(e => (e._2, e._4))
      sorted.indices.map { i =>
        val acc = (0 to 7.min(i)).map(j => sorted(i - j)._2 * (128L >> j)).sum
        (u, sorted(i)._1) -> acc
      }
    }
    assert(out.size === ev.length)
    assert(out === expected)
  }

  test("e23 autocorrelation flags equal an exact BigInt re-derivation (sf0.001)") {
    val out = SparkEntry.queries("e23_autocorr_flag")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    val daily = Tables.events(spark, Sf0001)
      .select($"user_id", date_trunc("day", $"ts").cast("date").cast("string"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1).map(_._2).toVector).toMap
    var flaggedStrong = 0
    daily.foreach { case (u, sd) =>
      val n = BigInt(sd.size)
      val s = sd.map(BigInt(_)).sum
      val cent = sd.map(v => n * v - s)
      val den = cent.map(c => c * c).sum
      if (den > 0) {
        val num = cent.zip(cent.tail).map { case (a, b) => a * b }.sum
        assert(out(u) === ((sd.size.toLong, num > 0, num.abs * 4 > den)), s"user $u")
        if (num.abs * 4 > den) flaggedStrong += 1
      } else assert(!out.contains(u), s"user $u with zero variance must be excluded")
    }
    assert(out.size === daily.count { case (_, sd) =>
      val n = BigInt(sd.size); val s = sd.map(BigInt(_)).sum
      sd.map(v => { val c = n * v - s; c * c }).sum > 0
    })
  }
}
