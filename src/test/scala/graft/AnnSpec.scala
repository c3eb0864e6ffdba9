package graft

import org.apache.spark.sql.functions._

/** IVF ANN (d11) vs the exact brute-force baseline (d10) at sf0.001:
  * recall@5 and exactness of what IVF does return. */
class AnnSpec extends SparkSpec {

  private def topk(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, Sf0001)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq)
      .toMap

  test("d11 IVF recall@5 vs exact top-k is >= 0.6, with exact cosines") {
    val exact = topk("d10_ann_topk")
    val ivf = topk("d11_ann_ivf")
    assert(ivf.keySet === exact.keySet, "every query must return neighbors")
    val recalls = exact.map { case (q, ex) =>
      val got = ivf(q).toSet
      ex.count(got) / ex.size.toDouble
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 $mean below 0.6 (nprobe=4/16)")

    // cosines reported by IVF must equal the exact ones (IVF prunes the
    // candidate set; it must not perturb the metric)
    val exactCos = SparkEntry.queries("d10_ann_topk")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    SparkEntry.queries("d11_ann_ivf")(spark, Sf0001)
      .collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        exactCos.get(key).foreach { c =>
          assert(r.getDouble(2) === c, s"cosine mismatch for $key")
        }
      }
  }

  test("d11 IVF centroid assignment is exchange-free (map-side argmax)") {
    import spark.implicits._
    import graft.operators.AnnIvf
    val nv = Tables.load(spark, Sf0001, "embeddings")
    val cents = AnnIvf.centroids(spark, nv, 16)
    val assigned = AnnIvf.assign(spark, nv, cents)
    val physical = assigned.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"assignment stage must be a pure projection, got:\n$physical")
    // and it must still be a total assignment: every vector, one cluster
    val n = nv.count()
    assert(assigned.count() === n)
    assert(assigned.filter($"cluster_id" < 0).count() === 0L)
  }

  test("d11 results are valid neighbors: k per query, no self, ranks contiguous") {
    val rows = SparkEntry.queries("d11_ann_ivf")(spark, Sf0001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q returned ${rs.length} neighbors")
      assert(rs.forall(_.getLong(1) != q), s"query $q returned itself")
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to 5L), s"ranks not contiguous for $q")
      // ranks ordered by descending cosine
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(byRank === byRank.sorted.reverse, s"rank order violates cosine order for $q")
    }
  }

  test("recall-vs-probe curve: IVF recall rises monotonically with nprobe (artifact)") {
    import graft.operators.AnnIvf
    // The tuning story a real user needs: each nprobe step scans
    // nprobe/16 of the corpus, so this curve IS the recall-vs-cost
    // tradeoff. Asserted monotone (more probes can only add candidates,
    // and candidate cosines are exact, so recall cannot drop); the
    // measured points are published to ANN_CURVE.md.
    val exact = topk("d10_ann_topk")
    val nv = Tables.load(spark, Sf0001, "embeddings")
    import spark.implicits._
    val queries = nv.filter($"vec_id" < 10)
    val points = Seq(1, 2, 4, 8).map { nprobe =>
      val got = AnnIvf.search(spark, nv, queries,
          numClusters = 16, nprobe = nprobe, k = 5)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recalls = exact.map { case (q, ex) =>
        ex.count(got.getOrElse(q, Set.empty)) / ex.size.toDouble
      }
      nprobe -> recalls.sum / recalls.size
    }
    points.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall dropped from $r1 (nprobe=$p1) to $r2 (nprobe=$p2)")
    }
    assert(points.last._2 >= 0.9,
      s"nprobe=8/16 (half the corpus) should be near-exact, got ${points.last._2}")
    val md = new StringBuilder(
      "# ANN recall-vs-probe curve (IVF, C=16, k=5, sf0.001)\n\n" +
        "Measured by AnnSpec against the exact brute-force top-k (d10).\n" +
        "Cost column = fraction of the corpus scanned per query.\n\n" +
        "| nprobe | corpus scanned | mean recall@5 |\n| --- | --- | --- |\n")
    points.foreach { case (p, r) =>
      md.append(f"| $p | ${p / 16.0 * 100}%.0f%% | $r%.2f |\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("ANN_CURVE.md"), md.toString)
  }

  test("d44 semantic-dedup ANN path: edge recall and component agreement vs exact (sf0.01)") {
    import graft.operators.SemDedup
    import spark.implicits._
    // the scale path's QUALITY contract: the bucket-bounded generator
    // must recover nearly all of the exact cosine graph and label
    // nearly every vector identically. (EXACTNESS of the pipeline
    // itself — lattice buckets, cosine verify, componentization — is
    // now pinned by d44's own DuckDB oracle, which replays the ANN
    // path; this spec measures its distance from the d38 baseline.
    // Under the lattice probe metric the sf0.01 corpus misses exactly
    // one exact edge at nprobe=4 — 499/500 labels agree — where the
    // former float-cosine probe happened to catch it: the documented
    // probabilistic miss, traded for an oracle-checkable build.)
    val nv = Tables.load(spark, Sf001, "embeddings")
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edgeSet(SemDedup.exactEdges(spark, nv, 0.4))
    // the default adaptive C — the spec must test what d44 ships
    val ann = edgeSet(SemDedup.annEdges(spark, nv, 0.4, nprobe = 4))
    assert(exact.nonEmpty, "sf0.01 corpus should contain cosine>=0.4 edges")
    assert(ann.subsetOf(exact),
      "every ANN edge is exact-verified — false positives are impossible by construction")
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.8, f"ANN edge recall $recall%.3f below 0.8 (nprobe=4, adaptive C)")

    def comps(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      SemDedup.components(spark, nv, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactComps = comps(SemDedup.exactEdges(spark, nv, 0.4))
    val annComps = comps(SemDedup.annEdges(spark, nv, 0.4, nprobe = 4))
    val agree = exactComps.count { case (v, c) => annComps.get(v).contains(c) }
    val agreement = agree.toDouble / exactComps.size
    assert(agreement >= 0.99,
      f"component label agreement $agreement%.4f below 0.99 " +
        s"($agree of ${exactComps.size} vectors)")
  }

  test("d16 LSH: locality property on constructed vectors") {
    import spark.implicits._
    import graft.operators.AnnLsh
    val base = Array.tabulate(AnnLsh.Dim)(i => math.sin(i + 1).toFloat)
    val nearDup = base.clone(); nearDup(0) += 1e-4f
    val opposite = base.map(-_)
    val df = Seq((1L, base), (2L, nearDup), (3L, opposite))
      .toDF("vec_id", "embedding")
      .select($"vec_id", AnnLsh.bucketCode($"embedding").as("code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df(1) === df(2), "near-identical vectors must share a bucket")
    assert(df(1) === ((~df(3)) & ((1L << AnnLsh.NumBits) - 1)),
      "an opposite vector flips every sign bit")
  }

  test("d16 LSH: valid neighbors, exact cosines, recall reported vs exact") {
    val exact = topk("d10_ann_topk")
    val rows = SparkEntry.queries("d16_ann_lsh")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.forall(_.getLong(1) != q))
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to rs.length.toLong))
    }
    val lsh = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.collect { case (q, ex) if lsh.contains(q) =>
      ex.count(lsh(q)) / ex.size.toDouble
    }
    val mean = if (recalls.isEmpty) 0.0 else recalls.sum / recalls.size
    // data-independent 8-bit codes at moderate cosines: recall is the
    // documented tradeoff vs IVF — require a non-trivial floor
    assert(mean >= 0.2, s"LSH mean recall@5 $mean below floor")
  }
}
