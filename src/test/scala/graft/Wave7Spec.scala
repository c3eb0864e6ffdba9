package graft

import org.apache.spark.sql.functions._

/** Seventh-wave operators: exact-substring removal (d50). Expected
  * answers recomputed driver-side by an independent method (brute-force
  * window maps over the raw strings) at sf0.001.
  */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  test("d51 pq ann: ADC+R recall@5 vs exact lattice-L2, deterministic codebooks") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val pq = SparkEntry.queries("d51_ann_pq")(spark, Sf0001)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

    // exact lattice-L2 top-5, driver-side
    val vecs = e.select($"vec_id",
        graft.operators.KMeans.quantize($"embedding").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val exact = vecs.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (nid, nv) =>
          (qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum, nid)
        }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap

    assert(pq.keySet === exact.keySet)
    val recall = exact.map { case (q, ex) =>
      (pq(q) intersect ex).size.toDouble / ex.size
    }.sum / exact.size
    info(f"pq adc+r recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"pq recall@5 $recall%.3f below bar")

    // bit-determinism: two independent trainings yield identical codebooks
    val cb1 = graft.operators.PqAnn.train(spark, e, m = 16, k = 16, iters = 3)
    val cb2 = graft.operators.PqAnn.train(spark, e, m = 16, k = 16, iters = 3)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("d50 substr removal: matches a brute-force window-coverage recompute") {
    val out = SparkEntry.queries("d50_substr_remove")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

    val docs = Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .replaceAll("\\s+", " ").trim)
      .filter(_._2.nonEmpty)
    val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap

    // brute force: every 16-gram -> set of docs containing it
    val W = 16
    val owners = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    toks.foreach { case (id, ts) =>
      ts.sliding(W).filter(_.size == W)
        .foreach(w => owners.getOrElseUpdate(w.mkString(" "),
          scala.collection.mutable.Set.empty) += id)
    }
    var removedTotal = 0L
    toks.foreach { case (id, ts) =>
      val covered = Array.fill(ts.size)(false)
      ts.sliding(W).zipWithIndex.filter(_._1.size == W).foreach { case (w, i) =>
        if (owners(w.mkString(" ")).size >= 2)
          (i until i + W).foreach(covered(_) = true)
      }
      val nRemoved = covered.count(identity).toLong
      assert(out(id) === ((ts.size.toLong, nRemoved)),
        s"doc $id: expected (${ts.size}, $nRemoved), got ${out(id)}")
      removedTotal += nRemoved
    }
    assert(out.keySet === toks.keySet)
    // the corpus must actually exercise the removal path
    assert(removedTotal > 0, "sf0.001 corpus produced no shared spans")
  }
}
