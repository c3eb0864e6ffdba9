package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** Sixth-wave operators: semantic dedup (d38), TF-IDF keywords (d39),
  * source-overlap matrix (d40), exact-algebra outliers (e17). Each test
  * recomputes the expected answer driver-side by an independent method
  * (union-find, BigInt algebra, brute-force ranking) at sf0.001.
  */
class Wave6Spec extends SparkSpec {
  import spark.implicits._

  test("d38 semdedup: labels equal an independent union-find over cosine edges") {
    val nv = Tables.load(spark, Sf0001, "embeddings")
      .select($"vec_id", $"embedding",
        graft.functions.Vectors.norm($"embedding").as("nrm"))
    val a = nv.select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"))
    val b = nv.select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb"))
    val edges = a.join(b, $"a_id" < $"b_id")
      .filter(graft.functions.Vectors
        .cosineWithNorms($"ea", $"eb", $"na", $"nb") >= 0.4)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = nv.select($"vec_id").collect().map(_.getLong(0))
    // driver-side union-find (path-halving), the independent oracle
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val expected = ids.map(i => i -> ids.filter(j => find(j) == find(i)).min).toMap
    val got = SparkEntry.queries("d38_semdedup")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(edges.nonEmpty, "testdata should contain semantic near-dups")
  }

  test("d38 semdedup: exactly one kept representative per cluster, the minimum") {
    val rows = SparkEntry.queries("d38_semdedup")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._3 == 1L) == 1, s"cluster $cid kept != 1")
      assert(members.filter(_._3 == 1L).head._1 == cid, s"kept != min in $cid")
      assert(members.map(_._1).min == cid, s"label != component min in $cid")
    }
  }

  test("e17 outliers: flag matches BigInt recomputation of (n·v−S)² > 9(nQ−S²)") {
    val evs = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_id",
        ($"value".cast("decimal(18,6)") * 1000000).cast("long").as("vi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), BigInt(r.getLong(2))))
    val byUser = evs.groupBy(_._1)
    val expected = byUser.iterator.flatMap { case (_, es) =>
      val n = BigInt(es.length)
      val s = es.map(_._3).sum
      val q = es.map(e => e._3 * e._3).sum
      es.iterator.filter { case (_, _, vi) =>
        val d = n * vi - s
        d * d > 9 * (n * q - s * s)
      }.map(_._2)
    }.toSet
    val got = SparkEntry.queries("e17_outlier_events")(spark, Sf0001)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 should contain 3-sigma outliers")
  }

  test("d39 tf-idf: rank-1 term maximizes tf/df within each document") {
    val tf = Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scores = tf.join(df, "term")
      .select($"doc_id", $"term", ($"tf".cast("double") / $"df".cast("double")).as("sc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = SparkEntry.queries("d39_tfidf_terms")(spark, Sf0001)
      .filter($"rk" === 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (doc, term) =>
      val best = scores(doc).map(_._3).max
      val gotScore = scores(doc).find(_._2 == term).get._3
      assert(gotScore == best, s"doc $doc: rk1 term $term is not max-score")
    }
    assert(got.size == scores.size, "one rk-1 term per document")
  }

  test("q34 triangles: degree-ordered enumeration equals brute-force per-node counts") {
    val li = Tables.load(spark, Sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    val a = li.select($"l_orderkey", $"l_partkey".as("a"))
    val b = li.select($"l_orderkey", $"l_partkey".as("b"))
    val edges = a.join(b, Seq("l_orderkey")).filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n")).filter($"n" >= 2)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: for every edge (a,b), nodes adjacent to both
    val adj = edges.toSeq.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((x, y) <- edges; z <- adj(x) intersect adj(y); if x < y && y < z) {
      triCount(x) += 1; triCount(y) += 1; triCount(z) += 1
    }
    val expected = triCount.toSeq.sortBy { case (k, n) => (-n, k) }.take(15)
    val got = SparkEntry.queries("q34_triangles")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "sf0.001 co-purchase graph should contain triangles")
  }

  test("d40 source overlap: exact side equals per-fingerprint source-set expansion") {
    val fps = Tables.load(spark, Sf0001, "documents")
      .select(Text.fingerprint($"text").as("f"), $"source").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = fps.groupBy(_._1).values.flatMap { g =>
      val srcs = g.map(_._2).distinct.sorted
      for (i <- srcs.indices; j <- i + 1 until srcs.length) yield (srcs(i), srcs(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("d40_source_overlap")(spark, Sf0001)
      .filter($"n_shared_fp" > 0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(got == expected)
  }
}
