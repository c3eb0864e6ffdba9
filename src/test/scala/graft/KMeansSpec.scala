package graft

import org.apache.spark.sql.functions._

/** d46 (KMeans.fit): the integer-lattice Lloyd iteration against a
  * plain-Scala re-derivation — a third implementation independent of
  * BOTH the Spark centroid-literal fold and the DuckDB unrolled-CTE
  * oracle, so a shared misunderstanding (seeding, tie-breaks, the
  * round-half-up lattice re-rounding, empty-cluster carry-over) cannot
  * pass silently. Also pins the clustering is non-trivial and that the
  * lattice quantization stays within half a cell of the float means.
  */
class KMeansSpec extends SparkSpec {

  private val Scale = 1L << 20
  private val (k, iters) = (8, 3)

  private def quantized(): Seq[(Long, Array[Long])] =
    Tables.load(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor((x.toDouble + 1.0) * Scale.toDouble).toLong).toArray)
      .sortBy(_._1).toSeq

  /** Reference fit: the same algorithm as a driver-side loop. */
  private def referenceFit(): Map[Long, (Long, Long)] = {
    val qv = quantized()
    var cents: Array[Array[Long]] = qv.take(k).map(_._2.clone()).toArray
    def assign(q: Array[Long]): (Int, Long) = {
      var (bestK, bestD) = (-1, Long.MaxValue)
      cents.indices.foreach { c =>
        var d = 0L
        var i = 0
        while (i < q.length) { val t = q(i) - cents(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestK = c; bestD = d }
      }
      (bestK, bestD)
    }
    (1 to iters).foreach { _ =>
      val members = qv.groupBy { case (_, q) => assign(q)._1 }
      cents = cents.indices.map { c =>
        members.get(c) match {
          case None => cents(c) // emptied cluster keeps its centroid
          case Some(ms) =>
            val n = ms.size.toLong
            val dim = ms.head._2.length
            Array.tabulate(dim) { i =>
              val s = ms.map(_._2(i)).sum
              (2 * s + n) / (2 * n) // round-half-up, all coords >= 0
            }
        }
      }.toArray
    }
    qv.map { case (id, q) => val (c, d) = assign(q); id -> (c.toLong, d) }.toMap
  }

  test("d46: operator assignment equals the driver-side reference fit (sf0.001)") {
    val got = SparkEntry.queries("d46_kmeans_embed")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = referenceFit()
    assert(got === want, "assignment or dist2 diverges from the reference loop")
    // non-trivial clustering: more than half the clusters in use, and no
    // cluster holds everything
    val sizes = got.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.size > k / 2, s"only ${sizes.size} of $k clusters used")
    assert(sizes.values.max < got.size, "degenerate: one cluster holds all vectors")
  }

  test("d46: lattice centroids stay within half a cell of the float means per round") {
    // One round from the seeds: the float-mean centroid and the lattice
    // centroid must agree to 0.5 lattice cells per coordinate — i.e.
    // quantized Lloyd IS Lloyd up to sub-noise perturbation.
    val qv = quantized()
    val seeds = qv.take(k).map(_._2).toArray
    def nearest(q: Array[Long]): Int =
      seeds.indices.minBy { c =>
        var d = 0L; var i = 0
        while (i < q.length) { val t = q(i) - seeds(c)(i); d += t * t; i += 1 }
        (d, c.toLong)
      }
    val members = qv.groupBy { case (_, q) => nearest(q) }
    members.foreach { case (_, ms) =>
      val n = ms.size.toLong
      ms.head._2.indices.foreach { i =>
        val s = ms.map(_._2(i)).sum
        val lattice = (2 * s + n) / (2 * n)
        val floatMean = s.toDouble / n
        assert(math.abs(lattice - floatMean) <= 0.5 + 1e-9)
      }
    }
  }
}
