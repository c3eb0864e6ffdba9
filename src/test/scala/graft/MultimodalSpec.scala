package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import java.nio.charset.StandardCharsets

/** Multimodal plumbing (d12): schema, batching, and feature math of the
  * per-partition extraction operator. */
class MultimodalSpec extends SparkSpec {

  test("feature extraction: exact values on a known payload") {
    import spark.implicits._
    val payload = "aabb".getBytes(StandardCharsets.UTF_8)
    val ds = Seq(MediaRecord(1L, "image", 64, 64, payload)).toDS()
    val f = Multimodal.extractFeatures(ds).collect()(0)
    assert(f.n_bytes === 4L)
    assert(f.mean_byte === ('a'.toInt + 'b'.toInt) / 2.0)
    assert(f.byte_entropy === 1.0) // two symbols, equal frequency
  }

  test("batching: partitions larger than one batch extract every record exactly once") {
    import spark.implicits._
    val n = Multimodal.DecodeBatchSize * 3 + 7 // forces ragged final batch
    val ds = (1 to n).map(i =>
      MediaRecord(i.toLong, "audio", 1, 1, Array.fill(i % 17)(i.toByte)))
      .toDS().repartition(2)
    val out = Multimodal.extractFeatures(ds).collect()
    assert(out.length === n)
    assert(out.map(_.doc_id).toSet === (1 to n).map(_.toLong).toSet)
    // empty payloads are legal and don't produce NaNs
    out.filter(_.n_bytes == 0).foreach { f =>
      assert(f.mean_byte === 0.0 && f.byte_entropy === 0.0)
    }
  }

  test("d12 end-to-end: one feature row per document, stable media typing") {
    import spark.implicits._
    val df = SparkEntry.queries("d12_multimodal_meta")(spark, Sf0001)
    val rows = df.collect()
    val docs = Tables.load(spark, Sf0001, "documents").count()
    assert(rows.length.toLong === docs)
    assert(rows.map(_.getString(1)).toSet === Set("image", "audio", "video"))
    // deterministic: doc_id mod 3 decides the modality
    rows.foreach { r =>
      val expect = Seq("image", "audio", "video")((r.getLong(0) % 3).toInt)
      assert(r.getString(1) === expect)
    }
  }

  test("d59 frame sampling equals a driver-side stride re-derivation (sf0.001)") {
    import spark.implicits._
    val out = SparkEntry.queries("d59_frame_sample")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val media = graft.operators.Multimodal
      .mediaFromDocuments(spark, Tables.load(spark, Sf0001, "documents"))
      .collect().filter(_.media_type == "video")
    assert(media.nonEmpty)
    val expected = media.flatMap { r =>
      val frameSize = math.max(1, r.width * r.height / 64)
      val n = math.max(1L, r.payload.length.toLong / frameSize)
      (0 until 4).map { i =>
        val idx = i.toLong * n / 4
        val lo = (idx * frameSize).toInt.min(r.payload.length)
        val hi = ((idx + 1) * frameSize).toInt.min(r.payload.length)
        val cs = (lo until hi).foldLeft(0L)((a, p) => a * 131 + (r.payload(p) & 0xff))
        (r.doc_id, idx) -> ((n, (hi - lo).toLong, cs))
      }.distinctBy(_._1)
    }.toMap
    assert(out === expected)
    // every video contributes, fanout bounded by k
    assert(out.keys.map(_._1).toSet === media.map(_.doc_id).toSet)
    out.keys.groupBy(_._1).foreach { case (_, ks) => assert(ks.size <= 4) }
  }

  test("d60 thumbnail grids equal a driver-side average-pool re-derivation (sf0.001)") {
    import spark.implicits._
    // long-form output (doc_id, width, height, cell, value): regroup to
    // one 64-vector per doc for the re-derivation compare
    val out = SparkEntry.queries("d60_thumbnail_grid")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (id, cs) => id -> cs.sortBy(_._2).map(_._3).toSeq }
    val media = graft.operators.Multimodal
      .mediaFromDocuments(spark, Tables.load(spark, Sf0001, "documents"))
      .collect().filter(_.media_type == "image")
    assert(media.nonEmpty)
    media.foreach { r =>
      val (w, h) = (math.max(1, r.width), math.max(1, r.height))
      def px(row: Int, col: Int): Long = {
        val p = row * w + col
        if (p < r.payload.length) (r.payload(p) & 0xff).toLong else 0L
      }
      val expect = for (i <- 0 until 8; j <- 0 until 8) yield {
        val (r0, r1) = (i * h / 8, math.max(i * h / 8 + 1, (i + 1) * h / 8))
        val (c0, c1) = (j * w / 8, math.max(j * w / 8 + 1, (j + 1) * w / 8))
        val cells = for (rr <- r0 until r1; cc <- c0 until c1) yield px(rr, cc)
        cells.sum / cells.size
      }
      assert(out(r.doc_id) === expect, s"doc ${r.doc_id}")
      assert(out(r.doc_id).length === 64)
      assert(out(r.doc_id).forall(v => v >= 0 && v <= 255))
    }
    assert(out.keySet === media.map(_.doc_id).toSet)
  }

  test("aHash 64-bit pack: band byte views and packed-XOR hamming match the per-band form") {
    // the phash pipeline verifies candidates with bit_count(h64_a ^
    // h64_b) over ONE packed fingerprint; this property pins that the
    // SQL pack (bit i at position i, bands as shifted byte views) is
    // bitwise-identical to the per-band construction and that packed
    // hamming equals the per-band bit_count sum — including bit 63,
    // where shiftleft(1L, 63) is Long.MinValue and the pack relies on
    // carry-free addition of distinct powers of two
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9)
    val grids = (0 until 64).map { i =>
      // mix dark/bright rows so high bits (incl. 63) are exercised
      (i.toLong, Seq.tabulate(64)(c => if (rnd.nextBoolean()) 255L else rnd.nextInt(4).toLong))
    }
    val df = grids.toDF("doc_id", "grid")
      .withColumn("tot", aggregate($"grid", lit(0L), _ + _))
      .withColumn("h64", expr(
        """aggregate(zip_with(grid, sequence(0L, 63L),
          |  (v, i) -> IF(64 * v > tot, shiftleft(1L, CAST(i AS INT)), 0L)),
          |  0L, (acc, x) -> acc + x)""".stripMargin))
    val rows = df.select($"doc_id", $"grid", $"tot", $"h64").collect()
    val h = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { r =>
      val grid = r.getSeq[Long](1)
      val tot = r.getLong(2)
      // reference: the per-cell bit construction the r8 shape used
      val bits = grid.zipWithIndex.map { case (v, i) => if (64 * v > tot) 1L << i else 0L }
      assert(r.getLong(3) === bits.sum, s"pack mismatch doc ${r.getLong(0)}")
      // band byte views recover the same 8 bytes the per-band agg built
      val bandsFromH64 = (0 until 8).map(b => (r.getLong(3) >> (b * 8)) & 255L)
      val bandsPerCell = (0 until 8).map(b =>
        (0 until 8).map(k => (bits(b * 8 + k) != 0L, k)).collect { case (true, k) => 1L << k }.sum)
      assert(bandsFromH64 === bandsPerCell, s"band view mismatch doc ${r.getLong(0)}")
    }
    // packed hamming == per-band bit_count sum, for every pair
    for (a <- h.keys; b <- h.keys if a < b) {
      val packed = java.lang.Long.bitCount(h(a) ^ h(b))
      val perBand = (0 until 8).map { band =>
        java.lang.Long.bitCount(((h(a) >> (band * 8)) & 255L) ^ ((h(b) >> (band * 8)) & 255L))
      }.sum
      assert(packed === perBand, s"hamming mismatch ($a, $b)")
    }
  }
}
