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
}
