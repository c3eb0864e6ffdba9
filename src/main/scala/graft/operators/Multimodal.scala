package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.4 d12): media payloads
  * travel as opaque `binary` columns next to typed metadata, and
  * decode/feature-extraction runs as a *batched* per-partition operator —
  * the Spark-side shape (schema, encoders, partition batching, feature
  * struct) is real and tested; only the codec call itself is a stub,
  * because no image/audio library ships in this container.
  *
  * At 100 TB: payload bytes never shuffle — extraction is map-side
  * (mapPartitions), and everything downstream of it carries only the
  * fixed-width feature struct. Partition the input by storage locality
  * (file), not by media_type, so one huge modality can't skew executors.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Fixed-width features extracted per record. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      byte_entropy: Double,
      phash: Long)

  /** Decode batch size: extraction codecs (JPEG/PNG/audio frames) amortize
    * setup per batch, so the operator works on fixed-size slices of each
    * partition's iterator rather than row-at-a-time. */
  val DecodeBatchSize = 64

  /** STUB — deterministic fake decode.
    *
    * A real deployment decodes the payload (image pixels, audio PCM,
    * video frames) with a native codec here; this container has none, so
    * features are computed directly on the raw bytes. The contract —
    * bytes in, fixed-width `MediaFeatures` out, called once per batch —
    * is exactly what a codec-backed implementation would keep.
    */
  private def decodeBatchStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = r.payload
      val n = bytes.length
      val hist = new Array[Long](256)
      var sum = 0L
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        hist(b) += 1
        sum += b
        i += 1
      }
      var entropy = 0.0
      if (n > 0) {
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) {
            val p = hist(j).toDouble / n
            entropy -= p * (math.log(p) / math.log(2.0))
          }
          j += 1
        }
      }
      // perceptual-hash stand-in: sign pattern of histogram vs uniform
      var phash = 0L
      var k = 0
      while (k < 64) {
        val bucket = hist(4 * k) + hist(4 * k + 1) + hist(4 * k + 2) + hist(4 * k + 3)
        if (bucket.toDouble > n / 64.0) phash |= (1L << k)
        k += 1
      }
      MediaFeatures(r.doc_id, r.media_type,
        n.toLong, if (n == 0) 0.0 else sum.toDouble / n, entropy, phash)
    }

  /** Batched per-partition feature extraction. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(decodeBatchStub)
    }
  }

  /** One sampled frame: the frame's byte slice reduced to fixed-width
    * features (a real deployment would decode + resize the frame here). */
  final case class FrameSample(
      doc_id: Long,
      frame_idx: Long,
      n_frames: Long,
      frame_bytes: Long,
      frame_checksum: Long)

  /** Frame sampling over video-typed payloads — the mapInPandas-shaped
    * batch operator of a real pipeline, expressed as batched
    * mapPartitions (this container ships no codec, same contract as
    * decodeBatchStub): the payload is treated as `n_frames` fixed-size
    * frames (frame size from the record's width×height, 1 byte/pixel
    * stand-in), and `k` frames are sampled at the deterministic uniform
    * stride floor(i·n/k), i = 0..k−1 — the ffmpeg `select` idiom. Only
    * the sampled frames' features leave the operator: at 100 TB the
    * payload bytes never shuffle, each record fans out to exactly k
    * fixed-width rows map-side, and skew is bounded by k, not by video
    * length. */
  def sampleFrames(records: Dataset[MediaRecord], k: Int): Dataset[FrameSample] = {
    import records.sparkSession.implicits._
    require(k >= 1)
    records.filter(_.media_type == "video").mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
        val frameSize = math.max(1, r.width * r.height / 64) // stand-in px/64
        val n = math.max(1L, r.payload.length.toLong / frameSize)
        (0 until k).map { i =>
          val idx = i.toLong * n / k
          val lo = (idx * frameSize).toInt.min(r.payload.length)
          val hi = ((idx + 1) * frameSize).toInt.min(r.payload.length)
          var cs = 0L
          var p = lo
          while (p < hi) { cs = cs * 131 + (r.payload(p) & 0xff); p += 1 }
          FrameSample(r.doc_id, idx, n, (hi - lo).toLong, cs)
        }.distinctBy(_.frame_idx) // short payloads: stride may repeat a frame
      })
    }
  }

  /** An image resized to a fixed side×side grid (flattened row-major);
    * values are average-pooled bytes, 0..255. */
  final case class Thumb(doc_id: Long, width: Int, height: Int, grid: Seq[Long])

  /** Resize over image-typed payloads — the third multimodal batch
    * shape (decode → d12, frame-sample → d59, resize → here): the
    * payload is treated as height×width single-byte pixels (row-major,
    * short payloads zero-padded — the codec stand-in, same contract as
    * decodeBatchStub) and average-pooled onto a fixed side×side grid
    * with integer-exact cell boundaries floor(i·h/side) — the
    * area-interpolation idiom. Output is 64 longs per image however
    * large the input: downstream of this operator nothing scales with
    * source resolution, and the pooling is a map-side batched pass —
    * payload bytes never shuffle. */
  def resizeToGrid(records: Dataset[MediaRecord], side: Int): Dataset[Thumb] = {
    import records.sparkSession.implicits._
    require(side >= 1)
    records.filter(_.media_type == "image").mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val w = math.max(1, r.width)
        val h = math.max(1, r.height)
        def px(row: Int, col: Int): Long = {
          val p = row * w + col
          if (p < r.payload.length) (r.payload(p) & 0xff).toLong else 0L
        }
        val grid = for (i <- 0 until side; j <- 0 until side) yield {
          val (r0, r1) = (i * h / side, math.max(i * h / side + 1, (i + 1) * h / side))
          val (c0, c1) = (j * w / side, math.max(j * w / side + 1, (j + 1) * w / side))
          var sum = 0L
          var rr = r0
          while (rr < r1) {
            var cc = c0
            while (cc < c1) { sum += px(rr, cc); cc += 1 }
            rr += 1
          }
          sum / ((r1 - r0).toLong * (c1 - c0))
        }
        Thumb(r.doc_id, w, h, grid)
      })
    }
  }

  final case class VadOut(doc_id: Long, n_frames: Long, n_voiced: Long,
                          n_segments: Long, longest: Long)

  /** Voice-activity detection over audio-typed payloads — the fourth
    * multimodal batch shape (decode → d12, frame-sample → d59, resize
    * → d60, signal-segmentation → here): the payload is treated as
    * 8-bit samples, cut into fixed `frame`-byte frames (trailing
    * partial frame dropped — the codec stand-in contract), each frame
    * scored by exact integer energy Σ(v−97)², thresholded against
    * meanSqThresh·frame, and the voiced mask collapsed to contiguous
    * SEGMENTS (count, longest run) in the same pass. Output is five
    * longs per clip however long the audio; the per-record loop is the
    * codec boundary (mapPartitions batched), payload bytes never
    * shuffle, and there is no exchange until the caller aggregates. */
  def detectVoice(records: Dataset[MediaRecord], frame: Int,
                  meanSqThresh: Long): Dataset[VadOut] = {
    import records.sparkSession.implicits._
    require(frame >= 1)
    records.filter(_.media_type == "audio").mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val p = r.payload
        val nf = p.length / frame
        var f = 0
        var nVoiced = 0L; var nSeg = 0L; var run = 0L; var longest = 0L
        while (f < nf) {
          var e = 0L
          var i = f * frame
          val end = i + frame
          while (i < end) {
            val d = (p(i) & 0xff) - 97
            e += d.toLong * d
            i += 1
          }
          if (e > meanSqThresh * frame) {
            nVoiced += 1
            if (run == 0) nSeg += 1
            run += 1
            if (run > longest) longest = run
          } else run = 0
          f += 1
        }
        VadOut(r.doc_id, nf.toLong, nVoiced, nSeg, longest)
      })
    }
  }

  /** Synthesize a deterministic media table from `documents` (the
    * container has no real media files): payload = the document's bytes,
    * media_type/width/height derived from doc_id. Exercises binary-column
    * IO, casts, and the typed Dataset encoder path. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
      $"doc_id",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod($"doc_id", lit(3)) + 1).cast("int")).as("media_type"),
      (pmod($"doc_id", lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod($"doc_id", lit(48)) * 16 + 64).cast("int").as("height"),
      encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
