package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media payload: opaque bytes + structured metadata. */
final case class MediaRecord(doc_id: Long, media: Array[Byte])

/** Deterministic "decoded" features of a media payload. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    byte_sum: Long,
    header_hex: String,
    format: String,
    width: Long,
    height: Long)

/** Multimodal-column plumbing (SURVEY.md §2.11): image/audio/video as
  * opaque `BinaryType` columns with typed metadata, processed by batched
  * per-partition decoders.
  *
  * The Spark-side shape is real and scale-correct: `Dataset[MediaRecord]`
  * with a `BinaryType` payload, decode as `mapPartitions` (one decoder
  * instance per partition, streaming iterator — no per-row setup, no
  * driver collect; the 100 TB path is "binary parquet in, features out,
  * no shuffle"). Only the codec itself is stubbed: this container has no
  * image/audio libraries, so [[StubDecoder]] derives deterministic
  * features from the raw bytes. Swap it for a real JNI/javax decoder
  * without touching the plumbing.
  */
object Multimodal {

  /** The decode stub — the one deliberately-fake piece. A real
    * implementation would parse an actual codec header here. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val b = r.media
      val n = b.length.toLong
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += b(i) & 0xff; i += 1 }
      val hex = b.take(8).map(x => f"${x & 0xff}%02X").mkString
      val b0 = if (b.length > 0) b(0) & 0xff else 0
      val b1 = if (b.length > 1) b(1) & 0xff else 0
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = n,
        byte_sum = sum,
        header_hex = hex,
        format = if (b0 % 2 == 0) "rgb8" else "gray8",
        width = b0 % 64 + 1,
        height = b1 % 64 + 1)
    }
  }

  /** documents(text) → MediaRecord with the UTF-8 bytes as the payload —
    * the test stand-in for reading a binary media column from parquet. */
  def fromText(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** Batched decode: one decoder per partition, streamed. */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec contexts etc.)
      it.map(StubDecoder.decode)
    }
  }

  /** Feature extraction stub: L2-normalized 64-bin byte histogram as an
    * `Array[Float]` embedding — the plumbing shape of an image/audio
    * feature extractor (fixed-dim float vector per payload, pure
    * per-partition map). Output plugs directly into
    * [[graft.operators.Similarity]] (bruteTopK / lshPairs / ivfTopK),
    * closing the decode → featurize → ANN-search pipeline. */
  def featureVectors(ds: Dataset[MediaRecord], dim: Int = 64): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val h = new Array[Float](dim)
      var i = 0
      while (i < r.media.length) { h((r.media(i) & 0xff) % dim) += 1f; i += 1 }
      var n2 = 0.0
      var j = 0
      while (j < dim) { n2 += h(j).toDouble * h(j); j += 1 }
      val inv = if (n2 > 0) (1.0 / math.sqrt(n2)).toFloat else 0f
      j = 0
      while (j < dim) { h(j) *= inv; j += 1 }
      (r.doc_id, h)
    }).toDF("doc_id", "embedding")
  }

  /** Resize stub: downsample the payload to a fixed `target` length by
    * strided byte selection — the plumbing shape of image resize (fixed
    * output geometry per row, pure per-partition map). A real
    * implementation swaps the sampler for a pixel-space scaler. */
  def resizeStub(ds: Dataset[MediaRecord], target: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val n = r.media.length
      val out =
        if (n <= target) r.media
        else Array.tabulate(target)(i => r.media((i.toLong * n / target).toInt))
      MediaRecord(r.doc_id, out)
    })
  }

  /** Frame sampling stub: every `stride`-th byte as a "frame" digest —
    * the plumbing shape of video frame extraction (explode to one row per
    * sampled frame). */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      r.media.indices.by(stride).map(i =>
        (r.doc_id, i.toLong, (r.media(i) & 0xff).toLong))
    }.toDF("doc_id", "frame_idx", "frame_value")
  }
}
