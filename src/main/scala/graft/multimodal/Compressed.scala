package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Modern compressed-corpus ingestion beyond gzip: zstd (RFC 8878 — what
  * large web corpora ship as today), LZ4 frame, and Snappy. The codecs
  * are the REAL reference implementations Spark itself ships for shuffle
  * and parquet compression (zstd-jni, lz4-java, snappy-java on the
  * unmanaged classpath) — the honest engineering here is the ingestion
  * contract around them, same as [[Gzip]]:
  *
  *  - per-partition streamed decode, zero shuffle, no driver bytes;
  *  - never throw on hostile input — truncated frames, foreign bytes and
  *    decompression bombs return None (route-elsewhere; one bad payload
  *    must not kill a corpus-wide scan);
  *  - bombs are stopped at [[Gzip.MaxDecodedBytes]] by STREAMING decode
  *    with a cap — a zstd/LZ4 frame header's declared content size is
  *    attacker-controlled and must not be trusted as an allocation hint;
  *  - format routing by magic number ([[sniff]]), so a mixed-compression
  *    corpus splits into per-codec scans.
  */
object Compressed {

  /** Compression-format sniff by magic number: zstd 28 B5 2F FD (RFC
    * 8878 §3.1.1), LZ4 frame 04 22 4D 18, gzip 1F 8B. "unknown" for
    * anything else (raw Snappy has no magic by design). */
  def sniff(b: Array[Byte]): String =
    if (b == null || b.length < 4) "unknown"
    else if ((b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd) "zstd"
    else if ((b(0) & 0xff) == 0x04 && (b(1) & 0xff) == 0x22 &&
      (b(2) & 0xff) == 0x4d && (b(3) & 0xff) == 0x18) "lz4"
    else if ((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) "gzip"
    else "unknown"

  def zstdCompress(data: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, 3)

  /** Streaming zstd decode with the shared bomb cap; the frame's declared
    * content size is deliberately ignored as an allocation hint. The
    * magic is checked first — an empty or foreign byte string must be
    * None, not the clean-EOF empty payload a bare stream read yields. */
  def zstdDecompress(b: Array[Byte]): Option[Array[Byte]] =
    if (sniff(b) != "zstd") None
    else boundedRead(new com.github.luben.zstd.ZstdInputStream(
      new ByteArrayInputStream(b)))

  def lz4Compress(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  def lz4Decompress(b: Array[Byte]): Option[Array[Byte]] =
    if (sniff(b) != "lz4") None
    else boundedRead(new net.jpountz.lz4.LZ4FrameInputStream(
      new ByteArrayInputStream(b)))

  def snappyCompress(data: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(data)

  def snappyDecompress(b: Array[Byte]): Option[Array[Byte]] =
    try {
      if (b == null || b.length == 0) None
      else if (!org.xerial.snappy.Snappy.isValidCompressedBuffer(b)) None
      else {
        // raw Snappy stores the uncompressed length in the stream head;
        // validate it against the cap BEFORE the single-shot allocate
        val n = org.xerial.snappy.Snappy.uncompressedLength(b)
        if (n < 0 || n > Gzip.MaxDecodedBytes) None
        else Some(org.xerial.snappy.Snappy.uncompress(b))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Drain a decoder stream under [[Gzip.MaxDecodedBytes]]; None on any
    * decode error, truncation, or the cap tripping. The stream is always
    * closed (zstd-jni holds native buffers). */
  private def boundedRead(in: java.io.InputStream): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size().toLong + n > Gzip.MaxDecodedBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()

  /** documents → one compressed payload per row under the given codec. */
  def compressTexts(docs: DataFrame, idCol: String, textCol: String,
      codec: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val enc: Array[Byte] => Array[Byte] = codec match {
      case "zstd" => zstdCompress
      case "lz4" => lz4Compress
      case "snappy" => snappyCompress
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        MediaRecord(id, enc(t.getBytes("UTF-8")))
      })
  }

  /** Compressed payloads → text rows through the real decoder; corrupt
    * payloads drop. One decoder call per row, streamed per partition. */
  def decompressTexts(ds: Dataset[MediaRecord], codec: String): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val dec: Array[Byte] => Option[Array[Byte]] = codec match {
      case "zstd" => zstdDecompress
      case "lz4" => lz4Decompress
      case "snappy" => snappyDecompress
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    ds.mapPartitions(_.flatMap(r =>
      dec(r.media).map(d => (r.doc_id, new String(d, "UTF-8")))))
      .toDF("doc_id", "text")
  }

  /** Mixed-compression corpus routing: per-format payload counts +
    * decoded-byte totals through the magic-number sniff — the scan that
    * tells a 100 TB pipeline which per-codec readers to launch. Payload
    * codec of doc d = [gzip, zstd, lz4][d mod 3]. */
  def routeTexts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val data = t.getBytes("UTF-8")
        val payload = (id % 3) match {
          case 0 => Gzip.gzipStored(data)
          case 1 => zstdCompress(data)
          case _ => lz4Compress(data)
        }
        (sniff(payload), 1L, data.length.toLong)
      })
      .toDF("format", "one", "n")
      .groupBy(col("format"))
      .agg(count(col("one")).as("n_payloads"),
        sum(col("n")).as("decoded_bytes"))
  }
}
