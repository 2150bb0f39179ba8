package graft.multimodal

import java.io.ByteArrayInputStream
import java.util.zip.{CRC32, GZIPInputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gzip (RFC 1952) ingestion plumbing — compressed text corpora are how
  * 100 TB of documents actually arrive. Decompression is the REAL codec:
  * `java.util.zip.GZIPInputStream`, which also verifies the member's
  * CRC-32 and ISIZE trailer. The encoder emits spec-complete members
  * (magic, DEFLATE method, FHCRC-free header; stored-mode blocks so the
  * bytes are deterministic cross-platform; real CRC-32 + ISIZE trailer) —
  * readable by any gunzip, and decodable here through the same general
  * inflate path as compressed members.
  */
object Gzip {

  /** RFC 1952 member with stored-mode DEFLATE blocks: deterministic
    * output (no compressor version drift), legal input to any decoder. */
  def gzipStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 32)
    // header: magic 1f 8b, CM=8 (deflate), FLG=0, MTIME=0 (deterministic),
    // XFL=0, OS=255 (unknown)
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(0); out.write(0xff)
    ByteIo.writeStoredBlocks(out, data)
    val crc = new CRC32
    crc.update(data)
    out.write(ByteIo.le32b(crc.getValue), 0, 4)
    out.write(ByteIo.le32b(data.length.toLong & 0xffffffffL), 0, 4)
    out.toByteArray
  }

  /** Ceiling on decompressed member size. A corpus document is MBs at
    * most; a member that inflates past this is a decompression bomb (a
    * ~1 MB stream can legally expand ~1000×) and is rejected like any
    * other corrupt payload — an unbounded readAllBytes would let one
    * hostile member OOM the executor, which is exactly the
    * kill-the-scan failure the never-throw contract exists to prevent. */
  val MaxDecodedBytes: Int = 1 << 28 // 256 MiB

  /** Real decode incl. trailer CRC verification; None on any corruption
    * or a decompressed size past [[MaxDecodedBytes]] (route-elsewhere,
    * never throw — one bad member must not kill a corpus-wide scan). */
  def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    if (b == null || b.length < 18) None
    else try {
      val in = new GZIPInputStream(new ByteArrayInputStream(b))
      try {
        // size hint in Long: b.length * 4 wraps Int past 512 MiB and a
        // negative capacity throws IllegalArgumentException — which is
        // not an IOException and would escape the never-throw contract
        val hint = math.min(b.length.toLong * 4, 1L << 16).toInt
        val out = new java.io.ByteArrayOutputStream(hint)
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size().toLong + n > MaxDecodedBytes) return None
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** documents → (doc_id, gz): each text as one spec-complete gzip
    * member, built distributedly. */
  def compressTexts(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("binary").as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map(r => MediaRecord(r.doc_id, gzipStored(r.media))))
  }

  /** (doc_id, gz) → (doc_id, text) through the real decoder; members that
    * fail to decode (bad magic, corrupt CRC, truncation) come back with a
    * null text — count them, don't crash on them. */
  def decompressTexts(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      (r.doc_id, gunzip(r.media).map(new String(_, "UTF-8")))
    }).toDF("doc_id", "text")
  }
}
