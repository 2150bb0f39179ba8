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
    var off = 0
    while (off < data.length || data.isEmpty && off == 0) {
      val n = math.min(65535, data.length - off)
      val last = off + n == data.length
      out.write(if (last) 1 else 0)
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >> 8) & 0xff)
      out.write(data, off, n)
      off += n
      if (last) off = data.length + 1 // terminate (handles empty input)
    }
    val crc = new CRC32
    crc.update(data)
    val c = crc.getValue
    out.write((c & 0xff).toInt); out.write(((c >> 8) & 0xff).toInt)
    out.write(((c >> 16) & 0xff).toInt); out.write(((c >> 24) & 0xff).toInt)
    val isize = data.length.toLong & 0xffffffffL
    out.write((isize & 0xff).toInt); out.write(((isize >> 8) & 0xff).toInt)
    out.write(((isize >> 16) & 0xff).toInt)
    out.write(((isize >> 24) & 0xff).toInt)
    out.toByteArray
  }

  /** Real decode incl. trailer CRC verification; None on any corruption
    * (route-elsewhere, never throw — one bad member must not kill a
    * corpus-wide scan). */
  def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    if (b == null || b.length < 18) None
    else try {
      val in = new GZIPInputStream(new ByteArrayInputStream(b))
      try Some(in.readAllBytes()) finally in.close()
    } catch { case _: java.io.IOException => None }

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
