package graft.multimodal

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{CRC32, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A packed archive payload, keyed by the archive it came from. */
final case class ArchiveRecord(archive_id: Long, archive: Array[Byte])

/** Archive ingestion — the container formats a 100 TB training corpus
  * actually ships in. Three real parsers, no library shortcuts:
  *
  *  - ZIP (PKWARE APPNOTE): end-of-central-directory scan → central
  *    directory walk → per-member local-header read, STORED copy or
  *    DEFLATE inflate (`java.util.zip.Inflater`, raw), CRC-32 verified.
  *    Metadata-only scans ([[zipMeta]]) never touch member bytes — the
  *    cheap "what's in this corpus" pass a 100 TB crawl needs before
  *    committing to decompression.
  *  - ustar tar (POSIX.1-1988): 512-byte block walk, octal field parse,
  *    header checksum verified, end-of-archive double zero block.
  *  - WARC-in-gzip (ISO 28500 / RFC 1952): the Common-Crawl shape — one
  *    gzip member per WARC record, members concatenated. The splitter
  *    recovers MEMBER BOUNDARIES (offset + length per record), which a
  *    plain `GZIPInputStream` read deliberately hides — boundaries are
  *    what make a .warc.gz seekable/splittable at scale.
  *
  * Execution model: one archive per row, `mapPartitions` decode with a
  * per-partition reused `Inflater` (native buffers released at task end),
  * zero shuffle. Parsers never throw on hostile input (truncated
  * headers, corrupt CRCs, decompression bombs, lying size fields):
  * a corrupt member is dropped — one bad archive must not kill a
  * corpus-wide scan. Size guards mirror [[Gzip.MaxDecodedBytes]] plus
  * the 1032:1 DEFLATE expansion ceiling.
  *
  * Fixtures pack the `documents` table (groups of [[GroupSize]] docs per
  * archive, members ordered by doc_id, deterministic stored-mode DEFLATE)
  * so every parsed field — member names, sizes, offsets, payload bytes —
  * is reconstructible by a SQL oracle from first principles.
  *
  * Reference scope: the reference ingests a packed binary stream and
  * explodes it into typed records
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:36-44);
  * archives are that same explode-the-container shape for corpus files.
  */
object Archives {

  /** Documents per fixture archive. */
  val GroupSize = 8

  private val MaxMemberBytes: Int = Gzip.MaxDecodedBytes
  private val MaxNameBytes = 4096

  // ======================= fixture builders =======================

  /** Group documents into (archive_id = doc_id / GroupSize) and build one
    * deterministic archive per group, members sorted by doc_id. Built
    * distributedly — the groupBy shuffle is the honest cost of archive
    * assembly (packing is a real grouped operation, not fixture
    * convenience). */
  private def grouped(docs: DataFrame, idCol: String, textCol: String)(
      build: Seq[(Long, Array[Byte])] => Array[Byte]): Dataset[ArchiveRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("txt"))
      .as[(Long, String)]
      .groupByKey(_._1 / GroupSize)
      .mapGroups { (aid, it) =>
        val members = it.toSeq.sortBy(_._1)
          .map { case (id, txt) => id -> txt.getBytes(UTF_8) }
        ArchiveRecord(aid, build(members))
      }
  }

  private def memberName(id: Long): String = s"doc-$id.txt"
  // Digit count bounded to 18 so the captured id always fits a Long:
  // a hostile `doc-99999999999999999999.txt` simply fails to match and
  // the member is dropped, instead of id.toLong throwing mid-scan.
  private[multimodal] val NamePattern = "doc-([0-9]{1,18})\\.txt".r

  // ======================= ZIP =======================

  /** Even doc_ids are STORED (method 0), odd are DEFLATE (method 8, with
    * stored-mode blocks so the compressed bytes — and therefore the
    * central directory's compressed-size field — are deterministic and
    * oracle-computable: 5·ceil(n/65535) + n). */
  private def zipMethod(id: Long): Int = if (id % 2 == 0) 0 else 8

  private def zipCompress(id: Long, data: Array[Byte]): Array[Byte] =
    if (zipMethod(id) == 0) data
    else {
      val out = new java.io.ByteArrayOutputStream(data.length + 8)
      ByteIo.writeStoredBlocks(out, data)
      out.toByteArray
    }

  /** Spec-complete ZIP: local file headers + central directory + EOCD,
    * real CRC-32s, readable by any unzip (ArchivesSpec cross-checks with
    * `java.util.zip.ZipInputStream`). */
  def zipFixture(members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    import ByteIo.{le16b, le32b}
    val out = new java.io.ByteArrayOutputStream(1024)
    val central = new java.io.ByteArrayOutputStream(256)
    var count = 0
    members.foreach { case (id, data) =>
      val name = memberName(id).getBytes(US_ASCII)
      val comp = zipCompress(id, data)
      val crc = new CRC32; crc.update(data)
      val offset = out.size()
      // local file header: sig, version 2.0, flags 0, method, DOS
      // time/date 0 (deterministic), crc, sizes, name/extra lengths
      out.write(Array[Byte](0x50, 0x4b, 0x03, 0x04), 0, 4)
      out.write(le16b(20), 0, 2); out.write(le16b(0), 0, 2)
      out.write(le16b(zipMethod(id)), 0, 2)
      out.write(le16b(0), 0, 2); out.write(le16b(0), 0, 2)
      out.write(le32b(crc.getValue), 0, 4)
      out.write(le32b(comp.length.toLong), 0, 4)
      out.write(le32b(data.length.toLong), 0, 4)
      out.write(le16b(name.length), 0, 2); out.write(le16b(0), 0, 2)
      out.write(name, 0, name.length)
      out.write(comp, 0, comp.length)
      // central directory entry mirrors the local header + offset
      central.write(Array[Byte](0x50, 0x4b, 0x01, 0x02), 0, 4)
      central.write(le16b(20), 0, 2); central.write(le16b(20), 0, 2)
      central.write(le16b(0), 0, 2)
      central.write(le16b(zipMethod(id)), 0, 2)
      central.write(le16b(0), 0, 2); central.write(le16b(0), 0, 2)
      central.write(le32b(crc.getValue), 0, 4)
      central.write(le32b(comp.length.toLong), 0, 4)
      central.write(le32b(data.length.toLong), 0, 4)
      central.write(le16b(name.length), 0, 2)
      central.write(le16b(0), 0, 2); central.write(le16b(0), 0, 2)
      central.write(le16b(0), 0, 2); central.write(le16b(0), 0, 2)
      central.write(le32b(0), 0, 4)
      central.write(le32b(offset.toLong), 0, 4)
      central.write(name, 0, name.length)
      count += 1
    }
    val cdOffset = out.size()
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06), 0, 4)
    out.write(ByteIo.le16b(0), 0, 2); out.write(ByteIo.le16b(0), 0, 2)
    out.write(ByteIo.le16b(count), 0, 2); out.write(ByteIo.le16b(count), 0, 2)
    out.write(ByteIo.le32b(cd.length.toLong), 0, 4)
    out.write(ByteIo.le32b(cdOffset.toLong), 0, 4)
    out.write(ByteIo.le16b(0), 0, 2)
    out.toByteArray
  }

  def zipFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(zipFixture)

  /** The ZIP64 twin of [[zipFixture]]: the layout a STREAMING writer
    * emits regardless of archive size — every 32-bit size/offset field
    * in the central directory is the 0xFFFFFFFF placeholder with the
    * real value in the 0x0001 extended-info extra field, the EOCD
    * carries 0xFFFF/0xFFFFFFFF placeholders, and a ZIP64 EOCD record +
    * locator precede it. Readers that only parse the classic EOCD see
    * nothing but placeholders (the silent-drop failure mode this format
    * exists to test); `java.util.zip.ZipFile` cross-checks it in
    * ArchivesSpec. Local headers carry version 4.5 and the two-field
    * local ZIP64 extra, per APPNOTE 4.5.3. */
  def zip64Fixture(members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    import ByteIo.{le16b, le32b, le64b}
    val out = new java.io.ByteArrayOutputStream(1024)
    val central = new java.io.ByteArrayOutputStream(256)
    var count = 0
    members.foreach { case (id, data) =>
      val name = memberName(id).getBytes(US_ASCII)
      val comp = zipCompress(id, data)
      val crc = new CRC32; crc.update(data)
      val offset = out.size()
      // local header: version 4.5, maxed sizes, ZIP64 extra (uncomp, comp)
      out.write(Array[Byte](0x50, 0x4b, 0x03, 0x04), 0, 4)
      out.write(le16b(45), 0, 2); out.write(le16b(0), 0, 2)
      out.write(le16b(zipMethod(id)), 0, 2)
      out.write(le16b(0), 0, 2); out.write(le16b(0), 0, 2)
      out.write(le32b(crc.getValue), 0, 4)
      out.write(le32b(0xffffffffL), 0, 4)
      out.write(le32b(0xffffffffL), 0, 4)
      out.write(le16b(name.length), 0, 2); out.write(le16b(20), 0, 2)
      out.write(name, 0, name.length)
      out.write(le16b(0x0001), 0, 2); out.write(le16b(16), 0, 2)
      out.write(le64b(data.length.toLong), 0, 8)
      out.write(le64b(comp.length.toLong), 0, 8)
      out.write(comp, 0, comp.length)
      // CD entry: placeholders + three-field ZIP64 extra
      central.write(Array[Byte](0x50, 0x4b, 0x01, 0x02), 0, 4)
      central.write(le16b(45), 0, 2); central.write(le16b(45), 0, 2)
      central.write(le16b(0), 0, 2)
      central.write(le16b(zipMethod(id)), 0, 2)
      central.write(le16b(0), 0, 2); central.write(le16b(0), 0, 2)
      central.write(le32b(crc.getValue), 0, 4)
      central.write(le32b(0xffffffffL), 0, 4)
      central.write(le32b(0xffffffffL), 0, 4)
      central.write(le16b(name.length), 0, 2)
      central.write(le16b(28), 0, 2) // extra length
      central.write(le16b(0), 0, 2)
      central.write(le16b(0), 0, 2); central.write(le16b(0), 0, 2)
      central.write(le32b(0), 0, 4)
      central.write(le32b(0xffffffffL), 0, 4)
      central.write(name, 0, name.length)
      central.write(le16b(0x0001), 0, 2); central.write(le16b(24), 0, 2)
      central.write(le64b(data.length.toLong), 0, 8)
      central.write(le64b(comp.length.toLong), 0, 8)
      central.write(le64b(offset.toLong), 0, 8)
      count += 1
    }
    val cdOffset = out.size()
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    val z64Offset = out.size()
    // ZIP64 EOCD record (fixed 56 bytes: size field = 44 remaining)
    out.write(Array[Byte](0x50, 0x4b, 0x06, 0x06), 0, 4)
    out.write(le64b(44), 0, 8)
    out.write(le16b(45), 0, 2); out.write(le16b(45), 0, 2)
    out.write(le32b(0), 0, 4); out.write(le32b(0), 0, 4)
    out.write(le64b(count.toLong), 0, 8); out.write(le64b(count.toLong), 0, 8)
    out.write(le64b(cd.length.toLong), 0, 8)
    out.write(le64b(cdOffset.toLong), 0, 8)
    // ZIP64 EOCD locator
    out.write(Array[Byte](0x50, 0x4b, 0x06, 0x07), 0, 4)
    out.write(le32b(0), 0, 4)
    out.write(le64b(z64Offset.toLong), 0, 8)
    out.write(le32b(1), 0, 4)
    // classic EOCD, all placeholders
    out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06), 0, 4)
    out.write(le16b(0), 0, 2); out.write(le16b(0), 0, 2)
    out.write(le16b(0xffff), 0, 2); out.write(le16b(0xffff), 0, 2)
    out.write(le32b(0xffffffffL), 0, 4)
    out.write(le32b(0xffffffffL), 0, 4)
    out.write(le16b(0), 0, 2)
    out.toByteArray
  }

  def zip64Fixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(zip64Fixture)

  /** One central-directory entry, plus the local-header offset needed to
    * reach the member bytes. */
  final case class ZipEntry(name: String, method: Int, compSize: Long,
      uncompSize: Long, crc32: Long, localOffset: Long)

  /** EOCD scan (backwards over the ≤64 KiB comment window, per spec) →
    * central directory walk. ZIP64-aware: a ZIP64 EOCD locator directly
    * preceding the EOCD routes entry count / CD extent through the ZIP64
    * EOCD record, and per-entry 0xFFFFFFFF placeholders resolve through
    * the 0x0001 extended-info extra field — the layout every streaming
    * zip writer emits once it cannot seek back, and any archive over
    * 4 GiB or 65,535 members requires. Bounds-checked throughout; None
    * on any structural violation. Never reads member bytes. */
  def zipDirectory(b: Array[Byte]): Option[Vector[ZipEntry]] = {
    if (b == null || b.length < 22) return None
    // EOCD signature search from the tail: the comment field is the only
    // trailing variable-length region, capped at 65535 by its u16 length
    var eocd = -1
    var p = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && p >= stop) {
      if (b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 0x05 && b(p + 3) == 0x06 &&
          ByteIo.le16(b, p + 20) == b.length - (p + 22)) eocd = p
      p -= 1
    }
    if (eocd < 0) return None
    var entries: Long = ByteIo.le16(b, eocd + 10)
    var cdSize = ByteIo.le32u(b, eocd + 12)
    var cdOff = ByteIo.le32u(b, eocd + 16)
    if (ByteIo.le16(b, eocd + 8) != entries) return None // single-disk only
    if (eocd >= 20 && ByteIo.le32u(b, eocd - 20) == 0x07064b50L) {
      // ZIP64 EOCD locator: (disk-with-record, record offset, total disks)
      val loc = eocd - 20
      if (ByteIo.le32u(b, loc + 4) != 0 || ByteIo.le32u(b, loc + 16) != 1)
        return None
      val z64 = ByteIo.le64(b, loc + 8)
      // subtraction form: z64 + 56 overflows for hostile near-MaxValue
      // offsets and would wrap past the guard into a throwing toInt
      if (z64 < 0 || z64 > loc - 56) return None
      val zo = z64.toInt
      if (ByteIo.le32u(b, zo) != 0x06064b50L) return None
      if (ByteIo.le32u(b, zo + 16) != 0 || ByteIo.le32u(b, zo + 20) != 0)
        return None // single disk, CD starts on it
      entries = ByteIo.le64(b, zo + 24)
      if (entries != ByteIo.le64(b, zo + 32)) return None
      cdSize = ByteIo.le64(b, zo + 40)
      cdOff = ByteIo.le64(b, zo + 48)
      if (entries < 0 || cdSize < 0 || cdOff < 0 || cdSize > zo ||
          cdOff > zo - cdSize) return None // overflow-safe cdOff+cdSize>zo
    } else if (cdOff + cdSize > eocd) return None
    if (cdOff + cdSize > b.length) return None
    val cd = java.util.Arrays.copyOfRange(b, cdOff.toInt,
      (cdOff + cdSize).toInt)
    parseCentralDirectory(cd, entries)
  }

  /** Walk `entries` central-directory records laid out in `cd` (a slice
    * holding exactly the CD). Shared by the row-based [[zipDirectory]]
    * and the file-backed tail-ranged reader
    * ([[ArchiveFiles.readZipDirectory]]) so ZIP64 placeholder handling
    * cannot drift between the twins. */
  private[multimodal] def parseCentralDirectory(cd: Array[Byte],
      entries: Long): Option[Vector[ZipEntry]] = {
    if (entries < 0 || entries > cd.length / 46) return None
    val n = entries.toInt
    val out = Vector.newBuilder[ZipEntry]
    var o = 0
    var i = 0
    while (i < n) {
      if (o + 46 > cd.length) return None
      if (ByteIo.le32u(cd, o) != 0x02014b50L) return None
      val method = ByteIo.le16(cd, o + 10).toInt
      val crc = ByteIo.le32u(cd, o + 16)
      var comp = ByteIo.le32u(cd, o + 20)
      var uncomp = ByteIo.le32u(cd, o + 24)
      val nameLen = ByteIo.le16(cd, o + 28).toInt
      val extraLen = ByteIo.le16(cd, o + 30).toInt
      val commentLen = ByteIo.le16(cd, o + 32).toInt
      var localOff = ByteIo.le32u(cd, o + 42)
      if (nameLen > MaxNameBytes) return None
      if (o + 46 + nameLen + extraLen + commentLen > cd.length) return None
      // 0xFFFFFFFF placeholders resolve through the ZIP64 extended-info
      // extra field (id 0x0001) — fields appear in spec order (uncomp,
      // comp, local offset), each present ONLY if its 32-bit twin is
      // maxed. A placeholder with no resolving field is structural lying.
      if (comp == 0xffffffffL || uncomp == 0xffffffffL ||
          localOff == 0xffffffffL) {
        var eo = o + 46 + nameLen
        val eEnd = eo + extraLen
        var found = false
        while (!found && eo + 4 <= eEnd) {
          val id = ByteIo.le16(cd, eo).toInt
          val sz = ByteIo.le16(cd, eo + 2).toInt
          if (eo + 4 + sz > eEnd) return None
          if (id == 0x0001) {
            var fo = eo + 4
            val fEnd = eo + 4 + sz
            if (uncomp == 0xffffffffL) {
              if (fo + 8 > fEnd) return None
              uncomp = ByteIo.le64(cd, fo); fo += 8
            }
            if (comp == 0xffffffffL) {
              if (fo + 8 > fEnd) return None
              comp = ByteIo.le64(cd, fo); fo += 8
            }
            if (localOff == 0xffffffffL) {
              if (fo + 8 > fEnd) return None
              localOff = ByteIo.le64(cd, fo); fo += 8
            }
            found = true
          } else eo += 4 + sz
        }
        if (!found || comp < 0 || uncomp < 0 || localOff < 0) return None
      }
      val name = new String(cd, o + 46, nameLen, UTF_8)
      out += ZipEntry(name, method, comp, uncomp, crc, localOff)
      o += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(out.result())
  }

  /** Extract one member's bytes via its local header, verifying sizes and
    * CRC-32. Bomb guards: uncompressed size capped, and for DEFLATE also
    * bounded by the 1032:1 max expansion of the actual compressed bytes. */
  private[multimodal] def zipMember(b: Array[Byte], e: ZipEntry, inf: Inflater): Option[Array[Byte]] = {
    val lo = e.localOffset
    if (lo < 0 || lo + 30 > b.length) return None
    if (ByteIo.le32u(b, lo.toInt) != 0x04034b50L) return None
    val nameLen = ByteIo.le16(b, lo.toInt + 26)
    val extraLen = ByteIo.le16(b, lo.toInt + 28)
    val dataOff = lo + 30 + nameLen + extraLen
    if (dataOff + e.compSize > b.length) return None
    if (e.uncompSize > MaxMemberBytes) return None
    val data: Option[Array[Byte]] = e.method match {
      case 0 =>
        if (e.compSize != e.uncompSize) None
        else Some(java.util.Arrays.copyOfRange(b, dataOff.toInt, (dataOff + e.compSize).toInt))
      case 8 =>
        if (e.uncompSize > e.compSize * 1032L + 64L) None
        else try {
          inf.reset()
          inf.setInput(b, dataOff.toInt, e.compSize.toInt)
          val raw = new Array[Byte](e.uncompSize.toInt)
          var off = 0
          while (off < raw.length && !inf.finished()) {
            val n = inf.inflate(raw, off, raw.length - off)
            if (n == 0 && inf.needsInput()) return None // truncated stream
            off += n
          }
          // a stream that is not finished at exactly uncompSize lied
          if (off != raw.length || !(inf.finished() || inf.inflate(new Array[Byte](1)) == 0 && inf.finished()))
            None
          else Some(raw)
        } catch { case _: java.util.zip.DataFormatException => None }
      case _ => None // unsupported method — route elsewhere, don't throw
    }
    data.filter { d =>
      val crc = new CRC32; crc.update(d)
      crc.getValue == e.crc32
    }
  }

  /** Metadata-only corpus scan: one row per central-directory entry, no
    * member bytes touched. Shuffle-free. */
  def zipMeta(ds: Dataset[ArchiveRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      zipDirectory(rec.archive).toSeq.flatten.map(e =>
        (rec.archive_id, e.name, e.method.toLong, e.compSize, e.uncompSize))
    }).toDF("archive_id", "name", "method", "comp_size", "uncomp_size")
  }

  /** Archive → member rows: the corpus-explode. One reused Inflater per
    * partition; corrupt members dropped, never thrown. */
  def zipExplode(ds: Dataset[ArchiveRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val inf = new Inflater(true)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => inf.end())
      it.flatMap { rec =>
        zipDirectory(rec.archive).toSeq.flatten.flatMap { e =>
          e.name match {
            case NamePattern(id) =>
              zipMember(rec.archive, e, inf).map(d => (id.toLong, new String(d, UTF_8)))
            case _ => None
          }
        }
      }
    }.toDF("doc_id", "text")
  }

  // ======================= ustar tar =======================

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(US_ASCII)
  }

  /** One checksummed ustar header block. Deterministic: mtime 0, uid/gid
    * 0, mode 0644. `name` is written raw into the 100-byte field (longer
    * names must go through a GNU/PAX meta member — see
    * [[tarLongFixture]]). */
  private[multimodal] def tarHeaderBlock(name: Array[Byte], size: Long,
      typeflag: Byte): Array[Byte] = {
    val hdr = new Array[Byte](512)
    System.arraycopy(name, 0, hdr, 0, math.min(name.length, 100))
    System.arraycopy(octal(420 /* 0644 */, 8), 0, hdr, 100, 8)
    System.arraycopy(octal(0, 8), 0, hdr, 108, 8)
    System.arraycopy(octal(0, 8), 0, hdr, 116, 8)
    System.arraycopy(octal(size, 12), 0, hdr, 124, 12)
    System.arraycopy(octal(0, 12), 0, hdr, 136, 12)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum as spaces
    hdr(156) = typeflag
    // POSIX magic "ustar" NUL + version "00" (hdr(262) is already 0)
    System.arraycopy("ustar".getBytes(US_ASCII), 0, hdr, 257, 5)
    hdr(263) = '0'; hdr(264) = '0'
    var sum = 0L
    var i = 0
    while (i < 512) { sum += hdr(i) & 0xff; i += 1 }
    // chksum: six octal digits, NUL, space (the POSIX terminator pair)
    System.arraycopy(("0" * 6 + java.lang.Long.toOctalString(sum)).takeRight(6)
      .getBytes(US_ASCII), 0, hdr, 148, 6)
    hdr(154) = 0; hdr(155) = ' '
    hdr
  }

  private def tarWritePadded(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    out.write(data, 0, data.length)
    val pad = (512 - data.length % 512) % 512
    out.write(new Array[Byte](pad), 0, pad)
  }

  /** One POSIX.1-1988 ustar header + padded payload per member, two zero
    * blocks at the end. Deterministic: mtime 0, uid/gid 0. */
  def tarFixture(members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    members.foreach { case (id, data) =>
      out.write(tarHeaderBlock(memberName(id).getBytes(US_ASCII),
        data.length.toLong, '0'), 0, 512)
      tarWritePadded(out, data)
    }
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }

  def tarFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(tarFixture)

  /** Deterministic >100-char member path: a 104-char directory of one
    * repeated letter + the classic basename — too long for the plain
    * ustar name field, so writers must emit a GNU or PAX meta member.
    * The DuckDB oracle rebuilds it as
    * `repeat(chr(97 + doc_id % 26), 104) || '/doc-' || doc_id || '.txt'`. */
  private[multimodal] def longMemberName(id: Long): String =
    ('a' + (id % 26).toInt).toChar.toString * 104 + "/" + memberName(id)

  /** Long-name tar fixture: every member's path tops 100 chars, carried
    * the way real writers do it — even doc_ids via a GNU `@LongLink`
    * ('L') meta member, odd via a PAX extended header ('x') with a
    * `path=` record — with the terminal ustar header holding the
    * truncated first 100 bytes, exactly what GNU/POSIX tar emit for
    * compatibility with pre-extension readers. */
  def tarLongFixture(members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    members.foreach { case (id, data) =>
      val longName = longMemberName(id).getBytes(UTF_8)
      if (id % 2 == 0) {
        val payload = longName :+ 0.toByte
        out.write(tarHeaderBlock("././@LongLink".getBytes(US_ASCII),
          payload.length.toLong, 'L'), 0, 512)
        tarWritePadded(out, payload)
      } else {
        // PAX record: `len path=<name>\n`, len counting its own digits
        val body = s" path=${longMemberName(id)}\n".getBytes(UTF_8)
        var len = body.length + 1
        while ((len.toString.length + body.length) != len)
          len = len.toString.length + body.length
        val payload = len.toString.getBytes(US_ASCII) ++ body
        out.write(tarHeaderBlock(s"PaxHeaders.0/doc-$id.txt".getBytes(US_ASCII),
          payload.length.toLong, 'x'), 0, 512)
        tarWritePadded(out, payload)
      }
      out.write(tarHeaderBlock(java.util.Arrays.copyOf(longName, 100),
        data.length.toLong, '0'), 0, 512)
      tarWritePadded(out, data)
    }
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }

  def tarLongFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(tarLongFixture)

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1 // leading pad
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); seen = true; i += 1
      if (v > MaxMemberBytes.toLong * 64) return None // absurd field
    }
    if (!seen) None else Some(v)
  }

  /** Longest member path the walkers accept (PATH_MAX-ish; a longer
    * "name" in a GNU/PAX meta payload is hostile). */
  private val MaxTarNameBytes = 4096

  /** One raw checksum-verified header at `b(o)`: (name from the header's
    * own fields incl. the ustar `prefix`, payload size, typeflag), or
    * None for the end-of-archive zero block / any structural violation.
    * Shared with [[ArchiveFiles]]'s boundary walk — like
    * [[parseCentralDirectory]], ONE parser for both twins so tar-format
    * fixes cannot drift between the row-based and file-backed paths. */
  private[multimodal] def tarRawHeader(b: Array[Byte], o: Int): Option[(String, Long, Byte)] = {
    var allZero = true
    var i = 0
    while (allZero && i < 512) { if (b(o + i) != 0) allZero = false; i += 1 }
    if (allZero) return None
    // magic: "ustar" at 257 (NUL- or space-terminated variants both ok)
    val magicOk = b(o + 257) == 'u' && b(o + 258) == 's' && b(o + 259) == 't' &&
      b(o + 260) == 'a' && b(o + 261) == 'r'
    val stored = parseOctal(b, o + 148, 8)
    var sum = 0L
    i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (b(o + i) & 0xff).toLong)
      i += 1
    }
    val size = parseOctal(b, o + 124, 12)
    if (!magicOk || !stored.contains(sum) || size.isEmpty ||
        size.get > MaxMemberBytes.toLong) return None
    var end = o
    while (end < o + 100 && b(end) != 0) end += 1
    val base = new String(b, o, end - o, UTF_8)
    // POSIX ustar prefix field (155 bytes at 345): carries the leading
    // path when name alone tops 100 bytes but each half fits
    var pEnd = o + 345
    while (pEnd < o + 345 + 155 && b(pEnd) != 0) pEnd += 1
    val name =
      if (pEnd == o + 345) base
      else new String(b, o + 345, pEnd - (o + 345), UTF_8) + "/" + base
    Some((name, size.get, b(o + 156)))
  }

  /** Parse the PAX extended-header records `len key=value\n` (len is the
    * decimal byte length of the WHOLE record, its own digits included)
    * and return the `path` override, if any. Stops at the first
    * malformed record — PAX payloads are untrusted member data. */
  private def paxPath(p: Array[Byte]): Option[String] = {
    var o = 0
    var path: Option[String] = None
    while (o < p.length) {
      var d = o
      var len = 0L
      while (d < p.length && p(d) >= '0' && p(d) <= '9') {
        len = len * 10 + (p(d) - '0')
        if (len > p.length) return path
        d += 1
      }
      if (d == o || d >= p.length || p(d) != ' ' ||
          len < (d - o) + 2 || o + len > p.length ||
          p((o + len - 1).toInt) != '\n') return path
      val rec = new String(p, d + 1, (o + len - 1).toInt - (d + 1), UTF_8)
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path" &&
          rec.length - eq - 1 <= MaxTarNameBytes)
        path = Some(rec.substring(eq + 1))
      o = (o + len).toInt
    }
    path
  }

  /** Parse ONE logical tar member at `b(off)`: consumes any GNU
    * `@LongLink` ('L') / PAX extended ('x') / PAX global ('g') meta
    * members — the two mechanisms real archives use for names over the
    * ustar header's 100 bytes — then the terminal header. PAX `path`
    * overrides GNU longname overrides the header's own (prefix'd) name.
    * Returns (effectiveName, terminal typeflag, payload offset, payload
    * size, offset just past the member), or None at the end-of-archive
    * zero block / first structural violation (after a corrupt header the
    * block arithmetic is untrusted — stop, don't resync). */
  private[multimodal] def tarLogicalMember(b: Array[Byte], off0: Int):
      Option[(String, Byte, Int, Long, Long)] = {
    var off = off0.toLong
    var pendingGnu: Option[String] = None
    var pendingPax: Option[String] = None
    var metas = 0
    while (off + 512 <= b.length && metas <= 8) {
      val o = off.toInt
      tarRawHeader(b, o) match {
        case None => return None
        case Some((hdrName, size, tf)) =>
          if (off + 512 + size > b.length) return None
          val next = off + 512 + ((size + 511) / 512) * 512
          tf match {
            case 'L' =>
              // GNU longname: payload is the next member's path, NUL-ended
              if (size > MaxTarNameBytes) return None
              var end = o + 512
              val stop = o + 512 + size.toInt
              while (end < stop && b(end) != 0) end += 1
              pendingGnu = Some(new String(b, o + 512, end - (o + 512), UTF_8))
              metas += 1
            case 'x' =>
              if (size > (64 << 10)) return None
              val payload = java.util.Arrays.copyOfRange(b, o + 512,
                o + 512 + size.toInt)
              pendingPax = paxPath(payload).orElse(pendingPax)
              metas += 1
            case 'g' => metas += 1 // PAX global: consume, no overrides kept
            case _ =>
              val name = pendingPax.orElse(pendingGnu).getOrElse(hdrName)
              return Some((name, tf, o + 512, size, next))
          }
          off = next
      }
    }
    None
  }

  /** Header-checksum-verified block walk. Emits (member name, offset of
    * its first header block — the meta header for GNU/PAX long-name
    * members, since that is where a ranged read must start —, payload)
    * until the end-of-archive zero block or the first structural
    * violation. */
  def tarMembers(b: Array[Byte]): Vector[(String, Long, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Long, Array[Byte])]
    if (b == null) return out.result()
    var off = 0L
    var done = false
    while (!done && off + 512 <= b.length) {
      tarLogicalMember(b, off.toInt) match {
        case Some((name, tf, poff, size, next)) =>
          if (tf == '0' || tf == 0)
            out += ((name, off,
              java.util.Arrays.copyOfRange(b, poff, poff + size.toInt)))
          off = next
        case None => done = true
      }
    }
    out.result()
  }

  /** The path's basename — the segment doc ids live in. Long-name
    * members carry directory prefixes; flat names pass through. */
  private[multimodal] def baseName(name: String): String =
    name.substring(name.lastIndexOf('/') + 1)

  /** Tar → member rows with each member's real header offset — the field
    * that makes a tarball range-readable (a 100 TB fetch plans byte
    * ranges from an index, it doesn't stream whole files). Ids match on
    * the basename, so GNU/PAX long paths resolve too. */
  def tarExplode(ds: Dataset[ArchiveRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      tarMembers(rec.archive).flatMap { case (name, off, data) =>
        baseName(name) match {
          case NamePattern(id) =>
            Some((id.toLong, off, new String(data, UTF_8)))
          case _ => None
        }
      }
    }).toDF("doc_id", "member_offset", "text")
  }

  /** `.tar.gz` fixtures: the tar fixture compressed as one RFC 1952
    * member — the most common way a corpus tarball actually ships. */
  def tgzFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(ms => Gzip.gzipStored(tarFixture(ms)))

  /** `.tar.gz` of the LONG-NAME tar fixture: GNU/PAX meta chains through
    * the gzip layer — the decompressed-stream offsets now count the meta
    * blocks, which the oracle pins (member = 512 meta header + 512 meta
    * payload + 512 real header + padded payload). */
  def tgzLongFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(ms => Gzip.gzipStored(tarLongFixture(ms)))

  /** `.tar.gz` explode: the real gzip decode (CRC/ISIZE-verified, bombs
    * rejected — [[Gzip.gunzip]]) composed with the checksum-verified tar
    * walk. Offsets are within the DECOMPRESSED stream — the coordinate
    * space a tar index actually uses (gzip is not seekable; a 100 TB
    * pipeline decompresses once and indexes the tar offsets). */
  def tgzExplode(ds: Dataset[ArchiveRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      Gzip.gunzip(rec.archive).toSeq.flatMap(tarMembers).flatMap {
        case (name, off, data) =>
          baseName(name) match {
            case NamePattern(id) =>
              Some((id.toLong, off, new String(data, UTF_8)))
            case _ => None
          }
      }
    }).toDF("doc_id", "member_offset", "text")
  }

  // ======================= WARC (.warc.gz) =======================

  /** One WARC/1.0 resource record, gzip'd as its own RFC 1952 member
    * (stored-mode DEFLATE — deterministic bytes), members concatenated:
    * the Common Crawl layout, where per-record members are what make the
    * file splittable. */
  def warcFixture(members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    members.foreach { case (id, data) =>
      val gz = Gzip.gzipStored(warcRecordBytes(id, data))
      out.write(gz, 0, gz.length)
    }
    out.toByteArray
  }

  def warcFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol)(warcFixture)

  /** Boundary of one gzip member starting at `off`: returns (member
    * length, decompressed bytes), or None on any corruption. Parses the
    * general RFC 1952 header (FEXTRA/FNAME/FCOMMENT/FHCRC), inflates raw,
    * and verifies the CRC-32 + ISIZE trailer. */
  private[multimodal] def gzipMemberAt(b: Array[Byte], off: Int, inf: Inflater): Option[(Long, Array[Byte])] = {
    if (off + 18 > b.length) return None
    if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b || b(off + 2) != 8) return None
    val flg = b(off + 3) & 0xff
    if ((flg & 0xe0) != 0) return None // reserved bits must be zero
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > b.length) return None
      p += 2 + ByteIo.le16(b, p).toInt
    }
    if ((flg & 8) != 0) { while (p < b.length && b(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (p < b.length && b(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= b.length) return None
    try {
      inf.reset()
      inf.setInput(b, p, b.length - p)
      val out = new java.io.ByteArrayOutputStream(math.min(b.length - p, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        if (out.size().toLong + n > MaxMemberBytes) return None // bomb
        out.write(buf, 0, n)
      }
      val used = inf.getBytesRead
      val trailer = p + used.toInt
      if (trailer + 8 > b.length) return None
      val data = out.toByteArray
      val crc = new CRC32; crc.update(data)
      if (ByteIo.le32u(b, trailer) != crc.getValue) return None
      if (ByteIo.le32u(b, trailer + 4) != (data.length.toLong & 0xffffffffL)) return None
      Some(((trailer + 8 - off).toLong, data))
    } catch { case _: java.util.zip.DataFormatException => None }
  }

  /** Minimal WARC record parse: headers up to the blank line, payload =
    * Content-Length bytes after it. Returns (record-id field, payload). */
  private[multimodal] def warcRecord(rec: Array[Byte]): Option[(String, Array[Byte])] = {
    var i = 0
    var hdrEnd = -1
    while (hdrEnd < 0 && i + 3 < rec.length) {
      if (rec(i) == '\r' && rec(i + 1) == '\n' && rec(i + 2) == '\r' && rec(i + 3) == '\n')
        hdrEnd = i
      i += 1
    }
    if (hdrEnd < 0) return None
    val lines = new String(rec, 0, hdrEnd, US_ASCII).split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val fields = lines.drop(1).flatMap { l =>
      val c = l.indexOf(':')
      if (c < 0) None else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
    }.toMap
    for {
      len <- fields.get("content-length").flatMap(_.toLongOption)
      rid <- fields.get("warc-record-id")
      if len >= 0 && hdrEnd + 4 + len <= rec.length
    } yield (rid, java.util.Arrays.copyOfRange(rec, hdrEnd + 4, (hdrEnd + 4 + len).toInt))
  }

  // Same Long-overflow guard as NamePattern: >18-digit ids don't match.
  private[multimodal] val RecordIdPattern = "<urn:graft:([0-9]{1,18})>".r

  /** `.warc.zst`-style fixtures: one RFC 8878 zstd frame per WARC record
    * ([[Compressed.zstdStoredFrame]] — deterministic raw-block frames, so
    * the oracle can compute every boundary), frames concatenated. */
  def warcZstFixtures(docs: DataFrame, idCol: String, textCol: String): Dataset[ArchiveRecord] =
    grouped(docs, idCol, textCol) { members =>
      val out = new java.io.ByteArrayOutputStream(1024)
      members.foreach { case (id, data) =>
        val record = warcRecordBytes(id, data)
        val z = Compressed.zstdStoredFrame(record)
        out.write(z, 0, z.length)
      }
      out.toByteArray
    }

  private def warcRecordBytes(id: Long, data: Array[Byte]): Array[Byte] =
    ("WARC/1.0\r\n" +
      "WARC-Type: resource\r\n" +
      s"WARC-Record-ID: <urn:graft:$id>\r\n" +
      s"Content-Length: ${data.length}\r\n" +
      "\r\n").getBytes(US_ASCII) ++ data ++ "\r\n\r\n".getBytes(US_ASCII)

  /** The zstd twin of [[warcSplit]]: member boundaries recovered by the
    * real zstd frame parser ([[Compressed.zstdFrames]]), then the same
    * WARC record grammar. Same output shape, same scale story — the
    * boundary fields are what make a 100 TB .warc.zst splittable. */
  def warcZstSplit(ds: Dataset[ArchiveRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      Compressed.zstdFrames(rec.archive).flatMap { case (off, len, data) =>
        warcRecord(data) match {
          case Some((RecordIdPattern(id), payload)) =>
            Some((id.toLong, off, len, new String(payload, UTF_8)))
          case _ => None
        }
      }
    }).toDF("doc_id", "member_offset", "member_len", "text")
  }

  /** Split a .warc.gz into records WITH their member boundaries —
    * (doc_id, member_offset, member_len, text). The boundary fields are
    * the point: they are what an index needs for ranged reads, and a
    * transparent concatenated-gzip read cannot produce them. Walk stops
    * at the first corrupt member (boundaries downstream of it are
    * unknowable). */
  def warcSplit(ds: Dataset[ArchiveRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val inf = new Inflater(true)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => inf.end())
      it.flatMap { rec =>
        val b = rec.archive
        val out = Vector.newBuilder[(Long, Long, Long, String)]
        var off = 0L
        var done = b == null
        while (!done && off < (if (b == null) 0 else b.length)) {
          gzipMemberAt(b, off.toInt, inf) match {
            case Some((mlen, data)) =>
              warcRecord(data) match {
                case Some((RecordIdPattern(id), payload)) =>
                  out += ((id.toLong, off, mlen, new String(payload, UTF_8)))
                case _ => () // non-graft record: skip it, boundary still good
              }
              off += mlen
            case None => done = true
          }
        }
        out.result()
      }
    }.toDF("doc_id", "member_offset", "member_len", "text")
  }
}
