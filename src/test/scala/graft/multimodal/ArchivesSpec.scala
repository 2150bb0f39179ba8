package graft.multimodal

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, Inflater, ZipEntry => JZipEntry, ZipInputStream, ZipOutputStream}

import graft.SparkSpec

/** Archive parsers: cross-validated against the JDK's independent
  * implementations where one exists (ZipInputStream/ZipOutputStream for
  * ZIP, GZIPInputStream for the concatenated-gzip WARC read), golden
  * arithmetic otherwise, plus hostile-payload rejection. */
class ArchivesSpec extends SparkSpec {

  private def members(n: Int): Seq[(Long, Array[Byte])] =
    (0 until n).map(i => (i.toLong, s"payload $i " + "x" * (i * 7 % 40)))
      .map { case (id, s) => id -> s.getBytes("UTF-8") }

  // ======================= ZIP =======================

  test("ZIP fixture is readable by the JDK's independent ZipInputStream") {
    val ms = members(5)
    val zip = Archives.zipFixture(ms)
    val zin = new ZipInputStream(new ByteArrayInputStream(zip))
    val seen = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map(e => e.getName -> zin.readAllBytes().toSeq)
      .toVector
    assert(seen.map(_._1) === ms.map { case (id, _) => s"doc-$id.txt" })
    assert(seen.map(_._2) === ms.map(_._2.toSeq))
  }

  test("our parser reads a ZIP from the JDK's independent ZipOutputStream (real DEFLATE)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    val data = ("the quick brown fox " * 50).getBytes("UTF-8")
    zout.putNextEntry(new JZipEntry("doc-7.txt"))
    zout.write(data); zout.closeEntry(); zout.close()
    val b = bos.toByteArray
    val dir = Archives.zipDirectory(b)
    assert(dir.isDefined && dir.get.size == 1)
    val e = dir.get.head
    assert(e.name == "doc-7.txt" && e.method == 8 && e.uncompSize == data.length)
    val inf = new Inflater(true)
    try assert(Archives.zipMember(b, e, inf).map(_.toSeq) === Some(data.toSeq))
    finally inf.end()
  }

  test("zipDirectory pins every central-directory field") {
    val ms = members(4)
    val dir = Archives.zipDirectory(Archives.zipFixture(ms)).get
    assert(dir.size == 4)
    dir.zip(ms).foreach { case (e, (id, data)) =>
      assert(e.name == s"doc-$id.txt")
      assert(e.method == (if (id % 2 == 0) 0 else 8))
      assert(e.uncompSize == data.length)
      val expComp = if (id % 2 == 0) data.length.toLong
        else data.length.toLong + 5L * math.max(1, (data.length + 65534) / 65535)
      assert(e.compSize == expComp)
      val crc = new java.util.zip.CRC32; crc.update(data)
      assert(e.crc32 == crc.getValue)
    }
  }

  test("ZIP64 fixture: placeholders resolve through the 0x0001 extras and the ZIP64 EOCD") {
    val ms = members(5)
    val zip = Archives.zip64Fixture(ms)
    // every 32-bit CD size/offset field is 0xFFFFFFFF on the wire; the
    // parsed entries must still carry the REAL values
    val dir = Archives.zipDirectory(zip)
      .getOrElse(fail("zip64 fixture did not parse"))
    assert(dir.size === 5)
    val inf = new Inflater(true)
    try {
      dir.zip(ms).foreach { case (e, (id, data)) =>
        assert(e.name === s"doc-$id.txt")
        assert(e.uncompSize === data.length)
        assert(e.uncompSize < 0xffffffffL && e.compSize < 0xffffffffL &&
          e.localOffset < 0xffffffffL, "placeholder leaked through")
        assert(Archives.zipMember(zip, e, inf).map(_.toSeq) === Some(data.toSeq))
      }
    } finally inf.end()
    // the JDK's ZipFile (independent ZIP64 reader) agrees
    val tmp = java.io.File.createTempFile("graft-zip64", ".zip")
    try {
      java.nio.file.Files.write(tmp.toPath, zip)
      val zf = new java.util.zip.ZipFile(tmp)
      try {
        val es = zf.entries()
        ms.foreach { case (id, data) =>
          val e = es.nextElement()
          assert(e.getName === s"doc-$id.txt")
          assert(zf.getInputStream(e).readAllBytes().toSeq === data.toSeq)
        }
      } finally zf.close()
    } finally tmp.delete()
  }

  test("hostile ZIP64 structures reject as None, never throw") {
    val good = Archives.zip64Fixture(members(3))
    def locOff: Int = { // the ZIP64 EOCD locator precedes the 22-byte EOCD
      good.length - 22 - 20
    }
    assert(ByteIo.le32u(good, locOff) === 0x07064b50L)
    // locator pointing past itself (record offset >= locator)
    val badOff = good.clone()
    System.arraycopy(ByteIo.le64b(good.length.toLong), 0, badOff, locOff + 8, 8)
    assert(Archives.zipDirectory(badOff) === None)
    // multi-disk locator
    val badDisk = good.clone()
    System.arraycopy(ByteIo.le32b(2), 0, badDisk, locOff + 16, 4)
    assert(Archives.zipDirectory(badDisk) === None)
    // ZIP64 EOCD record signature clobbered
    val z64 = ByteIo.le64(good, locOff + 8).toInt
    val badSig = good.clone()
    badSig(z64) = 0x51
    assert(Archives.zipDirectory(badSig) === None)
    // CD entry placeholder with its resolving extra field id clobbered
    val cdOff = ByteIo.le64(good, z64 + 48).toInt
    val nameLen = ByteIo.le16(good, cdOff + 28).toInt
    val badExtra = good.clone()
    badExtra(cdOff + 46 + nameLen) = 0x42 // 0x0001 -> 0x0142
    assert(Archives.zipDirectory(badExtra) === None)
    // OVERFLOW-hostile: record offset near Long.MaxValue — a sum-form
    // bounds check (z64 + 56 > loc) wraps negative and slips through
    // into a throwing toInt; the subtraction form must return None
    val hugeOff = good.clone()
    System.arraycopy(ByteIo.le64b(Long.MaxValue - 16), 0, hugeOff,
      locOff + 8, 8)
    assert(Archives.zipDirectory(hugeOff) === None)
    // OVERFLOW-hostile: cdOff + cdSize each ~2^62 wraps the sum guard
    val hugeCd = good.clone()
    System.arraycopy(ByteIo.le64b(1L << 62), 0, hugeCd, z64 + 40, 8)
    System.arraycopy(ByteIo.le64b(1L << 62), 0, hugeCd, z64 + 48, 8)
    assert(Archives.zipDirectory(hugeCd) === None)
  }

  // ======================= long-name tar =======================

  test("GNU @LongLink and PAX path members carry >100-char names through the walk") {
    val ms = members(6) // even ids -> GNU 'L', odd -> PAX 'x'
    val tar = Archives.tarLongFixture(ms)
    val seen = Archives.tarMembers(tar)
    assert(seen.size === 6)
    seen.zip(ms).foreach { case ((name, _, data), (id, payload)) =>
      assert(name === Archives.longMemberName(id))
      assert(name.length > 100, "fixture name fits a plain header — test is vacuous")
      assert(data.toSeq === payload.toSeq)
    }
    // explode resolves ids from the basename
    import spark.implicits._
    val docs = (0L until 6L).map(i => (i, s"payload $i " + "x" * (i.toInt * 7 % 40)))
      .toDF("doc_id", "text")
    val exploded = Archives.tarExplode(Archives.tarLongFixtures(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(exploded.toSeq === docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
  }

  test("ustar prefix-field names (100-255 chars, no meta member) resolve") {
    // patch a classic fixture's header: move a directory prefix into the
    // 155-byte prefix field and re-checksum — the POSIX split mechanism
    val tar = Archives.tarFixture(members(1))
    val prefix = "p" * 120
    val pb = prefix.getBytes("US-ASCII")
    System.arraycopy(pb, 0, tar, 345, pb.length)
    java.util.Arrays.fill(tar, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += tar(i) & 0xff
    System.arraycopy(("0" * 6 + java.lang.Long.toOctalString(sum)).takeRight(6)
      .getBytes("US-ASCII"), 0, tar, 148, 6)
    tar(154) = 0; tar(155) = ' '
    val seen = Archives.tarMembers(tar)
    assert(seen.size === 1)
    assert(seen.head._1 === prefix + "/doc-0.txt")
  }

  test("hostile long-name metas stop the walk or fall back, never throw") {
    val ms = members(4)
    // truncate right after a meta header: its promised payload is gone
    val tar = Archives.tarLongFixture(ms)
    assert(Archives.tarMembers(tar.take(512)) === Vector())
    // a PAX payload violating the `len key=value\n` grammar (len lies
    // about its span): the path override is ignored and the member
    // parses under its own header name
    val bogusPax = ("9999 path=/evil\n").getBytes("UTF-8")
    val payload = "hello".getBytes("UTF-8")
    val paxTar = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Archives.tarHeaderBlock("PaxHeaders.0/doc-1.txt".getBytes("US-ASCII"),
        bogusPax.length.toLong, 'x'), 0, 512)
      out.write(bogusPax, 0, bogusPax.length)
      out.write(new Array[Byte](512 - bogusPax.length), 0, 512 - bogusPax.length)
      out.write(Archives.tarHeaderBlock("doc-1.txt".getBytes("US-ASCII"),
        payload.length.toLong, '0'), 0, 512)
      out.write(payload, 0, payload.length)
      out.write(new Array[Byte](512 - payload.length), 0, 512 - payload.length)
      out.write(new Array[Byte](1024), 0, 1024)
      out.toByteArray
    }
    val seen = Archives.tarMembers(paxTar)
    assert(seen.size === 1)
    assert(seen.head._1 === "doc-1.txt")
    assert(seen.head._3.toSeq === payload.toSeq)
    // meta members with no terminal member before EOF zeros: no emission
    val onlyMetas = {
      val one = Archives.tarLongFixture(Seq(0L -> "x".getBytes("UTF-8")))
      // first member = L header + payload block; cut before the real header
      one.take(1024) ++ new Array[Byte](1024)
    }
    assert(Archives.tarMembers(onlyMetas) === Vector())
  }

  test("hostile ZIPs reject as None, never throw") {
    val good = Archives.zipFixture(members(3))
    assert(Archives.zipDirectory(good.take(good.length - 3)).isEmpty) // truncated EOCD
    assert(Archives.zipDirectory(Array.empty[Byte]).isEmpty)
    assert(Archives.zipDirectory("not a zip at all, far too short?!".getBytes).isEmpty)
    val badCd = good.clone()
    // corrupt the first central-directory signature byte
    val cdOff = ByteIo.le32u(good, good.length - 6).toInt
    badCd(cdOff) = 'X'.toByte
    assert(Archives.zipDirectory(badCd).isEmpty)
    // corrupt one member's stored bytes → CRC mismatch drops that member
    val dir = Archives.zipDirectory(good).get
    val e0 = dir.head // doc-0: STORED
    val badData = good.clone()
    badData(e0.localOffset.toInt + 30 + e0.name.length) =
      (badData(e0.localOffset.toInt + 30 + e0.name.length) ^ 1).toByte
    val inf = new Inflater(true)
    try {
      assert(Archives.zipMember(badData, e0, inf).isEmpty)
      // a lying uncompressed-size field must not survive
      assert(Archives.zipMember(good, e0.copy(uncompSize = e0.uncompSize + 1), inf).isEmpty)
    } finally inf.end()
  }

  // ======================= tar =======================

  test("tar round trip with checksum-verified headers and exact block offsets") {
    val ms = members(5)
    val tar = Archives.tarFixture(ms)
    assert(tar.length % 512 == 0)
    val got = Archives.tarMembers(tar)
    assert(got.map(_._1) === ms.map { case (id, _) => s"doc-$id.txt" })
    assert(got.map(_._3.toSeq) === ms.map(_._2.toSeq))
    // offsets follow the 512-block arithmetic
    var expOff = 0L
    got.zip(ms).foreach { case ((_, off, _), (_, data)) =>
      assert(off == expOff)
      expOff += 512 + ((data.length + 511) / 512) * 512
    }
  }

  test("corrupt tar headers stop the walk instead of throwing or resyncing") {
    val ms = members(3)
    val tar = Archives.tarFixture(ms)
    // flip a payload byte of member 0: its header is fine, but member 1's
    // header is intact too — only a header corruption stops the walk
    val badHdr = tar.clone()
    badHdr(148) = 'X'.toByte // chksum field of member 0
    assert(Archives.tarMembers(badHdr).isEmpty)
    // corrupting member 1's magic yields exactly member 0
    val secondHdr = 512 + ((ms.head._2.length + 511) / 512) * 512
    val bad2 = tar.clone()
    bad2(secondHdr + 257) = 'X'.toByte
    assert(Archives.tarMembers(bad2).map(_._1) === Vector("doc-0.txt"))
    // truncation mid-payload drops the partial member
    assert(Archives.tarMembers(tar.take(520)).isEmpty)
    assert(Archives.tarMembers(Array.empty[Byte]).isEmpty)
    assert(Archives.tarMembers(null).isEmpty)
  }

  // ======================= WARC =======================

  test("warc member boundaries are exact and the payload matches a JDK concatenated read") {
    val ms = members(4)
    val warc = Archives.warcFixture(ms)
    // boundary check: each member re-parses at its recorded offset
    val inf = new Inflater(true)
    try {
      var off = 0L
      val recs = Vector.newBuilder[Array[Byte]]
      while (off < warc.length) {
        val (mlen, data) = Archives.gzipMemberAt(warc, off.toInt, inf).get
        recs += data
        off += mlen
      }
      assert(off == warc.length) // boundaries tile the file exactly
      // cross-decoder: GZIPInputStream reads concatenated members
      // transparently; total payload must be byte-identical
      val jdk = new GZIPInputStream(new ByteArrayInputStream(warc)).readAllBytes()
      assert(recs.result().flatten.toSeq === jdk.toSeq)
    } finally inf.end()
  }

  test("a corrupt middle member ends the walk at the last trustworthy boundary") {
    val ms = members(3)
    val warc = Archives.warcFixture(ms)
    val firstLen = Gzip.gzipStored(("WARC/1.0\r\n" +
      "WARC-Type: resource\r\n" +
      s"WARC-Record-ID: <urn:graft:0>\r\n" +
      s"Content-Length: ${ms.head._2.length}\r\n" +
      "\r\n").getBytes("US-ASCII") ++ ms.head._2 ++ "\r\n\r\n".getBytes).length
    val inf = new Inflater(true)
    try {
      // flip a stored-block length byte inside member 1: LEN/NLEN stop
      // agreeing and the inflate rejects — the member after it is
      // unreachable because its offset is unknowable
      val bad = warc.clone()
      bad(firstLen + 12) = (bad(firstLen + 12) ^ 1).toByte
      assert(Archives.gzipMemberAt(bad, firstLen, inf).isEmpty)
      assert(Archives.gzipMemberAt(warc, firstLen, inf).isDefined)
    } finally inf.end()
  }

  test("tgz composition: gzip layer is byte-transparent to the tar walk") {
    val ms = members(4)
    val tgz = Gzip.gzipStored(Archives.tarFixture(ms))
    val back = Gzip.gunzip(tgz).map(Archives.tarMembers).get
    assert(back.map(_._1) === ms.map { case (id, _) => s"doc-$id.txt" })
    assert(back.map(_._3.toSeq) === ms.map(_._2.toSeq))
    // corrupt gzip trailer → whole archive rejected before the tar walk
    val bad = tgz.clone()
    bad(tgz.length - 5) = (bad(tgz.length - 5) ^ 1).toByte
    assert(Gzip.gunzip(bad).isEmpty)
  }

  // ======================= Spark end-to-end =======================

  test("zip/tar/warc explode all round-trip the documents table") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val src = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val zip = Archives.zipExplode(Archives.zipFixtures(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(zip === src)

    val tar = Archives.tarExplode(Archives.tarFixtures(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(tar === src)

    val warc = Archives.warcSplit(Archives.warcFixtures(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(warc === src)
  }
}
