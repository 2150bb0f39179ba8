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
