package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Mp4 box walk: all three size encodings, v0/v1 mvhd, rejection. */
class Mp4Spec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("fixtures parse back to their generating arithmetic") {
    for (id <- 0L until 30L) {
      val i = Mp4.parse(Multimodal.mp4Fixture(id))
        .getOrElse(fail(s"fixture $id did not parse"))
      assert(i.brand === "isom")
      assert(i.timescale === 1000L * (id % 5 + 1))
      assert(i.duration === (id * 37) % 100000)
      assert(i.nTracks === (id % 3 + 1).toInt)
      assert(i.durationMs === i.duration * 1000 / i.timescale)
    }
  }

  test("version-1 mvhd (64-bit times) parses per spec") {
    // minimal file: ftyp + moov(mvhd v1)
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("mp42") ++ be32(0)
    val mvhdData = be32(0x01000000L) /* v1 */ ++
      Array.fill(16)(0.toByte) /* creation+modification, 8+8 */ ++
      be32(90000) /* timescale */ ++
      be32(0) ++ be32(123456789L) /* duration hi/lo */ ++
      new Array[Byte](80)
    val mvhd = be32(8L + mvhdData.length) ++ cc("mvhd") ++ mvhdData
    val moov = be32(8L + mvhd.length) ++ cc("moov") ++ mvhd
    val i = Mp4.parse(ftyp ++ moov).get
    assert(i.brand === "mp42")
    assert(i.timescale === 90000L)
    assert(i.duration === 123456789L)
    assert(i.nTracks === 0)
    assert(i.durationMs === 123456789L * 1000 / 90000)
  }

  test("malformed boxes reject: overrun size, missing moov, non-ftyp start") {
    val good = Multimodal.mp4Fixture(1L)
    // declared moov size overruns the buffer
    val overrun = good.clone()
    val moovOff = 24
    overrun(moovOff) = 0x7f // size high byte → way past end
    assert(Mp4.parse(overrun).isEmpty)
    // ftyp alone (no moov → no timescale)
    assert(Mp4.parse(good.take(24)).isEmpty)
    // plain bytes
    assert(Mp4.parse("not a container at all......".getBytes).isEmpty)
    assert(Mp4.parse(Array.empty[Byte]).isEmpty)
  }

  test("sample-table fixtures parse back to their generating arithmetic") {
    for (id <- 0L until 30L) {
      val t = Mp4.parseSamples(Multimodal.mp4SampleFixture(id))
        .getOrElse(fail(s"sample fixture $id did not parse"))
      val n = (id % 50 + 10).toInt
      val d1 = (id % 5 + 1) * 100
      assert(t.codec === "avc1")
      assert(t.mediaTimescale === 1000L * (id % 4 + 1))
      assert(t.sampleCount === n.toLong)
      assert(t.runs === Vector((n / 2.toLong, d1), (n - n / 2.toLong, d1 + 40)))
      if (id % 4 == 0) {
        assert(t.uniformSize === id % 200 + 100)
        assert(t.sizeOf(n - 1) === id % 200 + 100)
      } else {
        assert(t.uniformSize === 0L)
        assert(t.sizeOf(3) === (id * 13 + 21) % 991 + 1)
      }
      // dts prefix-sum across the run boundary
      assert(t.dtsOf(0) === 0L)
      assert(t.dtsOf(n / 2 + 1) === (n / 2) * d1 + (d1 + 40))
      // the parse-level walk still reads the movie header of this layout
      val i = Mp4.parse(Multimodal.mp4SampleFixture(id)).get
      assert(i.nTracks === 1 && i.timescale === t.mediaTimescale)
    }
  }

  test("golden hand-built stbl parses; truncated sample tables reject") {
    def fullBox(typ: String, data: Array[Byte]): Array[Byte] =
      be32(12L + data.length) ++ cc(typ) ++ be32(0) ++ data
    def box(typ: String, data: Array[Byte]): Array[Byte] =
      be32(8L + data.length) ++ cc(typ) ++ data
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("mp42") ++ be32(0)
    val mvhdData = be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++
      new Array[Byte](80)
    val mdhdData = be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++ be32(0)
    def stbl(sttsData: Array[Byte], stszData: Array[Byte]): Array[Byte] = {
      val entry = box("hvc1", new Array[Byte](8))
      box("stbl", fullBox("stsd", be32(1) ++ entry) ++
        fullBox("stts", sttsData) ++ fullBox("stsz", stszData))
    }
    def clip(sttsData: Array[Byte], stszData: Array[Byte]): Array[Byte] = {
      val mdia = box("mdia", (be32(32) ++ cc("mdhd") ++ be32(0) ++ mdhdData)
        ++ box("minf", stbl(sttsData, stszData)))
      ftyp ++ box("moov",
        (be32(108) ++ cc("mvhd") ++ be32(0) ++ mvhdData) ++ box("trak", mdia))
    }
    // 3 samples: runs (2×300, 1×600); sizes 10/20/30
    val good = clip(be32(2) ++ be32(2) ++ be32(300) ++ be32(1) ++ be32(600),
      be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30))
    val t = Mp4.parseSamples(good).getOrElse(fail("golden clip rejected"))
    assert(t.codec === "hvc1" && t.mediaTimescale === 600L)
    assert(t.dtsOf(2) === 600L && t.sizeOf(2) === 30L)
    // stts declares more entries than its box holds → reject
    assert(Mp4.parseSamples(clip(
      be32(9) ++ be32(2) ++ be32(300) ++ be32(1) ++ be32(600),
      be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30))).isEmpty)
    // stsz count disagrees with stts coverage → reject
    assert(Mp4.parseSamples(clip(
      be32(1) ++ be32(2) ++ be32(300),
      be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30))).isEmpty)
    // per-sample stsz table truncated → reject
    assert(Mp4.parseSamples(clip(
      be32(2) ++ be32(2) ++ be32(300) ++ be32(1) ++ be32(600),
      be32(0) ++ be32(9))).isEmpty)
  }

  test("mp4Meta surfaces null fields for undecodable payloads") {
    // direct function check without a Spark job: the Dataset op is a thin
    // mapPartitions over Mp4.parse, exercised end-to-end by q_mp4_meta
    assert(Mp4.parse(Multimodal.MediaFixtures.payload(0L)).isEmpty) // a PNG
  }
}
