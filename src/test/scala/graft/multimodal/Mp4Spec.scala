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

  test("mp4Meta surfaces null fields for undecodable payloads") {
    // direct function check without a Spark job: the Dataset op is a thin
    // mapPartitions over Mp4.parse, exercised end-to-end by q_mp4_meta
    assert(Mp4.parse(Multimodal.MediaFixtures.payload(0L)).isEmpty) // a PNG
  }
}
