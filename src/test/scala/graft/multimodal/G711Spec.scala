package graft.multimodal

import graft.SparkSpec

/** G.711 µ-law/A-law expansion + the RIFF-walking decoder. */
class G711Spec extends SparkSpec {

  test("published G.711 anchor values") {
    // µ-law: 0x00 is the negative maximum, 0xFF and 0x7F are the two
    // zeros, 0x80 the positive maximum
    assert(Multimodal.ulawToLinear(0x00) === -32124)
    assert(Multimodal.ulawToLinear(0xFF) === 0)
    assert(Multimodal.ulawToLinear(0x7F) === 0)
    assert(Multimodal.ulawToLinear(0x80) === 32124)
    // A-law: 0x55 is the smallest negative (-8), 0xD5 the smallest
    // positive (+8), 0x2A the negative maximum, 0xAA the positive
    assert(Multimodal.alawToLinear(0x55) === -8)
    assert(Multimodal.alawToLinear(0xD5) === 8)
    assert(Multimodal.alawToLinear(0x2A) === -32256)
    assert(Multimodal.alawToLinear(0xAA) === 32256)
  }

  test("sign bit flips the value exactly; expansion is odd-symmetric " +
      "over all 256 codes") {
    for (c <- 0 until 256) {
      assert(Multimodal.ulawToLinear(c ^ 0x80) ===
        -Multimodal.ulawToLinear(c), s"ulaw code $c")
      assert(Multimodal.alawToLinear(c ^ 0x80) ===
        -Multimodal.alawToLinear(c), s"alaw code $c")
    }
  }

  test("expansion is monotone in the companded domain (each segment " +
      "ladder increases with mantissa and segment)") {
    // positive µ-law codes in DECREASING code order are increasing
    // linear values: 0xFF (0) down to 0x80 (max)
    val u = (0x80 to 0xFF).reverse.map(Multimodal.ulawToLinear)
    assert(u.zip(u.tail).forall { case (a, b) => a < b }, s"ulaw: $u")
    // positive A-law: codes 0x80..0xFF XOR 0x55 reorder within nibble
    // runs; sort decoded values and require all 128 distinct instead
    val a = (0x80 to 0xFF).map(Multimodal.alawToLinear)
    assert(a.distinct.length === 128 && a.forall(_ > 0))
  }

  test("decodeG711 walks the RIFF container and expands every byte; " +
      "non-G.711 WAVs are dropped, never thrown") {
    import spark.implicits._
    val docs = spark.range(6).toDF("doc_id")
    val got = Multimodal.decodeG711(
        Multimodal.g711Fixtures(docs, "doc_id"))
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.length === 6 * 32)
    got.foreach { case (id, codec, sr, idx, pcm) =>
      assert(sr === 8000L)
      assert(codec === (if (id % 2 == 0) "ulaw" else "alaw"))
      val code = ((id * 29 + idx * 11) % 256).toInt
      val want = if (id % 2 == 0) Multimodal.ulawToLinear(code)
        else Multimodal.alawToLinear(code)
      assert(pcm === want.toLong, s"doc $id idx $idx")
    }
    // a PCM16 WAV (tag 1) is not a G.711 payload: dropped
    val pcmIn = Multimodal.audioFixtures(docs, "doc_id")
    assert(Multimodal.decodeG711(pcmIn).count() === 0L)
  }
}
