package graft.multimodal

import graft.SparkSpec

/** QOI codec: hand-assembled streams both directions, wrap-around
  * arithmetic, op coverage, hardening. */
class QoiCodecSpec extends SparkSpec {

  private def header(w: Int, h: Int, ch: Int): Array[Byte] =
    "qoif".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte, ch.toByte, 0)

  private val Marker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  test("hand-assembled stream decodes: RGB, RUN, DIFF, INDEX") {
    // 2x2 RGB: (10,20,30), run-repeat, +1+1+1 diff, index replay
    // hash(10,20,30,255) = (30+100+210+2805) % 64 = 9
    val bytes = header(2, 2, 3) ++
      Array[Byte](0xfe.toByte, 10, 20, 30) ++ // RGB
      Array[Byte](0xc0.toByte) ++ // RUN 1
      Array[Byte](0x7f.toByte) ++ // DIFF +1+1+1
      Array[Byte](0x09.toByte) ++ // INDEX slot 9
      Marker
    val img = QoiCodec.decode(bytes).get
    assert((img.width, img.height, img.channels) === (2, 2, 3))
    assert(img.pixels.map(_ & 0xff).toSeq === Seq(
      10, 20, 30, 10, 20, 30, 11, 21, 31, 10, 20, 30))
  }

  test("encode emits the spec-canonical greedy ops for the same image") {
    val px = Array[Int](10, 20, 30, 10, 20, 30, 11, 21, 31, 10, 20, 30)
      .map(_.toByte)
    val got = QoiCodec.encode(PngCodec.Image(2, 2, 3, px))
    val want = header(2, 2, 3) ++
      Array[Byte](0xfe.toByte, 10, 20, 30, 0xc0.toByte, 0x7f.toByte,
        0x09.toByte) ++ Marker
    assert(got.toSeq === want.toSeq)
  }

  test("LUMA op: hand case both directions") {
    // (100,100,100) -> (110,112,113): dg=12, dr-dg=-2, db-dg=1
    val px = Array[Int](100, 100, 100, 110, 112, 113).map(_.toByte)
    val enc = QoiCodec.encode(PngCodec.Image(2, 1, 3, px))
    // first pixel from (0,0,0): dg=100 -> RGB op; second: LUMA
    val body = enc.slice(14, enc.length - 8)
    assert(body.toSeq === Seq[Byte](0xfe.toByte, 100, 100, 100,
      (0x80 | 44).toByte, ((6 << 4) | 9).toByte))
    assert(QoiCodec.decode(enc).get.pixels.toSeq === px.toSeq)
  }

  test("DIFF wraps modulo 256 in both directions") {
    // start prev (0,0,0): (255,255,255) is diff -1,-1,-1 = 0x55;
    // then (0,0,0) is diff +1,+1,+1 = 0x7f
    val px = Array[Int](255, 255, 255, 0, 0, 0).map(_.toByte)
    val enc = QoiCodec.encode(PngCodec.Image(2, 1, 3, px))
    val body = enc.slice(14, enc.length - 8)
    assert(body.toSeq === Seq[Byte](0x55.toByte, 0x7f.toByte))
    assert(QoiCodec.decode(enc).get.pixels.toSeq === px.toSeq)
  }

  test("RGBA path: alpha changes force the 0xFF op and live in the " +
      "index hash") {
    val px = Array[Int](1, 2, 3, 128, 1, 2, 3, 200).map(_.toByte)
    val enc = QoiCodec.encode(PngCodec.Image(2, 1, 4, px))
    val body = enc.slice(14, enc.length - 8)
    assert(body(0) === 0xff.toByte && body(5) === 0xff.toByte)
    assert(QoiCodec.decode(enc).get.pixels.toSeq === px.toSeq)
  }

  test("round-trip across the fixture corpus; every op kind is " +
      "exercised somewhere") {
    var sawRun, sawIndex, sawDiff, sawLuma, sawRgb, sawRgba = false
    for (id <- 0L until 60L) {
      val bytes = Multimodal.qoiFixture(id)
      val img = QoiCodec.decode(bytes).get
      val w = (id % 8 + 1).toInt
      val h = (id % 6 + 1).toInt
      val ch = (3 + id % 2).toInt
      assert((img.width, img.height, img.channels) === (w, h, ch))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
        val xoff = if (y % 2 == 0) ((x / 2) % 2) * 29L else (x / 2) * 7L
        assert((img.pixels((y * w + x) * ch + c) & 0xff) ===
          ((id * 37 + y * 13 + xoff + c * 5) % 256).toInt,
          s"id $id pixel ($x,$y,$c)")
      }
      assert(QoiCodec.encode(img).toSeq === bytes.toSeq)
      // walk the op stream (tags are unambiguous when walked in order)
      var o = 14
      while (o < bytes.length - 8) {
        val b0 = bytes(o) & 0xff
        o += 1
        if (b0 == 0xfe) { sawRgb = true; o += 3 }
        else if (b0 == 0xff) { sawRgba = true; o += 4 }
        else (b0 >> 6) match {
          case 0 => sawIndex = true
          case 1 => sawDiff = true
          case 2 => sawLuma = true; o += 1
          case _ => sawRun = true
        }
      }
    }
    assert(sawRun && sawIndex && sawDiff && sawLuma && sawRgb && sawRgba,
      s"op coverage: run=$sawRun index=$sawIndex diff=$sawDiff " +
        s"luma=$sawLuma rgb=$sawRgb rgba=$sawRgba")
  }

  test("hardening: bad magic, truncation, missing marker, bomb " +
      "dimensions all return None, never throw") {
    val good = Multimodal.qoiFixture(7L)
    assert(QoiCodec.decode(null) === None)
    assert(QoiCodec.decode(Array[Byte](1, 2, 3)) === None)
    assert(QoiCodec.decode("qoix".getBytes ++ good.drop(4)) === None)
    assert(QoiCodec.decode(good.dropRight(1)) === None) // marker cut
    assert(QoiCodec.decode(good.dropRight(9)) === None) // stream cut
    val bomb = "qoif".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 0, 0, 0, 1, 0, 0, 4, 0) ++ Marker // 65536^2
    assert(QoiCodec.decode(bomb) === None)
    // run overshooting the pixel count is a structural violation
    val overshoot = header(1, 1, 3) ++
      Array[Byte](0xc1.toByte) ++ Marker // RUN 2 into a 1-pixel image
    assert(QoiCodec.decode(overshoot) === None)
  }

  test("ImageCodecs routes qoi by magic") {
    assert(ImageCodecs.sniff(Multimodal.qoiFixture(3L)) === "qoi")
  }
}
