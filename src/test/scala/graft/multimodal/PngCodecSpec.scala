package graft.multimodal

import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

/** PngCodec: real zlib + PNG-spec decode, all five filters, encode round
  * trip, integrity rejection. Pure JVM — no Spark session needed. */
class PngCodecSpec extends AnyFunSuite {

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val t = typ.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  private val sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Build a PNG whose IDAT is REAL deflate (java.util.zip.Deflater, best
    * compression) — the decoder must handle genuinely compressed streams,
    * not just the encoder's stored blocks. Optionally split the zlib
    * stream across two IDAT chunks (spec-legal, common in real files). */
  private def buildPng(w: Int, h: Int, ch: Int, filtered: Array[Byte],
      splitIdat: Boolean = false): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_COMPRESSION)
    d.setInput(filtered); d.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val n = d.deflate(buf)
    d.end()
    val z = buf.take(n)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, if (ch == 3) 2 else 6, 0, 0, 0)
    val idat =
      if (!splitIdat) chunk("IDAT", z)
      else chunk("IDAT", z.take(z.length / 2)) ++
        chunk("IDAT", z.drop(z.length / 2))
    sig ++ chunk("IHDR", ihdr) ++ idat ++ chunk("IEND", Array.empty)
  }

  /** Forward-apply a PNG filter (spec §6) to every scanline — the inverse
    * of what decode's unfilter must undo. */
  private def applyFilter(f: Int, px: Array[Byte], w: Int, h: Int,
      ch: Int): Array[Byte] = {
    val stride = w * ch
    val out = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      out(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = px(y * stride + x) & 0xff
        val a = if (x >= ch) px(y * stride + x - ch) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) px((y - 1) * stride + x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    out
  }

  private def testPixels(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch)(i => ((i * 37 + 11) % 256).toByte)

  test("a real libpng file (deflate stream, Sub filter) decodes exactly") {
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
        "+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg==")
    val img = PngCodec.decode(png).get
    assert(img.width === 1 && img.height === 1 && img.channels === 4)
    assert(img.pixels.toSeq === Seq[Byte](0, 0xff.toByte, 0, 0x7f))
  }

  test("every filter type round-trips through a real deflate stream") {
    val (w, h, ch) = (5, 4, 3)
    val px = testPixels(w, h, ch)
    for (f <- 0 to 4) {
      val png = buildPng(w, h, ch, applyFilter(f, px, w, h, ch))
      val img = PngCodec.decode(png)
        .getOrElse(fail(s"filter $f did not decode"))
      assert(img.pixels.toSeq === px.toSeq, s"filter $f")
    }
  }

  test("RGBA decodes with 4 channels; zlib split across two IDAT chunks") {
    val (w, h, ch) = (3, 3, 4)
    val px = testPixels(w, h, ch)
    val png = buildPng(w, h, ch, applyFilter(4, px, w, h, ch), splitIdat = true)
    val img = PngCodec.decode(png).get
    assert(img.channels === 4)
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("encode → decode round trip, including rows past one stored block") {
    // 700x32 RGB: filtered bytes = 32*(1+2100) > 65535 forces the
    // encoder's multi-block stored path
    val (w, h, ch) = (700, 32, 3)
    val px = testPixels(w, h, ch)
    val png = PngCodec.encode(PngCodec.Image(w, h, ch, px))
    val img = PngCodec.decode(png).get
    assert(img.width === w && img.height === h && img.channels === ch)
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("corrupt chunk CRC, truncated stream, and exotic shapes reject as None") {
    val px = testPixels(4, 4, 3)
    val good = PngCodec.encode(PngCodec.Image(4, 4, 3, px))
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 1).toByte // IEND crc
    assert(PngCodec.decode(badCrc).isEmpty)
    assert(PngCodec.decode(good.take(good.length - 20)).isEmpty)
    // interlaced flag → unsupported, reject (not garbage pixels)
    val interlaced = good.clone(); interlaced(28) = 1
    assert(PngCodec.decode(interlaced).isEmpty) // (CRC now wrong too — still None)
    // 16-bit depth
    val deep = good.clone(); deep(24) = 16
    assert(PngCodec.decode(deep).isEmpty)
    assert(PngCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("a preset-dictionary (FDICT) zlib stream rejects instead of spinning") {
    // FLG 0x20: FDICT set, (0x78*256 + 0x20) % 31 == 0 so the header is
    // well-formed zlib — Inflater returns 0 needing a dictionary we don't
    // have; decode must reject, not loop forever
    val (w, h, ch) = (2, 2, 3)
    val filtered = applyFilter(0, testPixels(w, h, ch), w, h, ch)
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x20)
    z.write(Array[Byte](1, 2, 3, 4)) // dictionary id
    ByteIo.writeStoredBlocks(z, filtered)
    val adler = new java.util.zip.Adler32
    adler.update(filtered)
    z.write(ByteIo.be32b(adler.getValue), 0, 4)
    val ihdr = ByteIo.be32b(w.toLong) ++ ByteIo.be32b(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++
      chunk("IEND", Array.empty)
    assert(PngCodec.decode(png).isEmpty)
  }

  test("nearest-neighbor resize maps src = floor(dst * srcDim / dstDim)") {
    // 4x2 RGB with pixel value = x*10 + y per channel
    val px = Array.tabulate(4 * 2 * 3) { i =>
      val p = i / 3; (p % 4 * 10 + p / 4).toByte
    }
    val out = PngCodec.resizeNearest(PngCodec.Image(4, 2, 3, px), 2, 1)
    // dst(0,0) → src(0,0) = 0; dst(1,0) → src(2,0) = 20
    assert(out.pixels.toSeq === Seq[Byte](0, 0, 0, 20, 20, 20))
  }

  test("fixture payloads are honest PNGs with the documented pixel fill") {
    for (id <- Seq(0L, 7L, 13L, 499L)) {
      val img = PngCodec.decode(Multimodal.pngFixture(id)).get
      assert(img.width === (id % 8 + 1).toInt)
      assert(img.height === (id % 6 + 1).toInt)
      val w = img.width
      for (y <- 0 until img.height; x <- 0 until w; c <- 0 until 3)
        assert((img.pixels((y * w + x) * 3 + c) & 0xff) ===
          ((id * 31 + y * 7 + x * 3 + c) % 256).toInt)
    }
  }
}
