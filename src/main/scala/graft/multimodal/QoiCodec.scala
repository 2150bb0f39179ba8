package graft.multimodal

/** QOI codec ("Quite OK Image format", qoiformat.org, Szablewski 2022
  * — a public one-page spec): 14-byte header (magic `qoif`, BE32
  * width/height, channels 3|4, colorspace 0|1), then a byte stream of
  * six op kinds over a running previous pixel and a 64-entry recently-
  * seen index (`hash = (3r+5g+7b+11a) mod 64`):
  *
  *   - `0xFE` RGB   (3 explicit bytes, alpha carried forward)
  *   - `0xFF` RGBA  (4 explicit bytes)
  *   - `00xxxxxx`   INDEX — replay index slot x
  *   - `01rrggbb`   DIFF  — per-channel delta in [-2,1], bias 2,
  *                  byte-wrapping arithmetic
  *   - `10gggggg`   LUMA  — dg in [-32,31] bias 32; second byte packs
  *                  (dr−dg, db−dg) in [-8,7] bias 8
  *   - `11xxxxxx`   RUN   — repeat previous pixel 1..62 times (bias −1;
  *                  62/63 are the RGB/RGBA tags)
  *
  * plus the 8-byte end marker `00×7 01`. Every decoded pixel is written
  * into the index (idempotent during runs), exactly as the reference
  * decoder does.
  *
  * Same hardening as the sibling codecs ([[TiffCodec]], [[PngCodec]]):
  * every read bounds-checked, the 2^26-sample bomb cap before any
  * allocation, None on any structural violation (bad magic, channels
  * outside 3|4, stream truncation, missing end marker) — route
  * elsewhere, never throw, the engine-wide multimodal contract.
  *
  * The encoder emits the spec's canonical greedy choice (run → index →
  * diff → luma → rgb/rgba), so output is byte-identical to the
  * reference `qoi_encode` for the same pixels — pinned in QoiCodecSpec
  * by hand-assembled byte streams in both directions.
  */
object QoiCodec {

  private val MaxSamples = 1L << 26

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  def decode(bytes: Array[Byte]): Option[PngCodec.Image] = {
    if (bytes == null || bytes.length < 14 + 8) return None
    if (bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' ||
      bytes(3) != 'f') return None
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val w = be32(4)
    val h = be32(8)
    val channels = bytes(12) & 0xff
    val colorspace = bytes(13) & 0xff
    if (w <= 0 || h <= 0 || (channels != 3 && channels != 4) ||
      colorspace > 1) return None
    if (w * h * channels > MaxSamples) return None
    val total = (w * h).toInt
    val px = new Array[Byte](total * channels)
    // index slots start zeroed: (0,0,0,0) per spec
    val idx = new Array[Int](64) // packed 0xRRGGBBAA
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var o = 14
    var p = 0
    val n = bytes.length
    while (p < total) {
      if (o >= n - 8) return None // ran into / past the end marker
      val b0 = bytes(o) & 0xff
      o += 1
      var run = 1
      if (b0 == 0xfe) { // RGB
        if (o + 3 > n - 8) return None
        pr = bytes(o) & 0xff; pg = bytes(o + 1) & 0xff
        pb = bytes(o + 2) & 0xff
        o += 3
      } else if (b0 == 0xff) { // RGBA
        if (o + 4 > n - 8) return None
        pr = bytes(o) & 0xff; pg = bytes(o + 1) & 0xff
        pb = bytes(o + 2) & 0xff; pa = bytes(o + 3) & 0xff
        o += 4
      } else (b0 >> 6) match {
        case 0 => // INDEX
          val v = idx(b0 & 0x3f)
          pr = (v >>> 24) & 0xff; pg = (v >>> 16) & 0xff
          pb = (v >>> 8) & 0xff; pa = v & 0xff
        case 1 => // DIFF, byte-wrapping, bias 2
          pr = (pr + ((b0 >> 4) & 3) - 2) & 0xff
          pg = (pg + ((b0 >> 2) & 3) - 2) & 0xff
          pb = (pb + (b0 & 3) - 2) & 0xff
        case 2 => // LUMA, bias 32 / 8
          if (o + 1 > n - 8) return None
          val dg = (b0 & 0x3f) - 32
          val b1 = bytes(o) & 0xff
          o += 1
          pr = (pr + dg + ((b1 >> 4) & 0xf) - 8) & 0xff
          pg = (pg + dg) & 0xff
          pb = (pb + dg + (b1 & 0xf) - 8) & 0xff
        case _ => // RUN, bias -1
          run = (b0 & 0x3f) + 1
      }
      idx(hash(pr, pg, pb, pa)) =
        (pr << 24) | (pg << 16) | (pb << 8) | pa
      var k = 0
      while (k < run && p < total) {
        val base = p * channels
        px(base) = pr.toByte
        px(base + 1) = pg.toByte
        px(base + 2) = pb.toByte
        if (channels == 4) px(base + 3) = pa.toByte
        p += 1
        k += 1
      }
      if (k < run) return None // run overshot the pixel count
    }
    // end marker: exactly 00×7 01 at the current offset
    if (o + 8 != n) return None
    var m = 0
    while (m < 7) { if (bytes(o + m) != 0) return None; m += 1 }
    if (bytes(o + 7) != 1) return None
    Some(PngCodec.Image(w.toInt, h.toInt, channels, px))
  }

  /** Spec-canonical greedy encode (run → index → diff → luma →
    * rgb/rgba); 3- or 4-channel input. */
  def encode(img: PngCodec.Image): Array[Byte] = {
    require(img.channels == 3 || img.channels == 4,
      s"QOI supports 3 or 4 channels (got ${img.channels})")
    require(img.pixels.length == img.width * img.height * img.channels,
      "pixel buffer does not match geometry")
    val out = new java.io.ByteArrayOutputStream(
      14 + img.pixels.length + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(img.width); be32(img.height)
    out.write(img.channels); out.write(0) // sRGB colorspace
    val idx = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    val total = img.width * img.height
    var p = 0
    while (p < total) {
      val base = p * img.channels
      val r = img.pixels(base) & 0xff
      val g = img.pixels(base + 1) & 0xff
      val b = img.pixels(base + 2) & 0xff
      val a = if (img.channels == 4) img.pixels(base + 3) & 0xff else pa
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hi = hash(r, g, b, a)
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        if (idx(hi) == packed) out.write(hi)
        else {
          idx(hi) = packed
          if (a == pa) {
            // byte-wrapping signed deltas
            val dr = ((r - pr).toByte).toInt
            val dg = ((g - pg).toByte).toInt
            val db = ((b - pb).toByte).toInt
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
              db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) |
                (db + 2))
            else {
              val drg = ((dr - dg).toByte).toInt
              val dbg = ((db - dg).toByte).toInt
              if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                dbg >= -8 && dbg <= 7) {
                out.write(0x80 | (dg + 32))
                out.write(((drg + 8) << 4) | (dbg + 8))
              } else {
                out.write(0xfe); out.write(r); out.write(g); out.write(b)
              }
            }
          } else {
            out.write(0xff); out.write(r); out.write(g); out.write(b)
            out.write(a)
          }
        }
        pr = r; pg = g; pb = b; pa = a
      }
      p += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    var m = 0
    while (m < 7) { out.write(0); m += 1 }
    out.write(1)
    out.toByteArray
  }
}
