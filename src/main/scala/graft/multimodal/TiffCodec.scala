package graft.multimodal

/** Baseline TIFF decoder (TIFF 6.0 spec, Adobe 1992): both byte orders
  * ("II" little-endian, "MM" big-endian — the endianness is per-FILE,
  * declared in the header, and every field honors it), a real IFD walk
  * (sorted 12-byte entries: tag, type, count, inline-or-offset value —
  * values are stored INLINE left-justified when their byte size fits in
  * 4, at an absolute offset otherwise, per spec §2), and multi-strip
  * pixel assembly. Scope: uncompressed (Compression=1) 8-bit grayscale
  * (Photometric=1, SamplesPerPixel=1) and RGB (Photometric=2, SPP=3) —
  * the baseline every TIFF writer can emit. Anything else (LZW/packbits,
  * tiles, planar, 16-bit) returns None — route-elsewhere, never throw,
  * the engine-wide multimodal contract.
  *
  * Defaults per spec: RowsPerStrip defaults to "infinite" (one strip),
  * SamplesPerPixel to 1, Compression to 1. StripByteCounts is REQUIRED
  * and must sum to exactly width·height·spp for uncompressed data —
  * enforced, since a mismatch means the strips lie about geometry.
  *
  * Same hardening as the other codecs: every read bounds-checked, the
  * 2^26-pixel bomb cap before any allocation, None on any structural
  * violation.
  */
object TiffCodec {

  private val MaxPixels = 1L << 26

  private def u16(b: Array[Byte], o: Int, le: Boolean): Int =
    if (o < 0 || o + 2 > b.length) -1
    else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u32(b: Array[Byte], o: Int, le: Boolean): Long =
    if (o < 0 || o + 4 > b.length) -1L
    else if (le)
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    else
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def typeSize(t: Int): Int = t match {
    case 1 => 1 // BYTE
    case 3 => 2 // SHORT
    case 4 => 4 // LONG
    case _ => -1
  }

  /** All values of one IFD entry as longs, or null on any violation. */
  private def values(b: Array[Byte], entry: Int, le: Boolean): Array[Long] = {
    val t = u16(b, entry + 2, le)
    val size = typeSize(t)
    if (size < 0) return null
    val count = u32(b, entry + 4, le)
    if (count <= 0 || count > 65536) return null
    val total = size * count
    val base =
      if (total <= 4) entry + 8
      else {
        val off = u32(b, entry + 8, le)
        if (off < 0 || off + total > b.length) return null
        off.toInt
      }
    if (base + total > b.length) return null
    val out = new Array[Long](count.toInt)
    var i = 0
    while (i < out.length) {
      out(i) = size match {
        case 1 => (b(base + i) & 0xffL)
        case 2 => u16(b, base + 2 * i, le).toLong
        case _ => u32(b, base + 4 * i, le)
      }
      if (out(i) < 0) return null
      i += 1
    }
    out
  }

  def decode(b: Array[Byte]): Option[PngCodec.Image] = {
    if (b == null || b.length < 8) return None
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return None
    if (u16(b, 2, le) != 42) return None
    val ifd = u32(b, 4, le)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(b, ifd.toInt, le)
    if (n <= 0 || ifd + 2 + 12L * n + 4 > b.length) return None

    var width, height, spp, photo = -1L
    var comp, rps = -1L
    var bits: Array[Long] = null
    var offs: Array[Long] = null
    var counts: Array[Long] = null
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      val tag = u16(b, e, le)
      tag match {
        case 256 => width = u32OrU16Scalar(b, e, le)
        case 257 => height = u32OrU16Scalar(b, e, le)
        case 258 => bits = values(b, e, le)
        case 259 => comp = u32OrU16Scalar(b, e, le)
        case 262 => photo = u32OrU16Scalar(b, e, le)
        case 273 => offs = values(b, e, le)
        case 277 => spp = u32OrU16Scalar(b, e, le)
        case 278 => rps = u32OrU16Scalar(b, e, le)
        case 279 => counts = values(b, e, le)
        case _ => () // unknown tags are legal; skip
      }
      i += 1
    }
    if (spp < 0) spp = 1 // spec default
    if (comp < 0) comp = 1 // spec default
    if (width <= 0 || height <= 0 || comp != 1) return None
    if (width * height * spp > MaxPixels) return None
    if (!((photo == 1 && spp == 1) || (photo == 2 && spp == 3)))
      return None
    if (bits == null || bits.length != spp || bits.exists(_ != 8L))
      return None
    if (rps <= 0) rps = height // spec default: one strip
    val strips = ((height + rps - 1) / rps).toInt
    if (offs == null || counts == null ||
      offs.length != strips || counts.length != strips) return None
    val total = width * height * spp
    if (counts.sum != total) return None
    val px = new Array[Byte](total.toInt)
    var pos = 0
    var s = 0
    while (s < strips) {
      val off = offs(s)
      val len = counts(s)
      if (off < 0 || len < 0 || off + len > b.length) return None
      System.arraycopy(b, off.toInt, px, pos, len.toInt)
      pos += len.toInt
      s += 1
    }
    Some(PngCodec.Image(width.toInt, height.toInt, spp.toInt, px))
  }

  /** Encode 8-bit gray (1 channel) or RGB (3 channels) pixels as a
    * minimal little-endian baseline TIFF: single strip at offset 8,
    * IFD after the pixel data — readable by this decoder and by any
    * spec-conforming reader (TiffCodecSpec cross-checks ImageIO). */
  def encode(img: PngCodec.Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"TIFF encode supports 1 or 3 channels (got ${img.channels})")
    require(img.pixels.length == img.width * img.height * img.channels,
      "pixel buffer does not match geometry")
    val rgb = img.channels == 3
    def w16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def w32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val dataEnd = 8L + img.pixels.length
    val bitsOff = dataEnd
    val ifdOff = if (rgb) dataEnd + 6 else dataEnd
    def entry(tag: Int, tpe: Int, count: Long, value: Array[Byte]) =
      w16(tag) ++ w16(tpe) ++ w32(count) ++ value
    val shortInline = (v: Int) => w16(v) ++ w16(0)
    val ifd = w16(9) ++
      entry(256, 3, 1, shortInline(img.width)) ++
      entry(257, 3, 1, shortInline(img.height)) ++
      (if (rgb) entry(258, 3, 3, w32(bitsOff))
       else entry(258, 3, 1, shortInline(8))) ++
      entry(259, 3, 1, shortInline(1)) ++
      entry(262, 3, 1, shortInline(if (rgb) 2 else 1)) ++
      entry(273, 4, 1, w32(8L)) ++
      entry(277, 3, 1, shortInline(img.channels)) ++
      entry(278, 3, 1, shortInline(img.height)) ++
      entry(279, 4, 1, w32(img.pixels.length.toLong)) ++
      w32(0L)
    "II".getBytes("US-ASCII") ++ w16(42) ++ w32(ifdOff) ++ img.pixels ++
      (if (rgb) w16(8) ++ w16(8) ++ w16(8) else Array.empty[Byte]) ++
      ifd
  }

  /** Scalar SHORT-or-LONG field (width/height/etc accept both types). */
  private def u32OrU16Scalar(b: Array[Byte], entry: Int,
      le: Boolean): Long = {
    val v = values(b, entry, le)
    if (v == null || v.length != 1) -1L else v(0)
  }
}
