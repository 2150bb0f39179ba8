package graft.multimodal

import java.util.zip.{CRC32, Inflater}

/** A REAL (if deliberately small) PNG codec, pure JVM — no native library:
  * `java.util.zip.Inflater` IS the real zlib decoder, and everything
  * around it (chunk walk, scanline unfiltering, CRC/Adler integrity) is
  * the published PNG/RFC-1950 spec implemented byte-by-byte.
  *
  * Decode path: signature → chunk walk (IHDR first; ALL IDAT chunks
  * concatenated into one zlib stream, as the spec requires; stop at
  * IEND) → inflate → per-scanline unfilter with all five PNG filter
  * types (None / Sub / Up / Average / Paeth, spec §6) → packed
  * row-major pixel bytes.
  *
  * Scope: 8-bit depth, truecolor (color type 2) and truecolor+alpha (6),
  * non-interlaced — the shapes a training-data pipeline actually stores.
  * Everything else returns None (route-elsewhere, never throw: one exotic
  * payload must not kill a 100 TB scan).
  *
  * Encode path emits filter-0 scanlines in STORED-mode zlib blocks (legal
  * zlib, bit-identical across platforms, and reconstructable arithmetic-
  * ally by a SQL oracle) with real CRC32 chunk checksums and a real
  * Adler-32 — decodable by any PNG reader, and by [[decode]] via the same
  * general Inflater path as compressed streams.
  */
object PngCodec {

  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private val Sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decode with a caller-provided Inflater so a `mapPartitions` decoder
    * can reuse one native-buffer context across its whole partition. */
  def decode(png: Array[Byte], inf: Inflater): Option[Image] = {
    if (png == null || png.length < 45) return None // sig+IHDR+empty IDAT+IEND
    var i = 0
    while (i < 8) { if (png(i) != Sig(i)) return None; i += 1 }
    if (ByteIo.be32(png, 8) != 13L || ByteIo.fourCC(png, 12) != "IHDR")
      return None
    val wL = ByteIo.be32(png, 16)
    val hL = ByteIo.be32(png, 20)
    val bitDepth = png(24) & 0xff
    val colorType = png(25) & 0xff
    val interlace = png(28) & 0xff
    if (bitDepth != 8 || (colorType != 2 && colorType != 6) ||
      png(26) != 0 || png(27) != 0 || interlace != 0) return None
    if (wL <= 0 || hL <= 0 || wL * hL > (1 << 26)) return None
    val w = wL.toInt
    val h = hL.toInt
    val ch = if (colorType == 2) 3 else 4

    // chunk walk: concatenate every IDAT payload (one zlib stream split
    // across chunks is the spec-mandated layout for large images). All
    // offset arithmetic in Long: a hostile 0x7fffffff chunk length must
    // fail the bounds check, not wrap Int and slip past it.
    val idat = new java.io.ByteArrayOutputStream()
    var o = 33L
    var sawEnd = false
    while (!sawEnd && o + 8 <= png.length) {
      val len = ByteIo.be32(png, o.toInt)
      val typ = ByteIo.fourCC(png, o.toInt + 4)
      if (o + 12 + len > png.length) return None
      val crc = new CRC32
      crc.update(png, o.toInt + 4, 4 + len.toInt)
      if (crc.getValue != ByteIo.be32(png, o.toInt + 8 + len.toInt)) return None
      if (typ == "IDAT") idat.write(png, o.toInt + 8, len.toInt)
      else if (typ == "IEND") sawEnd = true
      o += 12 + len
    }
    if (!sawEnd || idat.size() == 0) return None

    // Deflate expands at most ~1032:1 (one distance-1 match per bit), so
    // a tiny hostile payload with maximal IHDR dims cannot force the full
    // ~268 MB raw allocation before failing — reject it pre-alloc.
    val rawLen = h.toLong * (1 + w.toLong * ch)
    if (rawLen > idat.size().toLong * 1032L) return None
    val raw = new Array[Byte](rawLen.toInt)
    inf.reset()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // the whole stream was handed over up front, so zero progress
        // without `finished` means truncation, a preset-dictionary
        // (FDICT) stream, or any other stall — reject, never spin
        if (n == 0) return None
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    if (off != raw.length) return None

    // unfilter (PNG spec §6): recon bytes in place into `out`
    val stride = w * ch
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val a = if (x >= ch) out(rowOut + x - ch) & 0xff else 0 // left
        val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0 // up
        val c = if (x >= ch && y > 0) out(rowOut - stride + x - ch) & 0xff
          else 0 // up-left
        val recon = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 =>
            // Paeth predictor, spec §6.6
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, ch, out))
  }

  def decode(png: Array[Byte]): Option[Image] = {
    val inf = new Inflater()
    try decode(png, inf) finally inf.end()
  }

  /** Real PNG bytes for an 8-bit truecolor image: filter-0 scanlines in
    * stored-mode zlib blocks (multi-block when a row span exceeds the
    * 65535-byte stored cap), real Adler-32 and chunk CRC32s. */
  def encode(img: Image): Array[Byte] = {
    require(img.channels == 3 || img.channels == 4,
      s"encode supports 3/4 channels, got ${img.channels}")
    require(img.pixels.length == img.width * img.height * img.channels,
      "pixel buffer does not match the declared geometry")
    val stride = img.width * img.channels
    val filtered = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      filtered(y * (1 + stride)) = 0 // filter type None
      System.arraycopy(img.pixels, y * stride,
        filtered, y * (1 + stride) + 1, stride)
      y += 1
    }
    // zlib wrapper: CMF/FLG 0x78 0x01 (32 KiB window, check bits valid),
    // stored blocks, then Adler-32 of the uncompressed data
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    ByteIo.writeStoredBlocks(z, filtered)
    val adler = new java.util.zip.Adler32
    adler.update(filtered)
    z.write(ByteIo.be32b(adler.getValue), 0, 4)

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new CRC32
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      ByteIo.be32b(data.length.toLong) ++ t ++ data ++ ByteIo.be32b(crc.getValue)
    }
    val colorType: Byte = if (img.channels == 3) 2 else 6
    val ihdr = ByteIo.be32b(img.width.toLong) ++ ByteIo.be32b(img.height.toLong) ++
      Array[Byte](8, colorType, 0, 0, 0)
    Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Nearest-neighbor resize in PIXEL space (not byte-stride space):
    * src index = floor(dst * srcDim / dstDim), the standard NN mapping. */
  def resizeNearest(img: Image, dw: Int, dh: Int): Image = {
    require(dw > 0 && dh > 0, s"target must be positive, got ${dw}x$dh")
    val ch = img.channels
    val out = new Array[Byte](dw * dh * ch)
    var y = 0
    while (y < dh) {
      val sy = (y.toLong * img.height / dh).toInt
      var x = 0
      while (x < dw) {
        val sx = (x.toLong * img.width / dw).toInt
        System.arraycopy(img.pixels, (sy * img.width + sx) * ch,
          out, (y * dw + x) * ch, ch)
        x += 1
      }
      y += 1
    }
    Image(dw, dh, ch, out)
  }
}
