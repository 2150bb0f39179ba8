package graft.multimodal

/** GIF87a/89a codec (CompuServe/W3C specification, public) — the last
  * image format in the real-decoder family (PNG: [[PngCodec]], JPEG:
  * [[JpegCodec]]).
  *
  * Decode: logical screen descriptor, global/local color tables, the
  * block walk (extensions skipped by their sub-block structure, Graphics
  * Control Extension read for frame delays), and real LZW decompression
  * of the indexed image data — variable-width codes packed LSB-first,
  * clear/EOI handling, the 12-bit dictionary cap with deferred-clear
  * tolerance, and the KwKwK corner case. Interlaced frames (the four-pass
  * 8/8/4/2 row weave, spec appendix E) are de-woven to scan order.
  * Multi-frame (animated) streams decode to one [[Frame]] per image
  * descriptor with its GCE delay. Malformed input — truncated sub-blocks,
  * code overflow, palette-escaping indices, pixel-count mismatch —
  * returns None: route-elsewhere, never throw, same contract as the other
  * decoders. Decoded size is bounded before allocation (2^26 pixels,
  * mirroring [[PngCodec]]).
  *
  * Encode: legal GIF89a streams from an indexed frame — real LZW with
  * the one-entry-offset code-width bump the decoder mirrors, dictionary
  * reset via CLEAR at 4096, 255-byte sub-block packing, optional
  * interlaced row order, and NETSCAPE2.0 loop + per-frame GCE delays for
  * animations. Encoded fixtures are decodable by any GIF reader (the
  * spec cross-checks both directions against the JDK's independent
  * ImageIO codec).
  */
object GifCodec {

  /** One decoded frame: placement on the logical screen, GCE delay in
    * centiseconds (0 when absent), packed RGB pixels. */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, pixels: Array[Byte])

  private val MaxPixels = 1 << 26
  private val MaxCodes = 4096

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** First frame as a packed-RGB image (the [[ImageCodecs]] entry). */
  def decode(b: Array[Byte]): Option[PngCodec.Image] =
    decodeFrames(b).flatMap(_.headOption)
      .map(f => PngCodec.Image(f.width, f.height, 3, f.pixels))

  /** All frames of a (possibly animated) GIF, in stream order. */
  def decodeFrames(b: Array[Byte]): Option[Vector[Frame]] = {
    if (b == null || b.length < 14) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val packed = b(10) & 0xff
    var o = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (o + 3 * n > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, o, o + 3 * n)
      o += 3 * n
    }
    var delay = 0
    val frames = Vector.newBuilder[Frame]
    var count = 0
    while (o < b.length) {
      (b(o) & 0xff) match {
        case 0x3b => // trailer
          return if (count == 0) None else Some(frames.result())
        case 0x21 => // extension: label + sub-blocks
          if (o + 2 > b.length) return None
          val label = b(o + 1) & 0xff
          o += 2
          if (label == 0xf9 && o + 5 <= b.length && (b(o) & 0xff) == 4)
            delay = le16(b, o + 2) // GCE delay, centiseconds
          var done = false
          while (!done) {
            if (o >= b.length) return None
            val n = b(o) & 0xff
            if (o + 1 + n > b.length) return None
            o += 1 + n
            if (n == 0) done = true
          }
        case 0x2c => // image descriptor
          if (o + 10 > b.length) return None
          val left = le16(b, o + 1)
          val top = le16(b, o + 3)
          val w = le16(b, o + 5)
          val h = le16(b, o + 7)
          val ip = b(o + 9) & 0xff
          o += 10
          var pal = gct
          if ((ip & 0x80) != 0) { // local color table wins
            val n = 2 << (ip & 7)
            if (o + 3 * n > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, o, o + 3 * n)
            o += 3 * n
          }
          if (pal == null || w <= 0 || h <= 0 ||
            w.toLong * h > MaxPixels) return None
          if (o >= b.length) return None
          val minCode = b(o) & 0xff
          o += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (o >= b.length) return None
            val n = b(o) & 0xff
            if (o + 1 + n > b.length) return None
            data.write(b, o + 1, n)
            o += 1 + n
            if (n == 0) done = true
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h) match {
            case Some(v) => v
            case None => return None
          }
          val rows = if ((ip & 0x40) != 0) deinterlace(idx, w, h) else idx
          val px = new Array[Byte](w * h * 3)
          val npal = pal.length / 3
          var i = 0
          while (i < w * h) {
            val pi = rows(i) & 0xff
            if (pi >= npal) return None
            px(i * 3) = pal(pi * 3)
            px(i * 3 + 1) = pal(pi * 3 + 1)
            px(i * 3 + 2) = pal(pi * 3 + 2)
            i += 1
          }
          frames += Frame(left, top, w, h, delay, px)
          count += 1
          delay = 0
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** GIF-variant LZW: variable-width codes LSB-first, CLEAR resets the
    * dictionary, EOI must land exactly on `expected` decoded indices. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Byte](MaxCodes)
    val stack = new Array[Byte](MaxCodes)
    val out = new Array[Byte](expected)
    var outN = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitPos = 0L
    val totalBits = data.length.toLong * 8

    def readCode(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val bp = bitPos + i
        if (((data((bp >> 3).toInt) >> (bp & 7).toInt) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    /** Root literal of `code`'s string (walks the prefix chain). */
    def firstOf(code: Int): Int = {
      var c = code
      var guard = 0
      while (c >= clear + 2) {
        c = prefix(c)
        guard += 1
        if (guard > MaxCodes) return -1
      }
      if (c >= clear) -1 else c
    }
    /** Append `code`'s string to the output; -1 on corruption/overflow. */
    def emit(code: Int): Int = {
      var sp = 0
      var c = code
      while (c >= clear + 2) {
        if (sp >= MaxCodes) return -1
        stack(sp) = suffix(c)
        sp += 1
        c = prefix(c)
      }
      if (c >= clear) return -1
      if (outN + 1 + sp > expected) return -1
      out(outN) = c.toByte
      outN += 1
      var i = sp - 1
      while (i >= 0) { out(outN) = stack(i); outN += 1; i -= 1 }
      c
    }

    while (true) {
      val code = readCode()
      if (code < 0 || code >= (1 << codeSize)) return None
      if (code == clear) {
        codeSize = minCode + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        return if (outN == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear || outN >= expected) return None
        out(outN) = code.toByte
        outN += 1
        prev = code
      } else {
        if (code < next) {
          val f = emit(code)
          if (f < 0) return None
          if (next < MaxCodes) {
            prefix(next) = prev
            suffix(next) = f.toByte
            next += 1
          }
        } else if (code == next && next < MaxCodes) {
          // KwKwK: the entry being referenced is the one being defined
          val f = firstOf(prev)
          if (f < 0) return None
          prefix(next) = prev
          suffix(next) = f.toByte
          next += 1
          if (emit(code) < 0) return None
        } else return None
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    None // unreachable
  }

  /** The four-pass interlace weave (spec appendix E) back to scan order. */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    for ((start, step) <- interlacePasses; y <- start until h by step) {
      System.arraycopy(idx, src * w, out, y * w, w)
      src += 1
    }
    out
  }

  private val interlacePasses = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  // ---------------------------------------------------------------- encode

  /** LSB-first bit packer for LZW codes. */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        buf.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { buf.write((acc & 0xff).toInt); acc = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  /** Real LZW compression of an index stream: CLEAR first, dictionary on
    * (prefixCode, byte) pairs, code width bumped one entry AFTER the
    * decoder's bump point (the add timelines are offset by one), CLEAR +
    * reset when the table fills, EOI last. */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bw = new BitWriter
    var codeSize = minCode + 1
    var next = eoi + 1
    var dict = new java.util.HashMap[Integer, Integer]()
    bw.write(clear, codeSize)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i) & 0xff
      if (prev < 0) prev = k
      else {
        val key = Integer.valueOf((prev << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          bw.write(prev, codeSize)
          if (next < MaxCodes) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          } else {
            bw.write(clear, codeSize)
            codeSize = minCode + 1
            next = eoi + 1
            dict = new java.util.HashMap[Integer, Integer]()
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) bw.write(prev, codeSize)
    bw.write(eoi, codeSize)
    bw.finish()
  }

  private def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var o = 0
    while (o < data.length) {
      val n = math.min(255, data.length - o)
      out.write(n)
      out.write(data, o, n)
      o += n
    }
    out.write(0)
    out.toByteArray
  }

  private def header(w: Int, h: Int, palette: Array[Byte],
      minCode: Int): java.io.ByteArrayOutputStream = {
    val nEntries = palette.length / 3
    require(Integer.bitCount(nEntries) == 1 && nEntries >= 4 &&
      nEntries <= 256, s"palette must be a power-of-two size, got $nEntries")
    require(1 << minCode == math.max(4, nEntries),
      s"minCode $minCode does not match palette size $nEntries")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    val sizeBits = 31 - Integer.numberOfLeadingZeros(nEntries) - 1
    out.write(0x80 | sizeBits) // GCT present
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette, 0, palette.length)
    out
  }

  private def imageBlock(w: Int, h: Int, indices: Array[Byte], minCode: Int,
      interlaced: Boolean): Array[Byte] = {
    require(indices.length == w * h, "index count must equal w*h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlaced) 0x40 else 0)
    val rows =
      if (!interlaced) indices
      else {
        val woven = new Array[Byte](indices.length)
        var dst = 0
        for ((start, step) <- interlacePasses; y <- start until h by step) {
          System.arraycopy(indices, y * w, woven, dst * w, w)
          dst += 1
        }
        woven
      }
    out.write(minCode)
    out.write(subBlocks(lzwEncode(rows, minCode)))
    out.toByteArray
  }

  /** Single-frame GIF89a from palette indices. */
  def encodeIndexed(w: Int, h: Int, palette: Array[Byte],
      indices: Array[Byte], minCode: Int,
      interlaced: Boolean = false): Array[Byte] = {
    val out = header(w, h, palette, minCode)
    out.write(imageBlock(w, h, indices, minCode, interlaced))
    out.write(0x3b)
    out.toByteArray
  }

  /** Animated GIF89a: NETSCAPE2.0 infinite loop, one GCE (delay in
    * centiseconds) per frame, all frames full-screen on the global
    * palette. */
  def encodeAnimated(w: Int, h: Int, palette: Array[Byte],
      frames: Seq[(Int, Array[Byte])], minCode: Int): Array[Byte] = {
    require(frames.nonEmpty, "an animation needs at least one frame")
    val out = header(w, h, palette, minCode)
    // application extension: NETSCAPE2.0 loop forever
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); out.write(0); out.write(0); out.write(0)
    for ((delayCs, indices) <- frames) {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // no disposal, no transparency
      out.write(delayCs & 0xff); out.write(delayCs >> 8)
      out.write(0); out.write(0)
      out.write(imageBlock(w, h, indices, minCode, interlaced = false))
    }
    out.write(0x3b)
    out.toByteArray
  }
}
