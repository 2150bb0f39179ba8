package graft.multimodal

/** A REAL baseline JPEG codec (ITU-T T.81 sequential DCT), pure JVM — no
  * native library and no `javax.imageio` in the hot path. Every stage of
  * the published spec is implemented byte-by-byte:
  *
  * Decode path: marker walk (SOI → APPn/COM skip → DQT 8/16-bit → DHT →
  * DRI → SOF0/SOF1 → SOS) → entropy-coded scan with 0xFF00 byte
  * unstuffing and RSTn restart handling (DC-predictor reset + byte
  * realignment, T.81 §F.2.1.3.1) → canonical Huffman decode built from
  * BITS/HUFFVAL via mincode/maxcode/valptr (Annex F.2.2.3) → DC
  * differential + AC run/size with ZRL and EOB → dezigzag → dequantize →
  * separable 2-D IDCT (Annex A.3.3) → level shift + clamp → chroma
  * upsample by sample replication → YCbCr→RGB in libjpeg-style 16-bit
  * fixed point (FIX(1.40200)=91881 etc — integer-exact, so a SQL oracle
  * can reproduce every output byte).
  *
  * Scope: baseline/extended-sequential Huffman frames (SOF0/SOF1) and
  * PROGRESSIVE Huffman frames (SOF2, T.81 Annex G: spectral selection +
  * successive approximation, DC and AC first/refinement scans, EOB runs,
  * multi-scan coefficient accumulation), 8-bit precision, 1 or 3
  * components, sampling factors 1–2 (4:4:4, 4:2:2, 4:4:0, 4:2:0,
  * grayscale) — what a web corpus actually contains, progressive being
  * the majority layout for large web JPEGs. Arithmetic coding, 12-bit,
  * and hierarchical frames return None (route-elsewhere, never throw:
  * one exotic payload must not kill a 100 TB scan). Hostile-payload
  * guards mirror [[PngCodec]]: pixel-count cap (tighter for progressive,
  * which must buffer every coefficient until EOI), entropy-segment
  * bounds checks, a scan-count cap, no unbounded loops.
  *
  * Encode path is coefficient-level: the caller supplies QUANTIZED DCT
  * coefficients per block and the standard Annex K Huffman tables are
  * used to entropy-code them — a legal baseline JFIF stream decodable by
  * any JPEG reader (JpegCodecSpec cross-checks against the JDK's
  * independent ImageIO decoder). Driving the encoder with sparse
  * coefficients on the {(0,0),(4,0),(0,4),(4,4)} basis makes the IDCT
  * output exact integers (cos((2x+1)·4π/16) = ±√2/2, so every term is
  * F/8), which is what lets q_jpeg_pixels pin the ENTIRE decode path —
  * Huffman, predictors, dequant, IDCT, upsample, color convert — against
  * a from-first-principles DuckDB oracle.
  */
object JpegCodec {

  import PngCodec.Image

  /** Natural index (row*8+col) of each position in zigzag order, T.81
    * Figure A.6. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** C(u)·cos((2x+1)uπ/16), the separable IDCT basis (T.81 A.3.3). */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** YCbCr→RGB fixed-point constants, 65536-scaled (libjpeg convention:
    * FIX(1.40200), FIX(0.34414), FIX(0.71414), FIX(1.77200)). The
    * conversion is R = Y + (91881·Cr' + 32768 >> 16) etc with Cb'/Cr'
    * centered at 0 — exact integer arithmetic, mirrored verbatim by the
    * q_jpeg_pixels oracle. */
  val FixRCr = 91881
  val FixGCb = 22554
  val FixGCr = 46802
  val FixBCb = 116130

  /** Cheap no-stacktrace bail for structural violations; decode() maps it
    * (and anything else non-fatal) to None. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // Annex C canonical code generation + Annex F.2.2.3 decode tables.
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      if (k != vals.length) bail()
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0

    def readBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) bail()
        var by = b(pos) & 0xff
        pos += 1
        if (by == 0xff) {
          if (pos >= b.length) bail()
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed 0xFF data byte
          else bail() // a real marker inside entropy data
        }
        acc = by
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }

    def receive(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (code > t.maxCode(l)) {
        if (l >= 16) bail()
        code = (code << 1) | readBit()
        l += 1
      }
      t.huffVal(t.valPtr(l) + code - t.minCode(l))
    }

    /** Byte-align and consume an expected RSTn marker (restart boundary):
      * discard pad bits, skip 0xFF fill, verify the modulo-8 sequence. */
    def restart(expectMod8: Int): Unit = {
      n = 0
      if (pos + 1 >= b.length) bail()
      while (pos + 2 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) bail()
      val m = b(pos + 1) & 0xff
      if (m != 0xd0 + expectMod8) bail()
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): map the `t` received magnitude bits to the
    * signed coefficient value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable 2-D IDCT (T.81 A.3.3) of one DEQUANTIZED natural-order
    * block, level-shifted and clamped into `plane` at (px0, py0). Shared
    * by the sequential scan loop and progressive EOI reconstruction. */
  private def idct8x8(coeff: Array[Int], tmp: Array[Double],
      plane: Array[Int], pw: Int, py0: Int, px0: Int): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += coeff(v * 8 + u) * CosT(x)(u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += tmp(vv * 8 + x) * CosT(y)(vv); vv += 1 }
        val s = Math.round(0.25 * acc).toInt + 128
        plane((py0 + y) * pw + px0 + x) =
          if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0 // DC huffman table id (from SOS)
    var ta = 0 // AC huffman table id
  }

  /** Decode with no shared state — one call per payload; decoders are
    * cheap (a few small arrays), so no cross-row reuse is needed. */
  def decode(jpeg: Array[Byte]): Option[Image] =
    try decodeImpl(jpeg)
    catch {
      case _: Bail => None
      case scala.util.control.NonFatal(_) => None
    }

  private def decodeImpl(b: Array[Byte]): Option[Image] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None

    val quant = new Array[Array[Int]](4) // zigzag order, as stored in DQT
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var w = 0
    var h = 0
    var comps: Array[Component] = null

    // ---- progressive (SOF2) state: per-component coefficient buffers,
    // zigzag-indexed per block over the MCU-PADDED block grid, filled
    // scan by scan and reconstructed (dequant + IDCT) only at EOI.
    var progressive = false
    var progDone = false
    var progScans = 0
    var pCoef: Array[Array[Int]] = null
    var pMcusX = 0
    var pMcusY = 0
    var pBlocksW: Array[Int] = null // padded grid width (blocks) = mcusX·h
    var pCompBW: Array[Int] = null // real grid width = ceil(compW/8)
    var pCompBH: Array[Int] = null

    def u16(o: Int): Int = {
      if (o + 1 >= b.length) bail()
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }

    /** Decode ONE progressive scan (T.81 G.2) into [[pCoef]]; returns the
      * byte offset just past its entropy data. DC scans are interleaved
      * (all components) or single-component; AC scans are always
      * single-component (spec rule). Coefficient indices are ZIGZAG per
      * block, matching the scan's spectral band [ss,se]. */
    def progScan(scanCis: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
        start: Int): Int = {
      if (ss == 0) { if (se != 0) bail() } // DC scan
      else if (scanCis.length != 1 || se < ss || se > 63) bail()
      if (al > 13 || ah > 14 || (ah != 0 && ah != al + 1)) bail()
      val br = new BitReader(b, start)
      var eobrun = 0
      val pred = new Array[Int](comps.length)
      var rstSeq = 0

      def dcBlock(ci: Int, blockIdx: Int): Unit = {
        val base = blockIdx * 64
        if (ah == 0) {
          val dct = dcTables(comps(ci).td)
          if (dct == null) bail()
          val t = br.decodeHuff(dct)
          if (t > 15) bail()
          pred(ci) += extend(br.receive(t), t)
          pCoef(ci)(base) = pred(ci) << al
        } else if (br.readBit() == 1) pCoef(ci)(base) |= (1 << al)
      }

      def acBlock(ci: Int, blockIdx: Int): Unit = {
        val coef = pCoef(ci)
        val base = blockIdx * 64
        val act = acTables(comps(ci).ta)
        if (act == null) bail()
        if (ah == 0) {
          // first scan for this band: run/size with EOB runs (G.2.2)
          if (eobrun > 0) { eobrun -= 1; return }
          var k = ss
          var open = true
          while (open && k <= se) {
            val rs = br.decodeHuff(act)
            val r = rs >> 4
            val s = rs & 15
            if (s == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
                open = false
              } else k += 16 // ZRL
            } else {
              k += r
              if (k > se) bail()
              coef(base + k) = extend(br.receive(s), s) << al
              k += 1
            }
          }
        } else {
          // refinement (G.1.2.3): newly-significant ±1<<al placements
          // threaded through correction bits of already-nonzero coeffs.
          // `c & p1` tests bit al of the magnitude — valid because every
          // stored value is a multiple of 2^al until this scan refines it.
          val p1 = 1 << al
          def correct(i: Int): Unit = {
            val c = coef(i)
            if (br.readBit() == 1 && (c & p1) == 0)
              coef(i) = if (c >= 0) c + p1 else c - p1
          }
          var k = ss
          if (eobrun == 0) {
            var open = true
            while (open && k <= se) {
              val rs = br.decodeHuff(act)
              var r = rs >> 4
              val s = rs & 15
              var newVal = 0
              if (s == 0) {
                if (r < 15) {
                  eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                  open = false // current block finishes via the EOB path
                } // r == 15: ZRL — skip 16 zero-history positions
              } else {
                if (s != 1) bail() // refinement can only create ±1<<al
                newVal = if (br.readBit() == 1) p1 else -p1
              }
              if (open) {
                var placed = false
                while (!placed && k <= se) {
                  if (coef(base + k) != 0) correct(base + k)
                  else if (r == 0) {
                    if (newVal != 0) coef(base + k) = newVal
                    placed = true
                  } else r -= 1
                  k += 1
                }
                if (!placed && newVal != 0) bail() // run past band end
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              if (coef(base + k) != 0) correct(base + k)
              k += 1
            }
            eobrun -= 1
          }
        }
      }

      def maybeRestart(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart(rstSeq % 8)
          rstSeq += 1
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }

      if (ss == 0 && scanCis.length > 1) {
        // interleaved DC scan over the FRAME MCU grid. T.81 allows any
        // 1 ≤ Ns ≤ Nf subset of components here (B.2.3: components must
        // be distinct, at most 4); the MCU geometry still derives from
        // the frame's max sampling factors — per-component data units
        // per MCU stay Hi×Vi — so a subset scan walks the same grid and
        // simply emits fewer components per MCU.
        if (scanCis.distinct.length != scanCis.length || scanCis.length > 4)
          bail()
        var mcu = 0
        val total = pMcusX * pMcusY
        while (mcu < total) {
          maybeRestart(mcu)
          val my = mcu / pMcusX
          val mx = mcu % pMcusX
          var i = 0
          while (i < scanCis.length) {
            val ci = scanCis(i)
            val ch = if (comps.length == 1) 1 else comps(ci).h
            val cv = if (comps.length == 1) 1 else comps(ci).v
            var bv = 0
            while (bv < cv) {
              var bu = 0
              while (bu < ch) {
                dcBlock(ci, (my * cv + bv) * pBlocksW(ci) + mx * ch + bu)
                bu += 1
              }
              bv += 1
            }
            i += 1
          }
          mcu += 1
        }
      } else {
        // non-interleaved: raster over the component's REAL block grid
        // (ceil(compW/8) × ceil(compH/8)), stored at the padded stride
        val ci = scanCis(0)
        val bw = pCompBW(ci)
        val total = bw * pCompBH(ci)
        var unit = 0
        while (unit < total) {
          maybeRestart(unit)
          val blockIdx = (unit / bw) * pBlocksW(ci) + unit % bw
          if (ss == 0) dcBlock(ci, blockIdx) else acBlock(ci, blockIdx)
          unit += 1
        }
      }
      br.pos
    }

    var o = 2
    var sawSos = false
    var scanStart = -1
    while (!sawSos && !progDone) {
      // marker: any number of 0xFF fill bytes then the code
      if (o >= b.length) bail()
      if ((b(o) & 0xff) != 0xff) bail()
      while (o < b.length && (b(o) & 0xff) == 0xff) o += 1
      if (o >= b.length) bail()
      val marker = b(o) & 0xff
      o += 1
      marker match {
        case 0xd9 => // EOI: terminates a progressive frame, fatal otherwise
          if (progressive && progScans > 0) progDone = true else return None
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
          if (comps != null) bail() // second frame header
          progressive = marker == 0xc2
          val len = u16(o)
          if (o + len > b.length || len < 8) bail()
          val prec = b(o + 2) & 0xff
          h = u16(o + 3)
          w = u16(o + 5)
          val nc = b(o + 7) & 0xff
          // progressive buffers every coefficient of every block until
          // EOI (~12 B/pixel at 4:4:4), so its pixel cap is 4× tighter
          val cap = if (progressive) (1L << 24) else (1L << 26)
          if (prec != 8 || w <= 0 || h <= 0 || w.toLong * h > cap)
            bail()
          if (nc != 1 && nc != 3) bail()
          if (len != 8 + 3 * nc) bail()
          comps = Array.tabulate(nc) { i =>
            val p = o + 8 + 3 * i
            val hv = b(p + 1) & 0xff
            val c = Component(b(p) & 0xff, hv >> 4, hv & 15, b(p + 2) & 0xff)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) bail()
            c
          }
          if (progressive) {
            // effective factors: single-component frames are always
            // non-interleaved, their declared factors don't shape the grid
            val eh = Array.tabulate(nc)(i => if (nc == 1) 1 else comps(i).h)
            val ev = Array.tabulate(nc)(i => if (nc == 1) 1 else comps(i).v)
            val hm = eh.max
            val vm = ev.max
            pMcusX = (w + 8 * hm - 1) / (8 * hm)
            pMcusY = (h + 8 * vm - 1) / (8 * vm)
            pBlocksW = Array.tabulate(nc)(i => pMcusX * eh(i))
            val pBlocksH = Array.tabulate(nc)(i => pMcusY * ev(i))
            pCompBW = Array.tabulate(nc) { i =>
              val compW = (w * eh(i) + hm - 1) / hm
              (compW + 7) / 8
            }
            pCompBH = Array.tabulate(nc) { i =>
              val compH = (h * ev(i) + vm - 1) / vm
              (compH + 7) / 8
            }
            pCoef = Array.tabulate(nc)(i =>
              new Array[Int](pBlocksW(i) * pBlocksH(i) * 64))
          }
          o += len
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
            0xce | 0xcf =>
          return None // lossless / arithmetic / hierarchical: out of scope
        case 0xc4 => // DHT — possibly several tables in one segment
          val len = u16(o)
          if (o + len > b.length) bail()
          var p = o + 2
          while (p < o + len) {
            val tcth = b(p) & 0xff
            val tc = tcth >> 4
            val th = tcth & 15
            if (tc > 1 || th > 3 || p + 17 > o + len) bail()
            val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
            val nv = bits.sum
            if (nv > 256 || p + 17 + nv > o + len) bail()
            val vals = Array.tabulate(nv)(i => b(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + nv
          }
          o += len
        case 0xdb => // DQT — 8-bit (Pq=0) or 16-bit (Pq=1) entries
          val len = u16(o)
          if (o + len > b.length) bail()
          var p = o + 2
          while (p < o + len) {
            val pqtq = b(p) & 0xff
            val pq = pqtq >> 4
            val tq = pqtq & 15
            if (pq > 1 || tq > 3) bail()
            val n = if (pq == 0) 64 else 128
            if (p + 1 + n > o + len) bail()
            quant(tq) = Array.tabulate(64) { i =>
              if (pq == 0) b(p + 1 + i) & 0xff
              else ((b(p + 1 + 2 * i) & 0xff) << 8) | (b(p + 2 + 2 * i) & 0xff)
            }
            p += 1 + n
          }
          o += len
        case 0xdd => // DRI
          val len = u16(o)
          if (len != 4 || o + len > b.length) bail()
          restartInterval = u16(o + 2)
          o += len
        case 0xda => // SOS
          if (comps == null) bail()
          val len = u16(o)
          if (o + len > b.length) bail()
          val ns = b(o + 2) & 0xff
          if (len != 6 + 2 * ns) bail()
          if (!progressive && ns != comps.length) bail()
          if (progressive && (ns < 1 || ns > comps.length)) bail()
          val scanCis = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = b(o + 3 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) bail()
            scanCis(i) = ci
            val c = comps(ci)
            val tdta = b(o + 4 + 2 * i) & 0xff
            c.td = tdta >> 4
            c.ta = tdta & 15
            if (c.td > 3 || c.ta > 3) bail()
            i += 1
          }
          val ss = b(o + 3 + 2 * ns) & 0xff
          val se = b(o + 4 + 2 * ns) & 0xff
          val ahal = b(o + 5 + 2 * ns) & 0xff
          if (!progressive) {
            // spectral selection / approximation must be (0, 63, 0)
            if (ss != 0 || se != 63 || ahal != 0) bail()
            scanStart = o + len
            sawSos = true
          } else {
            progScans += 1
            if (progScans > 64) bail() // hostile many-scan bomb
            o = progScan(scanCis, ss, se, ahal >> 4, ahal & 15, o + len)
          }
        case 0xd8 => bail() // nested SOI
        case m if m >= 0xd0 && m <= 0xd7 => bail() // RST outside a scan
        case 0x01 => () // TEM, standalone
        case _ => // APPn, COM, DNL, anything else with a length: skip
          val len = u16(o)
          if (len < 2 || o + len > b.length) bail()
          o += len
      }
    }

    // ------------------------------------------------------------- scan
    val nc = comps.length
    val hmax = if (nc == 1) 1 else comps.map(_.h).max
    val vmax = if (nc == 1) 1 else comps.map(_.v).max
    // single-component scans are non-interleaved: the MCU is one block
    val (ch_, cv_) =
      if (nc == 1) (Array(1), Array(1))
      else (comps.map(_.h), comps.map(_.v))
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)

    val planeW = Array.tabulate(nc)(i => mcusX * ch_(i) * 8)
    val planeH = Array.tabulate(nc)(i => mcusY * cv_(i) * 8)
    val planes = Array.tabulate(nc)(i => new Array[Int](planeW(i) * planeH(i)))
    comps.foreach { c =>
      if (quant(c.tq) == null) bail()
    }

    val coeff = new Array[Int](64)
    val tmp = new Array[Double](64)

    if (progressive) {
      // ------------------------- progressive reconstruction (at EOI)
      // every scan already accumulated into pCoef (zigzag per block,
      // padded grid — same geometry as planeW/planeH by construction):
      // dequantize with the tables in effect at EOI, dezigzag, IDCT.
      var ci = 0
      while (ci < nc) {
        val qt = quant(comps(ci).tq)
        val coef = pCoef(ci)
        val bwP = planeW(ci) / 8
        val bhP = planeH(ci) / 8
        var bi = 0
        while (bi < bwP * bhP) {
          val base = bi * 64
          var k = 0
          while (k < 64) {
            coeff(Zigzag(k)) = coef(base + k) * qt(k)
            k += 1
          }
          idct8x8(coeff, tmp, planes(ci), planeW(ci),
            (bi / bwP) * 8, (bi % bwP) * 8)
          bi += 1
        }
        ci += 1
      }
    } else {
    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](nc)
    var rstSeq = 0
    var mcu = 0
    val totalMcus = mcusX * mcusY

    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstSeq % 8)
        rstSeq += 1
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val qt = quant(c.tq)
        val dct = dcTables(c.td)
        val act = acTables(c.ta)
        if (dct == null || act == null) bail()
        var bv = 0
        while (bv < cv_(ci)) {
          var bu = 0
          while (bu < ch_(ci)) {
            // ---- entropy-decode one block (T.81 F.2.2) ----
            java.util.Arrays.fill(coeff, 0)
            val t = br.decodeHuff(dct)
            if (t > 15) bail()
            pred(ci) += extend(br.receive(t), t)
            coeff(0) = pred(ci) * qt(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = br.decodeHuff(act)
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL: sixteen zeros
                else open = false // EOB
              } else {
                k += r
                if (k > 63) bail()
                coeff(Zigzag(k)) = extend(br.receive(s), s) * qt(k)
                k += 1
              }
            }
            // ---- separable IDCT (A.3.3) + level shift into the plane ----
            idct8x8(coeff, tmp, planes(ci), planeW(ci),
              (my * cv_(ci) + bv) * 8, (mx * ch_(ci) + bu) * 8)
            bu += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    }

    // -------------------------------------------- upsample + color convert
    // Chroma upsampling: triangle filter (3:1 weights, the "fancy"
    // interpolation every libjpeg-lineage decoder defaults to) for the
    // 2×1 and 2×2 factors real encoders emit; sample replication for
    // exotic factors (which is also what libjpeg does there). A FLAT
    // downsampled plane is a fixed point of the triangle filter, which
    // is why the DC-only-chroma fixtures stay oracle-exact.
    def upsampled(ci: Int): (Array[Int], Int) = {
      val hr = hmax / ch_(ci)
      val vr = vmax / cv_(ci)
      val src = planes(ci)
      val srcW = planeW(ci)
      val dw = (w + hr - 1) / hr // meaningful downsampled region
      val dh = (h + vr - 1) / vr
      if (hr == 1 && vr == 1) (src, srcW)
      else if (hr == 2 && vr == 1) {
        val out = new Array[Int](2 * dw * dh)
        var y = 0
        while (y < dh) {
          val ib = y * srcW
          val ob = y * 2 * dw
          if (dw == 1) { out(ob) = src(ib); out(ob + 1) = src(ib) }
          else {
            out(ob) = src(ib)
            out(ob + 1) = (src(ib) * 3 + src(ib + 1) + 2) >> 2
            var i = 1
            while (i < dw - 1) {
              out(ob + 2 * i) = (src(ib + i) * 3 + src(ib + i - 1) + 1) >> 2
              out(ob + 2 * i + 1) = (src(ib + i) * 3 + src(ib + i + 1) + 2) >> 2
              i += 1
            }
            out(ob + 2 * dw - 2) = (src(ib + dw - 1) * 3 + src(ib + dw - 2) + 1) >> 2
            out(ob + 2 * dw - 1) = src(ib + dw - 1)
          }
          y += 1
        }
        (out, 2 * dw)
      } else if (hr == 2 && vr == 2) {
        val out = new Array[Int](2 * dw * 2 * dh)
        val t = new Array[Int](dw)
        var r = 0
        while (r < dh) {
          var vv = 0
          while (vv < 2) {
            val other = if (vv == 0) math.max(0, r - 1) else math.min(dh - 1, r + 1)
            var i = 0
            while (i < dw) {
              t(i) = src(r * srcW + i) * 3 + src(other * srcW + i)
              i += 1
            }
            val ob = (2 * r + vv) * 2 * dw
            if (dw == 1) {
              out(ob) = (t(0) * 4 + 8) >> 4
              out(ob + 1) = (t(0) * 4 + 7) >> 4
            } else {
              out(ob) = (t(0) * 4 + 8) >> 4
              out(ob + 1) = (t(0) * 3 + t(1) + 7) >> 4
              i = 1
              while (i < dw - 1) {
                out(ob + 2 * i) = (t(i) * 3 + t(i - 1) + 8) >> 4
                out(ob + 2 * i + 1) = (t(i) * 3 + t(i + 1) + 7) >> 4
                i += 1
              }
              out(ob + 2 * dw - 2) = (t(dw - 1) * 3 + t(dw - 2) + 8) >> 4
              out(ob + 2 * dw - 1) = (t(dw - 1) * 4 + 7) >> 4
            }
            vv += 1
          }
          r += 1
        }
        (out, 2 * dw)
      } else {
        // replication for the rare 1×2 / other factors (libjpeg's
        // int_upsample does the same)
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = src((y / vr) * srcW + (x / hr))
            x += 1
          }
          y += 1
        }
        (out, w)
      }
    }

    val out = new Array[Byte](w * h * 3)
    if (nc == 1) {
      val plane = planes(0)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = plane(y * pw + x).toByte
          val o3 = (y * w + x) * 3
          out(o3) = g; out(o3 + 1) = g; out(o3 + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val (py, pwy) = upsampled(0)
      val (pcb, pwcb) = upsampled(1)
      val (pcr, pwcr) = upsampled(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = py(y * pwy + x)
          val cb = pcb(y * pwcb + x) - 128
          val cr = pcr(y * pwcr + x) - 128
          var r = yy + ((FixRCr * cr + 32768) >> 16)
          var g = yy - ((FixGCb * cb + FixGCr * cr + 32768) >> 16)
          var bb = yy + ((FixBCb * cb + 32768) >> 16)
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (bb < 0) bb = 0 else if (bb > 255) bb = 255
          val o3 = (y * w + x) * 3
          out(o3) = r.toByte; out(o3 + 1) = g.toByte; out(o3 + 2) = bb.toByte
          x += 1
        }
        y += 1
      }
    }
    Some(Image(w, h, 3, out))
  }

  // ---------------------------------------------------------------- encode

  /** Standard Annex K Huffman tables (T.81 Tables K.3–K.6), the ones real
    * encoders ship: (BITS, HUFFVAL). */
  private val DcLumaBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromaBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** symbol → (code, length) from canonical BITS/HUFFVAL (Annex C). */
  private def deriveCodes(bits: Array[Int], vals: Array[Int]): Array[Array[Int]] = {
    val codes = Array.fill(256)(null: Array[Int])
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k)) = Array(code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }

  private lazy val DcLumaCodes = deriveCodes(DcLumaBits, DcLumaVals)
  private lazy val DcChromaCodes = deriveCodes(DcChromaBits, DcChromaVals)
  private lazy val AcLumaCodes = deriveCodes(AcLumaBits, AcLumaVals)
  private lazy val AcChromaCodes = deriveCodes(AcChromaBits, AcChromaVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def writeBit(bit: Int): Unit = {
      acc = (acc << 1) | bit
      n += 1
      if (n == 8) {
        out.write(acc)
        if (acc == 0xff) out.write(0x00) // byte stuffing
        acc = 0
        n = 0
      }
    }
    def write(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit((v >> i) & 1); i -= 1 }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = while (n != 0) writeBit(1)
  }

  private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** Entropy-code one block of QUANTIZED coefficients (natural order);
    * returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, coeffs: Array[Int], pred: Int,
      dc: Array[Array[Int]], ac: Array[Array[Int]]): Int = {
    val dcv = coeffs(0)
    val diff = dcv - pred
    val t = bitLen(math.abs(diff))
    val c = dc(t)
    if (c == null) bail()
    bw.write(c(0), c(1))
    if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coeffs(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) {
          val z = ac(0xf0); bw.write(z(0), z(1)); run -= 16
        }
        val s = bitLen(math.abs(v))
        if (s > 10) bail() // baseline AC magnitude cap
        val sym = ac((run << 4) | s)
        if (sym == null) bail()
        bw.write(sym(0), sym(1))
        bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val e = ac(0x00); bw.write(e(0), e(1)) } // EOB
    dcv
  }

  /** Emit a complete baseline JFIF stream for a 3-component YCbCr image
    * from QUANTIZED coefficient blocks.
    *
    * @param w,h           pixel geometry (any size; partial MCUs padded)
    * @param mode420       true → luma 2×2, chroma 1×1 (4:2:0);
    *                      false → all 1×1 (4:4:4)
    * @param quantLuma     64 entries, ZIGZAG order, table id 0
    * @param quantChroma   64 entries, ZIGZAG order, table id 1
    * @param coeffs        (component 0/1/2, blockRow, blockCol) →
    *                      64 QUANTIZED coefficients in NATURAL order;
    *                      block coordinates are in the COMPONENT plane
    *                      (padded to whole MCUs)
    * @param restartInterval MCUs between RSTn markers; 0 = none
    */
  def encode(w: Int, h: Int, mode420: Boolean,
      quantLuma: Array[Int], quantChroma: Array[Int],
      coeffs: (Int, Int, Int) => Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"bad geometry ${w}x$h")
    require(quantLuma.length == 64 && quantChroma.length == 64,
      "quant tables must have 64 zigzag entries")
    val out = new java.io.ByteArrayOutputStream(1024)
    def m(code: Int): Unit = { out.write(0xff); out.write(code) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }

    m(0xd8) // SOI
    // APP0/JFIF 1.1, no thumbnail
    m(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    u16(1); u16(1); out.write(0); out.write(0)
    // DQT ×2
    for ((tq, qt) <- Seq((0, quantLuma), (1, quantChroma))) {
      m(0xdb); u16(2 + 65); out.write(tq)
      qt.foreach(q => out.write(q & 0xff))
    }
    // SOF0
    m(0xc0); u16(8 + 9); out.write(8)
    u16(h); u16(w); out.write(3)
    val lumaHV = if (mode420) 0x22 else 0x11
    out.write(1); out.write(lumaHV); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    // DHT ×4 (standard Annex K)
    for ((tc, th, bits, vals) <- Seq(
        (0, 0, DcLumaBits, DcLumaVals), (1, 0, AcLumaBits, AcLumaVals),
        (0, 1, DcChromaBits, DcChromaVals),
        (1, 1, AcChromaBits, AcChromaVals))) {
      m(0xc4); u16(2 + 17 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) }
    // SOS
    m(0xda); u16(6 + 6); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    val lh = if (mode420) 2 else 1
    val mcusX = (w + 8 * lh - 1) / (8 * lh)
    val mcusY = (h + 8 * lh - 1) / (8 * lh)
    val pred = new Array[Int](3)
    var rstSeq = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        m(0xd0 + rstSeq % 8)
        rstSeq += 1
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      if (mode420) {
        var bv = 0
        while (bv < 2) {
          var bu = 0
          while (bu < 2) {
            pred(0) = encodeBlock(bw, coeffs(0, 2 * my + bv, 2 * mx + bu),
              pred(0), DcLumaCodes, AcLumaCodes)
            bu += 1
          }
          bv += 1
        }
        pred(1) = encodeBlock(bw, coeffs(1, my, mx), pred(1),
          DcChromaCodes, AcChromaCodes)
        pred(2) = encodeBlock(bw, coeffs(2, my, mx), pred(2),
          DcChromaCodes, AcChromaCodes)
      } else {
        pred(0) = encodeBlock(bw, coeffs(0, my, mx), pred(0),
          DcLumaCodes, AcLumaCodes)
        pred(1) = encodeBlock(bw, coeffs(1, my, mx), pred(1),
          DcChromaCodes, AcChromaCodes)
        pred(2) = encodeBlock(bw, coeffs(2, my, mx), pred(2),
          DcChromaCodes, AcChromaCodes)
      }
      mcu += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------- progressive encode

  /** One progressive scan descriptor (T.81 Annex G). DC scans (ss=0,
    * se=0) list the interleaved components; AC scans must name exactly
    * one component (spec rule B.2.3 for progressive). */
  final case class ProgScan(comps: Seq[Int], ss: Int, se: Int,
      ah: Int, al: Int)

  /** The libjpeg-shaped default script: DC first at al=1, luma low band
    * first (fast first paint), chroma, luma high band, then DC + AC
    * successive-approximation refinements — so a stream encoded with it
    * exercises EVERY progressive decode path: interleaved DC first +
    * refinement, AC first scans with EOB runs, and the AC refinement
    * correction-bit algorithm (G.1.2.3). */
  val DefaultProgScript: Seq[ProgScan] = Seq(
    ProgScan(Seq(0, 1, 2), 0, 0, 0, 1),
    ProgScan(Seq(0), 1, 5, 0, 2),
    ProgScan(Seq(2), 1, 63, 0, 1),
    ProgScan(Seq(1), 1, 63, 0, 1),
    ProgScan(Seq(0), 6, 63, 0, 2),
    ProgScan(Seq(0, 1, 2), 0, 0, 1, 0),
    ProgScan(Seq(0), 1, 63, 2, 1),
    ProgScan(Seq(2), 1, 63, 1, 0),
    ProgScan(Seq(1), 1, 63, 1, 0),
    ProgScan(Seq(0), 1, 63, 1, 0))

  /** AC point transform (G.1.2.2): divide, i.e. truncate toward zero —
    * NOT the arithmetic shift DC uses. */
  private def acPT(v: Int, al: Int): Int =
    if (v >= 0) v >> al else -((-v) >> al)

  /** Emit a complete PROGRESSIVE (SOF2) JFIF stream for a 3-component
    * YCbCr image from the same QUANTIZED coefficient blocks [[encode]]
    * takes — progressive transmission is a lossless rearrangement, so a
    * conformant decoder reconstructs pixels IDENTICAL to the sequential
    * stream's (which is what lets the progressive fixtures share the
    * sequential fixtures' first-principles oracle).
    *
    * Scan-by-scan encoding per Annex G: DC first scans code the
    * arithmetic-shifted DC diffs; DC refinements send bit `al` per
    * block; AC first scans code the point-transformed band with EOB;
    * AC refinement scans interleave newly-significant ±1·2^al
    * placements with buffered correction bits for already-nonzero
    * coefficients, flushing ZRLs before any nonzero position exactly as
    * the decoder's G.1.2.3 walk consumes them. Huffman tables are the
    * standard Annex K set (legal for every symbol the script emits). */
  def encodeProgressive(w: Int, h: Int, mode420: Boolean,
      quantLuma: Array[Int], quantChroma: Array[Int],
      coeffs: (Int, Int, Int) => Array[Int],
      script: Seq[ProgScan] = DefaultProgScript): Array[Byte] = {
    require(w > 0 && h > 0, s"bad geometry ${w}x$h")
    require(quantLuma.length == 64 && quantChroma.length == 64,
      "quant tables must have 64 zigzag entries")
    val out = new java.io.ByteArrayOutputStream(1024)
    def m(code: Int): Unit = { out.write(0xff); out.write(code) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }

    m(0xd8) // SOI
    m(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    u16(1); u16(1); out.write(0); out.write(0)
    for ((tq, qt) <- Seq((0, quantLuma), (1, quantChroma))) {
      m(0xdb); u16(2 + 65); out.write(tq)
      qt.foreach(q => out.write(q & 0xff))
    }
    // SOF2 — same payload layout as SOF0, progressive marker
    m(0xc2); u16(8 + 9); out.write(8)
    u16(h); u16(w); out.write(3)
    val lumaHV = if (mode420) 0x22 else 0x11
    out.write(1); out.write(lumaHV); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    for ((tc, th, bits, vals) <- Seq(
        (0, 0, DcLumaBits, DcLumaVals), (1, 0, AcLumaBits, AcLumaVals),
        (0, 1, DcChromaBits, DcChromaVals),
        (1, 1, AcChromaBits, AcChromaVals))) {
      m(0xc4); u16(2 + 17 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }

    // Materialize every block once (progressive visits each block in
    // several scans). Padded MCU grids, matching [[encode]]'s geometry.
    val lh = if (mode420) 2 else 1
    val mcusX = (w + 8 * lh - 1) / (8 * lh)
    val mcusY = (h + 8 * lh - 1) / (8 * lh)
    val blocksW = Array(mcusX * lh, mcusX, mcusX)
    val blocksH = Array(mcusY * lh, mcusY, mcusY)
    val blocks: Array[Array[Array[Int]]] = Array.tabulate(3) { ci =>
      Array.tabulate(blocksW(ci) * blocksH(ci)) { bi =>
        val blk = coeffs(ci, bi / blocksW(ci), bi % blocksW(ci))
        require(blk.length == 64, "coefficient block must have 64 entries")
        blk
      }
    }
    // Non-interleaved AC scans cover the REAL block grid only (padding
    // blocks keep their DC; they are cropped away at decode).
    val compBW = Array.tabulate(3) { ci =>
      val cw = if (ci == 0) w else (w + lh - 1) / lh
      (cw + 7) / 8
    }
    val compBH = Array.tabulate(3) { ci =>
      val chh = if (ci == 0) h else (h + lh - 1) / lh
      (chh + 7) / 8
    }

    for (scan <- script) {
      val ns = scan.comps.length
      require(ns >= 1 && ns <= 3, "scan must name 1-3 components")
      require(scan.ss != 0 || scan.se == 0, "DC scan band must be [0,0]")
      require(scan.ss == 0 || ns == 1, "AC scans are single-component")
      m(0xda); u16(6 + 2 * ns); out.write(ns)
      for (ci <- scan.comps) {
        out.write(ci + 1) // component ids are 1,2,3
        out.write(if (ci == 0) 0x00 else 0x11)
      }
      out.write(scan.ss); out.write(scan.se)
      out.write((scan.ah << 4) | scan.al)

      val bw = new BitWriter(out)
      if (scan.ss == 0) {
        // ---------------- DC scan, interleaved over the MCU grid
        val pred = new Array[Int](3)
        var mcu = 0
        while (mcu < mcusX * mcusY) {
          val my = mcu / mcusX
          val mx = mcu % mcusX
          for (ci <- scan.comps) {
            val ch = if (ci == 0) lh else 1
            var bv = 0
            while (bv < ch) {
              var bu = 0
              while (bu < ch) {
                val blk = blocks(ci)((my * ch + bv) * blocksW(ci) + mx * ch + bu)
                if (scan.ah == 0) {
                  val v = blk(0) >> scan.al // DC PT is the arithmetic shift
                  val diff = v - pred(ci)
                  pred(ci) = v
                  val t = bitLen(math.abs(diff))
                  val c = (if (ci == 0) DcLumaCodes else DcChromaCodes)(t)
                  if (c == null) bail()
                  bw.write(c(0), c(1))
                  if (t > 0)
                    bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
                } else bw.writeBit((blk(0) >> scan.al) & 1)
                bu += 1
              }
              bv += 1
            }
          }
          mcu += 1
        }
      } else {
        // ---------------- AC scan, raster over the real block grid
        val ci = scan.comps.head
        val ac = if (ci == 0) AcLumaCodes else AcChromaCodes
        def sym(s: Int): Unit = { val c = ac(s); if (c == null) bail(); bw.write(c(0), c(1)) }
        val bwG = compBW(ci)
        var unit = 0
        while (unit < bwG * compBH(ci)) {
          val blk = blocks(ci)((unit / bwG) * blocksW(ci) + unit % bwG)
          if (scan.ah == 0) {
            // first scan for the band: run/size over the point transform
            var r = 0
            var k = scan.ss
            while (k <= scan.se) {
              val v = acPT(blk(Zigzag(k)), scan.al)
              if (v == 0) r += 1
              else {
                while (r > 15) { sym(0xf0); r -= 16 }
                val s = bitLen(math.abs(v))
                if (s > 10) bail()
                sym((r << 4) | s)
                bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
                r = 0
              }
              k += 1
            }
            if (r > 0) sym(0x00) // EOB0
          } else {
            // refinement: G.1.2.3 encoder — buffer correction bits of
            // history coefficients, flush after the next symbol, in the
            // exact order the decoder's walk consumes them
            val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
            def flushPending(): Unit = {
              pending.foreach(bw.writeBit)
              pending.clear()
            }
            var r = 0
            var k = scan.ss
            while (k <= scan.se) {
              val v = blk(Zigzag(k))
              val a = math.abs(v) >> scan.al
              if (a == 0) r += 1
              else {
                while (r > 15) { sym(0xf0); flushPending(); r -= 16 }
                if (a > 1) pending += (a & 1) // history: correction bit
                else { // newly significant at this precision
                  sym((r << 4) | 1)
                  bw.writeBit(if (v > 0) 1 else 0)
                  flushPending()
                  r = 0
                }
              }
              k += 1
            }
            if (r > 0 || pending.nonEmpty) { sym(0x00); flushPending() }
          }
          unit += 1
        }
      }
      bw.flush()
    }
    m(0xd9) // EOI
    out.toByteArray
  }
}
