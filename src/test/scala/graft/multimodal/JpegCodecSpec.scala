package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the pure-JVM baseline JPEG codec.
  *
  * Two independent anchors: (1) the exact-basis closed form — fixtures
  * whose coefficients live on {(0,0),(4,0),(0,4),(4,4)} decode to
  * integer pixels computable from first principles, so every stage
  * (Huffman, predictors, dequant, IDCT, upsample, color convert) is
  * pinned bit-for-bit; (2) the JDK's OWN ImageIO JPEG codec (an
  * independent libjpeg-lineage implementation) must agree with ours in
  * both directions — it decodes our encoder's streams, and we decode its
  * (natural-image, 4:2:0, partial-MCU) streams — within the ±couple-LSB
  * window two spec-conformant IDCTs can differ by. */
class JpegCodecSpec extends AnyFunSuite {

  /** Closed-form decoded RGB of Multimodal.jpegFixture (see its doc). */
  private def expectedFixturePixels(docId: Long): Array[Byte] = {
    val md = docId % 2
    def sgn(k: Int): Int = if (k == 0 || k == 3 || k == 4 || k == 7) 1 else -1
    val out = new Array[Byte](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val by = y / 8; val bx = x / 8
      val sx = sgn(x % 8); val sy = sgn(y % 8)
      val yy = 128 + ((docId * 7 + by * 5 + bx * 3) % 48).toInt - 24 +
        sx * (((docId * 11 + by * 7 + bx * 5) % 24).toInt - 12) +
        sy * (((docId * 13 + by * 3 + bx * 7) % 24).toInt - 12) +
        sx * sy * (((docId * 5 + by * 11 + bx * 13) % 16).toInt - 8)
      val cby = if (md == 0) by else 0
      val cbx = if (md == 0) bx else 0
      val cbd = 2 * (((docId * 3 + cby * 2 + cbx) % 20).toInt - 10)
      val crd = 2 * (((docId * 9 + cby + cbx * 2) % 20).toInt - 10)
      val r = yy + ((JpegCodec.FixRCr * crd + 32768) >> 16)
      val g = yy - ((JpegCodec.FixGCb * cbd + JpegCodec.FixGCr * crd + 32768) >> 16)
      val b = yy + ((JpegCodec.FixBCb * cbd + 32768) >> 16)
      val o = (y * 16 + x) * 3
      out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
    }
    out
  }

  test("fixture decode is EXACT against the closed form (4:4:4, 4:2:0, RSTn)") {
    // ids cover: even=4:4:4 / odd=4:2:0, and id%3==0 adds restart markers
    for (id <- 0L until 24L) {
      val img = JpegCodec.decode(Multimodal.jpegFixture(id))
        .getOrElse(fail(s"fixture $id did not decode"))
      assert(img.width === 16 && img.height === 16 && img.channels === 3)
      assert(img.pixels.toSeq === expectedFixturePixels(id).toSeq,
        s"pixel mismatch for fixture $id")
    }
  }

  test("near-fixture decode: RGB == luma exactly (zero chroma), bump shifts one block") {
    val a = JpegCodec.decode(Multimodal.jpegNearFixture(8L)).get // canonical
    val b = JpegCodec.decode(Multimodal.jpegNearFixture(9L)).get // bump 2
    assert(a.width === 72 && a.height === 16)
    for (i <- 0 until a.pixels.length by 3) {
      assert(a.pixels(i) === a.pixels(i + 1)) // R == G
      assert(a.pixels(i) === a.pixels(i + 2)) // R == B
    }
    for (y <- 0 until 16; x <- 0 until 72) {
      val d = (b.pixels((y * 72 + x) * 3) & 0xff) -
        (a.pixels((y * 72 + x) * 3) & 0xff)
      if (y < 8 && x >= 8 && x < 16) assert(d === 2, s"bumped block at ($x,$y)")
      else assert(d === 0, s"untouched block at ($x,$y)")
    }
  }

  test("ImageIO (independent JDK codec) decodes our encoder's stream to the same image") {
    for (id <- Seq(0L, 1L, 3L, 6L, 7L)) { // both modes, with/without RST
      val bytes = Multimodal.jpegFixture(id)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our stream for id $id")
      assert(ref.getWidth === 16 && ref.getHeight === 16)
      val ours = expectedFixturePixels(id)
      var maxDiff = 0
      for (y <- 0 until 16; x <- 0 until 16) {
        val rgb = ref.getRGB(x, y)
        val o = (y * 16 + x) * 3
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - (ours(o) & 0xff)))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - (ours(o + 1) & 0xff)))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - (ours(o + 2) & 0xff)))
      }
      // two spec-conformant IDCT/color-convert pipelines may differ by a
      // couple of LSBs; structural table/layout errors would differ wildly
      assert(maxDiff <= 2, s"ImageIO disagrees by $maxDiff for id $id")
    }
  }

  /** Deterministic "natural" RGB content (no Random — reproducible). */
  private def naturalImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((x * 31 + y * 17) ^ (x * y)) & 0xff
      val g = (x * 7 + y * 29) & 0xff
      val b = ((x + 1) * (y + 3)) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def imageIoJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new IIOImage(img, null, null), p)
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("we decode ImageIO-encoded natural images (4:2:0, partial MCUs) like ImageIO does") {
    // 37x23: not multiples of 16 → padded MCUs on both axes
    val src = naturalImage(37, 23)
    val bytes = imageIoJpeg(src, 0.9f)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ours = JpegCodec.decode(bytes)
      .getOrElse(fail("our decoder rejected an ImageIO stream"))
    assert(ours.width === 37 && ours.height === 23 && ours.channels === 3)
    var sumDiff = 0L
    var maxDiff = 0
    for (y <- 0 until 23; x <- 0 until 37) {
      val rgb = ref.getRGB(x, y)
      val o = (y * 37 + x) * 3
      val dr = math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o) & 0xff))
      val dg = math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff))
      val db = math.abs((rgb & 0xff) - (ours.pixels(o + 2) & 0xff))
      sumDiff += dr + dg + db
      maxDiff = math.max(maxDiff, math.max(dr, math.max(dg, db)))
    }
    val meanDiff = sumDiff.toDouble / (37 * 23 * 3)
    assert(maxDiff <= 3, s"max per-channel diff $maxDiff")
    assert(meanDiff <= 1.0, s"mean per-channel diff $meanDiff")
  }

  test("grayscale JPEG decodes with replicated channels") {
    val img = new BufferedImage(20, 12, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 12; x <- 0 until 20) {
      val v = (x * 13 + y * 7) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = imageIoJpeg(img, 0.95f)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ours = JpegCodec.decode(bytes).getOrElse(fail("grayscale rejected"))
    assert(ours.width === 20 && ours.height === 12 && ours.channels === 3)
    var maxDiff = 0
    for (y <- 0 until 12; x <- 0 until 20) {
      val o = (y * 20 + x) * 3
      assert(ours.pixels(o) === ours.pixels(o + 1))
      assert(ours.pixels(o) === ours.pixels(o + 2))
      // compare RAW coded samples (raster): getRGB would route the gray
      // channel through Java2D's gray→sRGB color management
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (ours.pixels(o) & 0xff)))
    }
    assert(maxDiff <= 2, s"grayscale diff $maxDiff")
  }

  test("hostile and malformed payloads are rejected, never thrown") {
    val good = Multimodal.jpegFixture(2L)
    assert(JpegCodec.decode(null) === None)
    assert(JpegCodec.decode(Array.emptyByteArray) === None)
    assert(JpegCodec.decode("notjpeg".getBytes) === None)
    assert(JpegCodec.decode(good.take(good.length - 8)) === None, "truncated scan")
    assert(JpegCodec.decode(good.take(20)) === None, "truncated header")
    // SOF0 → SOF2 on a SEQUENTIAL stream: the scan header's (0,63,0)
    // band is illegal for a progressive DC scan, so this forged frame
    // must be rejected, not misdecoded
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog) === None)
    // hostile dims: patch SOF height/width to 65500x65500 (> pixel cap);
    // the 4-byte patch lands before any entropy data is touched
    val big = good.clone()
    big(sof + 5) = 0xff.toByte; big(sof + 6) = 0xdc.toByte
    big(sof + 7) = 0xff.toByte; big(sof + 8) = 0xdc.toByte
    assert(JpegCodec.decode(big) === None)
    // EOI immediately after SOI: no frame at all
    assert(JpegCodec.decode(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
  }

  // ----------------------------------------------- progressive (SOF2)

  test("progressive fixture decodes EXACTLY like its sequential twin (both modes)") {
    // progressive transmission is a lossless rearrangement of the same
    // quantized coefficients: pixels must equal the sequential closed
    // form bit-for-bit, through DC SA, AC spectral bands, AC refinement
    for (id <- 0L until 24L) {
      val bytes = Multimodal.jpegProgressiveFixture(id)
      val img = JpegCodec.decode(bytes)
        .getOrElse(fail(s"progressive fixture $id did not decode"))
      assert(img.width === 16 && img.height === 16 && img.channels === 3)
      assert(img.pixels.toSeq === expectedFixturePixels(id).toSeq,
        s"pixel mismatch for progressive fixture $id")
    }
  }

  test("ImageIO (independent JDK codec) decodes our progressive stream to the same image") {
    for (id <- Seq(0L, 1L, 2L, 5L)) { // both subsampling modes
      val bytes = Multimodal.jpegProgressiveFixture(id)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our progressive stream for id $id")
      assert(ref.getWidth === 16 && ref.getHeight === 16)
      val ours = expectedFixturePixels(id)
      var maxDiff = 0
      for (y <- 0 until 16; x <- 0 until 16) {
        val rgb = ref.getRGB(x, y)
        val o = (y * 16 + x) * 3
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - (ours(o) & 0xff)))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - (ours(o + 1) & 0xff)))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - (ours(o + 2) & 0xff)))
      }
      assert(maxDiff <= 2, s"ImageIO disagrees by $maxDiff on progressive id $id")
    }
  }

  private def imageIoProgressiveJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new IIOImage(img, null, null), p)
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("we decode ImageIO progressive-encoded natural images like ImageIO does") {
    // 41x19: partial MCUs on both axes; an independent encoder's scan
    // script (not ours) driving our Annex G scan loop
    val src = naturalImage(41, 19)
    val bytes = imageIoProgressiveJpeg(src, 0.9f)
    // confirm the payload really is SOF2
    val isProg = bytes.indices.exists(i => (bytes(i) & 0xff) == 0xff &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xc2)
    assert(isProg, "ImageIO did not emit a progressive stream")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ours = JpegCodec.decode(bytes)
      .getOrElse(fail("our decoder rejected an ImageIO progressive stream"))
    assert(ours.width === 41 && ours.height === 19 && ours.channels === 3)
    var sumDiff = 0L
    var maxDiff = 0
    for (y <- 0 until 19; x <- 0 until 41) {
      val rgb = ref.getRGB(x, y)
      val o = (y * 41 + x) * 3
      val dr = math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o) & 0xff))
      val dg = math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff))
      val db = math.abs((rgb & 0xff) - (ours.pixels(o + 2) & 0xff))
      sumDiff += dr + dg + db
      maxDiff = math.max(maxDiff, math.max(dr, math.max(dg, db)))
    }
    val meanDiff = sumDiff.toDouble / (41 * 19 * 3)
    assert(maxDiff <= 3, s"max per-channel diff $maxDiff")
    assert(meanDiff <= 1.0, s"mean per-channel diff $meanDiff")
  }

  test("subset-interleaved progressive DC scans (1 <= Ns < Nf) decode exactly") {
    // T.81 B.2.3 allows a DC scan to interleave any distinct subset of
    // the frame's components; the MCU grid stays the FRAME grid. Split
    // the DC first pass {Y,Cb}+{Cr} and the DC refinement {Cb,Cr}+{Y}
    // and the pixels must still equal the sequential closed form.
    // (4:4:4 geometry: the single-component scans' raster equals the MCU
    // walk there, which is what the encoder emits.)
    import JpegCodec.ProgScan
    val subsetScript = Seq(
      ProgScan(Seq(0, 1), 0, 0, 0, 1), // DC first, {Y, Cb} only
      ProgScan(Seq(2), 0, 0, 0, 1),    // DC first, {Cr} alone
      ProgScan(Seq(0), 1, 63, 0, 1),
      ProgScan(Seq(1), 1, 63, 0, 0),
      ProgScan(Seq(2), 1, 63, 0, 0),
      ProgScan(Seq(1, 2), 0, 0, 1, 0), // DC refinement, {Cb, Cr}
      ProgScan(Seq(0), 0, 0, 1, 0),    // DC refinement, {Y} alone
      ProgScan(Seq(0), 1, 63, 1, 0))
    val q8 = Array.fill(64)(8)
    val q16 = Array.fill(64)(16)
    for (id <- Seq(0L, 2L, 6L, 12L)) { // even ids: 4:4:4 fixtures
      val bytes = JpegCodec.encodeProgressive(16, 16, mode420 = false,
        q8, q16, Multimodal.jpegFixtureBlock(id), subsetScript)
      val img = JpegCodec.decode(bytes)
        .getOrElse(fail(s"subset-interleaved DC stream $id did not decode"))
      assert(img.pixels.toSeq === expectedFixturePixels(id).toSeq,
        s"pixel mismatch for subset-interleaved DC fixture $id")
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected subset-DC stream $id")
    }
    // a DC scan naming the same component twice violates B.2.3: reject
    val dup = JpegCodec.encodeProgressive(16, 16, mode420 = false,
      q8, q16, Multimodal.jpegFixtureBlock(0L),
      Seq(ProgScan(Seq(0, 0), 0, 0, 0, 1)) ++ subsetScript.drop(2))
    assert(JpegCodec.decode(dup) === None)
  }

  test("hostile progressive payloads are rejected, never thrown") {
    val good = Multimodal.jpegProgressiveFixture(4L)
    assert(JpegCodec.decode(good).isDefined)
    // truncated mid-scan
    assert(JpegCodec.decode(good.take(good.length / 2)) === None)
    // EOI with zero scans: SOF2 then EOI directly
    val sof = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      (good(i + 1) & 0xff) == 0xc2).get
    val sofLen = ((good(sof + 2) & 0xff) << 8) | (good(sof + 3) & 0xff)
    val noScan = good.take(sof + 2 + sofLen) ++ Array(0xff, 0xd9).map(_.toByte)
    assert(JpegCodec.decode(noScan) === None)
    // oversized progressive dims (within the sequential cap, above the
    // tighter progressive cap): 5000x4000 = 2e7 > 2^24 must be rejected
    val big = good.clone()
    big(sof + 5) = ((4000 >> 8) & 0xff).toByte; big(sof + 6) = (4000 & 0xff).toByte
    big(sof + 7) = ((5000 >> 8) & 0xff).toByte; big(sof + 8) = (5000 & 0xff).toByte
    assert(JpegCodec.decode(big) === None)
  }
}
