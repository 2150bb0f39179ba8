package graft.multimodal

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** GifCodec against three independent references: (1) the fixture
  * arithmetic (palette/index formulas decoded back bit-exactly), (2) the
  * JDK's own ImageIO GIF codec in both directions (their encoder → our
  * decoder, our encoder → their decoder), (3) hand-built hostile streams
  * that must reject, never throw. */
class GifCodecSpec extends AnyFunSuite {

  private def rgbOf(img: PngCodec.Image, x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * img.width + x) * 3
    ((img.pixels(o) & 0xff), (img.pixels(o + 1) & 0xff),
      (img.pixels(o + 2) & 0xff))
  }

  test("fixtures decode back to their generating arithmetic (incl. interlace)") {
    for (id <- 0L until 24L) { // ids 0,5,10,15,20 take the interlaced path
      val img = GifCodec.decode(Multimodal.gifFixture(id))
        .getOrElse(fail(s"fixture $id rejected"))
      val w = (id % 9 + 2).toInt
      val h = (id % 7 + 2).toInt
      assert(img.width === w && img.height === h && img.channels === 3)
      for (y <- 0 until h; x <- 0 until w) {
        val j = (id + x * 3 + y * 5) % 16
        val want = (0 to 2).map(c => ((id * 17 + j * 29 + c * 13) % 256).toInt)
        assert(rgbOf(img, x, y) === ((want(0), want(1), want(2))),
          s"pixel ($x,$y) of fixture $id")
      }
    }
  }

  test("animated fixtures: frame count, GCE delays, per-frame pixels") {
    for (id <- Seq(0L, 1L, 7L, 11L)) {
      val frames = GifCodec.decodeFrames(Multimodal.gifAnimFixture(id))
        .getOrElse(fail(s"anim fixture $id rejected"))
      val nf = (id % 3 + 2).toInt
      assert(frames.size === nf)
      for ((f, fi) <- frames.zipWithIndex) {
        assert(f.delayCs === ((id + fi * 7) % 100 + 1).toInt)
        val j = (id + fi * 11) % 16 // index of pixel (0,0)
        assert((f.pixels(0) & 0xff) === ((id * 17 + j * 29) % 256).toInt)
      }
    }
  }

  test("ImageIO (independent JDK codec) decodes our encoder's stream") {
    for (id <- Seq(2L, 5L, 9L)) { // 5 exercises the interlaced writer
      val bytes = Multimodal.gifFixture(id)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our stream for id $id")
      val ours = GifCodec.decode(bytes).get
      assert(ref.getWidth === ours.width && ref.getHeight === ours.height)
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        val rgb = ref.getRGB(x, y)
        assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ===
          rgbOf(ours, x, y), s"ImageIO disagrees at ($x,$y), id $id")
      }
    }
  }

  test("our decoder reads ImageIO's independently-encoded GIF") {
    val w = 23
    val h = 17
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // few distinct colors so the JDK writer's palette stays lossless
      val v = ((x / 4 + y / 4) % 4) * 80
      img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", out))
    val ours = GifCodec.decode(out.toByteArray)
      .getOrElse(fail("our decoder rejected ImageIO's GIF"))
    assert(ours.width === w && ours.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(rgbOf(ours, x, y) ===
        (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)),
        s"mismatch at ($x,$y)")
    }
  }

  test("LZW survives dictionary growth to 12-bit codes and a clear reset") {
    // 256x64 pseudo-random 16-color frame: >16k pixels of low-repeat
    // data pushes the dictionary past 4096 entries, forcing the encoder's
    // mid-stream CLEAR and the decoder's resynchronization.
    val w = 256
    val h = 64
    var seed = 12345L
    val idx = Array.fill(w * h) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 16).toByte
    }
    val pal = Array.tabulate(48)(i => (i * 5).toByte)
    val bytes = GifCodec.encodeIndexed(w, h, pal, idx, minCode = 4)
    val img = GifCodec.decode(bytes).getOrElse(fail("big frame rejected"))
    for (i <- 0 until w * h) // palette red channel of entry j is j*3*5
      assert((img.pixels(i * 3) & 0xff) === ((idx(i) & 0xff) * 15) % 256)
    // and the independent JDK decoder agrees on a spot-check row
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- 0 until w)
      assert(((ref.getRGB(x, 40) >> 16) & 0xff) === (img.pixels((40 * w + x) * 3) & 0xff))
  }

  test("hostile streams reject (never throw): truncation, bad codes, overruns") {
    val good = Multimodal.gifFixture(3L)
    assert(GifCodec.decode(good.take(good.length - 2)).isEmpty) // no trailer
    assert(GifCodec.decode(good.take(11)).isEmpty)              // mid-header
    assert(GifCodec.decode("GIF89a then garbage".getBytes).isEmpty)
    assert(GifCodec.decode(Array.empty[Byte]).isEmpty)
    assert(GifCodec.decode(null).isEmpty)
    // flip a byte inside the LZW data: either still-decodable noise or a
    // clean None, but never an exception / wrong-size output
    for (off <- good.length - 12 until good.length - 4) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x55).toByte
      GifCodec.decode(bad).foreach { img =>
        assert(img.pixels.length === img.width * img.height * 3)
      }
    }
    // declared IMAGE-DESCRIPTOR dimensions demand more pixels than the
    // stream encodes (descriptor sits after the 13-byte header + 48-byte
    // global color table; width low byte is 5 bytes past the 0x2c)
    val short = good.clone()
    assert((short(61) & 0xff) === 0x2c)
    short(66) = 99
    assert(GifCodec.decode(short).isEmpty)
  }

  test("ImageCodecs routes GIF by magic") {
    assert(ImageCodecs.sniff(Multimodal.gifFixture(1L)) === "gif")
    val inf = new java.util.zip.Inflater()
    try assert(ImageCodecs.decode(Multimodal.gifFixture(1L), inf).isDefined)
    finally inf.end()
  }
}
