package graft.multimodal

import java.util.zip.{Deflater, GZIPOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Gzip member framing + the real-decoder contract. */
class GzipSpec extends AnyFunSuite {

  test("stored-mode members decode via the real GZIPInputStream") {
    for (s <- Seq("", "a", "hello gzip éß世界",
        "x" * 200000)) { // > one stored block
      val data = s.getBytes("UTF-8")
      val gz = Gzip.gzipStored(data)
      assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte && gz(2) == 8)
      assert(Gzip.gunzip(gz).map(new String(_, "UTF-8")) === Some(s))
    }
  }

  test("members from a REAL compressor (GZIPOutputStream) also decode") {
    val data = ("the quick brown fox " * 100).getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos) {
      `def`.setLevel(Deflater.BEST_COMPRESSION)
    }
    g.write(data); g.close()
    assert(Gzip.gunzip(bos.toByteArray).map(_.toSeq) === Some(data.toSeq))
  }

  test("a decompression bomb is rejected at the size cap, not inflated into OOM") {
    // ~300 MB of zeros compresses to ~300 KB; decode must stop at
    // MaxDecodedBytes (256 MiB) and return None instead of allocating on
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    val zeros = new Array[Byte](1 << 16)
    for (_ <- 0 until ((300L << 20) >> 16).toInt) g.write(zeros)
    g.close()
    assert(bos.size() < (1 << 21), "bomb fixture should be small compressed")
    assert(Gzip.gunzip(bos.toByteArray).isEmpty)
  }

  test("corrupt trailer CRC, truncation, and foreign bytes reject as None") {
    val gz = Gzip.gzipStored("payload".getBytes("UTF-8"))
    val badCrc = gz.clone()
    badCrc(gz.length - 5) = (badCrc(gz.length - 5) ^ 1).toByte // CRC byte
    assert(Gzip.gunzip(badCrc).isEmpty)
    assert(Gzip.gunzip(gz.take(gz.length - 3)).isEmpty)
    assert(Gzip.gunzip("definitely not gzip".getBytes).isEmpty)
    assert(Gzip.gunzip(Array.empty[Byte]).isEmpty)
  }
}
