package graft.multimodal

import graft.SparkSpec

/** The zstd/LZ4/Snappy ingestion contract: real reference codecs, but
  * the never-throw + bomb-cap behavior is ours to prove. */
class CompressedSpec extends SparkSpec {

  private val samples = Seq("", "a", "hello zstd éß世界", "x" * 200000)

  test("zstd, lz4, snappy round-trip arbitrary text") {
    for (s <- samples) {
      val data = s.getBytes("UTF-8")
      assert(Compressed.zstdDecompress(Compressed.zstdCompress(data))
        .map(new String(_, "UTF-8")) === Some(s))
      assert(Compressed.lz4Decompress(Compressed.lz4Compress(data))
        .map(new String(_, "UTF-8")) === Some(s))
      assert(Compressed.snappyDecompress(Compressed.snappyCompress(data))
        .map(new String(_, "UTF-8")) === Some(s))
    }
  }

  test("sniff routes by magic and none of the magics collide") {
    val data = "payload".getBytes("UTF-8")
    assert(Compressed.sniff(Compressed.zstdCompress(data)) === "zstd")
    assert(Compressed.sniff(Compressed.lz4Compress(data)) === "lz4")
    assert(Compressed.sniff(Gzip.gzipStored(data)) === "gzip")
    assert(Compressed.sniff(data) === "unknown")
    assert(Compressed.sniff(null) === "unknown")
    assert(Compressed.sniff(Array[Byte](0x28, 0x42)) === "unknown")
  }

  test("hostile payloads reject as None, never throw") {
    val data = ("abc" * 1000).getBytes("UTF-8")
    for ((comp, dec) <- Seq[(Array[Byte], Array[Byte] => Option[Array[Byte]])](
        (Compressed.zstdCompress(data), Compressed.zstdDecompress),
        (Compressed.lz4Compress(data), Compressed.lz4Decompress),
        (Compressed.snappyCompress(data), Compressed.snappyDecompress))) {
      assert(dec(comp.take(comp.length / 2)).isEmpty, "truncation")
      // a mid-stream bit flip must never THROW — these formats don't all
      // checksum content, so None or a differing payload are both legal,
      // an escaped exception (killing a corpus scan) is not
      val corrupt = comp.clone()
      corrupt(comp.length / 2) = (corrupt(comp.length / 2) ^ 0x55).toByte
      dec(corrupt) // must return, not throw
      assert(dec("garbage not compressed".getBytes).isEmpty)
      assert(dec(Array.empty[Byte]).isEmpty)
    }
  }

  test("a zstd decompression bomb stops at the cap, not at OOM") {
    // ~300 MB of zeros → a few hundred KB of zstd; the decode must stop
    // at Gzip.MaxDecodedBytes (256 MiB) via the streaming cap
    val zeros = new Array[Byte](1 << 20)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new com.github.luben.zstd.ZstdOutputStream(bos)
    for (_ <- 0 until 300) out.write(zeros)
    out.close()
    assert(bos.size() < (1 << 21), "bomb fixture should be tiny compressed")
    assert(Compressed.zstdDecompress(bos.toByteArray).isEmpty)
  }

  test("snappy's embedded length field cannot force a giant allocation") {
    // raw snappy prefixes the uncompressed length; forge one past the cap
    val small = Compressed.snappyCompress("tiny".getBytes("UTF-8"))
    val forged = java.util.Arrays.copyOf(small, small.length)
    // varint length: overwrite with ~1 GiB (0x80 0x80 0x80 0x04 = 2^30)
    val big = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x04)
    System.arraycopy(big, 0, forged, 0, math.min(big.length, forged.length))
    assert(Compressed.snappyDecompress(forged).isEmpty)
  }

  test("zstdStoredFrame: every FCS branch and multi-block decode via the real zstd") {
    // 0/255 → 1-byte FCS; 256/65791 → 2-byte; 65792 → 4-byte; 200000
    // additionally spans two raw blocks (128 KiB cap)
    for (n <- Seq(0, 1, 255, 256, 65791, 65792, 200000)) {
      val data = Array.tabulate(n)(i => ((i * 31 + n) % 256).toByte)
      val frame = Compressed.zstdStoredFrame(data)
      assert(Compressed.sniff(frame) === "zstd")
      // the independent reference decoder accepts our frame bytes
      assert(Compressed.zstdDecompress(frame).map(_.toSeq) === Some(data.toSeq),
        s"n=$n")
      // and the reference frame parser agrees on the exact frame length
      assert(com.github.luben.zstd.Zstd.findFrameCompressedSize(frame)
        === frame.length, s"n=$n")
      val fcsLen = if (n < 256) 1 else if (n < 65792) 2 else 4
      val blocks = math.max(1, (n + (1 << 17) - 1) / (1 << 17))
      assert(frame.length === 5 + fcsLen + 3 * blocks + n, s"n=$n")
    }
  }

  test("zstdFrames recovers exact member boundaries; corruption stops the walk") {
    val records = (0 until 4).map(i => s"record $i ${"y" * (i * 300)}".getBytes("UTF-8"))
    val concat = records.map(Compressed.zstdStoredFrame).reduce(_ ++ _)
    val got = Compressed.zstdFrames(concat)
    assert(got.map(_._3.toSeq) === records.map(_.toSeq))
    // boundaries tile the file exactly
    assert(got.map(f => f._1 + f._2).last === concat.length)
    got.sliding(2).foreach { case Vector((o1, l1, _), (o2, _, _)) =>
      assert(o1 + l1 === o2)
    case _ => () }
    // flip a block-header byte of frame 1: walk keeps frame 0 only
    val f0len = Compressed.zstdStoredFrame(records(0)).length
    val bad = concat.clone()
    bad(f0len + 5) = (bad(f0len + 5) ^ 0x7f).toByte
    assert(Compressed.zstdFrames(bad).size <= 1)
    assert(Compressed.zstdFrames(Array.empty[Byte]).isEmpty)
    assert(Compressed.zstdFrames(null).isEmpty)
  }

  test("mixed-codec corpus decodes through routed per-codec scans") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sfDir, "documents")
    for (codec <- Seq("zstd", "lz4", "snappy")) {
      val back = Compressed.decompressTexts(
        Compressed.compressTexts(docs, "doc_id", "text", codec), codec)
      val diff = back.as("b")
        .join(docs.select(col("doc_id"), col("text").as("orig")), "doc_id")
        .where(col("text") =!= col("orig")).count()
      assert(diff === 0, s"$codec roundtrip diverged")
      assert(back.count() === docs.count())
    }
  }
}
