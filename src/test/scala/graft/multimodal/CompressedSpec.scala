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
