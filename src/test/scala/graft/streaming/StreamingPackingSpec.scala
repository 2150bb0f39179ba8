package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Incremental per-source sequence packing (streaming counterpart of the
  * batch two-phase prefix sum in graft.operators.Packing). */
class StreamingPackingSpec extends SparkSpec {

  test("offsets are contiguous per source and survive across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val q = StreamingPacking.packStream(
      in.toDF().toDF("source", "doc_id", "text"), packSize = 5)
      .writeStream.format("memory").queryName("pk_stream")
      .outputMode("append").start()
    try {
      in.addData(("a", 1L, "w1 w2 w3"), ("a", 2L, "w1 w2 w3 w4"),
        ("b", 10L, "x1 x2"))
      q.processAllAvailable()
      in.addData(("a", 3L, "w1 w2"), ("b", 11L, "x1 x2 x3 x4 x5 x6"))
      q.processAllAvailable()

      val got = spark.table("pk_stream").as[PackedDoc].collect()
        .map(p => (p.source, p.doc_id) -> p).toMap
      // source a: 3 + 4 + 2 tokens, offsets 0, 3, 7 — batch boundary at 7
      assert(got(("a", 1L)).offset === 0L)
      assert(got(("a", 2L)).offset === 3L)
      assert(got(("a", 3L)).offset === 7L) // continued from checkpointed state
      // source b independent: 0 then 2
      assert(got(("b", 10L)).offset === 0L)
      assert(got(("b", 11L)).offset === 2L)
      // pack ranges: packSize 5 → doc (a,2) spans packs 0..1
      assert(got(("a", 2L)).first_pack === 0L && got(("a", 2L)).last_pack === 1L)
      assert(got(("a", 3L)).first_pack === 1L && got(("a", 3L)).last_pack === 1L)
      assert(got(("b", 11L)).first_pack === 0L && got(("b", 11L)).last_pack === 1L)
      // invariant: within a source, every offset equals the sum of the
      // tokens processed before it (contiguous, no gaps or overlaps)
      for (src <- Seq("a", "b")) {
        val docs = got.values.filter(_.source == src).toSeq.sortBy(_.offset)
        val cum = docs.scanLeft(0L)(_ + _.n_tokens).init
        assert(docs.map(_.offset) === cum)
      }
    } finally q.stop()
  }
}
