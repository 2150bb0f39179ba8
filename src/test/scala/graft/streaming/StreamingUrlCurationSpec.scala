package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingUrlCuration.{CapDoc, CapVerdict}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming per-domain cap (cross-batch per-domain count state). */
class StreamingUrlCurationSpec extends SparkSpec {

  private val docs = Seq(
    CapDoc(1, "a.com"), CapDoc(2, "b.com"), CapDoc(3, "a.com"),
    CapDoc(4, "a.com"), CapDoc(5, "b.com"), CapDoc(6, "a.com"),
    CapDoc(7, "c.com"))

  test("id-ordered arrival reproduces the batch domain cap row for row") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[CapDoc]
    val q = StreamingUrlCuration.capVerdicts(in.toDS(), maxPerDomain = 2L)
      .writeStream.format("memory").queryName("cap1").outputMode("append")
      .start()
    try {
      in.addData(docs.take(3)); q.processAllAvailable()
      in.addData(docs.slice(3, 5)); q.processAllAvailable()
      in.addData(docs.drop(5)); q.processAllAvailable()
      val streamed = spark.table("cap1").as[CapVerdict].collect()
        .map(v => (v.doc_id, v.registrable, v.rnk, v.kept)).toSet
      // batch truth: rankWithinGroups on (registrable, doc_id)
      val batch = graft.operators.Packing.rankWithinGroups(
          spark.createDataset(docs).toDF(), "registrable", "doc_id")
        .selectExpr("doc_id", "registrable", "CAST(rnk AS LONG) rnk",
          "CAST(rnk <= 2 AS LONG) kept")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (1L, "a.com", 1L, 1L), (3L, "a.com", 2L, 1L),
        (4L, "a.com", 3L, 0L), (6L, "a.com", 4L, 0L),
        (2L, "b.com", 1L, 1L), (5L, "b.com", 2L, 1L),
        (7L, "c.com", 1L, 1L)))
    } finally q.stop()
  }

  test("arbitrary arrival keeps exactly min(cap, n) per domain") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[CapDoc]
    val q = StreamingUrlCuration.capVerdicts(in.toDS(), maxPerDomain = 2L)
      .writeStream.format("memory").queryName("cap2").outputMode("append")
      .start()
    try {
      // reversed arrival: the kept REPRESENTATIVES differ from batch
      // (arrival rank, by contract), but the kept counts cannot
      in.addData(docs.reverse.take(4)); q.processAllAvailable()
      in.addData(docs.reverse.drop(4)); q.processAllAvailable()
      val kept = spark.table("cap2").as[CapVerdict].collect()
        .filter(_.kept == 1L).groupBy(_.registrable)
        .view.mapValues(_.length.toLong).toMap
      assert(kept === Map("a.com" -> 2L, "b.com" -> 2L, "c.com" -> 1L))
      // and the first-arrived are the keepers: reversed order → max ids
      val keptIds = spark.table("cap2").as[CapVerdict].collect()
        .filter(v => v.kept == 1L && v.registrable == "a.com")
        .map(_.doc_id).toSet
      assert(keptIds === Set(6L, 4L))
    } finally q.stop()
  }
}
