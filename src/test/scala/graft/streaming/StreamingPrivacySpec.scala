package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingPrivacy.{KEvent, KRecord}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Hold-until-k streaming anonymity gate. */
class StreamingPrivacySpec extends SparkSpec {

  test("rows buffer until the k-th peer arrives, then pass through") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KRecord]
    val q = StreamingPrivacy.releaseGate(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("kg").outputMode("append")
      .start()
    try {
      in.addData(KRecord(1, "A"), KRecord(2, "A"), KRecord(3, "B"))
      q.processAllAvailable()
      assert(spark.table("kg").count() === 0) // A at 2 < 3, B at 1
      in.addData(KRecord(4, "A")) // A reaches 3 → flush all three
      q.processAllAvailable()
      val afterFlush = spark.table("kg").as[KRecord].collect().map(_.id).toSet
      assert(afterFlush === Set(1L, 2L, 4L))
      in.addData(KRecord(5, "A")) // open combination: straight through
      q.processAllAvailable()
      assert(spark.table("kg").count() === 4)
      // B never reaches 3 → its row is never released
      assert(!spark.table("kg").as[KRecord].collect().exists(_.quasi == "B"))
    } finally q.stop()
  }

  test("streamed released set equals the batch kAnonymize kept rows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rows = Seq(
      KRecord(1, "x|1"), KRecord(2, "x|1"), KRecord(3, "y|2"),
      KRecord(4, "x|1"), KRecord(5, "y|2"), KRecord(6, "z|3"),
      KRecord(7, "y|2"), KRecord(8, "x|1"))
    val in = MemoryStream[KRecord]
    val q = StreamingPrivacy.releaseGate(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("kg2").outputMode("append")
      .start()
    try {
      rows.grouped(3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("kg2").as[KRecord].collect()
        .map(_.id).toSet
      val batchKept = graft.operators.Privacy.kAnonymize(
          rows.toDF("id", "quasi"), "id", Seq("quasi"), k = 3L)
        .where($"kept" === 1L).select($"id").as[Long].collect().toSet
      assert(streamed === batchKept)
      assert(streamed === Set(1L, 2L, 3L, 4L, 5L, 7L, 8L)) // z|3 held
    } finally q.stop()
  }

  private def ev(id: Long, sec: Long, quasi: String) =
    KEvent(id, new java.sql.Timestamp(sec * 1000L), quasi)

  test("TTL gate: idle never-opened combination is evicted under " +
      "watermark advance; released set still equals batch kept rows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KEvent]
    val q = StreamingPrivacy.releaseGateTtl(
        in.toDS().withWatermark("ts", "0 seconds").as[KEvent],
        k = 2, ttl = "1 minute")
      .writeStream.format("memory").queryName("kgt").outputMode("append")
      .start()
    try {
      // rare combination R and A each buffer below k
      in.addData(ev(1, 10, "R"), ev(2, 11, "A")); q.processAllAvailable()
      assert(spark.table("kgt").count() === 0)
      // a 10-minute-later row on an UNRELATED key advances the
      // watermark past R's and A's timeouts → both evicted mid-buffer
      // (the timeout fires in the trailing no-data batch)
      in.addData(ev(10, 610, "C")); q.processAllAvailable()
      assert(spark.table("kgt").count() === 0)
      // A re-buffers from zero: row 3 alone is 1 < 2 → still nothing
      in.addData(ev(3, 615, "A")); q.processAllAvailable()
      assert(spark.table("kgt").count() === 0)
      // A reaches k again with NEW rows only → releases 3 and 4;
      // the evicted row 2 stays suppressed (under-release, never leak)
      in.addData(ev(4, 620, "A")); q.processAllAvailable()
      assert(spark.table("kgt").as[KEvent].collect().map(_.id).toSet
        === Set(3L, 4L))
      // batch parity over the finite stream: the rows the TTL
      // suppressed (R entirely, A's pre-eviction row 2; C below k)
      // are exactly what the batch gate ALSO suppresses on the
      // post-eviction corpus — released set == batch kept rows
      val batchKeptPost = graft.operators.Privacy.kAnonymize(
          Seq((3L, "A"), (4L, "A"), (1L, "R"), (10L, "C"))
            .toDF("id", "quasi"),
          "id", Seq("quasi"), k = 2L)
        .where($"kept" === 1L).select($"id").as[Long].collect().toSet
      assert(batchKeptPost === Set(3L, 4L))
    } finally q.stop()
  }

  test("TTL gate: an open combination keeps flowing within the TTL") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KEvent]
    val q = StreamingPrivacy.releaseGateTtl(
        in.toDS().withWatermark("ts", "0 seconds").as[KEvent],
        k = 2, ttl = "1 minute")
      .writeStream.format("memory").queryName("kgt2").outputMode("append")
      .start()
    try {
      in.addData(ev(1, 10, "B"), ev(2, 12, "B")); q.processAllAvailable()
      in.addData(ev(3, 40, "B")); q.processAllAvailable() // open, in TTL
      assert(spark.table("kgt2").as[KEvent].collect().map(_.id).toSet
        === Set(1L, 2L, 3L))
    } finally q.stop()
  }
}
