package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingPrivacy.KRecord
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
}
