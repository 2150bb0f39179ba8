package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingResample.{BucketSlice, Obs}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streamed TWAP: interval closes on the next arrival; folded slices
  * equal the batch operator over any finite stream. */
class StreamingResampleSpec extends SparkSpec {

  private def ob(id: Long, millis: Long, uid: Long, v: Double) =
    Obs(id, new Timestamp(millis), uid, v)

  /** Three keys; user 1 has a same-timestamp pair and a
    * bucket-straddling interval; user 2 a single (terminal,
    * never-emitting) observation; user 3 straddles the epoch with
    * pre-1970 millis (floored bucket grid, negative cents). */
  private val all = Seq(
    ob(1, 0L, 1, 1.0), ob(2, 100L, 1, 5.0), ob(3, 100L, 1, 3.0),
    ob(4, 250L, 1, 2.0), ob(5, 400L, 1, 9.0),
    ob(6, 50L, 2, 7.0),
    ob(7, -150L, 3, 1.0), ob(8, -50L, 3, -3.0), ob(9, 100L, 3, 9.0))

  test("folded streamed slices equal the batch TWAP across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = StreamingResample.twapStream(in.toDS(), bucketMillis = 100L)
      .writeStream.format("memory").queryName("twap1").outputMode("append")
      .start()
    try {
      in.addData(all.take(2)); q.processAllAvailable()
      in.addData(all.slice(2, 4)); q.processAllAvailable()
      in.addData(all.drop(4)); q.processAllAvailable()
      val streamed = spark.table("twap1").as[BucketSlice].collect()
        .groupBy(s => (s.user_id, s.bucket)).view
        .mapValues(ss => (ss.map(_.held_millis).sum, ss.map(_.vw).sum))
        .toMap
        .map { case (k, (h, vw)) =>
          (k._1, k._2, h, vw, Math.floorDiv(vw, math.max(h, 1L))) }
        .toSet
      val batch = graft.operators.Resample.twap(
          spark.createDataset(all).toDF()
            .selectExpr("event_id", "ts", "user_id", "value"),
          "user_id", "ts", "event_id", "value", bucketMillis = 100L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      // user 2's lone observation is terminal in BOTH: no bucket rows
      assert(!streamed.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("same-timestamp pair across a batch boundary still matches batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = StreamingResample.twapStream(in.toDS(), bucketMillis = 100L)
      .writeStream.format("memory").queryName("twap2").outputMode("append")
      .start()
    try {
      // the equal-ts pair (ids 2, 3) split across batches: id 3 must
      // take over holding WITHOUT emitting a zero-width interval
      in.addData(all.take(2)); q.processAllAvailable()
      in.addData(Seq(all(2))); q.processAllAvailable()
      in.addData(all.drop(3)); q.processAllAvailable()
      val streamed = spark.table("twap2").as[BucketSlice].collect()
        .groupBy(s => (s.user_id, s.bucket)).view
        .mapValues(ss => (ss.map(_.held_millis).sum, ss.map(_.vw).sum))
        .toMap
      // bucket 1 of user 1 must be held 100ms by the id-3 value (300c):
      // [100,250) splits as b1 100ms + b2 50ms
      assert(streamed((1L, 1L)) === ((100L, 30000L)))
      assert(streamed((1L, 2L))._1 === 100L) // 50ms of 300c + 50ms of 200c
      assert(streamed((1L, 2L))._2 === 300L * 50 + 200L * 50)
    } finally q.stop()
  }
}
