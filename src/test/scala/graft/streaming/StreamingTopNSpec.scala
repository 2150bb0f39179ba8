package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Incremental per-group leaderboards over a stream. */
class StreamingTopNSpec extends SparkSpec {

  test("boards evolve across batches; unchanged groups stay silent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = StreamingTopN.topNPerGroup(
      in.toDF().toDF("g", "id", "s"), "g", "id", "s", n = 2)
      .writeStream.format("memory").queryName("tb").outputMode("append").start()
    def boards(): Map[String, (Seq[Long], Seq[Long])] =
      spark.table("tb").as[TopNBoard].collect()
        .map(b => b.group -> ((b.ids, b.scores))).toMap // latest emit wins per key
    try {
      in.addData(("a", 1L, 10L), ("a", 2L, 30L), ("b", 5L, 7L))
      q.processAllAvailable()
      val t1 = spark.table("tb").as[TopNBoard].collect()
      assert(t1.length == 2)
      assert(boards()("a") == ((Seq(2L, 1L), Seq(30L, 10L))))
      assert(boards()("b") == ((Seq(5L), Seq(7L))))

      // batch 2: a gets a new leader; b's row doesn't make its board move
      in.addData(("a", 3L, 99L), ("b", 6L, 7L))
      q.processAllAvailable()
      val emitted = spark.table("tb").as[TopNBoard].collect()
      // a re-emitted (board changed), b re-emitted too (6 joins its 2-board)
      assert(emitted.count(_.group == "a") == 2)
      val aLatest = emitted.filter(_.group == "a").last
      assert(aLatest.ids == Seq(3L, 2L) && aLatest.scores == Seq(99L, 30L))

      // batch 3: a row far below a's board — NO new emit for a
      in.addData(("a", 9L, 1L))
      q.processAllAvailable()
      assert(spark.table("tb").as[TopNBoard].collect().count(_.group == "a") == 2,
        "an off-board row must not re-emit the unchanged board")
    } finally q.stop()
  }

  test("tie at the cut breaks by smallest id, batch-order independent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = StreamingTopN.topNPerGroup(
      in.toDF().toDF("g", "id", "s"), "g", "id", "s", n = 2)
      .writeStream.format("memory").queryName("tb2").outputMode("append").start()
    try {
      in.addData(("x", 8L, 5L))
      q.processAllAvailable()
      in.addData(("x", 4L, 5L), ("x", 6L, 5L)) // three-way score tie
      q.processAllAvailable()
      val last = spark.table("tb2").as[TopNBoard].collect()
        .filter(_.group == "x").last
      assert(last.ids == Seq(4L, 6L), s"tie must keep smallest ids: $last")
    } finally q.stop()
  }

  test("Long.MinValue score sorts worst, not best (negation overflow)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = StreamingTopN.topNPerGroup(
      in.toDF().toDF("g", "id", "s"), "g", "id", "s", n = 2)
      .writeStream.format("memory").queryName("tb3").outputMode("append").start()
    try {
      // -s of Long.MinValue overflows back to Long.MinValue, which a
      // sortBy(-s) ranks as the BEST entry; the explicit ordering must
      // rank it last and evict it once two real scores exist
      in.addData(("m", 1L, Long.MinValue), ("m", 2L, 5L), ("m", 3L, 7L))
      q.processAllAvailable()
      val last = spark.table("tb3").as[TopNBoard].collect()
        .filter(_.group == "m").last
      assert(last.ids == Seq(3L, 2L) && last.scores == Seq(7L, 5L),
        s"MinValue observation must not top the board: $last")
    } finally q.stop()
  }
}
