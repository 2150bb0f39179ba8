package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streamed conformal: folded histogram == batch exact rank, any
  * split/order; compaction answer-preserving; replay idempotent. */
class StreamingConformalSpec extends SparkSpec {

  private def base(tag: String) = s"/tmp/graft_conf_spec/$tag"

  private def batchGate(rows: Seq[(Long, Long, Boolean)],
      alphaPpm: Long) = {
    import spark.implicits._
    graft.operators.Calibration.conformalGate(
        rows.toDF("id", "nonconf", "is_cal"),
        "id", "nonconf", "is_cal", alphaPpm)
      .selectExpr("id", "nonconf", "is_cal", "thr", "n_cal", "kept")
      .as[(Long, Long, Boolean, Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
  }

  private def streamGate(tag: String,
      folds: Seq[Seq[(Long, Long, Boolean)]],
      all: Seq[(Long, Long, Boolean)], alphaPpm: Long,
      compactAfter: Int = -1, replayFold: Int = -1) = {
    import spark.implicits._
    val b = base(tag)
    StreamingConformal.init(spark, b)
    folds.zipWithIndex.foreach { case (f, i) =>
      StreamingConformal.fold(spark, b,
        f.toDF("id", "nonconf", "is_cal"), "nonconf", "is_cal")
      if (i == replayFold) // crash-replay: same content, same dir
        StreamingConformal.fold(spark, b,
          f.toDF("id", "nonconf", "is_cal"), "nonconf", "is_cal")
      if (i == compactAfter) StreamingConformal.compact(spark, b)
    }
    StreamingConformal.gate(spark, b,
        all.toDF("id", "nonconf", "is_cal"),
        "id", "nonconf", "is_cal", alphaPpm)
      .selectExpr("id", "nonconf", "is_cal", "thr", "n_cal", "kept")
      .as[(Long, Long, Boolean, Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
  }

  private val rows: Seq[(Long, Long, Boolean)] =
    (1L to 60L).map(i => (i, (i * 37) % 41, i % 3 != 0)) ++
      Seq((61L, 999L, false), (62L, -5L, true))

  test("three folds equal the batch gate, in order and shuffled") {
    val want = batchGate(rows, 150000L)
    val inOrder = rows.grouped(21).toSeq
    assert(streamGate("ord", inOrder, rows, 150000L) === want)
    val shuffled = Seq(rows.drop(40), rows.take(20),
      rows.slice(20, 40))
    assert(streamGate("shuf", shuffled, rows, 150000L) === want)
  }

  test("mid-run compaction and a crash-replayed fold change nothing") {
    val want = batchGate(rows, 100000L)
    assert(streamGate("cmp", rows.grouped(25).toSeq, rows, 100000L,
      compactAfter = 1) === want)
    assert(streamGate("rep", rows.grouped(25).toSeq, rows, 100000L,
      replayFold = 0) === want)
  }

  test("empty artifact fails OPEN; a calibration-free fold adds " +
      "nothing") {
    import spark.implicits._
    val b = base("empty")
    StreamingConformal.init(spark, b)
    StreamingConformal.fold(spark, b,
      Seq((1L, 5L, false)).toDF("id", "nonconf", "is_cal"),
      "nonconf", "is_cal")
    val got = StreamingConformal.gate(spark, b,
        Seq((1L, 5L, false)).toDF("id", "nonconf", "is_cal"),
        "id", "nonconf", "is_cal", 100000L)
      .selectExpr("thr", "n_cal", "kept")
      .as[(Long, Long, Boolean)].collect()
    assert(got.toSeq === Seq((Long.MaxValue, 0L, true)))
  }
}
