package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Purged temporal split (SURVEY.md §2.11). */
class SplitsSpec extends SparkSpec {

  private def ts(us: Long) = new Timestamp(us / 1000L) // micros → ms fixture

  test("roles partition the timeline: train | embargo gap | val") {
    import spark.implicits._
    // range [0 s, 100 s]; 4/5 cut at 80 s; 6 s embargo (embargoMicros 6e6)
    val rows = Seq(0L, 40L, 79L, 80L, 83L, 86L, 99L, 100L)
      .zipWithIndex.map { case (sec, i) => (i.toLong, ts(sec * 1000000L)) }
    val got = Splits.timeEmbargoSplit(rows.toDF("event_id", "ts"),
        "event_id", "ts", num = 4L, den = 5L, embargoMicros = 6000000L)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got === Map(
      0L -> "train", 1L -> "train", 2L -> "train", // < 80 s
      3L -> "embargo", 4L -> "embargo",            // [80, 86)
      5L -> "val", 6L -> "val", 7L -> "val"))      // >= 86 s
  }

  test("num=den puts everything in train except the embargoed tail") {
    import spark.implicits._
    val rows = Seq((1L, ts(0L)), (2L, ts(50000000L)), (3L, ts(100000000L)))
    val got = Splits.timeEmbargoSplit(rows.toDF("event_id", "ts"),
        "event_id", "ts", num = 1L, den = 1L, embargoMicros = 1000000L)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    // cut = tmax: nothing strictly before it is excluded; the max row
    // itself sits inside the embargo window
    assert(got === Map(1L -> "train", 2L -> "train", 3L -> "embargo"))
  }
}
