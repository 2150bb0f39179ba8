package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AttributionSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("hand-traced credits: first/last/linear with remainder to last") {
    import spark.implicits._
    // user 1: view(10:00), click(10:05), view(10:10) then a 1.00
    // purchase at 10:30 -> n=3: linear 33/33/34 (remainder to LAST),
    // first=view, last=view; user 2: purchase with no touches -> (none)
    val events = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(5), 1L, "click", 0.0),
      (3L, ts(10), 1L, "view", 0.0),
      (4L, ts(30), 1L, "purchase", 1.0),
      (5L, ts(30), 2L, "purchase", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    val got = Attribution.multiTouch(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // linear: views get 33 + (34-33 remainder on the last one) = 67,
    // click 33; first: the 10:00 view -> views 100; last: the 10:10
    // view -> views 100
    assert(got("view") === ((2L, 67L, 100L, 100L)))
    assert(got("click") === ((1L, 33L, 0L, 0L)))
    assert(got("(none)") === ((1L, 200L, 200L, 200L)))
  }

  test("lookback window excludes stale touches") {
    import spark.implicits._
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "click", 0.0),
      (2L, Timestamp.valueOf("2024-01-03 10:00:00"), 1L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    val got = Attribution.multiTouch(events, lookbackHours = 24)
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("(none)")) // the 2-day-old click never credits
  }

  test("conservation: every model's column sums to total purchase cents") {
    val events = Tables.t(spark, sfDir, "events")
    val rows = Attribution.multiTouch(events).collect()
    assert(rows.map(_.getString(0)).toSet.contains("view"))
    val total = events.where(col("event_type") === "purchase")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")))
      .head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === total) // linear
    assert(rows.map(_.getLong(3)).sum === total) // first
    assert(rows.map(_.getLong(4)).sum === total) // last
  }
}
