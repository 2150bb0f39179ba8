package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average resampling (TWAP) — the telemetry/finance
  * verb the plain bucketed mean gets WRONG for irregular observations:
  * a value holds from its observation until the next one, so a bucket's
  * average must weight each held value by its held DURATION inside the
  * bucket, not by its observation count (one sample held 23 hours
  * dominates a day, however many ticks landed in the other hour).
  *
  * Contract: per key, observations order by `(ts, tieCol)` (the
  * tiebreak makes same-timestamp observations deterministic — without
  * it, which of two equal-ts values holds the interval would be
  * arrival luck); each observation holds over `[ts, next_ts)`; the
  * LAST observation of a key opens an unbounded interval and is
  * excluded (documented — a horizon-closed variant just appends a
  * sentinel observation). Values are exact cents (`floor(v·100)`),
  * weights exact milliseconds, and the published
  * `twap_cents = Σ cents·ms div Σ ms` is one floored division of
  * exact integers per (key, bucket).
  *
  * Distribution shape: ONE per-key window (lead) — the sessionize
  * exchange — then a map-side bucket explode (intervals fan out
  * `(hi−lo)/bucket + 1` rows, the RangeJoin cost model) and one
  * combinable groupBy on (key, bucket). Nothing all-pairs, nothing
  * corpus-wide.
  *
  * Reference scope: the reference sums per-key byte counts over fixed
  * micro-batch windows
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:54-55)
  * — count-weighted resampling; TWAP is that surface made
  * duration-correct for irregular observations.
  */
object Resample {

  /** `(key, bucket, held_millis, vw, twap_cents)` per (key, bucket):
    * `bucket = floor(epoch_millis / bucketMillis)` — FLOORED division
    * (Spark's `div` truncates toward zero, which for pre-1970 negative
    * millis would shift bucket bounds off the grid and even produce
    * negative weights; `x - pmod(x, m)` is the exact multiple of `m`
    * at or below `x`, so the follow-up `div` is exact for any sign,
    * matching DuckDB's floored `//`). `vw = Σ cents·ms`;
    * `twap_cents = floor(vw / held_millis)` with the same idiom (cents
    * may be negative). */
  def twap(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String,
      bucketMillis: Long = 86400000L): DataFrame = {
    require(bucketMillis >= 1, s"bucketMillis must be >= 1 (got $bucketMillis)")
    val ev = events.select(col(keyCol).as("k"),
      unix_millis(col(tsCol)).as("lo"),
      col(tieCol).cast("long").as("tie"),
      floor(col(valueCol) * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("k")).orderBy(col("lo"), col("tie"))
    val iv = ev.withColumn("hi", lead(col("lo"), 1).over(w))
      .where(col("hi").isNotNull && col("hi") > col("lo"))
    val bw = lit(bucketMillis)
    val fdiv = (x: String) =>
      expr(s"(($x) - pmod($x, ${bucketMillis}L)) div ${bucketMillis}L")
    iv
      .withColumn("b", explode(sequence(fdiv("lo"), fdiv("hi - 1"))))
      .withColumn("wgt",
        least(col("hi"), (col("b") + 1) * bw) -
          greatest(col("lo"), col("b") * bw))
      .groupBy(col("k").as(keyCol), col("b").as("bucket"))
      .agg(sum(col("wgt")).cast("long").as("held_millis"),
        sum(col("cents") * col("wgt")).cast("long").as("vw"))
      .select(col(keyCol), col("bucket"), col("held_millis"), col("vw"),
        expr("(vw - pmod(vw, greatest(held_millis, 1L)))" +
          " div greatest(held_millis, 1L)").as("twap_cents"))
  }
}
