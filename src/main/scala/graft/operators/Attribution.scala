package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the classic funnel-economics
  * report ([[graft.queries.Pipeline]]'s funnel/retention family's
  * missing member): every `purchase` conversion distributes its value
  * over the user's preceding touch events (`view`/`click`) inside a
  * lookback window, under the three standard models at once:
  *
  *  - first-touch: full credit to the earliest touch in the window,
  *  - last-touch: full credit to the latest,
  *  - linear: `floor(cents/n)` per touch, remainder to the LAST touch
  *    (deterministic, so per-model totals conserve exactly).
  *
  * Conversions with no touch in the window land in the `(none)`
  * channel with full credit under every model, so each model's column
  * sums to the total converted cents — the conservation invariant the
  * spec asserts.
  *
  * Integer-exactness contract: values go to BIGINT cents
  * (`round(value·100)` — both engines round the same near-integer
  * double), the linear split is ONE floored division plus an exact
  * remainder, and ties inside a window break on `(ts, event_id)` —
  * a unique total order.
  *
  * Distribution shape (the 100 TB contract): touches join conversions
  * on the USER equi-key (the range predicate is a post-join filter on
  * the sort-merge/shuffled-hash join, never a cartesian); all three
  * windows partition by conversion id — per-conversion groups bounded
  * by a user's activity inside one lookback window; the final rollup
  * is a map-side-combinable groupBy on the channel.
  *
  * Reference scope: the reference aggregates per-key totals only
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:54-55);
  * attribution belongs to the declared extension surface
  * (SURVEY.md §2.11).
  *
  * Output: `(channel, n_rows, linear_cents, first_cents, last_cents)`
  * with `n_rows` = credited touches (for `(none)`: unattributed
  * conversions).
  */
object Attribution {

  def multiTouch(events: DataFrame, lookbackHours: Int = 24): DataFrame = {
    require(lookbackHours >= 1, s"need lookbackHours >= 1, got $lookbackHours")
    val cents = expr("CAST(round(value * 100) AS BIGINT)")
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("c_ts"), cents.as("cents"))
    val t = events.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
    val tp = p.join(t, Seq("user_id"))
      .where(col("t_ts") < col("c_ts") &&
        col("t_ts") >= col("c_ts") - expr(s"INTERVAL $lookbackHours HOURS"))
    val byConv = Window.partitionBy(col("conv_id"))
    val wDesc = byConv.orderBy(col("t_ts").desc, col("touch_id").desc)
    val wAsc = byConv.orderBy(col("t_ts").asc, col("touch_id").asc)
    val credited = tp
      .withColumn("n", count(lit(1)).over(byConv))
      .withColumn("rd", row_number().over(wDesc))
      .withColumn("ra", row_number().over(wAsc))
      .select(col("channel"),
        (expr("cents div n") +
          when(col("rd") === 1, expr("cents - (cents div n) * n"))
            .otherwise(0L)).as("lin"),
        when(col("ra") === 1, col("cents")).otherwise(0L).as("fir"),
        when(col("rd") === 1, col("cents")).otherwise(0L).as("las"))
    val unattributed = p
      .join(tp.select(col("conv_id")).distinct(), Seq("conv_id"),
        "left_anti")
      .select(lit("(none)").as("channel"), col("cents").as("lin"),
        col("cents").as("fir"), col("cents").as("las"))
    credited.unionByName(unattributed)
      .groupBy(col("channel"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("lin")).cast("long").as("linear_cents"),
        sum(col("fir")).cast("long").as("first_cents"),
        sum(col("las")).cast("long").as("last_cents"))
  }
}
