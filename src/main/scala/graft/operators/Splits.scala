package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/validation splitting with temporal hygiene. [[Dedup]] owns the
  * GROUP-aware split (near-dup clusters never straddle train/val); this
  * module owns the TIME axis: a forecasting/ranking corpus must split
  * at a time cut, and rows inside an EMBARGO window after the cut
  * belong to neither side — they leak label information across the
  * boundary through any feature computed over trailing windows (the
  * purged/embargoed split of financial ML, de Prado 2018).
  *
  * Exact-integer contract: the cut is epoch-micros arithmetic,
  * `tmin + (tmax−tmin)·num div den` — a single floored division of
  * exact integers (num/den kept small so the product stays ≪ 2^63 for
  * any realistic time span), reproduced verbatim in the oracle.
  *
  * Distribution shape: one global min/max aggregation (two longs)
  * cross-joined back, then a stateless per-row CASE — one scan, no
  * windows, no shuffle beyond the scalar agg. */
object Splits {

  /** Label every row `train` (before the cut), `val` (at least
    * `embargoMicros` after the cut), or `embargo` (the purged gap):
    * `(idCol, ts_us, role)`. The cut sits `num/den` of the way through
    * the observed time range. */
  def timeEmbargoSplit(df: DataFrame, idCol: String, tsCol: String,
      num: Long = 4L, den: Long = 5L,
      embargoMicros: Long = 21600000000L): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"cut fraction must be in [0,1]: $num/$den")
    val us = unix_micros(col(tsCol))
    val bounds = df.agg(min(us).as("tmin"), max(us).as("tmax"))
    df.select(col(idCol), us.as("ts_us"))
      .crossJoin(bounds)
      .select(col(idCol), col("ts_us"),
        expr(s"tmin + (tmax - tmin) * ${num}L div ${den}L").as("cut"))
      .select(col(idCol), col("ts_us"),
        when(col("ts_us") < col("cut"), lit("train"))
          .when(col("ts_us") >= col("cut") + lit(embargoMicros), lit("val"))
          .otherwise(lit("embargo")).as("role"))
  }
}
