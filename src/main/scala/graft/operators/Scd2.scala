package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history: rebuild per-key validity
  * intervals from a change log — the warehouse-side complement of the
  * as-of join (which queries such intervals back).
  *
  * Scale shape: ONE hash exchange on the key; both windows (change
  * detection via lag, interval close via lead) and the filter in between
  * share that partitioning, so Catalyst plans a single shuffle + sort.
  * No self-join against "current state" — the log rebuild formulation is
  * idempotent and replay-friendly, which is what you want when the log
  * lives in a 100 TB append-only table.
  */
object Scd2 {

  /** @param log      change log: one row per observation of a key's attrs
    * @param keyCol   dimension key
    * @param tsCol    effective timestamp of the observation (becomes
    *                 valid_from; consumed — not in the output)
    * @param tieCol   unique tiebreaker for same-timestamp observations
    * @param attrCols tracked attributes: a version row is emitted only
    *                 when at least one differs (null-safely) from the
    *                 previous observation
    * @return log columns (minus tsCol) + valid_from, valid_to (null =
    *         open) and is_current
    */
  def fromChangeLog(log: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val versions = log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || changed)
      .where(col("__chg"))
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__rn", "__chg", tsCol)
  }
}
