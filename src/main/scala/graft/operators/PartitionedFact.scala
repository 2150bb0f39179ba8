package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Date-partitioned fact layout + dynamic partition pruning (DPP) — the
  * first thing a warehouse user expects from a 100 TB fact table.
  *
  * The fact is laid out by month (`.../order_month=1995-03-01/...`); a
  * query joining it to a filtered dimension must read only the
  * partitions the dimension selects. When the selected set is only known
  * at RUN time (it comes out of another relation, not a literal), static
  * partition pruning can't help — Spark's dynamic partition pruning
  * closes the gap by planting a `dynamicpruning` subquery on the fact
  * scan that reuses the dimension's broadcast to skip whole partition
  * directories before a single row is read. PlanShapeSpec pins that
  * subquery in the executed plan; `q_dpp` oracle-checks the semantics.
  */
object PartitionedFact {

  /** Rewrite `df` laid out by the month of `dateCol`: one directory per
    * month, the layout under which month-ranged queries scan only their
    * slice. Partition values serialize as ISO dates so the column reads
    * back as DATE. At 100 TB this is the write-once layout cost that
    * every later scan amortizes. */
  def writeMonthPartitioned(df: DataFrame, dateCol: String, monthCol: String,
      path: String): Unit =
    df.withColumn(monthCol, to_date(date_trunc("month", col(dateCol))))
      .write.mode("overwrite").partitionBy(monthCol).parquet(path)

  /** Calendar dimension: one row per distinct month of `dateCol` with
    * year/quarter attributes — the runtime-filtered side of the DPP
    * join (tiny, broadcastable; its filtered months are what the fact
    * scan prunes to). */
  def monthCalendar(df: DataFrame, dateCol: String): DataFrame =
    df.select(to_date(date_trunc("month", col(dateCol))).as("order_month"))
      .distinct()
      .select(col("order_month"),
        year(col("order_month")).as("cal_year"),
        quarter(col("order_month")).as("cal_quarter"))
}
