package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: pay the shuffle ONCE at write time, then
  * every join/aggregation on the bucket key runs exchange-free forever.
  *
  * This is the storage-layout half of the scale story (the runtime half
  * being broadcast/salted/AQE joins): at 100 TB a fact⋈fact join's
  * dominant cost is re-hashing both sides across the cluster every query.
  * Writing both tables bucketed (and sorted) by the join key makes the
  * scan itself satisfy the join's required `HashClusteredDistribution`,
  * so Catalyst plans a SortMergeJoin with NO Exchange and NO Sort — the
  * plan-shape that `PlanShapeSpec` pins.
  *
  * Mechanics: `repartition(numBuckets, key)` uses the same Murmur3-based
  * `HashPartitioning` as the bucket-file assignment, so each write task
  * holds exactly one bucket's rows → ONE file per bucket. That matters:
  * the per-file sort order is only meaningful when a bucket is a single
  * file (a multi-file bucket re-sorts on read), and reading it back as
  * an output ORDERING (eliding the join's Sorts on top of its
  * Exchanges) additionally needs
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — off by
  * default since 3.0; exchange elimination alone needs nothing.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table at `path`,
    * registered as `table` in the session catalog (metadata only — the
    * catalog is where bucketing metadata lives; a bare parquet dir has
    * nowhere to record it). Drops any previous registration first, so
    * re-runs are idempotent. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(numBuckets, col(key))
      .write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Inner-join two co-bucketed tables on their shared bucket key. With
    * equal bucket counts both scans already satisfy the join's required
    * distribution and ordering — zero Exchange, zero Sort (asserted in
    * PlanShapeSpec). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
