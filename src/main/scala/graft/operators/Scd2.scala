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

  /** Incrementally maintain an SCD2 source-of-truth from micro-batches
    * of change observations — the `foreachBatch` companion of
    * [[fromChangeLog]].
    *
    * What is STORED is the deduplicated OBSERVATION log (hash-bucketed
    * by key, the [[graft.streaming.UpsertSink]] layout), not the derived
    * version rows. Version rows alone are NOT a sufficient statistic
    * under late data: if (ts=1,A), (ts=7,A) collapse into one version
    * and a late (ts=3,B) then arrives, the rebuild needs the dropped
    * ts=7 observation to know A resumed at 7 — any compacted form loses
    * such resumptions. Keeping the log (what a CDC feed already emits)
    * makes EVERY late arrival exactly equal to the full-log rebuild,
    * which [[readHistory]] derives on read via [[fromChangeLog]].
    *
    * Each batch reads ONLY the buckets its keys touch, unions in the
    * new observations, dedupes on (key, ts, tie) — which also makes
    * replays IDEMPOTENT without a batchId fence — and dynamic-overwrites
    * those buckets: cost ∝ touched keys, not table size. Once a
    * watermark bounds late arrivals, closed periods could additionally
    * be compacted to version rows; not done here. */
  def mergeBatch(batch: DataFrame, path: String, keyCol: String,
      tsCol: String, tieCol: String, attrCols: Seq[String],
      numBuckets: Int = 64): Unit = {
    import graft.streaming.UpsertSink
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val logCols = Seq(keyCol, tsCol, tieCol) ++ attrCols
    val obs = batch.select(logCols.map(col): _*)
      .withColumn("bucket", UpsertSink.bucketOf(keyCol, numBuckets))

    val unionObs = if (!UpsertSink.hasData(spark, path)) obs else {
      val affected = obs.select("bucket").distinct()
      spark.read.parquet(path)
        .join(broadcast(affected), Seq("bucket"), "left_semi")
        .unionByName(obs)
    }
    // one row per (key, ts, tie): a re-delivered observation with the
    // SAME identity but a different payload (an upstream correction) is
    // resolved deterministically — greatest attrs win — rather than by
    // dropDuplicates' arbitrary first-seen pick, which would let the
    // stored history flip between runs
    val w = Window.partitionBy(col(keyCol), col(tsCol), col(tieCol))
      .orderBy(attrCols.map(col(_).desc): _*)
    val merged = unionObs
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint(true) // the write overwrites what the plan reads
    UpsertSink.withDynamicOverwrite(spark) {
      merged.write.mode("overwrite").partitionBy("bucket").parquet(path)
    }
  }

  /** Current history (all version rows) of the incrementally-maintained
    * table at `path` — derived from the stored observation log, so it is
    * ALWAYS the exact full-log rebuild, whatever late data has arrived. */
  def readHistory(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String, tsCol: String, tieCol: String,
      attrCols: Seq[String]): DataFrame =
    fromChangeLog(spark.read.parquet(path).drop("bucket"),
      keyCol, tsCol, tieCol, attrCols)

  /** Point-in-time-correct dimension join — the feature-store read of an
    * SCD2 table: each fact row joins the version whose
    * `[valid_from, valid_to)` interval contains the fact's timestamp,
    * so no attribute from the fact's FUTURE ever leaks in (the training
    * leakage a plain "current dimension" join causes).
    *
    * Scale shape: an EQUI-join on the key with the interval test as a
    * residual condition — per-key version counts are small (one row per
    * actual change), so this is one hash join on the key, never a
    * nested-loop range join. Facts with a timestamp before the key's
    * first version (or an unknown key) are dropped, matching the SQL
    * `JOIN ... ON contains(interval, ts)` the oracle runs. */
  def pitJoin(facts: DataFrame, history: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val h = history.withColumnRenamed(keyCol, "__dim_key")
    // interval columns resolved against the HISTORY side explicitly
    // (mirroring the __dim_key rename): fact tables are often
    // interval-bearing themselves, and an unqualified valid_from/valid_to
    // would then be an ambiguous reference
    facts.join(h,
      facts.col(keyCol) === h.col("__dim_key") &&
        h.col("valid_from") <= facts.col(tsCol) &&
        (h.col("valid_to").isNull || facts.col(tsCol) < h.col("valid_to")))
      .drop("__dim_key")
  }
}
