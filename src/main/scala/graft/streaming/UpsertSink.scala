package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert ("MERGE") emulation on plain parquet — the
  * `foreachBatch` sink pattern for maintaining a keyed table from a
  * changelog stream without a transactional table format.
  *
  * Layout: the table is hash-bucketed by key into `bucket=N` partition
  * directories. Each micro-batch:
  *
  *   1. dedupes the batch to one row per key (greatest version wins),
  *   2. computes the AFFECTED buckets (distinct key-hashes in the batch),
  *   3. reads ONLY those buckets from the existing table, drops rows
  *      whose key is being replaced (left-anti join on key),
  *   4. unions the survivors with the new rows and overwrites ONLY the
  *      affected bucket directories (dynamic partition overwrite).
  *
  * The rewrite cost per batch is `affected_buckets / total_buckets` of
  * the table, not the whole table — at 100 TB with 4096 buckets a batch
  * touching 10 keys rewrites ≤ 10 buckets. Re-running a batch converges
  * to the same state (last-write-wins by version), which is what makes
  * the sink exactly-once under checkpoint replay.
  */
object UpsertSink {

  /** INT bucket id — partition directories round-trip as int on read, so
    * the union of existing and new rows stays type-stable. */
  def bucketOf(keyCol: String, numBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int").as("bucket")


  /** True when `path` holds at least one parquet file — a bare directory
    * (e.g. from an all-empty first batch or a crash between mkdir and
    * commit) must be treated as "no table yet" or the next read fails
    * schema inference. */
  private def hasData(path: String): Boolean = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Boolean =
      if (f.isFile) f.getName.endsWith(".parquet")
      else Option(f.listFiles()).exists(_.exists(walk))
    root.exists() && walk(root)
  }

  /** Apply one batch of upserts to the table at `path`. `versionCol`
    * breaks ties within and across batches (greater wins). */
  def upsertBatch(batch: DataFrame, path: String, keyCol: String,
      versionCol: String, numBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // 1. one row per key: greatest version wins; version TIES break on the
    //    remaining columns (descending) so replays of a tied batch pick
    //    the same row every time — the convergence contract depends on a
    //    deterministic total order, not just the version.
    val tieBreak = batch.columns.toSeq
      .filterNot(c => c == keyCol || c == versionCol).map(col(_).desc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(versionCol).desc +: tieBreak: _*)
    val newRows = batch
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn")
      .withColumn("bucket", bucketOf(keyCol, numBuckets))

    val exists = hasData(path)
    val merged0 = if (!exists) newRows else {
      val affected = newRows.select("bucket").distinct()
      val existing = spark.read.parquet(path)
        .join(broadcast(affected), Seq("bucket"), "left_semi")
      val kept = existing.join(newRows.select(col(keyCol)), Seq(keyCol), "left_anti")
      kept.select(newRows.columns.map(col).toSeq: _*).unionByName(newRows)
    }
    // materialize + truncate lineage: the write overwrites the same path
    // the merge just read (Spark rejects a write whose plan still scans
    // the destination)
    val merged = merged0.localCheckpoint(true)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("bucket").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Current table state (one row per key). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")

  /** Incremental AGGREGATE maintenance (a streaming materialized view):
    * merge a batch's partial aggregates into the keyed table by SUMMING
    * the value columns of matching keys — running per-key totals that
    * never rescan history. Unlike [[upsertBatch]]'s last-write-wins,
    * addition is not idempotent, so replays are fenced with a per-batchId
    * marker file: a replayed batch whose marker exists is skipped. The
    * marker is written after the data commit; the tiny crash window
    * between the two is the price of plain parquet (a transactional
    * format closes it with one atomic commit — same layout, same plan).
    */
  def mergeAggBatch(batch: DataFrame, path: String, keyCol: String,
      sumCols: Seq[String], batchId: Long, numBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val marker = new java.io.File(s"$path/_applied_batch_$batchId")
    if (marker.exists()) return
    if (batch.isEmpty) { // nothing finalized this trigger — just fence it
      marker.getParentFile.mkdirs(); marker.createNewFile(); return
    }

    val newRows = batch
      .groupBy(col(keyCol))
      .agg(sumCols.map(c => sum(col(c)).as(c)).head,
        sumCols.map(c => sum(col(c)).as(c)).tail: _*)
      .withColumn("bucket", bucketOf(keyCol, numBuckets))

    val exists = hasData(path)
    val merged0 = if (!exists) newRows else {
      val affected = newRows.select("bucket").distinct()
      val existing = spark.read.parquet(path)
        .join(broadcast(affected), Seq("bucket"), "left_semi")
      existing.select(newRows.columns.map(col).toSeq: _*)
        .unionByName(newRows)
        .groupBy(col("bucket"), col(keyCol))
        .agg(sumCols.map(c => sum(col(c)).as(c)).head,
          sumCols.map(c => sum(col(c)).as(c)).tail: _*)
        .select(newRows.columns.map(col).toSeq: _*)
    }
    val merged = merged0.localCheckpoint(true)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("bucket").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    marker.getParentFile.mkdirs()
    marker.createNewFile()
  }
}
