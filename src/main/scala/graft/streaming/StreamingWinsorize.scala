package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streamed winsorization — the incremental half of
  * [[graft.operators.Profiler.winsorize]]: observations arrive
  * continuously and the exact p-lo/p-hi rank cuts stay current, so a
  * live scoring path can clamp against thresholds computed over
  * EVERYTHING seen rather than a stale snapshot.
  *
  * The decomposition is [[StreamingConformal]]'s, applied to both
  * tails: the exact order statistic needs the observation MULTISET,
  * but a value HISTOGRAM `(v, cnt)` carries the same information and
  * its counts are ADDITIVE — each fold appends one batch-sized delta,
  * and the read side recovers the exact `ceil(n·ppm/10⁶)`-th smallest
  * values (clamped to `[1, n]`, the batch rule) as the first
  * histogram values whose running count reaches each k. The rank
  * tiebreak by id in the batch operator cannot change a cut VALUE, so
  * the streamed clamp equals the batch `winsorize` over everything
  * seen VERBATIM for any split and arrival order (q_winsorize_stream
  * shares the batch oracle).
  *
  * Values may be any numeric type (stored as DOUBLE — grouping on
  * exact value equality, the source values being what they are; NaN
  * is out of contract, as in the batch operator's non-null rule).
  *
  * Replay/crash contract: content-derived delta dir names +
  * overwrite; [[compact]] merges via the crash-safe
  * [[FoldStore.swap]]. The delta tag folds a value-weighted content
  * checksum (r14, the [[StreamingDrift]] term) alongside (distinct
  * values, total count, min, max), so two different batches alias
  * only on a checksum collision — callers whose batches can repeat
  * BYTE-IDENTICALLY must still salt with `batchTag` (the
  * [[StreamingConformal]] caveat verbatim). */
object StreamingWinsorize {

  private val histSchema = StructType(Seq(
    StructField("v", DoubleType), StructField("cnt", LongType)))

  private def histRoot(base: String) = s"$base/vhist"

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Wipe the artifact directory (fresh run). */
  def init(spark: SparkSession, base: String): Unit = {
    hadoopFs(spark, base).delete(new org.apache.hadoop.fs.Path(base), true)
    ()
  }

  /** Fold one micro-batch: histogram its non-null values and stage
    * the additive delta under a content-derived directory. */
  def fold(spark: SparkSession, base: String, rows: DataFrame,
      valueCol: String, batchTag: Option[Long] = None): Unit = {
    val delta = rows
      .select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    // both checksum factors bounded below 2^30 before multiplying so
    // the count-weighted term can never overflow (the StreamingDrift
    // tag discipline; r13 ADVICE — (n, min, max) alone aliased
    // different batches like {1,2,4} vs {1,3,4})
    val row = delta.agg(count(lit(1)), sum(col("cnt")),
      min(col("v")), max(col("v")),
      sum(pmod(pmod(xxhash64(col("v")), lit(1000000007L)) *
        pmod(col("cnt"), lit(1000000007L)), lit(1000000007L)))).head
    if (row.getLong(0) > 0L) {
      val salt = batchTag.map(b => s"b${b}_").getOrElse("")
      val tag = (s"d_$salt${row.getLong(0)}_${row.getLong(1)}_" +
        s"${row.getDouble(2)}_${row.getDouble(3)}_${row.getLong(4)}")
        .replace('.', 'p').replace('-', 'm')
      delta.write.mode("overwrite")
        .parquet(s"${histRoot(base)}/$tag")
    }
  }

  /** Merge accumulated delta dirs into one ([[FoldStore.swap]] — the
    * r14 crash-safe rename-aside protocol). */
  def compact(spark: SparkSession, base: String): Unit = {
    val fs = hadoopFs(spark, base)
    val root = new org.apache.hadoop.fs.Path(histRoot(base))
    FoldStore.swap(fs, root) { tmp =>
      merged(spark, base).write.mode("overwrite").parquet(tmp.toString)
    }
  }

  private def merged(spark: SparkSession, base: String): DataFrame = {
    val fs = hadoopFs(spark, base)
    val root = new org.apache.hadoop.fs.Path(histRoot(base))
    if (!FoldStore.exists(fs, root))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], histSchema)
    spark.read.schema(histSchema)
      .option("recursiveFileLookup", "true").parquet(root.toString)
      .groupBy(col("v"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** The always-current `(lo_cut, hi_cut, n)` — exact order
    * statistics over the merged histogram (batch k rule:
    * `clamp(ceil(n·ppm/10⁶), 1, n)`); a 0-row relation when nothing
    * has been folded. */
  def cuts(spark: SparkSession, base: String, loPpm: Long,
      hiPpm: Long): DataFrame = {
    require(loPpm >= 0 && hiPpm <= 1000000L && loPpm <= hiPpm,
      s"need 0 <= loPpm <= hiPpm <= 1e6 (got $loPpm, $hiPpm)")
    // two-phase cumulation (r14): values are raw DOUBLES, so the
    // histogram of a continuous column approximates the corpus and
    // an unpartitioned Window.orderBy would funnel it into ONE task
    val hist = merged(spark, base)
    val cum = graft.operators.Packing.cumSumOrdered(hist,
      "v", "cnt", cumCol = "cum", totalCol = Some("n"))
    cum
      .where(col("n") > 0L)
      .withColumn("__klo", expr(
        s"greatest(least((n * ${loPpm}L + 999999L) div 1000000L, n), 1L)"))
      .withColumn("__khi", expr(
        s"greatest(least((n * ${hiPpm}L + 999999L) div 1000000L, n), 1L)"))
      .agg(min(when(col("cum") >= col("__klo"), col("v"))).as("lo_cut"),
        min(when(col("cum") >= col("__khi"), col("v"))).as("hi_cut"),
        max(col("n")).as("n"))
      .where(col("n").isNotNull)
  }

  /** Clamp `rows` against the current cuts — the batch
    * [[graft.operators.Profiler.winsorize]] output shape
    * `(id, value, lo_cut, hi_cut, winsorized, clipped)`. */
  def winsorized(spark: SparkSession, base: String, rows: DataFrame,
      idCol: String, valueCol: String, loPpm: Long,
      hiPpm: Long): DataFrame =
    rows.select(col(idCol).cast("long").as("id"),
        col(valueCol).as("value"))
      .where(col("value").isNotNull)
      .crossJoin(broadcast(cuts(spark, base, loPpm, hiPpm)))
      .select(col("id"), col("value"), col("lo_cut"), col("hi_cut"),
        least(greatest(col("value"), col("lo_cut")), col("hi_cut"))
          .as("winsorized"),
        (col("value") < col("lo_cut") || col("value") > col("hi_cut"))
          .cast("long").as("clipped"))

  // ------------------------- per-GROUP twin -------------------------
  // The streamed half of Profiler.winsorizeByGroup (r14 — the
  // {winsorize, conformal} × {global, per-group} × {batch, streamed}
  // matrix had these two streamed-grouped cells empty): the additive
  // histogram gains a group column (the StreamingEcdf fold shape), and
  // the read side is the batch per-group construction verbatim over
  // the merged (group, v, cnt) relation.

  private val ghistSchema = StructType(Seq(
    StructField("group", StringType), StructField("v", DoubleType),
    StructField("cnt", LongType)))

  private def ghistRoot(base: String) = s"$base/gvhist"

  /** [[fold]] with one histogram per group. Tag folds a
    * (group, value, count)-weighted checksum (the r14 tag
    * discipline); salt repeating batches with `batchTag` as ever. */
  def foldByGroup(spark: SparkSession, base: String, rows: DataFrame,
      groupCol: String, valueCol: String,
      batchTag: Option[Long] = None): Unit = {
    val delta = rows
      .select(col(groupCol).cast("string").as("group"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("group"), col("v"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    // every factor reduced below 2^31 before multiplying (no overflow)
    val row = delta.agg(count(lit(1)), sum(col("cnt")),
      sum(pmod((pmod(xxhash64(col("group")), lit(1000000007L)) +
        pmod(xxhash64(col("v")), lit(1000000007L))) *
        pmod(col("cnt"), lit(1000000007L)), lit(1000000007L)))).head
    if (row.getLong(0) > 0L) {
      val salt = batchTag.map(b => s"b${b}_").getOrElse("")
      val tag = s"d_$salt${row.getLong(0)}_${row.getLong(1)}_" +
        s"${row.getLong(2)}"
      delta.write.mode("overwrite")
        .parquet(s"${ghistRoot(base)}/$tag")
    }
  }

  /** Merge the grouped delta dirs ([[FoldStore.swap]]). */
  def compactByGroup(spark: SparkSession, base: String): Unit = {
    val fs = hadoopFs(spark, base)
    val root = new org.apache.hadoop.fs.Path(ghistRoot(base))
    FoldStore.swap(fs, root) { tmp =>
      mergedByGroup(spark, base).write.mode("overwrite")
        .parquet(tmp.toString)
    }
  }

  private def mergedByGroup(spark: SparkSession,
      base: String): DataFrame = {
    val fs = hadoopFs(spark, base)
    val root = new org.apache.hadoop.fs.Path(ghistRoot(base))
    if (!FoldStore.exists(fs, root))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ghistSchema)
    spark.read.schema(ghistSchema)
      .option("recursiveFileLookup", "true").parquet(root.toString)
      .groupBy(col("group"), col("v"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** The always-current per-group `(group, lo_cut, hi_cut)` — the
    * batch per-group k rule over the merged grouped histogram,
    * cumulated two-phase ([[graft.operators.Packing
    * .cumSumWithinGroups]] — a `Window.partitionBy(group)` would
    * still sort one high-cardinality group's continuous-double
    * histogram in a single task). */
  def cutsByGroup(spark: SparkSession, base: String, loPpm: Long,
      hiPpm: Long): DataFrame = {
    require(loPpm >= 0 && hiPpm <= 1000000L && loPpm <= hiPpm,
      s"need 0 <= loPpm <= hiPpm <= 1e6 (got $loPpm, $hiPpm)")
    graft.operators.Packing.cumSumWithinGroups(
        mergedByGroup(spark, base), "group", "v", "cnt",
        cumCol = "__cum", totalCol = Some("__n"))
      .withColumn("__klo", expr(
        s"greatest(least((__n * ${loPpm}L + 999999L) div 1000000L, __n), 1L)"))
      .withColumn("__khi", expr(
        s"greatest(least((__n * ${hiPpm}L + 999999L) div 1000000L, __n), 1L)"))
      .groupBy(col("group"))
      .agg(min(when(col("__cum") >= col("__klo"), col("v")))
          .as("lo_cut"),
        min(when(col("__cum") >= col("__khi"), col("v")))
          .as("hi_cut"))
  }

  /** Clamp `rows` against the current per-group cuts — the batch
    * [[graft.operators.Profiler.winsorizeByGroup]] output shape
    * `(id, group, value, lo_cut, hi_cut, winsorized, clipped)`; rows
    * of groups never folded drop, exactly like the batch inner
    * join (fold-then-clamp callers never hit that edge). */
  def winsorizedByGroup(spark: SparkSession, base: String,
      rows: DataFrame, idCol: String, groupCol: String,
      valueCol: String, loPpm: Long, hiPpm: Long): DataFrame =
    rows.select(col(idCol).cast("long").as("id"),
        col(groupCol).cast("string").as("group"),
        col(valueCol).as("value"))
      .where(col("value").isNotNull)
      .join(cutsByGroup(spark, base, loPpm, hiPpm), Seq("group"))
      .select(col("id"), col("group"), col("value"), col("lo_cut"),
        col("hi_cut"),
        least(greatest(col("value"), col("lo_cut")), col("hi_cut"))
          .as("winsorized"),
        (col("value") < col("lo_cut") || col("value") > col("hi_cut"))
          .cast("long").as("clipped"))
}
