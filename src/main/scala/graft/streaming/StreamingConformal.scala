package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streamed split-conformal gate — the incremental half of
  * [[graft.operators.Calibration.conformalGate]]: labeled calibration
  * rows arrive continuously and the distribution-free keep threshold
  * stays current.
  *
  * The decomposition: the exact order statistic needs the calibration
  * MULTISET, but a value HISTOGRAM `(nonconf, cnt)` carries the same
  * information and its counts are ADDITIVE — so each fold appends one
  * batch-sized histogram delta, and the read side recovers the exact
  * `k = ceil((n+1)(1−α))`-th smallest value as the first histogram
  * value whose running count reaches `k` (a window over the
  * value-range-sized histogram, never the corpus). The gate after any
  * prefix of folds therefore equals the batch `conformalGate` over
  * everything seen VERBATIM, for any batch split and arrival order
  * (q_conformal_stream shares the batch oracle).
  *
  * Replay/crash contract: delta directory names derive from the
  * batch's CONTENT and are written with overwrite — a crash-replayed
  * fold rewrites the same directory instead of double-counting;
  * [[compact]] merges the tiny dirs stage-and-swap (the
  * [[StreamingCalibration]] idiom, single-writer folds).
  *
  * The idiom's inherent trade (shared by every content-addressed fold
  * in this package, and MORE likely to bite here than in
  * [[StreamingEval]]: calibration batches are small histograms that
  * can genuinely repeat verbatim — e.g. repeated single-value
  * batches): two DIFFERENT batches whose delta content is
  * byte-identical alias as a crash replay and are counted ONCE,
  * silently biasing the threshold. Callers whose batches can repeat
  * must salt the directory tag with [[fold]]'s `batchTag` (the
  * micro-batch id Structured Streaming hands foreachBatch is the
  * natural value) — replays of the same batch id still overwrite
  * idempotently, while distinct identical-content batches stay
  * distinct. */
object StreamingConformal {

  private val histSchema = StructType(Seq(
    StructField("nonconf", LongType), StructField("cnt", LongType)))

  private def histRoot(base: String) = s"$base/hist"

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Wipe the artifact directory (fresh run). */
  def init(spark: SparkSession, base: String): Unit = {
    hadoopFs(spark, base).delete(new org.apache.hadoop.fs.Path(base), true)
    ()
  }

  /** Fold one micro-batch: histogram its CALIBRATION rows and stage
    * the additive delta under a content-derived directory — salted
    * with `batchTag` when supplied (see the object doc: REQUIRED for
    * callers whose batches can repeat byte-identically; pass the
    * foreachBatch micro-batch id). */
  def fold(spark: SparkSession, base: String, rows: DataFrame,
      nonconfCol: String, calCol: String,
      batchTag: Option[Long] = None): Unit = {
    val delta = rows
      .where(col(calCol).cast("boolean"))
      .select(col(nonconfCol).cast("long").as("nonconf"))
      .groupBy(col("nonconf"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val row = delta.agg(count(lit(1)), sum(col("cnt")),
      min(col("nonconf")), max(col("nonconf")),
      sum(expr("nonconf * cnt % 1000000007L"))).head
    if (row.getLong(0) > 0L) {
      val salt = batchTag.map(b => s"b${b}_").getOrElse("")
      val tag = s"d_$salt${row.getLong(1)}_${row.getLong(2)}_" +
        s"${row.getLong(3)}_${row.getLong(4)}"
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
      .groupBy("nonconf")
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** The always-current `(thr, n_cal)` — exact order statistic over
    * the merged histogram; `+∞` (fail-open) when
    * `k = ceil((n+1)(1−α)) > n` or nothing has been seen. */
  def threshold(spark: SparkSession, base: String,
      alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 0 && alphaPpm < 1000000L,
      s"alphaPpm must be in [0, 1e6) (got $alphaPpm)")
    // two-phase cumulation (r14): nonconformities are raw BIGINTs, so
    // a continuous-valued score makes the histogram corpus-sized and
    // an unpartitioned Window.orderBy would funnel it into ONE task
    val hist = merged(spark, base)
    val cum = graft.operators.Packing.cumSumOrdered(hist,
      "nonconf", "cnt", cumCol = "cum", totalCol = Some("n_cal"))
    val keepPpm = 1000000L - alphaPpm
    // one aggregate: thr = first value whose running count reaches k
    // (null when k > n or the histogram is empty → fail OPEN)
    cum
      .withColumn("__k", expr(
        s"((n_cal + 1L) * ${keepPpm}L + 999999L) div 1000000L"))
      .agg(min(when(col("cum") >= col("__k"), col("nonconf")))
          .as("__thr"),
        max(col("n_cal")).as("__n"))
      .select(coalesce(col("__thr"), lit(Long.MaxValue)).as("thr"),
        coalesce(col("__n"), lit(0L)).as("n_cal"))
  }

  /** Gate `rows` with the current threshold — the batch
    * [[graft.operators.Calibration.conformalGate]] output shape
    * `(id, nonconf, is_cal, thr, n_cal, kept)`. */
  def gate(spark: SparkSession, base: String, rows: DataFrame,
      idCol: String, nonconfCol: String, calCol: String,
      alphaPpm: Long): DataFrame = {
    val thr = broadcast(threshold(spark, base, alphaPpm))
    rows.select(col(idCol).cast("long").as("id"),
        col(nonconfCol).cast("long").as("nonconf"),
        col(calCol).cast("boolean").as("is_cal"))
      .crossJoin(thr)
      .select(col("id"), col("nonconf"), col("is_cal"), col("thr"),
        col("n_cal"), (col("nonconf") <= col("thr")).as("kept"))
  }

  // ------------------------- per-GROUP twin -------------------------
  // The streamed half of Calibration.conformalGateByGroup (r14 — the
  // last empty cell of the {winsorize, conformal} × {global,
  // per-group} × {batch, streamed} matrix): the additive calibration
  // histogram gains a group column, the read side reruns the batch
  // per-group order statistic on the merged relation, and groups with
  // no folded calibration rows FAIL OPEN exactly like the batch left
  // join.

  private val ghistSchema = StructType(Seq(
    StructField("group", StringType), StructField("nonconf", LongType),
    StructField("cnt", LongType)))

  private def ghistRoot(base: String) = s"$base/ghist"

  /** [[fold]] with one calibration histogram per group. */
  def foldByGroup(spark: SparkSession, base: String, rows: DataFrame,
      groupCol: String, nonconfCol: String, calCol: String,
      batchTag: Option[Long] = None): Unit = {
    val delta = rows
      .where(col(calCol).cast("boolean"))
      .select(col(groupCol).cast("string").as("group"),
        col(nonconfCol).cast("long").as("nonconf"))
      .groupBy(col("group"), col("nonconf"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    // every factor reduced below 2^31 before multiplying (no overflow)
    val row = delta.agg(count(lit(1)), sum(col("cnt")),
      sum(pmod((pmod(xxhash64(col("group")), lit(1000000007L)) +
        pmod(col("nonconf"), lit(1000000007L))) *
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
      .groupBy(col("group"), col("nonconf"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** The always-current per-group `(group, thr, n_cal)` — the batch
    * `k = ceil((n+1)(1−α))` rule per group over the merged grouped
    * histogram, cumulated two-phase
    * ([[graft.operators.Packing.cumSumWithinGroups]]). */
  def thresholdByGroup(spark: SparkSession, base: String,
      alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 0 && alphaPpm < 1000000L,
      s"alphaPpm must be in [0, 1e6) (got $alphaPpm)")
    val keepPpm = 1000000L - alphaPpm
    graft.operators.Packing.cumSumWithinGroups(
        mergedByGroup(spark, base), "group", "nonconf", "cnt",
        cumCol = "__cum", totalCol = Some("n_cal"))
      .withColumn("__k", expr(
        s"((n_cal + 1L) * ${keepPpm}L + 999999L) div 1000000L"))
      .groupBy(col("group"))
      .agg(coalesce(min(when(col("__cum") >= col("__k"),
          col("nonconf"))), lit(Long.MaxValue)).as("thr"),
        max(col("n_cal")).as("n_cal"))
  }

  /** Gate `rows` per group — the batch
    * [[graft.operators.Calibration.conformalGateByGroup]] output
    * shape `(id, group, nonconf, is_cal, thr, n_cal, kept)`; groups
    * never folded fail OPEN (left join + `+∞`), exactly the batch
    * rule. */
  def gateByGroup(spark: SparkSession, base: String, rows: DataFrame,
      idCol: String, groupCol: String, nonconfCol: String,
      calCol: String, alphaPpm: Long): DataFrame =
    rows.select(col(idCol).cast("long").as("id"),
        col(groupCol).cast("string").as("group"),
        col(nonconfCol).cast("long").as("nonconf"),
        col(calCol).cast("boolean").as("is_cal"))
      .join(thresholdByGroup(spark, base, alphaPpm), Seq("group"),
        "left")
      .select(col("id"), col("group"), col("nonconf"), col("is_cal"),
        coalesce(col("thr"), lit(Long.MaxValue)).as("thr"),
        coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        (col("nonconf") <=
          coalesce(col("thr"), lit(Long.MaxValue))).as("kept"))
}
