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
  * overwrite; [[compact]] merges stage-and-swap; callers whose
  * batches can repeat byte-identically salt with `batchTag` (the
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
    val row = delta.agg(count(lit(1)), sum(col("cnt")),
      min(col("v")), max(col("v"))).head
    if (row.getLong(0) > 0L) {
      val salt = batchTag.map(b => s"b${b}_").getOrElse("")
      val tag = (s"d_$salt${row.getLong(1)}_" +
        s"${row.getDouble(2)}_${row.getDouble(3)}")
        .replace('.', 'p').replace('-', 'm')
      delta.write.mode("overwrite")
        .parquet(s"${histRoot(base)}/$tag")
    }
  }

  /** Merge accumulated delta dirs into one (stage-and-swap). */
  def compact(spark: SparkSession, base: String): Unit = {
    val fs = hadoopFs(spark, base)
    val root = new org.apache.hadoop.fs.Path(histRoot(base))
    if (!fs.exists(root)) return
    val tmp = new org.apache.hadoop.fs.Path(histRoot(base) + "_c")
    merged(spark, base).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(root, true)
    fs.rename(tmp, root)
    ()
  }

  private def merged(spark: SparkSession, base: String): DataFrame = {
    val fs = hadoopFs(spark, base)
    val root = new org.apache.hadoop.fs.Path(histRoot(base))
    if (!fs.exists(root))
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
    val hist = merged(spark, base)
    // value-range-sized relation: the unpartitioned window is bounded
    // by distinct values, never the corpus
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val n = cum.agg(coalesce(max(col("cum")), lit(0L)).as("n"))
    cum.crossJoin(broadcast(n))
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
}
