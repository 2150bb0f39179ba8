package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streamed DSIR — the incremental half of
  * [[graft.operators.Dsir.dsirWeights]]: the raw corpus arrives
  * continuously (the target exemplar sample is FIXED — it is the
  * definition of the domain being selected for), and the importance
  * weights stay current over everything seen, so a live ingest can be
  * scored against an always-up-to-date background distribution.
  *
  * The decomposition rides the batch operator's own split: the
  * corpus-facing stage is ONE hashed-feature count relation
  * `(b, cnt)` whose counts are ADDITIVE — each fold appends one
  * ≤ m-row delta; the weight arithmetic (add-one smoothing, the
  * single-ln micro-nat cell weights) reruns READ-side against the
  * fixed target counts, and scoring any slice is one broadcast join.
  * Scoring the union of everything folded therefore equals the batch
  * `dsirWeights` VERBATIM for any split and arrival order
  * (q_dsir_weights_stream shares the batch oracle).
  *
  * Replay/crash contract: content-derived delta dir names (cell
  * count, total, count-weighted checksum) + overwrite; [[compact]]
  * merges via the crash-safe [[FoldStore.swap]]; callers whose
  * batches can repeat byte-identically salt with `batchTag` (the
  * package-wide caveat). */
object StreamingDsir {

  private val histSchema = StructType(Seq(
    StructField("b", LongType), StructField("cnt", LongType)))

  private def histRoot(base: String) = s"$base/cells"

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Wipe the artifact directory (fresh run). */
  def init(spark: SparkSession, base: String): Unit = {
    hadoopFs(spark, base).delete(new org.apache.hadoop.fs.Path(base), true)
    ()
  }

  /** Fold one micro-batch of raw documents: hashed-feature counts
    * (the batch stage) staged as an additive ≤ m-row delta. */
  def fold(spark: SparkSession, base: String, rows: DataFrame,
      idCol: String, textCol: String, buckets: Int = 1024,
      batchTag: Option[Long] = None): Unit = {
    val delta = graft.operators.Dsir
      .featureCells(rows, idCol, textCol, buckets)
      .groupBy(col("b")).agg(count(lit(1)).cast("long").as("cnt"))
    // factors reduced below 2^31 before multiplying (no overflow)
    val row = delta.agg(count(lit(1)), sum(col("cnt")),
      sum(pmod(pmod(col("b"), lit(1000000007L)) *
        pmod(col("cnt"), lit(1000000007L)), lit(1000000007L)))).head
    if (row.getLong(0) > 0L) {
      val salt = batchTag.map(b => s"b${b}_").getOrElse("")
      val tag = s"d_$salt${row.getLong(0)}_${row.getLong(1)}_" +
        s"${row.getLong(2)}"
      delta.write.mode("overwrite")
        .parquet(s"${histRoot(base)}/$tag")
    }
  }

  /** Merge accumulated delta dirs ([[FoldStore.swap]]). */
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
      .groupBy(col("b"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** Score `rows` against everything folded so far — the batch
    * [[graft.operators.Dsir.dsirWeights]] output shape
    * `(doc_id, n_feats, logratio_micro, kept)`. The q side is the
    * merged fold state; `target` is the fixed exemplar sample. */
  def weights(spark: SparkSession, base: String, rows: DataFrame,
      target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 1024): DataFrame =
    graft.operators.Dsir.scoreAgainstCounts(
      rows, target,
      merged(spark, base).select(col("b"), col("cnt").as("cq")),
      idCol, textCol, buckets)
}
