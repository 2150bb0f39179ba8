package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One incoming document on a packing stream (tokens are whitespace
  * words, counted with the same rule as the batch path). */
final case class PackDoc(source: String, doc_id: Long, n_tokens: Long)

/** A document with its assigned position in its source's packed token
  * stream. */
final case class PackedDoc(source: String, doc_id: Long, n_tokens: Long,
    offset: Long, first_pack: Long, last_pack: Long)

/** Streaming counterpart of [[graft.operators.Packing]]: as documents
  * arrive, each SOURCE's token stream is packed incrementally — every doc
  * gets its running offset and pack range the moment it is processed,
  * instead of waiting for a batch prefix-sum over the whole corpus.
  *
  * State is ONE long per source (the next free token offset), checkpointed
  * by the state store — a restart resumes exactly where the stream left
  * off (same replay story as the alert edge-trigger, SURVEY.md §2.9 T4).
  * Within a micro-batch a source's documents are processed in doc_id
  * order, so replays of a committed batch assign identical offsets.
  * Sources are independent keys: packing scales out across sources, and
  * one hot source is still a single sequential token stream by DEFINITION
  * (offsets are a total order), so per-source throughput is the inherent
  * ceiling — the batch two-phase prefix sum is the right tool once the
  * corpus is static.
  */
object StreamingPacking {

  /** Artifact-backed packing fold — the micro-batch twin of
    * [[packStream]] for foreachBatch pipelines
    * ([[StreamingCleanPack]]): fold one batch of ALREADY-COUNTED
    * documents `(doc_id, n_tokens)` into the packed artifact under
    * `base`, offsets continuing from the stored cursor. The batch is
    * packed by the batch operator's own two-phase prefix sum
    * ([[graft.operators.Packing.packCounted]] with the cursor as
    * baseOffset — no single-partition window even on a huge fold),
    * appended, and the 1-row cursor is advanced. Offsets are final on
    * append: the composition contract is ASCENDING doc_id across
    * folds (crawl order — the same total order the batch prefix sum
    * uses), under which streamed packing equals the batch pack of
    * everything seen. */
  def foldCounted(spark: org.apache.spark.sql.SparkSession, base: String,
      counted: DataFrame, packSize: Int): Unit = {
    val packedPath = s"$base/packed"
    val cursorPath = s"$base/cursor"
    val cur = readCursor(spark, cursorPath)
    val batchPacked = graft.operators.Packing
      .packCounted(counted, packSize, baseOffset = cur)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Advance the cursor BEFORE the append. The append to packedPath
    // triggers Spark's recache-by-path on every cached plan that reads
    // that path — which includes this very batch (the caller's counted
    // lineage anti-joins the packed artifact). A post-append aggregate
    // would therefore RECOMPUTE against the just-extended artifact,
    // see an empty fresh set, and silently coalesce to the stale
    // cursor (observed: every fold re-wrote fold 1's cursor).
    val next = batchPacked
      .agg(coalesce(max(col("offset") + col("n_tokens")), lit(cur)))
      .head.getLong(0)
    batchPacked.write.mode("append").parquet(packedPath)
    batchPacked.unpersist()
    // APPEND-ONLY cursor log, max-wins: an overwritten single-row file
    // can be served stale by the session's file-listing cache (observed:
    // a third fold reading the first fold's cursor), while appended
    // files are always discovered — the same reason every other
    // artifact here is append-only. One tiny row per fold.
    spark.createDataFrame(Seq(Tuple1(next))).toDF("next_off")
      .coalesce(1).write.mode("append").parquet(cursorPath)
  }

  /** The packed artifact view:
    * `(doc_id, n_tokens, offset, first_pack, last_pack)`. */
  def packed(spark: org.apache.spark.sql.SparkSession,
      base: String): DataFrame = {
    val path = s"$base/packed"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("first_pack",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("last_pack",
        org.apache.spark.sql.types.LongType)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def readCursor(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) {
      val rows = spark.read.parquet(path)
        .agg(max(col("next_off"))).collect()
      if (rows.isEmpty || rows.head.isNullAt(0)) 0L else rows.head.getLong(0)
    } else 0L
  }

  /** docs: streaming DataFrame with (source STRING, doc_id LONG,
    * text STRING). */
  def packStream(docs: DataFrame, packSize: Int): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        size(expr(graft.operators.Dedup.wordsExpr("text"))).cast("long")
          .as("n_tokens"))
      .where(col("n_tokens") > 0)
      .as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[PackDoc], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val o = off
            off += d.n_tokens
            PackedDoc(src, d.doc_id, d.n_tokens, o,
              o / packSize, (o + d.n_tokens - 1) / packSize)
          }
          state.update(off)
          out.iterator
      }
  }
}
