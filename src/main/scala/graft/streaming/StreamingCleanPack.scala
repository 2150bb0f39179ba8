package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.multimodal.ArchiveRecord

/** The full streamed training-data pipeline, composed end to end:
  * ARCHIVES IN → contiguous token-packed training rows OUT,
  * incrementally. Each micro-batch folds through
  *  1. the clean stages ([[StreamingCorpusClean]]: record split,
  *     normalize + language/quality gates, exact dedup, banded
  *     near-dedup against the append-only artifact state),
  *  2. token counting over the fold's NEWLY surviving documents —
  *     either the whitespace rule (the batch q_clean_pack semantics)
  *     or an artifact-served trained tokenizer
  *     ([[graft.operators.UnigramLM.encodeWith]] on a stored
  *     `(piece, cnt)` vocabulary — train once, serve every fold),
  *  3. the packing fold ([[StreamingPacking.foldCounted]]: the batch
  *     two-phase prefix sum with the stored cursor as base offset,
  *     appended to the packed artifact).
  *
  * "Newly surviving" is computed as cleaned-so-far ANTI-JOIN
  * already-packed — so every survivor is packed exactly ONCE no
  * matter which fold it cleans in, and replayed folds are no-ops
  * (at-least-once safety, the [[StreamingCorpusClean]] discipline).
  *
  * Equality contract: under ASCENDING doc_id arrival (crawl order —
  * ALSO the order the batch prefix sum packs), the packed artifact
  * after any prefix of folds equals the batch
  * clean→count→[[graft.operators.Packing.packCounted]] of everything
  * seen (q_clean_pack_stream / q_clean_tokenize_pack_stream share
  * their batch twins' oracles verbatim; the 3-fold == batch spec pins
  * it). Out-of-order arrival keeps packing append-consistent (offsets
  * never rewrite) but can diverge from the batch total order — the
  * documented seam, inherent to "offsets are final on append".
  *
  * Artifact-refresh seam: the tokenizer vocabulary is read lazily per
  * fold, so a refreshed artifact affects only LATER folds — packed
  * rows are immutable once appended, exactly the production story
  * (retrain ⇒ new packed epoch, never a rewrite).
  *
  * Scale notes (100 TB): per fold, clean work is batch-proportional
  * (plus the established artifact merge-on-read scans), the count is
  * a fold-sized tokenizer pass, and packing shuffles only the fold.
  * The packed artifact is append-only partitioned parquet.
  */
object StreamingCleanPack {

  private def cleanBase(base: String) = s"$base/clean"
  private def packBase(base: String) = s"$base/pack"

  /** Wipe all artifacts (fresh run). */
  def init(spark: SparkSession, base: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Fold one micro-batch of raw documents through clean → count →
    * pack. `vocab = Some(v)` counts tokens with the trained
    * vocabulary; `None` uses the whitespace rule. */
  def foldDocs(spark: SparkSession, base: String, batch: DataFrame,
      idCol: String, textCol: String, packSize: Int = 256,
      vocab: Option[DataFrame] = None, lang: String = "en",
      minQuality: Long = 3000L, jaccard: Double = 0.8): Unit = {
    StreamingCorpusClean.foldDocs(spark, cleanBase(base), batch,
      idCol, textCol, lang, minQuality, jaccard)
    packNew(spark, base, packSize, vocab)
  }

  /** Fold one micro-batch of `.warc.zst` ARCHIVES end to end. */
  def foldWarcZst(spark: SparkSession, base: String,
      archives: Dataset[ArchiveRecord], packSize: Int = 256,
      vocab: Option[DataFrame] = None, lang: String = "en",
      minQuality: Long = 3000L, jaccard: Double = 0.8): Unit = {
    StreamingCorpusClean.foldWarcZst(spark, cleanBase(base), archives,
      lang, minQuality, jaccard)
    packNew(spark, base, packSize, vocab)
  }

  private def packNew(spark: SparkSession, base: String, packSize: Int,
      vocab: Option[DataFrame]): Unit = {
    val fresh = StreamingCorpusClean.cleaned(spark, cleanBase(base))
      .join(packed(spark, base).select("doc_id"), Seq("doc_id"),
        "left_anti")
    val counted = vocab match {
      case None =>
        fresh.select(col("doc_id"),
          size(expr(graft.operators.Dedup.wordsExpr("norm_text")))
            .cast("long").as("n_tokens"))
      case Some(v) =>
        graft.operators.UnigramLM
          .encodeWith(fresh, "doc_id", "norm_text", v)
          .select(col("doc_id"), col("n_tokens"))
    }
    StreamingPacking.foldCounted(spark, packBase(base), counted, packSize)
  }

  /** The packed training-row artifact:
    * `(doc_id, n_tokens, offset, first_pack, last_pack)`. */
  def packed(spark: SparkSession, base: String): DataFrame =
    StreamingPacking.packed(spark, packBase(base))

  /** The ONE-flow surface: attach the whole composition to a live
    * archive stream via foreachBatch (at-least-once after recovery;
    * both folds make replays no-ops). */
  def attach(archives: Dataset[ArchiveRecord], base: String,
      checkpoint: String, packSize: Int = 256,
      vocab: Option[DataFrame] = None): StreamingQuery =
    archives.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (ds: Dataset[ArchiveRecord], _: Long) =>
        foldWarcZst(ds.sparkSession, base, ds, packSize, vocab)
      }
      .start()
}
