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
