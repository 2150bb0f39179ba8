package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — sub-document deduplication, the
  * verb that catches what whole-document dedup cannot: two documents
  * sharing a boilerplate block (license header, navigation footer,
  * quoted reply chain) dedup at the CHUNK level even though their
  * document hashes differ. The chunking is CONTENT-defined (the FastCDC
  * idea, Xia et al. 2016, re-expressed over word streams): a chunk
  * boundary falls after word i iff the rolling 3-gram hash ending at i
  * satisfies `h % mask == 0`, so identical text spans chunk identically
  * WHEREVER they appear — insertions before a shared block shift its
  * position but not its chunk boundaries (the property fixed-width
  * chunking lacks).
  *
  * Determinism: the rolling hash is the engine-wide md5-derived h60 of
  * the space-joined 3-gram (the shingle convention); chunk identity is
  * h60 of the space-joined chunk words; the FIRST occurrence of a
  * chunk hash is the minimum `(doc_id, chunk_idx)` — every other
  * occurrence (cross-doc or within-doc repeat) counts as duplicated.
  * `mask = 16` targets ~16-word average chunks (geometric boundary
  * spacing); min/max chunk bounds are a production knob FastCDC adds
  * for variance control — deliberately omitted here, the boundary rule
  * alone carries the semantics.
  *
  * Distribution shape (the 100 TB contract): one per-DOC window for
  * the two lags + the boundary prefix sum (doc-keyed, the
  * SFT/preference discipline — documents are many), one groupBy to
  * chunk instances, one corpus-sized groupBy on chunk HASH (the dedup
  * exchange — this is the operator's point; it shuffles 8-byte hashes,
  * not text), a first-occurrence broadcast-unfriendly join back on the
  * hash (same partitioning, no extra exchange), and a per-doc rollup.
  * Everything is linear in the corpus; nothing is all-pairs.
  *
  * Reference scope: the reference engine has no text processing at all
  * — its payload bytes are consumed only via `.length`
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:42);
  * sub-document dedup is part of the declared extension surface
  * (SURVEY.md §2.11).
  */
object Cdc {

  /** The chunking stage alone:
    * `(doc_id, chunk_idx, chunk_hash, n_words)` — content-defined, so
    * a document's chunks are identical whatever corpus slice it
    * arrives in (what lets [[graft.streaming.StreamingCdc]] chunk each
    * micro-batch in isolation). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      mask: Long = 16L): DataFrame = {
    require(mask >= 1, s"mask must be >= 1 (got $mask)")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(expr(Dedup.wordsExpr(textCol)))
          .as(Seq("pos", "word")))
      .withColumn("w1", lag(col("word"), 1).over(byPos))
      .withColumn("w2", lag(col("word"), 2).over(byPos))
      .withColumn("boundary",
        when(col("w2").isNotNull &&
          expr(s"${Dedup.h60raw("concat_ws(' ', w2, w1, word)")} % $mask")
            === 0, 1L).otherwise(0L))
      .withColumn("chunk_idx",
        coalesce(sum(col("boundary")).over(
          byPos.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    words
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word"))).as("chunk_text"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"${Dedup.h60raw("chunk_text")}").as("chunk_hash"),
        col("n_words"))
  }

  /** Chunk instances with first-occurrence marking:
    * `(doc_id, chunk_idx, chunk_hash, n_words, is_dup)` — `is_dup` for
    * every instance that is not its hash's global minimum
    * `(doc_id, chunk_idx)`, computed as a PACKED
    * `(doc_id·2^20 + chunk_idx)` min — one BIGINT aggregate both
    * engines compute identically; valid while chunk_idx < 2^20 (a
    * million boundaries per document — far above any real document). */
  def chunkInstances(docs: DataFrame, idCol: String, textCol: String,
      mask: Long = 16L): DataFrame = {
    val ch = chunks(docs, idCol, textCol, mask)
    val first = ch
      .groupBy(col("chunk_hash"))
      .agg(min(col("doc_id") * lit(1L << 20) + col("chunk_idx"))
        .as("fpack"))
    ch.join(first, Seq("chunk_hash"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"),
        col("n_words"),
        (col("doc_id") * lit(1L << 20) + col("chunk_idx") =!=
          col("fpack")).cast("long").as("is_dup"))
  }

  /** Per-document CDC dedup report:
    * `(doc_id, n_chunks, n_words, dup_chunks, dup_words, dup_ppm)` —
    * the share of a document's words that are chunk-level duplicates
    * of content seen elsewhere (or earlier in the same document). */
  def dedupReport(docs: DataFrame, idCol: String, textCol: String,
      mask: Long = 16L): DataFrame =
    chunkInstances(docs, idCol, textCol, mask)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(col("n_words")).cast("long").as("n_words"),
        sum(col("is_dup")).cast("long").as("dup_chunks"),
        sum(col("is_dup") * col("n_words")).cast("long").as("dup_words"))
      .select(col("doc_id"), col("n_chunks"), col("n_words"),
        col("dup_chunks"), col("dup_words"),
        expr("dup_words * 1000000L div n_words").as("dup_ppm"))
}
