package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical training-corpus cleaning pipeline, composed from the
  * engine's operators (SURVEY.md §2.11) into one deterministic flow:
  *
  *   normalize → language filter → quality filter → exact dedup →
  *   MinHash near-dup dedup → survivors
  *
  * Every stage is a declarative transformation, so Catalyst plans the
  * whole pipeline as one job graph: the normalization/scoring stages are
  * stateless row maps fused into the scan; the two dedup stages are the
  * only shuffles (hash on text digest, then LSH band exchange). Drop
  * decisions are deterministic (smallest doc_id survives; in a verified
  * near-dup pair the larger id drops), so the pipeline is reproducible
  * run-over-run and DuckDB-oracle-checkable end to end.
  */
object CorpusClean {

  /** Whitespace-collapse + trim + lowercase — the normalization every
    * stage downstream keys on. */
  def normExpr(textCol: String): String =
    s"lower(trim(regexp_replace($textCol, '\\\\s+', ' ')))"

  /** @param minQuality   minimum integer quality score
    *                     (see [[TextAnalysis.qualityScore]]; 0..100000)
    * @param lang         keep documents whose stopword language ID is this
    * @param jaccard      near-dup drop threshold on true shingle Jaccard
    * @return surviving (doc_id, norm_text) rows
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQuality: Long = 3000L,
      jaccard: Double = 0.8): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    // Native kernels for the scan's inner loop: `norm_ws` replaces the
    // \s+ regex (byte-identical output), and `clean_gate` fuses
    // language-ID + quality scoring into ONE boolean predicate per row.
    // The predicate SHAPE matters as much as kernel speed: the generic
    // languageId→filter→qualityScore→filter composition exposes score
    // columns, and predicate pushdown inlines their whole
    // tokenize-and-score expression trees into every consumer below
    // (measured: 69 copies of the norm regex in that plan). A single
    // boolean kernel evaluates once per row; the generic operators keep
    // their own oracled queries (q_lang_id, q_quality).
    val filtered = docs
      .select(col(idCol).cast("long").as("doc_id"),
        call_function("norm_ws", col(textCol)).as("norm_text"))
      .where(call_function("clean_gate",
        col("norm_text"), lit(lang), lit(minQuality)))

    // exact dedup: smallest doc_id per identical normalized text;
    // read again by the near-dup pass and the final anti-join
    val exactKeep = Dedup.dropExactDuplicates(filtered, "doc_id", "norm_text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near-dup dedup among exact survivors: larger id of each verified
    // pair drops (chains collapse to their smallest member)
    val dropIds = Dedup.minhashPairs(exactKeep, "doc_id", "norm_text", jaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    exactKeep.join(dropIds, Seq("doc_id"), "left_anti")
      .select("doc_id", "norm_text")
  }
}
