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
    val filtered = gateFiltered(docs, idCol, textCol, lang, minQuality)

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

  /** The fused normalize + language/quality gate stage (shared by
    * [[clean]] and [[funnel]]). */
  private def gateFiltered(docs: DataFrame, idCol: String,
      textCol: String, lang: String, minQuality: Long): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        call_function("norm_ws", col(textCol)).as("norm_text"))
      .where(call_function("clean_gate",
        col("norm_text"), lit(lang), lit(minQuality)))

  /** Per-document drop-reason attribution — the funnel at document
    * granularity, the "why was my document dropped?" surface a
    * production pipeline exposes for debugging and appeals: one row
    * per input document with its FATE, the first stage that dropped
    * it (`gate` → `exact_dup` → `near_dup`) or `kept`. Stages are the
    * exact [[clean]] stages (shared code, not a re-derivation).
    *
    * Distribution shape: three id-keyed membership left-joins (gate
    * survivors, exact keepers, final survivors) over one shared
    * persisted pass — corpus-linear, no windows, no pairs. */
  def dropReasons(docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQuality: Long = 3000L,
      jaccard: Double = 0.8): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val all = docs.select(col(idCol).cast("long").as("doc_id"))
    val filtered = gateFiltered(docs, idCol, textCol, lang, minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactKeep = Dedup.dropExactDuplicates(filtered, "doc_id", "norm_text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropIds = Dedup.minhashPairs(exactKeep, "doc_id", "norm_text", jaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    val kept = exactKeep.join(dropIds, Seq("doc_id"), "left_anti")
    val out = all
      .join(filtered.select(col("doc_id"), lit(1L).as("__g")),
        Seq("doc_id"), "left")
      .join(exactKeep.select(col("doc_id"), lit(1L).as("__e")),
        Seq("doc_id"), "left")
      .join(kept.select(col("doc_id"), lit(1L).as("__k")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__g").isNull, "gate")
          .when(col("__e").isNull, "exact_dup")
          .when(col("__k").isNull, "near_dup")
          .otherwise("kept").as("fate"))
    // materialization is the caller's (the registry drains eagerly);
    // the two persists cover exactly the multi-consumer relations and
    // are released when the session's cache clears (Verify/Bench both
    // clearCache between queries)
    out
  }

  /** Curation funnel report — the observability surface every
    * production corpus pipeline publishes: per-stage survivor counts
    * and drop rates through input → gate (normalize + language +
    * quality, fused) → exact dedup → near dedup, the exact stages of
    * [[clean]]. Output: `(stage, stage_name, n_docs, drop_ppm)` with
    * `drop_ppm` relative to the PREVIOUS stage (floored ppm, 0 at
    * stage 0).
    *
    * The four counts are scalars (corpus-independent output), so they
    * are materialized eagerly — which also lets the shared exact-keep
    * relation be persisted for exactly the two passes that need it and
    * unpersisted deterministically before returning (no caller-releases
    * contract needed for a report of four numbers). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQuality: Long = 3000L,
      jaccard: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val n0 = docs.count()
    val filtered = gateFiltered(docs, idCol, textCol, lang, minQuality)
    val n1 = filtered.count()
    val exactKeep = Dedup.dropExactDuplicates(filtered, "doc_id", "norm_text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2 = exactKeep.count()
    val dropIds = Dedup.minhashPairs(exactKeep, "doc_id", "norm_text", jaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    val n3 = exactKeep.join(dropIds, Seq("doc_id"), "left_anti").count()
    exactKeep.unpersist()
    def ppm(prev: Long, n: Long): Long =
      if (prev <= 0) 0L else (prev - n) * 1000000L / prev
    spark.createDataset(Seq(
        (0L, "input", n0, 0L),
        (1L, "gate", n1, ppm(n0, n1)),
        (2L, "exact_dedup", n2, ppm(n1, n2)),
        (3L, "near_dedup", n3, ppm(n2, n3))))
      .toDF("stage", "stage_name", "n_docs", "drop_ppm")
  }
}
