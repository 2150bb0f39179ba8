package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact shared-span detection: document pairs that share a VERBATIM run
  * of `w` consecutive words — the span-level complement of MinHash
  * document dedup (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better", public paper: exact substring duplication is
  * what makes models regurgitate; document-level Jaccard misses it when
  * the containing documents are otherwise different).
  *
  * Sliding `w`-gram inventory → equi-join on the gram → pairs. A
  * suffix-array (the paper's single-node tool) doesn't distribute; the
  * gram join is the shuffle-native equivalent with the same output
  * semantics for a fixed window.
  *
  * Scale notes (100 TB):
  *  - The join key is `xxhash64(gram)` — 8 bytes regardless of `w`; the
  *    gram text rides along as payload ONLY for the exact-equality check
  *    inside the same join (for w ≤ ~8 that payload is cheaper than the
  *    two extra corpus-wide shuffles a hash-only join + position-rejoin
  *    verify would cost).
  *  - Per-document gram positions are deduplicated BEFORE the join
  *    (`distinct` on (doc, gram)), so a span repeated 1000× inside one
  *    document contributes one row, not 10⁶ join pairs.
  *  - Corpus-hot spans (a license header shared by millions of docs)
  *    would still square; `maxDf` drops grams whose document frequency
  *    exceeds the cap before pairing — same contract as
  *    [[Dedup.ngramJaccard]]'s hot-shingle cap: pairs supported ONLY by
  *    ubiquitous boilerplate are the pairs you least want anyway, and the
  *    cap turns the worst case from O(df²) to O(df·cap).
  */
object Spans {

  /** Pairs `(doc_a < doc_b, n_shared_spans, first_span)` sharing ≥1 exact
    * `w`-word span (gram df ≤ `maxDf`); `n_shared_spans` counts distinct
    * shared gram strings, `first_span` is the lexicographically first.
    *
    * Plan shape: the gram inventory feeds the hot-df aggregate and both
    * self-join branches; Spark's exchange reuse collapses the identical
    * post-distinct shuffles at runtime (measured: one ReusedExchange in
    * the executed plan), so the expensive exchange is paid once. A
    * many-consumer session at full 100 TB would persist the inventory
    * instead and accept the cache residency — measured here, recompute
    * under exchange reuse is the cheaper side of that tradeoff.
    */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maxDf: Long = 1L << 20): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), expr(Dedup.wordsExpr(textCol)).as("words"))
      .where(expr(s"size(words) >= $w"))
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, size(words) - $w),
             |  i -> array_join(slice(words, i + 1, $w), ' '))""".stripMargin))
          .as("gram"))
      .distinct()
    val keyed = grams.select(col("doc_id"), xxhash64(col("gram")).as("h"),
      col("gram"))
    val hot = keyed.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf)
      .select(col("h"))
    val kept = keyed.join(hot, Seq("h"), "left_anti")
    val a = kept.select(col("doc_id").as("doc_a"), col("h"), col("gram"))
    val b = kept.select(col("doc_id").as("doc_b"), col("h"),
      col("gram").as("gram_b"))
    a.join(b, Seq("h"))
      .where(col("doc_a") < col("doc_b") && col("gram") === col("gram_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_spans"), min(col("gram")).as("first_span"))
  }

  /** Repeated-span REMOVAL — the rewrite step of Lee et al.'s
    * ExactSubstr dedup, word-level: every word position covered by a
    * `w`-gram whose corpus occurrence count (same-doc repeats included)
    * reaches `minCount` is dropped; survivors are reassembled in
    * position order. Output `(doc_id, n_words, n_removed, clean_text)`
    * — every doc appears, fully-scrubbed ones with `clean_text = ''`.
    *
    * Unlike [[sharedSpans]] this never PAIRS occurrences, so there is no
    * df² blowup and no hot-gram cap: the duplicated-hash set is one row
    * per gram, coverage is `w ×` occurrences (linear), and the
    * position-level anti join is a shuffled equi-join on (doc, pos).
    * Reassembly is the order-preserving collect_list(struct(pos, word))
    * → sort_array → array_join idiom — per-document state only, bounded
    * by the row-size cap like every text column here. Join key is the
    * 60-bit md5 gram hash (8-byte shuffle rows; a collision would alter
    * both engines identically).
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minCount: Long = 2L): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), expr(Dedup.wordsExpr(textCol)).as("words"))
    val occ = base.where(expr(s"size(words) >= $w"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(words) - $w),
           |  i -> named_struct('i', i,
           |    'h', ${Dedup.h60raw(s"array_join(slice(words, i + 1, $w), ' ')")}))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.h").as("h"))
    val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount).select(col("h"))
    val covered = occ.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${w - 1})")).as("p"))
      .distinct()
    val kept = base
      .select(col("doc_id"), posexplode(col("words")).as(Seq("p", "word")))
      .join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(p, word))), x -> x.word)"),
          " ").as("clean_text"))
    base.select(col("doc_id"), size(col("words")).cast("long").as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
