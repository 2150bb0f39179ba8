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
}
