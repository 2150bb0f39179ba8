package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for training-data selection (the
  * construction of Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): score every raw document by
  * the log-likelihood ratio of its hashed n-gram features under the
  * TARGET domain's feature distribution vs the raw corpus's own — the
  * standard "make the crawl look like the target domain" selector that
  * sits between quality gates and tokenization in an LLM data
  * pipeline. A positive ratio means the document's n-grams are more
  * characteristic of the target than of the corpus at large.
  *
  * Features: word unigrams AND bigrams WITH multiplicity, hashed into
  * `buckets` cells by the engine-wide md5-derived 60-bit hash (the
  * dedup-family idiom, reproduced bit-for-bit by the oracle). Both
  * feature distributions are add-one-smoothed multinomials over the
  * cells; the per-cell weight is
  *
  *   `w_micro = floor(1e6 · ln( (cp+1)·(Tq+m) / ((cq+1)·(Tp+m)) ))`
  *
  * — ONE logarithm of ONE correctly-rounded division of exact BIGINT
  * products (the [[LanguageModel]] micro-nat discipline: both engines
  * hand `ln` identical doubles, so the floored micro-nat weights — and
  * therefore every document's exact-integer weight SUM — hash-match).
  * Products stay far from overflow: cell counts and totals are corpus
  * token counts (≤ ~1e12 · ~1e7 at any plausible slice ≪ 2^63).
  *
  * Distribution shape (the 100 TB contract): two map-side-combinable
  * groupBys to the ≤ m-cell count relations (the target sample is
  * small by design — a handful of exemplar documents — but nothing
  * here requires it), two 1-row totals broadcast back, the ≤ m-row
  * weight relation broadcast onto one corpus feature pass, one groupBy
  * on doc_id. The feature explode is evaluated twice (count pass +
  * scoring pass) and deliberately unpersisted — a cheap stateless
  * projection, the [[LanguageModel.perplexity]] position.
  *
  * Documents with no words emit no features and drop (mirrored in the
  * oracle). Output:
  * `(doc_id, n_feats, logratio_micro, kept)` with
  * `kept = logratio_micro > 0` (more target-like than corpus-like);
  * resampling callers feed `logratio_micro` to the A-ES weighted
  * sampler (q_weighted_sample) instead of thresholding.
  *
  * Reference scope: the reference publishes raw per-key totals with no
  * selection surface
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:54-55);
  * importance-based selection belongs to the declared extension
  * surface (SURVEY.md §2.11).
  */
object Dsir {

  /** Word unigram + bigram features (WITH multiplicity) hashed into
    * `m` cells: `(doc_id, b)` — the corpus-facing stage, shared with
    * the streamed twin ([[graft.streaming.StreamingDsir]]): cell
    * counts are ADDITIVE across any partition of the corpus, which is
    * what lets folds append ≤ m-row deltas and rerun the weight
    * arithmetic read-side. */
  def featureCells(docs: DataFrame, idCol: String,
      textCol: String, m: Int): DataFrame = {
    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"),
        expr(Dedup.wordsExpr(textCol)).as("words"))
      .select(col("doc_id"),
        explode(concat(col("words"),
          // descending-sequence guard: size<2 must yield [] not garbage
          expr("""if(size(words) < 2, array(),
                 |  transform(sequence(0, size(words) - 2),
                 |    i -> concat(element_at(words, i + 1), ' ',
                 |                element_at(words, i + 2))))"""
            .stripMargin))).as("g"))
    grams.select(col("doc_id"),
      expr(s"${Dedup.h60raw("g")} % $m").as("b"))
  }

  /** Per-document importance log-ratio of `raw` docs: target-domain
    * multinomial (fitted on `target`) over the raw corpus's own. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame =
    scoreAgainstCounts(raw, target,
      featureCells(raw, idCol, textCol, buckets)
        .groupBy(col("b")).agg(count(lit(1)).cast("long").as("cq")),
      idCol, textCol, buckets)

  /** The weight arithmetic + scoring over an EXPLICIT q-side count
    * relation `(b, cq)` — the read-side half the streamed twin reruns
    * against its merged fold state ([[graft.streaming.StreamingDsir
    * .weights]]). Cells of scored features must be present in `cqRel`
    * (true whenever the scored rows are a subset of the counted
    * corpus — both callers' contract). */
  def scoreAgainstCounts(rows: DataFrame, target: DataFrame,
      cqRel: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"need 2 <= buckets <= 2^20, got $buckets")
    val fp = featureCells(target, idCol, textCol, buckets)
    val cp = fp.groupBy(col("b")).agg(count(lit(1)).cast("long").as("cp"))
    val tq = broadcast(cqRel.agg(coalesce(sum(col("cq")), lit(0L))
      .as("tq")))
    val tp = broadcast(cp.agg(coalesce(sum(col("cp")), lit(0L)).as("tp")))
    // ≤ m rows: every scored feature's cell is present in cq by the
    // subset contract above
    val w = broadcast(cqRel.join(cp, Seq("b"), "left")
      .na.fill(0L, Seq("cp"))
      .crossJoin(tq).crossJoin(tp)
      .select(col("b"),
        floor(lit(1e6) * log(
          ((col("cp") + 1L) * (col("tq") + buckets.toLong)).cast("double") /
          ((col("cq") + 1L) * (col("tp") + buckets.toLong)).cast("double")))
          .cast("long").as("w")))
    featureCells(rows, idCol, textCol, buckets).join(w, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("w")).cast("long").as("logratio_micro"))
      .select(col("doc_id"), col("n_feats"), col("logratio_micro"),
        (col("logratio_micro") > 0L).as("kept"))
  }

  /** The RESAMPLING half of DSIR — the paper draws documents with
    * probability ∝ exp(importance ratio), which a threshold cannot
    * reproduce (it would take only the extreme head). This is the
    * Gumbel-top-k trick (sampling ∝ exp(s) ⇔ the top k of
    * `s + Gumbel(0,1)` noise), kept EXACT-integer and deterministic:
    * the Gumbel draw is `−ln(−ln u)` with `u` the engine-wide
    * md5-derived uniform `h60("<doc_id>:<salt>") % 1e6` mapped to
    * (0, 1) by ONE correctly-rounded division, and the key is
    *
    *   `key_micro = logratio_micro − floor(1e6 · ln(−ln u))`
    *
    * — a BIGINT both engines compute identically (two lns of
    * identical doubles, one floor — the [[Bootstrap]]/[[LanguageModel]]
    * argument), distributed per term exactly like the textbook key up
    * to the single flooring. Changing `salt` redraws the sample;
    * the same salt is reproducible forever with no RNG state.
    *
    * Distribution shape: [[dsirWeights]]'s passes plus ONE
    * TakeOrdered top-k (distributed, early-stopping — never a global
    * sort); the rank window runs over the ≤ k survivors.
    *
    * Output: `(doc_id, n_feats, logratio_micro, key_micro, rk)`,
    * the k sampled documents. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024,
      salt: Long = 0L): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val scored = dsirWeights(raw, target, idCol, textCol, buckets)
      .withColumn("__u", expr(s"""${Dedup.h60raw(
        s"concat(CAST(doc_id AS STRING), ':', '$salt')")} % 1000000"""))
      .withColumn("key_micro", col("logratio_micro") -
        floor(lit(1e6) * log(-log((col("__u") + 1L).cast("double")
          / lit(1000002.0d)))).cast("long"))
    val top = scored
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
    // ≤ k rows by construction — bounded unpartitioned window
    top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key_micro").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_feats"), col("logratio_micro"),
        col("key_micro"), col("rk"))
  }
}
