package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style
  * "perplexity filter": train a cheap LM on a trusted corpus, score
  * every crawl document, gate on perplexity. The model here is a bigram
  * LM with STUPID BACKOFF (Brants et al. 2007 — score, not probability:
  * no normalization, which is what makes it trainable as two count
  * tables) over a Laplace-smoothed unigram base:
  *
  *  - position 1:              S = (c(w)+1) / (N+V+1)
  *  - bigram seen in train:    S = c(prev,w) / c(prev)
  *  - bigram unseen (backoff): S = 0.4 * (c(w)+1) / (N+V+1), computed
  *    as 2*(c(w)+1) / (5*(N+V+1)) — exact integers up to the single
  *    final division
  *
  * Determinism contract: every per-position score is
  * `floor(1e6 * ln(S))::BIGINT` — micro-nats. The argument of ln() is a
  * single correctly-rounded division of exact integers, so both engines
  * hand ln identical doubles; a last-ulp ln() divergence only matters
  * within ~1e-10 of a floor boundary (measure-ish zero over the distinct
  * count ratios of a corpus). Summing INTEGER micro-nats (not doubles)
  * is what makes the per-document total order-independent under Spark's
  * nondeterministic partition-sum ordering — the same reason every gate
  * in this repo cross-multiplies instead of dividing.
  *
  * Distribution shape: the model is two count relations keyed by word /
  * (prev, word) — at web scale these are large (never broadcast, per the
  * BM25 contract) and every lookup is a shuffled equi-join; the corpus
  * totals are one row cross-joined in. Scoring is embarrassingly
  * parallel after the joins: one groupBy(doc) of integer sums with
  * map-side partials.
  */
object LanguageModel {

  /** Trains on `train`, scores `score`; returns per scored document
    * `(doc_id, n_tokens, n_backoff, nll_micro, ppl_micro)` where
    * nll_micro = -Σ floor(1e6·ln S) and ppl_micro = nll_micro div
    * n_tokens (micro-nats per token — exp of it is perplexity).
    */
  def perplexity(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def toks(docs: DataFrame): DataFrame = docs
      .select(col(idCol).cast("long").as("doc_id"),
        expr(Dedup.wordsExpr(textCol)).as("words"))
      .select(col("doc_id"), col("words"),
        posexplode(col("words")).as(Seq("p0", "word")))
      .select(col("doc_id"), col("word"),
        when(col("p0") >= 1, element_at(col("words"), col("p0")))
          .as("prev")) // p0 is 0-based; element_at is 1-based = previous

    // three scans of the train tokenization (uni/big/stats) — kept
    // unpersisted deliberately: the projection is a cheap stateless
    // explode, and pinning it would outlive this lazy plan (the
    // tfRelation release-contract problem without a release channel)
    val trainToks = toks(train)
    val uni = trainToks.groupBy("word")
      .agg(count(lit(1)).cast("long").as("c1"))
    val big = trainToks.where(col("prev").isNotNull)
      .groupBy(col("prev"), col("word"))
      .agg(count(lit(1)).cast("long").as("c12"))
    val stats = uni.agg(sum(col("c1")).cast("long").as("n_total"),
      count(lit(1)).cast("long").as("v"))

    val scored = toks(score)
      .join(uni, Seq("word"), "left")
      .join(uni.select(col("word").as("prev"), col("c1").as("c1prev")),
        Seq("prev"), "left")
      .join(big, Seq("prev", "word"), "left")
      .join(stats)
      .withColumn("c1s", coalesce(col("c1"), lit(0L)) + 1)
      .withColumn("den", col("n_total") + col("v") + 1)
      .withColumn("s_val",
        when(col("prev").isNull,
          col("c1s").cast("double") / col("den").cast("double"))
        .when(col("c12").isNotNull,
          col("c12").cast("double") / col("c1prev").cast("double"))
        .otherwise((lit(2L) * col("c1s")).cast("double")
          / (lit(5L) * col("den")).cast("double")))
      .withColumn("score_micro",
        floor(lit(1e6) * log(col("s_val"))).cast("long"))
      .withColumn("is_backoff",
        (col("prev").isNotNull && col("c12").isNull).cast("long"))

    val out = scored.groupBy(col("doc_id")).agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(col("is_backoff")).cast("long").as("n_backoff"),
        (-sum(col("score_micro"))).cast("long").as("nll_micro"))
      .withColumn("ppl_micro", expr("nll_micro div n_tokens"))
    out
  }

  /** Perplexity-bin width for [[ccnetBuckets]] thresholds: 1000
    * micro-nats/token = 0.001 nats/token. Binning is what keeps the
    * threshold histogram BOUNDED BY THE VALUE RANGE (a few thousand
    * bins for any real corpus), not by document count — raw ppl_micro
    * is near-continuous, and a per-language cumulative window over
    * per-document values would be a corpus-sized skewed partition at
    * 100 TB. */
  val PplBinMicro = 1000L

  /** CCNet-style head/middle/tail bucketing: score `score` docs under
    * the `train`-side LM ([[perplexity]]), then split each language into
    * perplexity terciles — `head` = best (lowest-ppl) third, CCNet's
    * keep-or-prioritize slice. Thresholds are exact order statistics
    * over BINNED ppl (see [[PplBinMicro]]): t1 = smallest bin with
    * cumulative count ≥ ⌈n/3⌉ via the integer form `cum*3 >= tot`
    * (1/3 is not binary-exact — never multiply by a float fraction),
    * t2 likewise at 2/3; ties land in the earlier bucket. Returns
    * `(doc_id, lang, ppl_micro, ppl_bin, bucket)`.
    *
    * Shape: doc-level scores (the [[perplexity]] joins), one
    * (lang, bin)-sized histogram, a cumulative window over that SMALL
    * histogram, and a lang-sized broadcast of the two thresholds back
    * onto the scored docs — no corpus-sized windows. */
  def ccnetBuckets(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    val ppl = perplexity(train, score, idCol, textCol)
      .select(col("doc_id"), col("ppl_micro"),
        expr(s"ppl_micro div $PplBinMicro").as("ppl_bin"))
    val pl = score.select(col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang"))
      .join(ppl, Seq("doc_id"))
      .localCheckpoint(true) // read twice: histogram + final bucketing
    val hist = pl.groupBy(col("lang"), col("ppl_bin"))
      .agg(count(lit(1)).cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("ppl_bin"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    val thr = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("tot", sum(col("c")).over(wAll))
      .groupBy(col("lang")).agg(
        min(when(col("cum") * 3 >= col("tot"), col("ppl_bin"))).as("b1"),
        min(when(col("cum") * 3 >= col("tot") * 2, col("ppl_bin"))).as("b2"))
    pl.join(broadcast(thr), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("ppl_micro"), col("ppl_bin"),
        when(col("ppl_bin") <= col("b1"), lit("head"))
          .when(col("ppl_bin") <= col("b2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
