package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ranked retrieval over the document corpus — the "find the training
  * examples most relevant to X" primitive (targeted curation, eval-set
  * mining, more-like-this expansion) that pure near-dup similarity
  * doesn't cover.
  */
object Retrieval {

  /** BM25 top-k retrieval with k1 = 1.2, b = 0.75 — integer-exact.
    *
    * Two deviations from textbook BM25, both so the score is a plain
    * BIGINT that is bit-identical in any engine (and under any
    * aggregation order — float-sum BM25 is order-dependent):
    *
    *  - idf is the log-free odds ratio, scaled to ppm:
    *    `idf_ppm = (2(N−df)+1)·10⁶ div (2df+1)` (the expression inside
    *    BM25's log, in exact integer arithmetic). Monotone in the
    *    standard idf, so rankings agree; only the score scale differs.
    *  - each per-term score is floored to an integer after one double
    *    division of exact integers. IEEE multiply/divide of identical
    *    integer-valued operands is bit-deterministic across engines
    *    (only transcendentals are not), so the floor is too; summing
    *    BIGINTs per document is then order-independent, unlike the
    *    float sum that makes naive BM25 irreproducible under shuffle.
    *
    * The length normalization is exact: with S = Σdl and N = #docs
    * (avgdl = S/N), `tf·(k1+1) / (tf + k1(1−b+b·dl/avgdl))` scaled by
    * 10·S·N-free integers becomes `22·S·tf / (10·S·tf + 3·S + 9·N·dl)`.
    *
    * Scale shape: one corpus pass builds the (doc, word) tf relation
    * (persisted — it feeds df, dl, corpus stats, and the term match);
    * `terms` (the disjunctive query) and the per-term idf relation are
    * broadcast; the final top-k is a sort+limit (TakeOrdered — two-phase,
    * no global sort). N counts docs with ≥ 1 token (tokenless docs can't
    * match and would only shift avgdl).
    *
    * @param terms single-column (`word`) query relation, assumed tiny
    * @return (cachedTf, topK) — triangleStats-style: `cachedTf` is the
    *         persisted (doc, word, tf) relation the plan references
    *         several times; the CALLER must `cachedTf.unpersist()` after
    *         materializing `topK` (or reuse it for further retrieval),
    *         otherwise its MEMORY_AND_DISK blocks strand for the life of
    *         the session. Registry/bench/verify consumers clear the
    *         whole cache instead.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val tf = tfRelation(docs, idCol, textCol)
    (tf, bm25Core(tf, terms.select(col("word")), k))
  }

  /** [[bm25TopK]] with the query derived from the corpus itself: the
    * `nTerms` rarest terms (df asc, word asc — deterministic). Shares
    * the single tokenize pass with the scoring — the separate
    * term-selection scan a naive wrapper pays is the most expensive
    * stage duplicated for nothing at 100 TB. Same (cachedTf, topK)
    * release contract as [[bm25TopK]]. */
  def bm25TopKRarest(docs: DataFrame, idCol: String, textCol: String,
      nTerms: Int, k: Int): (DataFrame, DataFrame) = {
    val tf = tfRelation(docs, idCol, textCol)
    // df of EVERY word falls out of the tf relation (one row per
    // (doc, word)); sort+limit = distributed TakeOrdered over the vocab
    val terms = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").asc, col("word").asc).limit(nTerms)
      .select(col("word"))
    (tf, bm25Core(tf, terms, k))
  }

  /** One persisted (doc, word, tf) pass — feeds df, dl, corpus stats
    * and the term match. Returned to callers through the public
    * operators' (cached, result) tuples so library users can release
    * it without a global `spark.catalog.clearCache()`. */
  private def tfRelation(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(expr(Dedup.wordsExpr(textCol))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  private def bm25Core(tf: DataFrame, terms: DataFrame, k: Int): DataFrame = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val dfr = tf.join(broadcast(terms.select(col("word"))), "word")
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val termRel = dfr.join(stats)
      .select(col("word"),
        expr("((2 * (n - df) + 1) * 1000000L) DIV (2 * df + 1)").as("idf_ppm"),
        col("n"), col("s"))
    val scored = tf
      .join(broadcast(termRel), "word")
      .join(dl, "doc_id")
      .select(col("doc_id"),
        expr("""CAST(floor(
               |  (CAST(idf_ppm AS DOUBLE) * CAST(tf AS DOUBLE) * 22.0
               |    * CAST(s AS DOUBLE))
               |  / (10.0 * CAST(s AS DOUBLE) * CAST(tf AS DOUBLE)
               |     + 3.0 * CAST(s AS DOUBLE)
               |     + 9.0 * CAST(n AS DOUBLE) * CAST(dl AS DOUBLE)))
               |AS BIGINT)""".stripMargin).as("score_t"))
    scored.groupBy(col("doc_id")).agg(sum(col("score_t")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      // unpartitioned window AFTER the limit: it single-tasks only the
      // ≤ k surviving rows (the top-k itself was a distributed
      // TakeOrdered), so the planner warning is vacuously cheap here
      .withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * two rankers over the same rarest-terms query: BM25 and plain term
    * COVERAGE (how many query terms the doc contains — the "different
    * retriever" whose errors are uncorrelated with BM25's tf/length
    * normalization). `rrf = Σ_rankers 10⁶ div (60 + rank)` with the
    * standard k=60 damping, in exact integer arithmetic (the float
    * 1/(60+r) form is orderable but not bit-reproducible as a sum);
    * docs missing from a ranker's top-`perRanker` contribute 0.
    *
    * Scale shape: the corpus-sized work is [[tfRelation]] ONCE (shared
    * by both rankers); each ranker ends in a distributed TakeOrdered;
    * the fusion itself is a full-outer join of two ≤ perRanker-row
    * relations — driver-trivial at any corpus size. Same (cachedTf,
    * result) release contract as [[bm25TopK]].
    */
  def rrfRarest(docs: DataFrame, idCol: String, textCol: String,
      nTerms: Int, perRanker: Int, k: Int): (DataFrame, DataFrame) = {
    val win = org.apache.spark.sql.expressions.Window
    val tf = tfRelation(docs, idCol, textCol)
    val terms = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").asc, col("word").asc).limit(nTerms)
      .select(col("word"))
    val bm = bm25Core(tf, terms, perRanker)
    // tf has one row per (doc, word), so coverage = matched-row count
    val cov = tf.join(broadcast(terms), "word")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("cov"))
      .orderBy(col("cov").desc, col("doc_id")).limit(perRanker)
      .withColumn("rk", row_number().over(
        win.orderBy(col("cov").desc, col("doc_id"))).cast("long"))
    val fused = bm.select(col("doc_id"), col("rk").as("rk_bm25"))
      .join(cov.select(col("doc_id"), col("rk").as("rk_cov")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr("1000000L DIV (60 + rk_bm25)"), lit(0L)) +
          coalesce(expr("1000000L DIV (60 + rk_cov)"), lit(0L))).as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col("doc_id")).limit(k)
      // post-limit window over ≤ k rows, like bm25Core's rank
      .withColumn("rk", row_number().over(
        win.orderBy(col("rrf_ppm").desc, col("doc_id"))).cast("long"))
    (tf, fused)
  }

  /** DSIR-style importance weights for data selection: score every raw
    * document by how much its unigram profile looks like a TARGET
    * subset (the "sample raw data that resembles the high-quality
    * target" step of corpus assembly — DSIR, Xie et al. 2023, with the
    * hashed-n-gram likelihood ratio simplified to unigrams).
    *
    * Per word: `ratio_ppm(w) = cnt_target(w)·total_raw·10⁶ div
    * (cnt_raw(w)·total_target)` — the target/raw occurrence-rate ratio
    * in exact ppm integer arithmetic (1e6 ≈ same rate; 0 = absent from
    * the target; the log-free form keeps scores BIGINT-exact and
    * summation order-independent, the same contract as [[bm25TopK]]).
    * Per document: `weight = Σ_w tf·ratio_ppm(w)` and the length-
    * normalized `w_per_tok = weight div n_words` — rank by `w_per_tok`
    * and keep the top fraction, or use it as a sampling temperature.
    *
    * Scale shape: one corpus pass builds (doc, word, tf) with the
    * target flag riding the groupBy key (persisted — feeds the word
    * stats and the final rejoin); word ratios join back on `word` (NOT
    * broadcast — a web-scale vocabulary is itself large); the totals
    * relation is one row. Integer-range guard: cnt_t·total_raw·10⁶
    * must fit in a BIGINT — beyond ~10¹² total tokens, pre-divide the
    * totals (the ppm resolution hides the difference long before the
    * ratio overflows). The guard is enforced, not advisory: the ratio
    * expression `raise_error`s on the first word whose product would
    * wrap, because non-ANSI Spark would otherwise overflow SILENTLY
    * (DuckDB errors; silent-wrong-on-one-engine is the worst failure
    * mode). The check `cnt_t > (MAXLONG div 10⁶) div tot_r` is exact —
    * `floor(floor(a/b)/c) = floor(a/(bc))` for positive integers — and
    * itself overflow-free.
    *
    * @param isTarget row predicate marking the target subset (must be
    *                 constant per document, and must select at least one
    *                 token — an empty target makes every ratio divide by
    *                 zero, an ANSI error rather than a silent answer)
    * @return (cachedTf, weights) — same release contract as
    *         [[bm25TopK]]: caller unpersists `cachedTf` after
    *         materializing `weights`.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val tf = docs
      .select(col(idCol).as("doc_id"), isTarget.cast("int").as("is_t"),
        explode(expr(Dedup.wordsExpr(textCol))).as("word"))
      .groupBy(col("doc_id"), col("is_t"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wstats = tf.groupBy(col("word"))
      .agg(sum(col("tf")).as("cnt_r"), sum(expr("tf * is_t")).as("cnt_t"))
    val totals = wstats.agg(sum(col("cnt_r")).as("tot_r"), sum(col("cnt_t")).as("tot_t"))
    val rated = wstats.join(totals)
      .select(col("word"),
        expr("""IF(cnt_t > (9223372036854775807L DIV 1000000L) DIV tot_r,
               |  raise_error(concat('importanceWeights: cnt_t*tot_r*1e6 ',
               |    'overflows BIGINT for word stats cnt_t=', cnt_t,
               |    ' tot_r=', tot_r, ' — pre-scale the totals')),
               |  (cnt_t * tot_r * 1000000L) DIV (cnt_r * tot_t))""".stripMargin)
          .as("ratio_ppm"))
    val weights = tf.join(rated, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_words"),
        sum(expr("tf * ratio_ppm")).as("weight"))
      .select(col("doc_id"), col("n_words"), col("weight"),
        expr("weight DIV n_words").as("w_per_tok"))
    (tf, weights)
  }

  /** Exact TF-IDF cosine similarity self-join over the inverted index —
    * the all-pairs document-similarity operator (near-dup detection on
    * VOCABULARY overlap, where shingle Jaccard sees only verbatim runs).
    *
    * Weights are BIGINT-exact: `w(d,t) = tf · ((N·1000) div df)` — the
    * per-mille idf RATIO (monotone in log idf, log-free like
    * [[bm25TopK]]'s odds form). Dot products and squared norms are then
    * BIGINT sums — order-independent under shuffle, unlike float TF-IDF
    * whose Σ changes with aggregation order. The ONLY float ops are the
    * final `dot / (√na · √nb)` on exact integers — IEEE sqrt/divide are
    * correctly rounded, so both engines produce identical bits.
    *
    * Scale shape: pairs come from the inverted index (join on `word`),
    * so only documents SHARING a term ever meet; terms with df >
    * `maxDf` are dropped from the index — they are boilerplate
    * carrying ~zero idf weight but df²/2 join rows (the same df-cap
    * rationale as [[Dedup]]'s shingle index, mirrored in the oracle).
    * Overflow headroom: w ≤ 1000·N·tf, so Σw² needs
    * (1000·N·maxTf)²·terms < 2⁶³ — fine to N ~ 10⁵ docs; beyond that
    * shrink the idf scale (precision-for-range) or switch the norm
    * accumulation to DECIMAL(38), both one-line changes.
    *
    * @return (cachedTf, pairs) — [[bm25TopK]]'s release contract;
    *         pairs = (doc_a, doc_b, cosine) with cosine ≥ threshold. */
  def tfidfSimJoin(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Long = 256L): (DataFrame, DataFrame) = {
    val tf = tfRelation(docs, idCol, textCol)
    val dfw = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = tf.select(col("doc_id")).distinct().count()
    val weights = tf.join(dfw.where(col("df") <= maxDf), "word")
      .select(col("doc_id"), col("word"),
        expr(s"tf * ((${n}L * 1000L) DIV df)").as("w"))
    val norms = weights.groupBy(col("doc_id"))
      .agg(sum(expr("w * w")).as("nsq"))
    val dots = weights.as("a")
      .join(weights.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(expr("a.w * b.w")).as("dot"))
    (tf, dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nsq").as("nsq_a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nsq").as("nsq_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("dot").cast("double") /
          (sqrt(col("nsq_a").cast("double")) * sqrt(col("nsq_b").cast("double"))))
          .as("c"))
      .where(col("c") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("c"), 6).as("cosine")))
  }

  /** A deterministic retrieval RUN to evaluate: one query per class,
    * the query being the class's [[TextAnalysis.classTerms]]
    * characteristic vocabulary, each document scored by COVERAGE (how
    * many of the query's terms it contains at least once), ranked
    * `(coverage desc, doc asc)`, cut to the top `k`.
    *
    * Scale shape: the term dim is (classes × nTerms)-sized and
    * broadcast; coverage is one map-side-combinable groupBy over the
    * distinct (doc, matched-term) pairs; the per-query cut is
    * [[TopN.topNPerGroup]] (histogram threshold — no per-group full
    * sort), and the explicit 1..k rank is a window over the ≤ k
    * SURVIVORS per query, never the corpus.
    *
    * @return (cachedTf, run) — same release contract as [[bm25TopK]];
    *         run columns: `(query, doc, coverage, rank)`. */
  def classCoverageRun(docs: DataFrame, idCol: String, classCol: String,
      textCol: String, nTerms: Int, minTf: Long, k: Int)
      : (DataFrame, DataFrame) = {
    val (tfc, terms) =
      TextAnalysis.classTerms(docs, classCol, textCol, minTf, nTerms)
    val dw = docs
      .select(col(idCol).as("doc"),
        explode(expr(Dedup.wordsExpr(textCol))).as("word"))
      .distinct()
    val cov = dw
      .join(broadcast(terms.select(col("class").as("query"), col("word"))),
        Seq("word"))
      .groupBy(col("query"), col("doc"))
      .agg(count(lit(1)).as("coverage"))
    val top = TopN.topNPerGroup(cov, "query", "coverage", "doc", k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query"))
      .orderBy(col("coverage").desc, col("doc"))
    (tfc, top.withColumn("rank", row_number().over(w).cast("long")))
  }

  /** Several [[classCoverageRun]]s that differ only in the term budget
    * `nTerms`, served from ONE ranked-vocabulary pass and ONE distinct
    * (doc, word) projection (r14 optimization round, guide §2.4: the
    * run-vs-run comparison queries — q_rank_overlap, q_eval_ci — built
    * each run independently, re-running the corpus (class, word) tf
    * exchange AND the corpus-wide distinct-word explode per budget,
    * when the budgets differ only in the `rk <= n` cut of the SAME
    * deterministic ranking). Per-budget output is IDENTICAL to
    * [[classCoverageRun]] with that budget: `rk` is a row_number over
    * the total order (conc_ppm desc, tf desc, word), so the top-n of
    * the top-max ranking IS the top-n ranking.
    *
    * @param rankK extra ranked-vocabulary depth to retain beyond the
    *        run budgets (0 = none): callers that also need the ranked
    *        terms themselves at a deeper cut (q_ndcg's grade-5
    *        judgment vocabulary next to its 3-term run) read them from
    *        `handles(1)` instead of re-running classTerms.
    * @return (handles, runs): `handles` are the persisted relations
    *         (class tf, ranked vocab, distinct doc-word) the caller
    *         releases after materializing (the Drain contract);
    *         `runs(i)` corresponds to `nTermsList(i)`. */
  def classCoverageRuns(docs: DataFrame, idCol: String, classCol: String,
      textCol: String, nTermsList: Seq[Int], minTf: Long, k: Int,
      rankK: Int = 0): (Seq[DataFrame], Seq[DataFrame]) = {
    require(nTermsList.nonEmpty)
    val (tfc, ranked) = TextAnalysis.classTerms(
      docs, classCol, textCol, minTf, math.max(nTermsList.max, rankK))
    // ranked is vocabulary-sized (classes × max budget after the cut);
    // persisted because each budget's broadcast re-reads it
    val rankedP = ranked
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the one corpus-sized shared relation: distinct (doc, word) pairs,
    // read once per budget's coverage join
    val dw = docs
      .select(col(idCol).as("doc"),
        explode(expr(Dedup.wordsExpr(textCol))).as("word"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val runs = nTermsList.map { n =>
      val cov = dw
        .join(broadcast(rankedP.where(col("rk") <= n)
          .select(col("class").as("query"), col("word"))), Seq("word"))
        .groupBy(col("query"), col("doc"))
        .agg(count(lit(1)).as("coverage"))
      val top = TopN.topNPerGroup(cov, "query", "coverage", "doc", k)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query"))
        .orderBy(col("coverage").desc, col("doc"))
      top.withColumn("rank", row_number().over(w).cast("long"))
    }
    (Seq(tfc, rankedP, dw), runs)
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    * two rankings, truncated at depth `k`, with the persistence
    * parameter fixed at the DYADIC p = 1/2 so the whole score is
    * exact integer arithmetic: depth d's weight
    * `(1−p)·p^(d−1)/d = 1/(d·2^d)`, so
    * `rbo_nano = Σ_{d=1..k} overlap_d · 1e9 div (d·2^d)` — both
    * engines floor the same terms and sum. Identical runs score
    * `Σ 1e9 div 2^d = 1e9 − ~1e9/2^k` (the truncated-RBO ceiling,
    * pinned in the spec); disjoint runs score 0. The residual
    * extrapolation term of the paper (unseen depths) is intentionally
    * omitted — truncated RBO is the comparable, exact quantity.
    *
    * Distribution shape: runs are (queries × k)-sized by contract;
    * one equi-join on (query, doc), a ≤ k-wide explode of agreement
    * depths, two tiny groupBys. Queries with zero overlap surface
    * with `rbo_nano = 0` (driven from run A's query set).
    *
    * Output: `(query, rbo_nano)`. */
  def rankBiasedOverlap(runA: DataFrame, runB: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 32, s"need 1 <= k <= 32, got $k")
    def prep(df: DataFrame, tag: String) =
      df.select(col(queryCol).cast("string").as("query"),
          col(docCol).cast("long").as("doc"),
          col(rankCol).cast("long").as(s"r$tag"))
        .where(col(s"r$tag") <= k)
    val a = prep(runA, "a")
    val b = prep(runB, "b")
    val depths = a.join(b, Seq("query", "doc"))
      .select(col("query"),
        explode(expr(s"sequence(greatest(ra, rb), ${k}L)")).as("d"))
    val sums = depths.groupBy(col("query"), col("d"))
      .agg(count(lit(1)).as("ov"))
      .groupBy(col("query"))
      .agg(sum(expr("ov * 1000000000L div (d * shiftleft(1L, " +
        "cast(d as int)))")).as("rbo_nano"))
    a.select(col("query")).distinct()
      .join(sums, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("rbo_nano"), lit(0L)).as("rbo_nano"))
  }

  /** DCG position discounts as exact-integer plan constants:
    * `w_d = 10¹² div floor(10⁶·ln(d+1))` — the reciprocal of the
    * micro-nat log ([[LanguageModel]]'s `floor(1e6·ln)` discipline),
    * computed ONCE at class load and interpolated verbatim into both
    * engines' plans (the [[Bootstrap]] Poisson-table precedent), so
    * nDCG needs no runtime transcendental anywhere. The standard
    * `1/log₂(d+1)` discount differs from `1/ln(d+1)` by the constant
    * factor ln 2, which cancels in the DCG/IDCG ratio — the published
    * `ndcg_ppm` is the textbook quantity up to per-term flooring. */
  val DcgDiscountMicro: IndexedSeq[Long] = (1 to 32).map { d =>
    1000000000000L / math.floor(1e6 * math.log(d + 1.0)).toLong
  }

  /** nDCG@k with graded relevance — the third leg of the retrieval
    * scorecard next to [[rankingMetrics]] (binary P/R/MRR) and
    * [[rankBiasedOverlap]] (run-vs-run): how close each query's run
    * comes to the IDEAL ordering of its graded judgments.
    *
    *   - `dcg_unit  = Σ_{d ≤ k} grade(run_d) · w_d`
    *   - `idcg_unit = Σ_{d ≤ k} grade(ideal_d) · w_d` over the k
    *     HIGHEST grades in qrels (ties by doc asc — deterministic)
    *   - `ndcg_ppm  = dcg_unit·10⁶ div idcg_unit` (0 when a query has
    *     no positive judgment at all)
    *
    * All integer arithmetic over the [[DcgDiscountMicro]] constants —
    * both engines sum identical BIGINT terms, so the scorecard
    * hash-matches.
    *
    * Distribution shape: `runs` is (queries × k)-sized by contract;
    * `qrels` is the one corpus-sized input — one equi-join for the
    * DCG side, and the ideal top-k runs through
    * [[TopN.topNPerGroup]]'s histogram threshold (no per-group full
    * sort — a query with a billion judged docs never funnels one
    * task); the explicit ideal rank is a window over the ≤ k
    * survivors per query. Run docs missing from qrels score grade 0.
    *
    * Output: `(query, dcg_unit, idcg_unit, ndcg_ppm)`, one row per
    * query in `runs`. */
  def ndcgAtK(runs: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= DcgDiscountMicro.length,
      s"need 1 <= k <= ${DcgDiscountMicro.length}, got $k")
    val spark = runs.sparkSession
    val w = broadcast(spark.createDataFrame(
        (1 to k).map(d => (d.toLong, DcgDiscountMicro(d - 1))))
      .toDF("__d", "__w"))
    val r = runs.select(col(queryCol).cast("string").as("query"),
        col(docCol).cast("long").as("doc"),
        col(rankCol).cast("long").as("rank"))
      .where(col("rank") <= k)
    val q = qrels.select(col(queryCol).cast("string").as("query"),
      col(docCol).cast("long").as("doc"),
      col(gradeCol).cast("long").as("grade"))
    val dcg = r.join(q, Seq("query", "doc"), "left")
      .join(w, col("rank") === col("__d"))
      .groupBy(col("query"))
      .agg(sum(coalesce(col("grade"), lit(0L)) * col("__w"))
        .as("dcg_unit"))
    val pos = q.where(col("grade") > 0L)
    val idealTop = TopN.topNPerGroup(pos, "query", "grade", "doc", k)
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query"))
      .orderBy(col("grade").desc, col("doc"))
    val idcg = idealTop
      .withColumn("__ir", row_number().over(wi).cast("long"))
      .join(w, col("__ir") === col("__d"))
      .groupBy(col("query"))
      .agg(sum(col("grade") * col("__w")).as("idcg_unit"))
    r.select(col("query")).distinct()
      .join(dcg, Seq("query"), "left")
      .join(idcg, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("dcg_unit"), lit(0L)).as("dcg_unit"),
        coalesce(col("idcg_unit"), lit(0L)).as("idcg_unit"))
      .withColumn("ndcg_ppm",
        when(col("idcg_unit") > 0L,
            expr("dcg_unit * 1000000L div idcg_unit"))
          .otherwise(lit(0L)))
  }

  /** MAP@k — mean-average-precision's per-query half, in EXACT
    * integer arithmetic: for every relevant retrieved doc at rank d,
    * the precision-at-d term `relcum_d / d` is scaled by
    * `L = lcm(1..k)` so each term `relcum_d · (L div d)` is an exact
    * integer (L/d divides exactly for every d ≤ k), and
    * `ap_ppm = Σ terms · 10⁶ div (L · min(n_rel, k))` — the TREC-style
    * AP@k denominator. Queries with no relevant judgment score 0.
    *
    * Distribution shape: `runs` is (queries × k)-sized by contract,
    * so the per-query cumulative window runs over ≤ k rows — never a
    * corpus; `qrels` is touched by one equi-join and one groupBy (the
    * [[rankingMetrics]] shape).
    *
    * Output: `(query, n_rel, hits, ap_units, ap_ppm)` with
    * `ap_units = Σ relcum·(L div d)` published so the consumer can
    * re-derive any alternative denominator exactly. */
  def averagePrecisionAtK(runs: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"need 1 <= k <= 20, got $k")
    val L = (1 to k).foldLeft(1L)((a, d) =>
      a / java.math.BigInteger.valueOf(a).gcd(
        java.math.BigInteger.valueOf(d.toLong)).longValue() * d)
    val r = runs.select(col(queryCol).cast("string").as("query"),
        col(docCol).cast("long").as("doc"),
        col(rankCol).cast("long").as("rank"))
      .where(col("rank") <= k)
    val q = qrels.select(col(queryCol).cast("string").as("query"),
      col(docCol).cast("long").as("doc")).distinct()
    val nrel = q.groupBy(col("query")).agg(count(lit(1)).as("n_rel"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val per = r
      .join(q.withColumn("__rel", lit(1L)), Seq("query", "doc"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .withColumn("__relcum", sum(col("__rel")).over(wq))
      .groupBy(col("query"))
      .agg(sum(col("__rel")).as("hits"),
        sum(when(col("__rel") === 1L,
            col("__relcum") * expr(s"${L}L div rank"))
          .otherwise(lit(0L))).as("ap_units"))
    per.join(nrel, Seq("query"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .select(col("query"), col("n_rel"), col("hits"), col("ap_units"),
        when(col("n_rel") > 0L,
            expr(s"ap_units * 1000000L div (${L}L * least(n_rel, ${k}L))"))
          .otherwise(lit(0L)).as("ap_ppm"))
  }

  /** Ranked-retrieval evaluation — MRR@k, precision@k, recall@k per
    * query, in exact ppm: the scorecard every retrieval change
    * (tokenizer, ranker, index) is judged by.
    *
    *   - `p_at_k_ppm`  = hits·1e6 div k (standard fixed-k denominator)
    *   - `r_at_k_ppm`  = hits·1e6 div n_rel
    *   - `mrr_ppm`     = 1e6 div rank-of-first-relevant (0 if none)
    *
    * All integer arithmetic — both engines floor the same
    * non-negative divisions, so the scorecard hash-matches.
    *
    * Distribution shape: `runs` is (queries × k)-sized by contract;
    * the one corpus-sized input is `qrels`, touched by exactly one
    * equi-join on (query, doc) and one groupBy — no windows, no
    * per-row work beyond the join. Queries present in `runs` but
    * absent from `qrels` score 0 across the board rather than
    * vanishing (left join + coalesce).
    *
    * Output: `(query, n_rel, n_ret, hits, p_at_k_ppm, r_at_k_ppm,
    * mrr_ppm)`, one row per query in `runs`. */
  def rankingMetrics(runs: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val r = runs.select(col(queryCol).cast("string").as("query"),
        col(docCol).cast("long").as("doc"),
        col(rankCol).cast("long").as("rank"))
      .where(col("rank") <= k)
    val q = qrels.select(col(queryCol).cast("string").as("query"),
      col(docCol).cast("long").as("doc")).distinct()
    val nrel = q.groupBy(col("query")).agg(count(lit(1)).as("n_rel"))
    val per = r
      .join(q.withColumn("__rel", lit(1L)), Seq("query", "doc"), "left")
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_ret"),
        sum(coalesce(col("__rel"), lit(0L))).as("hits"),
        min(when(col("__rel") === 1L, col("rank"))).as("__first"))
    per.join(nrel, Seq("query"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .select(col("query"), col("n_rel"), col("n_ret"), col("hits"),
        expr(s"hits * 1000000L div ${k}L").as("p_at_k_ppm"),
        expr("hits * 1000000L div greatest(n_rel, 1L)").as("r_at_k_ppm"),
        coalesce(expr("1000000L div __first"), lit(0L)).as("mrr_ppm"))
  }

  /** Sign-safe floored mean of a BIGINT sum — `div` truncates toward
    * zero in Spark while `//` floors in DuckDB; routing the division
    * through `abs` makes both floor the same non-negative quantity
    * (the drift-bin discipline), so negative metric deltas publish
    * identically. */
  private def signedMeanExpr(sumCol: String, nCol: String): String =
    s"""(CASE WHEN $sumCol < 0 THEN -1L ELSE 1L END)
       | * (abs($sumCol) div greatest($nCol, 1L))""".stripMargin

  /** Poisson-bootstrap confidence interval for the mean per-query
    * DELTA of an IR metric between two rankers — the statistic an
    * eval pipeline actually ships: not "ranker A scores X" but
    * "A beats B by D, significantly". Per query,
    * `delta = metric_A − metric_B`; the point estimate is the
    * sign-safe floored mean over queries, and the interval comes from
    * B Poisson(1)-weighted replicates of that mean (resampling over
    * QUERIES, the IR-eval convention — deltas within a query are
    * paired, which is what makes the test powerful), using
    * [[Bootstrap]]'s one-pass fixed-point machinery: weight
    * `k ~ Poisson(1)` from the md5 uniform `h60("<query>:<b>") % 1e6`
    * through the published [[Bootstrap.CdfPpm]] constants — no
    * transcendental at query time, both engines draw identical
    * weights, so the interval HASH-MATCHES.
    *
    * The CI is the percentile bootstrap: replicate means sorted
    * (tiebreak by replicate id — deterministic), `ci_lo` = the
    * `ceil(B·tail/10⁶)`-th smallest (clamped ≥ 1), `ci_hi` its
    * mirror. `significant` = the interval excludes zero.
    *
    * Distribution shape: inputs are per-QUERY metric relations
    * (queries-sized by construction — [[ndcgAtK]] /
    * [[averagePrecisionAtK]] / [[rankingMetrics]] outputs); one
    * equi-join on the query key, one ×B map-side explode, one
    * map-side-combinable groupBy down to B rows. The ranking window
    * over the B-row replicate relation is bounded by `replicates` BY
    * CONSTRUCTION (the isotonicFit acceptance — never data-sized).
    * A replicate that draws weight 0 for every query publishes mean
    * 0 (the `greatest(·,1)` guard) — at any realistic query count
    * the probability is e^(−n_queries) per replicate and the draw is
    * deterministic, so a fixture that passes once passes always.
    *
    * Output (one row): `(n_queries, mean_delta_ppm, ci_lo_ppm,
    * ci_hi_ppm, replicates, significant)`. */
  def metricDeltaCi(perQueryA: DataFrame, perQueryB: DataFrame,
      metricCol: String, replicates: Int = 64,
      tailPpm: Long = 25000L): DataFrame = {
    require(replicates >= 2 && replicates <= 4096,
      s"need 2 <= replicates <= 4096, got $replicates")
    require(tailPpm > 0 && 2 * tailPpm < 1000000L,
      s"need 0 < tailPpm < 5e5, got $tailPpm")
    val a = perQueryA.select(col("query").cast("string").as("query"),
      col(metricCol).cast("long").as("__ma"))
    val b = perQueryB.select(col("query").cast("string").as("query"),
      col(metricCol).cast("long").as("__mb"))
    val deltas = a.join(b, Seq("query"))
      .select(col("query"), (col("__ma") - col("__mb")).as("delta"))
    val point = deltas
      .agg(count(lit(1)).as("n_queries"), sum(col("delta")).as("__s"))
      .select(col("n_queries"),
        coalesce(expr(signedMeanExpr("__s", "n_queries")), lit(0L))
          .as("mean_delta_ppm"))
    val kCol = {
      val u = col("__u")
      Bootstrap.CdfPpm.zipWithIndex.foldRight(lit(6L)) {
        case ((c, k), elseCol) => when(u < c, k.toLong).otherwise(elseCol)
      }
    }
    val reps = deltas
      .withColumn("__b", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__u", expr(s"""${Dedup.h60raw(
        "concat(query, ':', CAST(__b AS STRING))")} % 1000000"""))
      .withColumn("__k", kCol)
      .groupBy(col("__b"))
      .agg(sum(col("__k") * col("delta")).as("__ks"),
        sum(col("__k")).as("__kn"))
      .select(col("__b"),
        expr(signedMeanExpr("__ks", "__kn")).as("__rm"))
    val loRank = math.max(1L,
      (replicates.toLong * tailPpm + 999999L) / 1000000L)
    val hiRank = replicates.toLong + 1L - loRank
    // B-row relation by construction — bounded unpartitioned window
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rm"), col("__b"))
    val ci = broadcast(reps
      .withColumn("__r", row_number().over(wr).cast("long"))
      .agg(min(when(col("__r") === loRank, col("__rm")))
          .as("ci_lo_ppm"),
        min(when(col("__r") === hiRank, col("__rm")))
          .as("ci_hi_ppm")))
    point.crossJoin(ci)
      .select(col("n_queries"), col("mean_delta_ppm"),
        col("ci_lo_ppm"), col("ci_hi_ppm"),
        lit(replicates.toLong).as("replicates"),
        (col("ci_lo_ppm") > 0L || col("ci_hi_ppm") < 0L)
          .as("significant"))
  }
}
