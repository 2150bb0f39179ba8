package graft.operators

import graft.SparkSpec

/** Ranked-retrieval scorecard: MRR@k / P@k / R@k in exact ppm. */
class RetrievalMetricsSpec extends SparkSpec {

  private def metrics(runs: Seq[(String, Long, Long)],
      qrels: Seq[(String, Long)], k: Int) = {
    import spark.implicits._
    Retrieval.rankingMetrics(
      runs.toDF("q", "d", "r"), qrels.toDF("q", "d"), "q", "d", "r", k)
      .selectExpr("query", "n_rel", "n_ret", "hits", "p_at_k_ppm",
        "r_at_k_ppm", "mrr_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
  }

  test("hand trace: one hit at rank 2 of 3, two relevant total") {
    val got = metrics(
      Seq(("A", 10L, 1L), ("A", 11L, 2L), ("A", 12L, 3L)),
      Seq(("A", 11L), ("A", 99L)), k = 3)
    assert(got.toSeq === Seq(("A", 2L, 3L, 1L, 333333L, 500000L, 500000L)))
  }

  test("no relevant retrieved: mrr and recall are 0, not null") {
    val got = metrics(
      Seq(("A", 10L, 1L), ("A", 11L, 2L)),
      Seq(("A", 99L)), k = 5)
    assert(got.toSeq === Seq(("A", 1L, 2L, 0L, 0L, 0L, 0L)))
  }

  test("query with no qrels scores 0 across the board instead of " +
      "vanishing") {
    val got = metrics(Seq(("B", 7L, 1L)), Seq(("A", 7L)), k = 2)
    assert(got.find(_._1 == "B").get === (("B", 0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("rows past rank k are ignored; perfect run scores 1e6 ppm") {
    val got = metrics(
      Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L)),
      Seq(("A", 1L), ("A", 2L)), k = 2)
    assert(got.toSeq === Seq(("A", 2L, 2L, 2L, 1000000L, 1000000L,
      1000000L)))
  }

  private def rbo(a: Seq[(String, Long, Long)],
      b: Seq[(String, Long, Long)], k: Int) = {
    import spark.implicits._
    Retrieval.rankBiasedOverlap(a.toDF("q", "d", "r"),
        b.toDF("q", "d", "r"), "q", "d", "r", k)
      .as[(String, Long)].collect().toMap
  }

  test("rankBiasedOverlap: identical runs hit the truncated ceiling, " +
      "disjoint runs score 0, hand partial case") {
    val run = (1L to 5L).map(i => ("q", i, i))
    // identical: sum of 1e9 div 2^d, d=1..5
    assert(rbo(run, run, 5)("q") ===
      500000000L + 250000000L + 125000000L + 62500000L + 31250000L)
    val other = (1L to 5L).map(i => ("q", i + 100L, i))
    assert(rbo(run, other, 5)("q") === 0L)
    // A: docs 1,2 at ranks 1,2; B: docs 2,3 — doc 2 agrees at depth 2
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L))
    val b = Seq(("q", 2L, 1L), ("q", 3L, 2L))
    assert(rbo(a, b, 2)("q") === 125000000L)
  }

  test("classCoverageRun ranks 1..k per query with coverage " +
      "non-increasing in rank") {
    val (cached, run) = Retrieval.classCoverageRun(
      graft.Tables.t(spark, sfDir, "documents"), "doc_id", "source",
      "text", nTerms = 5, minTf = 2L, k = 10)
    val rows = run.selectExpr("query", "coverage", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    cached.unpersist()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1L to byRank.length).toSeq,
        s"ranks must be dense 1..k for $q")
      val cov = byRank.map(_._2)
      assert(cov.zip(cov.tail).forall { case (a, b) => a >= b },
        s"coverage must be non-increasing in rank for $q")
    }
  }

  // ---- nDCG@k ----

  test("DcgDiscountMicro is exactly 1e12 div floor(1e6·ln(d+1)), and " +
      "no micro-nat log sits near a floor boundary") {
    Retrieval.DcgDiscountMicro.zipWithIndex.foreach { case (w, i) =>
      val d = i + 1
      val lnm = math.floor(1e6 * math.log(d + 1.0)).toLong
      assert(w === 1000000000000L / lnm, s"depth $d")
      // engine-exactness headroom: the fractional part of 1e6·ln(d+1)
      // must be far from 0/1 so a last-ulp ln() divergence cannot flip
      // the floor (the LanguageModel micro-nat argument, checked here
      // for every depth the table covers)
      val frac = 1e6 * math.log(d + 1.0) - lnm
      assert(frac > 1e-4 && frac < 1 - 1e-4, s"depth $d frac=$frac")
    }
  }

  private def ndcg(runs: Seq[(String, Long, Long)],
      qrels: Seq[(String, Long, Long)], k: Int) = {
    import spark.implicits._
    Retrieval.ndcgAtK(runs.toDF("q", "d", "r"),
        qrels.toDF("q", "d", "g"), "q", "d", "r", "g", k)
      .selectExpr("query", "dcg_unit", "idcg_unit", "ndcg_ppm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("ndcgAtK hand trace: grades (3,0,1) at ranks 1..3 vs ideal " +
      "(3,1) — exact integer terms") {
    val w1 = Retrieval.DcgDiscountMicro(0)
    val w2 = Retrieval.DcgDiscountMicro(1)
    val w3 = Retrieval.DcgDiscountMicro(2)
    // run: doc 10 (grade 3) rank 1, doc 11 (unjudged) rank 2,
    //      doc 12 (grade 1) rank 3; qrels also hold doc 99 grade 0
    val got = ndcg(
      Seq(("A", 10L, 1L), ("A", 11L, 2L), ("A", 12L, 3L)),
      Seq(("A", 10L, 3L), ("A", 12L, 1L), ("A", 99L, 0L)), k = 3)
    val dcg = 3L * w1 + 0L * w2 + 1L * w3
    val idcg = 3L * w1 + 1L * w2 // ideal: grade 3 first, then 1
    assert(got("A") === ((dcg, idcg, dcg * 1000000L / idcg)))
  }

  test("ndcgAtK: run in ideal order scores exactly 1e6 ppm; " +
      "no positive judgment scores 0; ideal uses TOP-k grades only") {
    val perfect = ndcg(
      Seq(("A", 1L, 1L), ("A", 2L, 2L)),
      Seq(("A", 1L, 2L), ("A", 2L, 1L)), k = 2)
    assert(perfect("A")._3 === 1000000L)
    val none = ndcg(Seq(("B", 1L, 1L)), Seq(("B", 1L, 0L)), k = 2)
    assert(none("B") === ((0L, 0L, 0L)))
    // 3 positives but k = 2: ideal must take the two HIGHEST grades
    val w1 = Retrieval.DcgDiscountMicro(0)
    val w2 = Retrieval.DcgDiscountMicro(1)
    val cut = ndcg(
      Seq(("C", 5L, 1L), ("C", 6L, 2L)),
      Seq(("C", 5L, 1L), ("C", 6L, 3L), ("C", 7L, 2L)), k = 2)
    assert(cut("C")._2 === 3L * w1 + 2L * w2)
    assert(cut("C")._1 === 1L * w1 + 3L * w2)
  }

  // ---- MAP@k ----

  private def map(runs: Seq[(String, Long, Long)],
      qrels: Seq[(String, Long)], k: Int) = {
    import spark.implicits._
    Retrieval.averagePrecisionAtK(runs.toDF("q", "d", "r"),
        qrels.toDF("q", "d"), "q", "d", "r", k)
      .selectExpr("query", "n_rel", "hits", "ap_units", "ap_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
  }

  test("averagePrecisionAtK hand trace: rel at ranks 1 and 3 of 3, " +
      "two relevant total — exact lcm-scaled terms") {
    // P@1 = 1/1, P@3 = 2/3; AP = (1 + 2/3)/2 = 5/6
    // L = lcm(1..3) = 6: units = 1·6 + 2·2 = 10; ppm = 10e6/(6·2)
    val got = map(
      Seq(("A", 10L, 1L), ("A", 11L, 2L), ("A", 12L, 3L)),
      Seq(("A", 10L), ("A", 12L)), k = 3)
    assert(got("A") === (("A", 2L, 2L, 10L, 10L * 1000000L / 12L)))
  }

  test("averagePrecisionAtK: perfect prefix run scores 1e6; no " +
      "relevant scores 0; TREC min(n_rel, k) denominator") {
    val perfect = map(
      Seq(("A", 1L, 1L), ("A", 2L, 2L)),
      Seq(("A", 1L), ("A", 2L)), k = 2)
    assert(perfect("A")._5 === 1000000L)
    val none = map(Seq(("B", 1L, 1L)), Seq(("B", 99L)), k = 2)
    assert(none("B")._5 === 0L && none("B")._2 === 1L)
    // 5 relevant but k = 2 and both retrieved hits: denominator is
    // min(5, 2) = 2, so a full-precision prefix still scores 1e6
    val cut = map(
      Seq(("C", 1L, 1L), ("C", 2L, 2L)),
      (1L to 5L).map(d => ("C", d)), k = 2)
    assert(cut("C")._5 === 1000000L)
  }

  private def ci(perQ: Seq[(String, Long)], shift: Long,
      replicates: Int = 64) = {
    import spark.implicits._
    val a = perQ.toDF("query", "m")
    val b = perQ.map { case (q, v) => (q, v - shift) }.toDF("query", "m")
    Retrieval.metricDeltaCi(a, b, "m", replicates)
      .selectExpr("n_queries", "mean_delta_ppm", "ci_lo_ppm",
        "ci_hi_ppm", "replicates", "significant")
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .head()
  }

  private val perQ: Seq[(String, Long)] =
    (1 to 12).map(i => (s"q$i", 100000L * i))

  test("metricDeltaCi hand trace: identical rankers give a degenerate " +
      "[0, 0] interval and NOT significant") {
    // every per-query delta is 0, so every Poisson-weighted replicate
    // mean is 0 regardless of the draw: mean 0, CI [0, 0]
    assert(ci(perQ, shift = 0L) === ((12L, 0L, 0L, 0L, 64L, false)))
  }

  test("metricDeltaCi hand trace: a constant per-query shift gives a " +
      "point-mass interval at the shift, significant in its sign") {
    // delta_q = c for all q ⇒ each replicate mean is sum(k·c)/sum(k)
    // = c exactly (any draw with sum(k) > 0; a 12-query all-zero draw
    // has probability e^-12 and the md5 draw is deterministic — this
    // fixture verified none occurs), so the percentile CI collapses
    // to [c, c]
    assert(ci(perQ, shift = 7000L) ===
      ((12L, 7000L, 7000L, 7000L, 64L, true)))
    // sign-safe: the negative shift mirrors exactly (Spark div
    // truncates, DuckDB // floors — the abs-routed mean makes both
    // floor the same non-negative quantity)
    assert(ci(perQ, shift = -7000L) ===
      ((12L, -7000L, -7000L, -7000L, 64L, true)))
  }

  test("metricDeltaCi rank rule: B=64, tail 2.5% picks the 2nd and " +
      "63rd order statistics (ceil(64*0.025) = 2)") {
    import spark.implicits._
    // heterogeneous deltas: replicate means spread, so the CI must be
    // strictly inside [min, max] of the replicate means — pin the
    // rank arithmetic rather than the (deterministic) draw itself
    val a = (1 to 9).map(i => (s"q$i", if (i % 2 == 0) 50000L else -10000L))
      .toDF("query", "m")
    val b = (1 to 9).map(i => (s"q$i", 0L)).toDF("query", "m")
    val row = Retrieval.metricDeltaCi(a, b, "m", replicates = 64)
      .selectExpr("ci_lo_ppm", "ci_hi_ppm")
      .as[(Long, Long)].head()
    assert(row._1 <= row._2)
    assert(row._1 >= -10000L && row._2 <= 50000L,
      "replicate means are convex combinations of the deltas")
  }
}
