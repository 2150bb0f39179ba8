package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture allocation operators — the two published mixing
  * policies between [[TextAnalysis.tokenBudgetMix]]'s equal-share
  * rebalance (temperature α → 0) and no rebalance at all (α = 1):
  *
  *  - [[temperatureSample]]: exponentiated share smoothing
  *    `q_i ∝ p_i^α` at α = 1/2 — the multilingual sampling rule of
  *    the mT5/XLM-R family, realized as per-domain keep rates
  *    normalized so the rarest domain keeps everything. α is FIXED at
  *    1/2 by the determinism discipline: `x^(1/2)` is IEEE `sqrt`
  *    (correctly rounded, bit-identical in any engine), while a
  *    general `pow(x, α)` is not correctly rounded and may differ by
  *    ulps between the JVM and the oracle's libm — the engine refuses
  *    to build a hash-gate on that.
  *  - [[waterfill]]: exact integer water-filling of a global token
  *    budget over per-domain token counts — every domain keeps
  *    `min(c_i, λ)` tokens with the level λ chosen so the total hits
  *    the budget (the "epoch cap" allocation a Pile-style mixture
  *    ships with). Closed-form over the sorted domain relation (one
  *    window pass), no iteration, all-BIGINT.
  *
  * Distribution shape (the 100 TB contract): both operators reduce the
  * corpus with ONE map-side-combinable groupBy to a DOMAINS-sized
  * relation (languages/sources — bounded by construction, the
  * types²-matrix precedent), run the allocation arithmetic there (the
  * waterfill's unpartitioned window orders ≤ |domains| rows, never
  * corpus rows), and broadcast the per-domain rates back onto one
  * corpus pass.
  *
  * Reference scope: the reference has no sampling surface
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:44-63);
  * mixture allocation belongs to the declared extension surface
  * (SURVEY.md §2.11).
  */
object Mixing {

  /** Keep each document of domain `d` with rate
    * `floor(1e6 · sqrt(c_min / c_d))` ppm (α = 1/2 temperature
    * smoothing; the rarest domain keeps 100%), decided by the
    * engine-wide md5 uniform of `(id, domain)` — the
    * [[graft.queries.Pipeline]] q_lang_balance draw, so the KEPT SET
    * hash-matches, not just its size.
    *
    * Output: `(id, domain, rate_ppm)` for kept rows. */
  def temperatureSample(docs: DataFrame, idCol: String,
      domainCol: String): DataFrame =
    sampleAgainstCounts(docs,
      docs.groupBy(col(domainCol).as("domain"))
        .agg(count(lit(1)).cast("long").as("n")),
      idCol, domainCol)

  /** The rate arithmetic + draw over an EXPLICIT `(domain, n)` count
    * relation — the read-side half the streamed twin reruns against
    * its merged fold state ([[graft.streaming.StreamingMixing
    * .sample]]). Domains of sampled rows must be present in `cntRel`
    * (true whenever the sampled rows are a subset of the counted
    * corpus — both callers' contract). */
  def sampleAgainstCounts(docs: DataFrame, cntRel: DataFrame,
      idCol: String, domainCol: String): DataFrame = {
    val rated = broadcast(cntRel
      .join(cntRel.agg(min(col("n")).as("m")))
      .select(col("domain"),
        expr("""CAST(floor(1000000.0 * sqrt(
               |  CAST(m AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("rate_ppm")))
    docs.select(col(idCol).cast("long").as("id"),
        col(domainCol).as("domain"))
      .join(rated, Seq("domain"))
      .where(expr(s"${Dedup.h60(
        "concat(CAST(id AS STRING), ':', domain)")} % 1000000")
        < col("rate_ppm"))
      .select(col("id"), col("domain"), col("rate_ppm"))
  }

  /** Exact integer water-filling: allocate
    * `budget = floor(total · budgetPpm / 1e6)` tokens over the
    * per-domain token counts `c_d` as `alloc_d = min(c_d, λ)`, with
    * the level λ the largest integer keeping the sum within budget.
    * Closed form: sort domains by count ascending; the level sits in
    * the first slot j where `pre_j + c_j · rem_j >= budget`
    * (`pre` = exclusive prefix sum, `rem` = domains from j on), at
    * `λ = (budget − pre_j) div rem_j`; if even the full corpus fits,
    * every domain keeps everything and λ = max(c). The residual
    * `budget − Σ alloc` is < |domains| tokens by construction.
    *
    * Output: one row per domain,
    * `(domain, total_tokens, alloc_tokens, budget_tokens, level)`. */
  def waterfill(docs: DataFrame, textCol: String, domainCol: String,
      budgetPpm: Long): DataFrame = {
    require(budgetPpm >= 0L, s"need budgetPpm >= 0, got $budgetPpm")
    val c = docs
      .select(col(domainCol).as("domain"),
        size(expr(Dedup.wordsExpr(textCol))).cast("long").as("t"))
      .groupBy(col("domain")).agg(sum(col("t")).as("c"))
    val g = c.agg(sum(col("c")).as("gt"),
      count(lit(1)).cast("long").as("m"),
      max(col("c")).as("cmax"))
    // |domains| rows: the unpartitioned windows below order a bounded
    // relation, never the corpus
    val wAsc = Window.orderBy(col("c").asc, col("domain").asc)
    val ranked = c.crossJoin(broadcast(g))
      .withColumn("budget", expr("(gt * " + budgetPpm + ") div 1000000"))
      .withColumn("j", row_number().over(wAsc).cast("long"))
      .withColumn("pre",
        coalesce(sum(col("c")).over(
          wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rem", col("m") - col("j") + 1L)
      .withColumn("feasible", col("pre") + col("c") * col("rem") >=
        col("budget"))
    // the FIRST feasible slot's level (min_by over j; later feasible
    // slots compute smaller pseudo-levels and must not win); no
    // feasible slot = the whole corpus fits the budget → λ = max(c)
    val lvl = broadcast(ranked.agg(
      coalesce(
        expr("""min_by(if(feasible, (budget - pre) div rem,
               |  CAST(NULL AS BIGINT)),
               |  if(feasible, j, CAST(NULL AS BIGINT)))""".stripMargin),
        max(col("c"))).as("level")))
    ranked.crossJoin(lvl)
      .select(col("domain"), col("c").as("total_tokens"),
        least(col("c"), col("level")).as("alloc_tokens"),
        col("budget").as("budget_tokens"), col("level"))
  }
}
