package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column row/null/distinct counts and min/max — the
  * first query anyone runs against an unfamiliar 100 TB table, and the
  * input to every data-quality monitor.
  *
  * One wide aggregation computes every column's statistics in a single
  * pass over the data, then the 1×(4·ncols) row is unpivoted driver-free
  * into the long (column, stat) form. Exact `count(distinct)` per column
  * expands the input ncols× (Spark's Expand-based multi-distinct); that
  * is the price of exactness — [[profileApprox]] swaps in HLL
  * `approx_count_distinct` for the 100 TB profile run, turning the whole
  * thing into one streaming-aggregate pass with constant memory.
  *
  * Min/max are reported as canonical strings (dates ISO, numerics via
  * plain cast) so one relation can carry mixed column types.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = true)

  /** HLL-based distinct counts (±2% default): the variant that stays a
    * single non-expanded pass at petabyte scale. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = false)

  /** Equi-width histogram of a numeric column: bucket i covers
    * `[lo + i·width, lo + (i+1)·width)`, out-of-range values clamp into
    * the edge buckets. One map-side-combined aggregation on the bucket id
    * — the profile companion that shows the SHAPE min/max can't.
    * `width` should be an integer-valued double so the bucket division is
    * the same correctly-rounded IEEE op in any engine.
    */
  def histogram(df: DataFrame, c: String, lo: Double, width: Double,
      nBuckets: Int): DataFrame =
    df.where(col(c).isNotNull)
      .select(least(greatest(floor((col(c) - lo) / width), lit(0)),
        lit(nBuckets - 1L)).cast("long").as("bucket"),
        col(c).as("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("__v")), 2).as("min_value"),
        round(max(col("__v")), 2).as("max_value"))

  /** Winsorization at EXACT rank thresholds — the robust-stats clip
    * that survives what z-score trimming ([[graft.queries]]'s
    * q_outliers) cannot: heavy tails move the mean/σ themselves, while
    * order statistics do not. The lower/upper cut values are the exact
    * `ceil(n·ppm/1e6)`-th smallest values (1-based, clamped to [1, n];
    * ties broken by the unique id so the RANK is well-defined — the
    * cut VALUE is unaffected by the tiebreak), and every value clamps
    * into `[lo_cut, hi_cut]`. No arithmetic touches the doubles (pure
    * least/greatest), so raw values hash-match bit-for-bit.
    *
    * Distribution shape (r13 histogram rewrite, r14 cumulation fix):
    * the cut VALUES are all the operator needs — per-row ranks never
    * were — so the construction is ONE map-side-combinable groupBy to
    * the value histogram, the cumulative count over it, a 1-row cut
    * relation broadcast back, one map-side clamp. The cumulation is
    * [[Packing.cumSumOrdered]] — NOT `Window.orderBy(v)` with no
    * PARTITION BY: `v` is a raw DOUBLE, so on a continuous-valued
    * column the "value-range-sized" histogram approximates the corpus
    * and an unpartitioned window would funnel it through ONE task (the
    * r13 verdict's scale-killer). The two-phase form costs one extra
    * narrow evaluation of the histogram groupBy and is exact wherever
    * the splitters cut; the k-th smallest VALUE is identical under
    * any construction (rank tiebreaks by id cannot change it), so
    * oracles are unchanged. Output:
    * `(id, value, lo_cut, hi_cut, winsorized, clipped)`. */
  def winsorize(df: DataFrame, idCol: String, valueCol: String,
      loPpm: Long = 10000L, hiPpm: Long = 990000L): DataFrame = {
    require(loPpm >= 0 && hiPpm <= 1000000L && loPpm <= hiPpm,
      s"need 0 <= loPpm <= hiPpm <= 1e6 (got $loPpm, $hiPpm)")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).as("v")).where(col("v").isNotNull)
    val hist = base.groupBy(col("v")).agg(count(lit(1)).as("__c"))
    val cum = Packing.cumSumOrdered(hist, "v", "__c",
      cumCol = "__cum", totalCol = Some("n"))
    val cuts = broadcast(cum
      .withColumn("__klo", expr(
        s"greatest(least((n * ${loPpm}L + 999999L) div 1000000L, n), 1L)"))
      .withColumn("__khi", expr(
        s"greatest(least((n * ${hiPpm}L + 999999L) div 1000000L, n), 1L)"))
      .agg(min(when(col("__cum") >= col("__klo"), col("v")))
          .as("lo_cut"),
        min(when(col("__cum") >= col("__khi"), col("v")))
          .as("hi_cut")))
    base.crossJoin(cuts)
      .select(col("id"), col("v").as("value"), col("lo_cut"),
        col("hi_cut"),
        least(greatest(col("v"), col("lo_cut")), col("hi_cut"))
          .as("winsorized"),
        (col("v") < col("lo_cut") || col("v") > col("hi_cut"))
          .cast("long").as("clipped"))
  }

  /** Per-GROUP winsorization — [[winsorize]] with one pair of exact
    * rank cuts per group (per-language / per-domain clipping: a global
    * p99 calibrated mostly on English clips every long-tailed minority
    * language at the wrong place; order statistics only transfer
    * WITHIN a group — the conformalGateByGroup argument applied to
    * robust clipping).
    *
    * Distribution shape: corpus work is ONE map-side-combinable
    * groupBy to the `(group, value)` histogram; the per-group
    * cumulation is [[Packing.cumSumWithinGroups]] (r14 — a
    * `Window.partitionBy(group)` would still sort ONE high-cardinality
    * group's continuous-double histogram in one task); cuts are a
    * groups-sized relation joined back on the group key. Same exact
    * `clamp(ceil(n·ppm/10⁶), 1, n)` rank rule as the global operator,
    * applied per group.
    *
    * Output: `(id, group, value, lo_cut, hi_cut, winsorized,
    * clipped)`. */
  def winsorizeByGroup(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, loPpm: Long = 10000L,
      hiPpm: Long = 990000L): DataFrame = {
    require(loPpm >= 0 && hiPpm <= 1000000L && loPpm <= hiPpm,
      s"need 0 <= loPpm <= hiPpm <= 1e6 (got $loPpm, $hiPpm)")
    val base = df.select(col(idCol).cast("long").as("id"),
        col(groupCol).cast("string").as("group"),
        col(valueCol).as("v"))
      .where(col("v").isNotNull)
    val hist = base.groupBy(col("group"), col("v"))
      .agg(count(lit(1)).as("__c"))
    val cuts = Packing.cumSumWithinGroups(hist, "group", "v", "__c",
        cumCol = "__cum", totalCol = Some("__n"))
      .withColumn("__klo", expr(
        s"greatest(least((__n * ${loPpm}L + 999999L) div 1000000L, __n), 1L)"))
      .withColumn("__khi", expr(
        s"greatest(least((__n * ${hiPpm}L + 999999L) div 1000000L, __n), 1L)"))
      .groupBy(col("group"))
      .agg(min(when(col("__cum") >= col("__klo"), col("v"))).as("lo_cut"),
        min(when(col("__cum") >= col("__khi"), col("v"))).as("hi_cut"))
    base.join(cuts, Seq("group"))
      .select(col("id"), col("group"), col("v").as("value"),
        col("lo_cut"), col("hi_cut"),
        least(greatest(col("v"), col("lo_cut")), col("hi_cut"))
          .as("winsorized"),
        (col("v") < col("lo_cut") || col("v") > col("hi_cut"))
          .cast("long").as("clipped"))
  }

  /** [[psiDrift]] over numeric VALUE BINS — the fourth cell of the
    * drift matrix ({TV, PSI} × {categorical, numeric}): the sign-safe
    * [[driftBinExpr]] binning with the PSI read-side arithmetic, so a
    * shifted tail that TV under-weights is caught with the same
    * exact-pico machinery. Output: the [[psiDrift]] shape with `bin`
    * BIGINT. */
  def psiNumericDrift(a: DataFrame, b: DataFrame, valueCol: String,
      binWidth: Long): DataFrame = {
    def binned(df: DataFrame) = df.select(
      expr(driftBinExpr(valueCol, binWidth)).as("category"))
    psiDrift(binned(a), binned(b), "category")
      .withColumnRenamed("category", "bin")
      .withColumn("bin", col("bin").cast("long"))
  }

  /** Categorical drift between two snapshots — the data-quality
    * monitor a pipeline runs between ingests ("did the source mix
    * shift?"): each snapshot's category shares in exact ppm plus the
    * per-category absolute gap. Σ gap_ppm / 2 is the total-variation
    * distance — the standard distribution-shift number that, unlike
    * PSI/KL, needs no logarithm and so stays EXACT integer at any
    * scale (shares are floored ppm; no count×count product ever
    * forms, so nothing approaches overflow at 100 TB totals).
    *
    * Distribution shape: two map-side-combinable groupBys + one
    * full-outer join on the category key (categories-sized) + two
    * 1-row total subqueries broadcast back. Categories missing from
    * either side surface with a zero count rather than vanishing.
    *
    * Output: `(category, n_a, n_b, share_a_ppm, share_b_ppm,
    * gap_ppm)`. */
  def categoryDrift(a: DataFrame, b: DataFrame,
      catCol: String): DataFrame =
    categoryDriftFromCounts(categoryCounts(a, catCol),
      categoryCounts(b, catCol))

  /** The one corpus-facing stage of [[categoryDrift]]: ONE
    * map-side-combinable groupBy to `(category, cnt)`. Counts are
    * ADDITIVE across any partition of the snapshot — what lets the
    * streamed twin ([[graft.streaming.StreamingDrift]]) fold per-batch
    * category counts and rerun the share arithmetic read-side. */
  def categoryCounts(df: DataFrame, catCol: String): DataFrame =
    df.groupBy(col(catCol).cast("string").as("category"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** The categories-sized half: shares + TV gaps from two
    * `(category, cnt)` count relations (see [[categoryDrift]]). */
  def categoryDriftFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("category"), col("cnt").as("n_a"))
      .join(b.select(col("category"), col("cnt").as("n_b")),
        Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val totals = broadcast(j.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb")))
    j.crossJoin(totals)
      .withColumn("share_a_ppm",
        expr("n_a * 1000000L div greatest(__ta, 1L)"))
      .withColumn("share_b_ppm",
        expr("n_b * 1000000L div greatest(__tb, 1L)"))
      .select(col("category"), col("n_a"), col("n_b"),
        col("share_a_ppm"), col("share_b_ppm"),
        abs(col("share_a_ppm") - col("share_b_ppm")).as("gap_ppm"))
  }

  /** Population stability index per category, in exact pico units —
    * the drift number risk teams publish next to [[categoryDrift]]'s
    * TV distance (PSI weights a share shift by its LOG ratio, so a
    * category going 1% → 0.1% screams where TV barely moves).
    *
    * Exactness discipline: shares are floored ppm, CLAMPED to ≥ 1 ppm
    * (the standard zero-bin practice — PSI is undefined at zero);
    * each term is `(sa − sb) · floor(10⁶·ln(sa/sb))` with `sa/sb` a
    * single correctly-rounded division of exact integers ≤ 10⁶, so
    * both engines hand ln identical doubles ([[LanguageModel]]'s
    * micro-nat argument) and the published BIGINT terms sum
    * order-independently. `Σ psi_term_pico / 10¹²` is the textbook
    * PSI.
    *
    * Distribution shape: identical to [[categoryDrift]] — two
    * map-side-combinable groupBys, one categories-sized full-outer
    * join, two 1-row totals broadcast back.
    *
    * Output: `(category, n_a, n_b, share_a_ppm, share_b_ppm,
    * psi_term_pico)` with the CLAMPED shares published (they are the
    * numbers the term actually used). */
  def psiDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame =
    psiFromCounts(categoryCounts(a, catCol), categoryCounts(b, catCol))

  /** The categories-sized half of [[psiDrift]] over two
    * `(category, cnt)` relations — shared with the streamed monitor
    * ([[graft.streaming.StreamingDrift.reportPsi]]). */
  def psiFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("category"), col("cnt").as("n_a"))
      .join(b.select(col("category"), col("cnt").as("n_b")),
        Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val totals = broadcast(j.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb")))
    j.crossJoin(totals)
      .withColumn("share_a_ppm",
        expr("greatest(n_a * 1000000L div greatest(__ta, 1L), 1L)"))
      .withColumn("share_b_ppm",
        expr("greatest(n_b * 1000000L div greatest(__tb, 1L), 1L)"))
      .select(col("category"), col("n_a"), col("n_b"),
        col("share_a_ppm"), col("share_b_ppm"),
        expr("""(share_a_ppm - share_b_ppm) *
               | CAST(floor(1000000.0d *
               |   ln(CAST(share_a_ppm AS DOUBLE)
               |      / CAST(share_b_ppm AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("psi_term_pico"))
  }

  /** The sign-safe truncating bin id for [[numericDrift]] and its
    * streamed twin — shared so a value always lands in the same bin
    * on both sides of the comparison. */
  def driftBinExpr(valueCol: String, binWidth: Long): String = {
    require(binWidth >= 1, s"binWidth must be positive (got $binWidth)")
    s"""(CASE WHEN CAST($valueCol AS BIGINT) < 0 THEN -1L ELSE 1L END)
       | * (abs(CAST($valueCol AS BIGINT)) div ${binWidth}L)"""
      .stripMargin
  }

  /** Numeric drift between two snapshots — [[categoryDrift]] over
    * VALUE BINS (sign-safe truncating division, the calibration
    * family's binning), so a shifted length/score/latency
    * distribution is caught with the same exact-ppm TV machinery and
    * no logarithm. Output:
    * `(bin, n_a, n_b, share_a_ppm, share_b_ppm, gap_ppm)`. */
  def numericDrift(a: DataFrame, b: DataFrame, valueCol: String,
      binWidth: Long): DataFrame = {
    def binned(df: DataFrame) = df.select(
      expr(driftBinExpr(valueCol, binWidth)).as("category"))
    categoryDrift(binned(a), binned(b), "category")
      .withColumnRenamed("category", "bin")
      .withColumn("bin", col("bin").cast("long"))
  }

  private def profileImpl(df: DataFrame, cols: Seq[String],
      exact: Boolean): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val total = count(lit(1)).as("__n")
    val wide = df.agg(total, aggs: _*)
    // unpivot the single wide row into (column, stats) — a stack() over
    // one row, no extra pass over the data
    val stacked = cols.map { c =>
      s"'$c', __n - __nn_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    wide.select(col("__n").as("n_rows"),
      expr(s"stack(${cols.size}, $stacked)")
        .as(Seq("column", "n_nulls", "n_distinct", "min_value", "max_value")))
      .select(col("column"), col("n_rows"), col("n_nulls").cast("long"),
        col("n_distinct").cast("long"), col("min_value"), col("max_value"))
  }
}
