package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-data operators — the RLHF-side curation verbs: pairwise
  * comparisons mined from an interaction stream, win-rate matrices,
  * Bradley–Terry strength fitting, and inter-judge agreement. A
  * training-data pipeline that collects human (or model-judge)
  * feedback needs exactly these to turn raw comparison logs into
  * rankings and reliability stats.
  *
  * Comparisons derive from the `events` stream: within each user's
  * timeline, every consecutive pair of DIFFERENT event types is one
  * head-to-head trial whose higher `value` wins (equal values are
  * ties and drop). That mirrors how implicit-feedback pipelines mint
  * preference pairs from session logs.
  *
  * Determinism contract (the engine-wide one): every published number
  * is an exact integer — ppm shares, micro-unit strengths, floored
  * single divisions of exact integers — so the whole Bradley–Terry
  * trajectory hash-matches a DuckDB oracle cell for cell.
  *
  * Distribution shape (the 100 TB contract): pair extraction is ONE
  * per-user window (a single hash exchange on user_id, the same
  * discipline as the sessionize/funnel family); everything after is
  * aggregated to the |types|² comparison matrix, so the MM iterations
  * run on a relation whose size is independent of the corpus. The
  * matrix shares are pre-normalized to ppm of the total comparison
  * count, which is what keeps every intermediate bounded (≤ 1e18)
  * at ANY corpus size — see [[bradleyTerry]].
  *
  * Reference scope: the reference aggregates per-key traffic totals
  * from an event stream with one `reduceByKey`
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:51-55);
  * head-to-head extraction + strength fitting is that same
  * grouped-aggregation surface pointed at comparison data.
  */
object Preference {

  /** Directed win counts `(winner, loser, cnt)` from consecutive
    * same-user event pairs (different types, unequal values). */
  private[operators] def wins(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .where(col("prev_type").isNotNull &&
        col("prev_type") =!= col("event_type") &&
        col("prev_value") =!= col("value"))
      .select(
        when(col("value") > col("prev_value"), col("event_type"))
          .otherwise(col("prev_type")).as("winner"),
        when(col("value") > col("prev_value"), col("prev_type"))
          .otherwise(col("event_type")).as("loser"))
      .groupBy("winner", "loser")
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Canonical win-rate matrix: one row per unordered type pair
    * `(type_a < type_b)` with both directed win counts, the trial
    * total, and a's win share in ppm (floored — exact integers
    * only). */
  def winRate(events: DataFrame): DataFrame = {
    val d = wins(events)
    d.select(
        when(col("winner") < col("loser"), col("winner"))
          .otherwise(col("loser")).as("type_a"),
        when(col("winner") < col("loser"), col("loser"))
          .otherwise(col("winner")).as("type_b"),
        when(col("winner") < col("loser"), col("cnt")).otherwise(lit(0L))
          .as("wa"),
        when(col("winner") < col("loser"), lit(0L)).otherwise(col("cnt"))
          .as("wb"))
      .groupBy("type_a", "type_b")
      .agg(sum(col("wa")).cast("long").as("wins_a"),
        sum(col("wb")).cast("long").as("wins_b"))
      .withColumn("n", col("wins_a") + col("wins_b"))
      .withColumn("winrate_a_ppm", expr("wins_a * 1000000L div n"))
  }

  /** Bradley–Terry strength fit by `rounds` MM iterations (the
    * classic minorization–maximization update: p_i ← W_i / Σ_j
    * N_ij/(p_i+p_j), renormalized each round), published as the full
    * trajectory `(round, event_type, strength_micro)` with strengths
    * summing to ≈ |types| × 1e6.
    *
    * Exact-integer schedule, overflow-safe at any corpus size:
    *  - the comparison matrix is pre-normalized ONCE to ppm of the
    *    total trial count (`m_ij = N_ij*1e6 div C`, `w_i = W_i*1e6
    *    div C`) — every later quantity is bounded by the ppm scale,
    *    not the corpus (pairs below 1 ppm of all trials floor out,
    *    which is the right behavior at 100 TB);
    *  - per round: `d_i = Σ_j (m_ij*1e6 div (p_i+p_j))`, raw
    *    strength `praw_i = w_i*1e12 div max(d_i,1)` (≤ 1e18 since
    *    `w_i ≤ 1e6`) capped at 1e14 — the natural scale is ~2e12 ×
    *    win-rate, so the cap only binds when a type's strength
    *    diverges (some type never loses: the BT MLE doesn't exist and
    *    the cap is what makes the fit total) and it keeps `Σpraw`
    *    inside a BIGINT for up to ~90k types;
    *  - renormalize by DIVISION only (`p_i = praw_i div max(Σpraw
    *    div (k*1e6), 1)` — a praw×1e6 multiply could overflow), so
    *    strengths sum to ≈ k×1e6 each round.
    * All divisions are floored divisions of non-negative integers,
    * identical in Spark (`div`) and DuckDB (`//`). */
  def bradleyTerry(events: DataFrame, rounds: Int = 5): DataFrame =
    fitWins(wins(events), rounds)

  /** The MM fit from an already-aggregated directed win-count matrix
    * `(winner, loser, cnt)` — the entry point for STORED matrices (a
    * streaming fold maintains the counts incrementally, the fit reruns
    * on the tiny matrix; see
    * [[graft.streaming.StreamingPreference]]). */
  def fitWins(winCounts: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val spark = winCounts.sparkSession
    val d = winCounts
      .groupBy("winner", "loser") // idempotent re-aggregation of folds
      .agg(sum(col("cnt")).cast("long").as("cnt"))
      .localCheckpoint(true) // read by W, N, and C
    // symmetric trial matrix + per-type win totals, both in ppm of C
    val c = d.agg(sum(col("cnt")).as("c")) // 1 row
    val m = d.select(col("winner").as("i"), col("loser").as("j"), col("cnt"))
      .unionByName(
        d.select(col("loser").as("i"), col("winner").as("j"), col("cnt")))
      .groupBy("i", "j").agg(sum(col("cnt")).as("nij"))
      .crossJoin(c)
      .select(col("i"), col("j"), expr("nij * 1000000L div c").as("mij"))
      .localCheckpoint(true)
    val w = d.groupBy(col("winner").as("i"))
      .agg(sum(col("cnt")).as("wi"))
      .crossJoin(c)
      .select(col("i"), expr("wi * 1000000L div c").as("wppm"))
    val types = m.select(col("i")).distinct()
    val k = types.count() // |types|: tiny, loop/scale constant
    var p = types.select(col("i"), lit(1000000L).as("p"))
      .localCheckpoint(true)
    var traj: DataFrame = null
    for (r <- 1 to rounds) {
      val dsum = m
        .join(p.select(col("i"), col("p").as("pi")), Seq("i"))
        .join(p.select(col("i").as("j"), col("p").as("pj")), Seq("j"))
        .groupBy("i")
        .agg(sum(expr("mij * 1000000L div greatest(pi + pj, 1L)")).as("di"))
      val praw = w.join(dsum, Seq("i"), "left")
        .select(col("i"), least(
          expr("wppm * 1000000000000L div greatest(coalesce(di, 0L), 1L)"),
          lit(100000000000000L)).as("praw"))
      val s = praw.agg(sum(col("praw")).as("s"))
      p = types
        .join(praw, Seq("i"), "left")
        .crossJoin(s)
        .select(col("i"), expr(
          s"coalesce(praw, 0L) div greatest(s div ${k * 1000000L}L, 1L)")
          .as("p"))
        .localCheckpoint(true) // read twice next round (pi + pj) + traj
      val step = p.select(lit(r.toLong).as("round"),
        col("i").as("event_type"), col("p").as("strength_micro"))
      traj = if (traj == null) step else traj.unionByName(step)
    }
    if (traj == null) spark.emptyDataFrame else traj
  }

  /** Fleiss' kappa for MORE than two judges: each event is one item
    * rated by three derived judges into two categories (positive /
    * negative) — judge A = `value >= athr`, judge B = `props.k >=
    * bthr`, judge C = `length(props) >= cthr` — the multi-rater agreement
    * stat an eval pipeline reports when a panel of model judges
    * scores the same items (Fleiss 1971).
    *
    * Exact-integer publication (the [[judgeAgreement]] discipline,
    * extended). With m = 3 judges, n items, `n_pos` positive votes per
    * item, `q = tot_pos = Σ n_pos`, `N = n·m`, and
    * `sum_sq = Σ_i (n_pos² + (m−n_pos)²)`:
    * `P̄ = (sum_sq − N) / (N·(m−1))` and
    * `P̄e = (q² + (N−q)²) / N²`. Clearing κ = (P̄ − P̄e)/(1 − P̄e)
    * to the common denominator `N²·(m−1)` gives the published exact
    * integers
    * `kappa_num = N·(sum_sq − N) − (m−1)·(q² + (N−q)²)` and
    * `kappa_den = N²·(m−1) − (m−1)·(q² + (N−q)²)`.
    * One division left to the consumer (kappa can be negative and
    * signed floored division differs between engines). */
  def fleissKappa(events: DataFrame, athr: Double = 35.0,
      bthr: Long = 50L, cthr: Long = 9L): DataFrame = {
    val m = lit(3L)
    val votes = events.select(
      ((col("value") >= lit(athr)).cast("long") +
        (get_json_object(col("props"), "$.k").cast("long") >= lit(bthr))
          .cast("long") +
        (length(col("props")) >= lit(cthr)).cast("long")).as("n_pos"))
    votes
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("n_pos")).cast("long").as("tot_pos"),
        sum(col("n_pos") * col("n_pos") +
          (m - col("n_pos")) * (m - col("n_pos"))).cast("long").as("sum_sq"))
      .select(col("n"), lit(3L).as("m"), col("tot_pos"), col("sum_sq"),
        expr("""n * 3 * (sum_sq - n * 3) -
               |2 * (tot_pos * tot_pos +
               |     (n * 3 - tot_pos) * (n * 3 - tot_pos))"""
          .stripMargin).as("kappa_num"),
        expr("""n * n * 9 * 2 -
               |2 * (tot_pos * tot_pos +
               |     (n * 3 - tot_pos) * (n * 3 - tot_pos))"""
          .stripMargin).as("kappa_den"))
  }

  /** Best-of-n selection — the rejection-sampling verb: per context
    * (user), pick the highest-scored candidate and publish it with its
    * margin over the runner-up (the margin is what reward-gap filters
    * threshold on before a pair enters DPO/RLHF training).
    *
    * Deterministic contract: scores are exact cents
    * (`floor(value·100)`, explicit floor — the engine-wide cast rule),
    * ties break to the SMALLER event_id; single-candidate contexts
    * publish NULL runner-up/margin. Output: `(user_id,
    * chosen_event_id, chosen_cents, runner_up_cents, margin_cents,
    * n_candidates)`.
    *
    * Distribution shape: one groupBy on the context key with a
    * per-context top-2 kept via sort_array over the collected
    * candidate list — candidate lists are CONTEXT-sized (a session's
    * samples, bounded upstream by the generator), never corpus-sized;
    * no per-group window over the corpus. */
  def bestOfN(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    events
      .select(col("user_id"), col("event_id"), cents.as("cents"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).cast("long").as("n_candidates"),
        slice(sort_array(collect_list(
          struct(col("cents"), (col("event_id") * -1).as("nid"))),
          asc = false), 1, 2).as("top2"))
      .select(col("user_id"),
        (element_at(col("top2"), 1).getField("nid") * -1)
          .as("chosen_event_id"),
        element_at(col("top2"), 1).getField("cents").as("chosen_cents"),
        try_element_at(col("top2"), lit(2)).getField("cents")
          .as("runner_up_cents"),
        (element_at(col("top2"), 1).getField("cents") -
          try_element_at(col("top2"), lit(2)).getField("cents"))
          .as("margin_cents"),
        col("n_candidates"))
  }

  /** DPO pair assembly — the RLHF last mile: per context the
    * [[bestOfN]] chosen candidate and its runner-up become the
    * (chosen, rejected) training pair, each rendered with the SFT chat
    * template ([[SftAssembly.contentExpr]] — identical payload
    * rendering to the SFT surfaces) plus the loss-mask span that
    * covers exactly the assistant content.
    *
    * Deterministic contract (the [[bestOfN]] rules): scores are exact
    * cents (`floor(value·100)`), ties break to the SMALLER event_id;
    * contexts with fewer than two candidates have no pair and drop.
    * Both texts share the prompt
    * `<|system|>conversation <id>\n<|user|>best_of n=<n>\n`; each
    * response block is `<|assistant|><content>\n`, so
    * `text.substring(loss_start, *_loss_end)` is precisely the
    * supervised characters — the [[SftAssembly]] span convention.
    *
    * Distribution shape: candidate content renders MAP-SIDE before
    * the fold, and the ONE exchange on the context key carries the
    * top-2 selection AND both payloads (no join back on event ids);
    * everything downstream is per-row string assembly. Candidate
    * lists are context-sized, never corpus-sized. */
  def dpoPairs(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    val cand = struct(cents.as("cents"), (col("event_id") * -1).as("nid"),
      SftAssembly.contentExpr.as("content"))
    val top2 = events
      .select(col("user_id"), cand.as("cand"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_candidates"),
        slice(sort_array(collect_list(col("cand")), asc = false), 1, 2)
          .as("top2"))
      .where(col("n_candidates") >= 2)
    val ch = element_at(col("top2"), 1)
    val rj = element_at(col("top2"), 2)
    val prompt = concat(lit("<|system|>conversation "),
      col("user_id").cast("string"), lit("\n<|user|>best_of n="),
      col("n_candidates").cast("string"), lit("\n"))
    val lossStart = (length(prompt) + lit(13)).cast("long") // <|assistant|>
    top2.select(
      col("user_id").as("conv_id"),
      (ch.getField("nid") * -1).as("chosen_event_id"),
      (rj.getField("nid") * -1).as("rejected_event_id"),
      ch.getField("cents").as("chosen_cents"),
      rj.getField("cents").as("rejected_cents"),
      (ch.getField("cents") - rj.getField("cents")).as("margin_cents"),
      col("n_candidates"),
      concat(prompt, lit("<|assistant|>"), ch.getField("content"),
        lit("\n")).as("text_chosen"),
      concat(prompt, lit("<|assistant|>"), rj.getField("content"),
        lit("\n")).as("text_rejected"),
      lossStart.as("loss_start"),
      (lossStart + length(ch.getField("content"))).cast("long")
        .as("chosen_loss_end"),
      (lossStart + length(rj.getField("content"))).cast("long")
        .as("rejected_loss_end"))
  }

  /** [[dpoPairs]] composed with the calibrated quality gate — the
    * reward-gap + quality-gate last mile before pairs enter training:
    * every assembled pair carries a quality proxy on its CHOSEN text
    * (rendered length — any integral score slots in), the proxy is
    * isotonic-calibrated against the reward-gap label
    * (`margin_cents >= marginThrCents`), and the pair is kept iff its
    * calibrated keep-probability clears `minPpb`. Filtering on the
    * CALIBRATED probability rather than the raw proxy is the point:
    * the gate inherits [[Calibration]]'s monotone, distribution-free
    * score→P(label) map instead of an arbitrary length threshold.
    *
    * Distribution shape: the fit side is ONE map-side-combinable
    * groupBy of the pair relation to ≤ 2·clamp bin counts (+ the
    * value-range-sized PAV); the apply side is the shared
    * [[Calibration.binExpr]] and ONE broadcast join of the fitted map
    * back onto the pairs — the pair relation is never self-joined.
    *
    * Output: every [[dpoPairs]] column plus
    * `(gate_score, bin, iso_ppb, kept)`. */
  def dpoGatedPairs(events: DataFrame, marginThrCents: Long,
      minPpb: Long, binWidth: Long = 16L,
      clamp: Long = 64L): DataFrame = {
    val pairs = dpoPairs(events)
      .withColumn("gate_score", length(col("text_chosen")).cast("long"))
    val fit = Calibration.isotonicBins(
      pairs.select(col("gate_score").as("s"),
        (col("margin_cents") >= marginThrCents).cast("long").as("p")),
      "s", "p", binWidth, clamp)
    val out = pairs
      .withColumn("bin",
        expr(Calibration.binExpr("gate_score", binWidth, clamp)))
      .join(broadcast(fit.select(col("bin"), col("iso_ppb"))),
        Seq("bin"))
    out.select((pairs.columns.map(col) ++ Seq(col("bin"),
      col("iso_ppb"), (col("iso_ppb") >= minPpb).as("kept"))): _*)
  }

  /** Krippendorff's alpha (nominal, two categories) — the agreement
    * stat that, unlike [[fleissKappa]], tolerates MISSING ratings:
    * every unit is rated by however many judges actually covered it,
    * and units with fewer than two ratings simply drop out as
    * unpairable. That is the realistic eval-panel shape — judges
    * abstain, coverage is partial — and exactly the case Fleiss'
    * design (fixed m raters per item) cannot represent.
    *
    * Derived panel over the `events` stream: judge A (`value >= athr`)
    * rates every event; judge B (`props.k >= bthr`) abstains on
    * `view` events (a judge scoped to interaction events); judge C
    * (`length(props) >= cthr`) abstains on every 7th event id (a
    * judge with coverage gaps). So m_u ∈ {1,2,3} and the m_u = 1
    * units are dropped, per Krippendorff (2004) §11.
    *
    * Exact-integer publication. Per pairable unit u with m_u ratings
    * and p_u positive: within-unit disagreement pairs
    * `d_u = 2·p_u·(m_u − p_u)`; the coincidence-matrix weight is
    * `d_u/(m_u − 1)`, and with a panel of at most 3 judges
    * `(m_u − 1) ∈ {1, 2}` divides 2, so
    * `s2 = Σ_u d_u · (2/(m_u − 1))` is EXACT (the lcm(1,2) clearing;
    * a larger panel would clear by lcm(1..J−1) the same way). With
    * n = Σ m_u total pairable ratings and n_pos = Σ p_u:
    * `D_e`-side integer `de = n² − n_pos² − (n − n_pos)²`, and
    * `alpha = 1 − (n−1)·s2 / (2·de)` clears to
    * `alpha_num = 2·de − (n−1)·s2`, `alpha_den = 2·de`.
    * One signed division left to the consumer (the [[fleissKappa]]
    * rule). Exactness bound: n² must fit a BIGINT, i.e. the rated
    * panel slice ≤ ~3e9 ratings — eval panels are sampled slices, not
    * the corpus, and the same bound already governs the kappa family.
    *
    * Distribution shape: one groupBy on the unit id (a single hash
    * exchange, map-side combinable), then a global fold to six
    * integers — corpus-size-independent output. */
  def krippendorffAlpha(events: DataFrame, athr: Double = 35.0,
      bthr: Long = 50L, cthr: Long = 9L): DataFrame = {
    val ja = (col("value") >= lit(athr)).cast("long")
    val jb = when(col("event_type") === lit("view"), lit(null).cast("long"))
      .otherwise((get_json_object(col("props"), "$.k").cast("long") >=
        lit(bthr)).cast("long"))
    val jc = when(col("event_id") % lit(7L) === lit(0L),
        lit(null).cast("long"))
      .otherwise((length(col("props")) >= lit(cthr)).cast("long"))
    val perUnit = events.select(
        (lit(1L) + jb.isNotNull.cast("long") + jc.isNotNull.cast("long"))
          .as("m_u"),
        (ja + coalesce(jb, lit(0L)) + coalesce(jc, lit(0L))).as("p_u"))
      .where(col("m_u") >= lit(2L))
    perUnit
      .agg(
        count(lit(1)).cast("long").as("n_units"),
        sum(col("m_u")).cast("long").as("n"),
        sum(col("p_u")).cast("long").as("n_pos"),
        sum(lit(2L) * col("p_u") * (col("m_u") - col("p_u")) *
          when(col("m_u") === lit(2L), lit(2L)).otherwise(lit(1L)))
          .cast("long").as("s2"))
      .select(col("n_units"), col("n"), col("n_pos"), col("s2"),
        (lit(2L) * (col("n") * col("n") - col("n_pos") * col("n_pos") -
          (col("n") - col("n_pos")) * (col("n") - col("n_pos"))) -
          (col("n") - lit(1L)) * col("s2")).as("alpha_num"),
        (lit(2L) * (col("n") * col("n") - col("n_pos") * col("n_pos") -
          (col("n") - col("n_pos")) * (col("n") - col("n_pos"))))
          .as("alpha_den"))
  }

  /** Cohen's kappa between two judges over the same trials: judge A =
    * `value >= athr`, judge B = `props.k >= bthr` (the model-judge vs
    * heuristic-judge agreement check every eval pipeline runs).
    * Published as exact integers — the agreement table plus kappa's
    * numerator `agree·n − a1·b1 − a0·b0` and denominator `n² − a1·b1
    * − a0·b0` (kappa can be negative, and floored division of signed
    * integers differs between engines, so the ratio itself is the
    * consumer's one division). */
  def judgeAgreement(events: DataFrame, athr: Double = 35.0,
      bthr: Long = 50L): DataFrame = {
    events
      .select(
        (col("value") >= lit(athr)).cast("long").as("ja"),
        (get_json_object(col("props"), "$.k").cast("long") >= lit(bthr))
          .cast("long").as("jb"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("ja")).cast("long").as("a1"),
        sum(col("jb")).cast("long").as("b1"),
        sum((col("ja") === col("jb")).cast("long")).cast("long").as("agree"))
      .select(col("n"), col("a1"), col("b1"), col("agree"),
        (col("agree") * col("n") - col("a1") * col("b1") -
          (col("n") - col("a1")) * (col("n") - col("b1"))).as("kappa_num"),
        (col("n") * col("n") - col("a1") * col("b1") -
          (col("n") - col("a1")) * (col("n") - col("b1"))).as("kappa_den"))
  }
}
