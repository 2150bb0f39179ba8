package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Preference / evaluation-data surface: head-to-head comparisons
  * mined from the events stream, win-rate matrices, Bradley–Terry
  * strength fitting (the full MM trajectory), and inter-judge
  * agreement — the RLHF-side curation verbs. Implementations in
  * [[graft.operators.Preference]]; every query here hash-matches a
  * DuckDB oracle cell for cell (exact-integer contract throughout).
  */
object Preference extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Shared oracle prefix: consecutive same-user event pairs → directed
    * win counts `d(winner, loser, cnt)` — mirrors
    * [[graft.operators.Preference.wins]] construct for construct. */
  private val winsCtes: String =
    """pr AS (
      |  SELECT user_id, event_type, value,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type,
      |    lag(value) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_value
      |  FROM events),
      |d AS MATERIALIZED (
      |  SELECT CASE WHEN value > prev_value THEN event_type
      |              ELSE prev_type END AS winner,
      |         CASE WHEN value > prev_value THEN prev_type
      |              ELSE event_type END AS loser,
      |         count(*)::BIGINT AS cnt
      |  FROM pr
      |  WHERE prev_type IS NOT NULL AND prev_type <> event_type
      |    AND prev_value <> value
      |  GROUP BY 1, 2)""".stripMargin

  /** Generated N-round Bradley–Terry MM oracle: the ppm-normalized
    * comparison matrix, then one `(d_r, praw_r, s_r, p_r)` CTE block
    * per round — every arithmetic step (per-term floored divisions,
    * the 1e14 strength cap, the Σpraw/k renormalization) mirrors
    * [[graft.operators.Preference.bradleyTerry]] exactly. `p_r` is
    * MATERIALIZED (read by round r+1 twice and by the trajectory
    * union). */
  private[queries] def bradleyTerryOracle(rounds: Int): String = {
    val sb = new StringBuilder("WITH " + winsCtes)
    sb.append("""
      |, c AS (SELECT sum(cnt)::BIGINT AS c FROM d),
      |m AS MATERIALIZED (
      |  SELECT i, j, (sum(cnt)::BIGINT * 1000000 // greatest(c.c, 1))::BIGINT AS mij
      |  FROM (SELECT winner AS i, loser AS j, cnt FROM d
      |        UNION ALL
      |        SELECT loser AS i, winner AS j, cnt FROM d) u
      |  CROSS JOIN c GROUP BY i, j, c.c),
      |w AS (SELECT winner AS i,
      |        (sum(cnt)::BIGINT * 1000000 // greatest(c.c, 1))::BIGINT AS wppm
      |      FROM d CROSS JOIN c GROUP BY 1, c.c),
      |ty AS MATERIALIZED (SELECT DISTINCT i FROM m),
      |tk AS (SELECT count(*)::BIGINT AS k FROM ty),
      |p0 AS MATERIALIZED (SELECT i, 1000000::BIGINT AS p FROM ty)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s"""
        |, d$r AS (
        |  SELECT m.i, sum(m.mij * 1000000 // greatest(pi.p + pj.p, 1))::BIGINT AS di
        |  FROM m
        |  JOIN p${r - 1} pi ON pi.i = m.i
        |  JOIN p${r - 1} pj ON pj.i = m.j
        |  GROUP BY 1),
        |praw$r AS MATERIALIZED (
        |  SELECT w.i, least(w.wppm * 1000000000000 //
        |    greatest(coalesce(dd.di, 0), 1), 100000000000000)::BIGINT AS praw
        |  FROM w LEFT JOIN d$r dd ON dd.i = w.i),
        |s$r AS (SELECT sum(praw)::BIGINT AS s FROM praw$r),
        |p$r AS MATERIALIZED (
        |  SELECT ty.i, (coalesce(pr.praw, 0) //
        |    greatest(s$r.s // (tk.k * 1000000), 1))::BIGINT AS p
        |  FROM ty LEFT JOIN praw$r pr ON pr.i = ty.i
        |  CROSS JOIN s$r CROSS JOIN tk)""".stripMargin)
    }
    sb.append("\n" + (1 to rounds).map(r =>
      s"SELECT $r::BIGINT AS round, i AS event_type, p AS strength_micro " +
        s"FROM p$r").mkString("\nUNION ALL\n"))
    sb.toString
  }

  /** The DPO pair CTE chain ending in `dp` (every published pair
    * column) — shared by q_dpo_pairs, q_dpo_pairs_stream, and the
    * gated composition. */
  private val dpoCtes: String =
    """c AS (
             |  SELECT user_id, event_id,
             |    CAST(floor(value * 100) AS BIGINT) AS cents,
             |    event_type || ' k=' || json_extract_string(props, '$.k')
             |      || ' v=' || CAST(floor(value * 100) AS BIGINT)
             |      AS content,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(floor(value * 100) AS BIGINT) DESC,
             |               event_id ASC) AS rn,
             |    count(*) OVER (PARTITION BY user_id)::BIGINT
             |      AS n_candidates
             |  FROM events),
             |p AS (
             |  SELECT a.user_id, a.n_candidates,
             |    a.event_id AS chosen_event_id,
             |    b.event_id AS rejected_event_id,
             |    a.cents AS chosen_cents, b.cents AS rejected_cents,
             |    a.content AS c_content, b.content AS r_content,
             |    '<|system|>conversation ' || a.user_id || chr(10) ||
             |      '<|user|>best_of n=' || a.n_candidates || chr(10)
             |      AS prompt
             |  FROM c a JOIN c b
             |    ON b.user_id = a.user_id AND b.rn = 2
             |  WHERE a.rn = 1),
             |dp AS (SELECT user_id AS conv_id, chosen_event_id,
             |  rejected_event_id, chosen_cents, rejected_cents,
             |  (chosen_cents - rejected_cents)::BIGINT AS margin_cents,
             |  n_candidates,
             |  prompt || '<|assistant|>' || c_content || chr(10)
             |    AS text_chosen,
             |  prompt || '<|assistant|>' || r_content || chr(10)
             |    AS text_rejected,
             |  (length(prompt) + 13)::BIGINT AS loss_start,
             |  (length(prompt) + 13 + length(c_content))::BIGINT
             |    AS chosen_loss_end,
             |  (length(prompt) + 13 + length(r_content))::BIGINT
             |    AS rejected_loss_end
             |FROM p)""".stripMargin

  /** Shared by q_dpo_pairs and q_dpo_pairs_stream (the pair log's
    * latest row per context equals the batch pair, so the oracle is
    * identical). */
  private val dpoOracle: String = s"WITH $dpoCtes\nSELECT * FROM dp"

  override val queries: Seq[GraftQuery] = Seq(

    // ---- head-to-head win-rate matrix: one row per unordered type
    //      pair, directed win counts + a's share in ppm (floored) ----
    GraftQuery("q_winrate",
      (s, dir) => graft.operators.Preference.winRate(t(s, dir, "events")),
      Some(s"""WITH $winsCtes,
             |g AS (SELECT
             |    CASE WHEN winner < loser THEN winner ELSE loser END AS type_a,
             |    CASE WHEN winner < loser THEN loser ELSE winner END AS type_b,
             |    CASE WHEN winner < loser THEN cnt ELSE 0 END AS wa,
             |    CASE WHEN winner < loser THEN 0 ELSE cnt END AS wb
             |  FROM d),
             |a AS (SELECT type_a, type_b, sum(wa)::BIGINT AS wins_a,
             |        sum(wb)::BIGINT AS wins_b
             |      FROM g GROUP BY 1, 2)
             |SELECT type_a, type_b, wins_a, wins_b,
             |  (wins_a + wins_b)::BIGINT AS n,
             |  (wins_a * 1000000 // (wins_a + wins_b))::BIGINT AS winrate_a_ppm
             |FROM a""".stripMargin)),

    // ---- Bradley–Terry MM fit, 5 rounds, full trajectory ----
    GraftQuery("q_bradley_terry",
      (s, dir) => graft.operators.Preference.bradleyTerry(
        t(s, dir, "events"), rounds = 5),
      Some(bradleyTerryOracle(5))),

    // ---- Fleiss' kappa across THREE derived judges (two categories):
    //      multi-rater agreement with both kappa sides cleared to the
    //      common denominator N^2(m-1), published as exact integers ----
    GraftQuery("q_fleiss_kappa",
      (s, dir) => graft.operators.Preference.fleissKappa(
        t(s, dir, "events"), athr = 35.0, bthr = 50L, cthr = 9L),
      Some("""WITH v AS (
             |  SELECT (value >= 35.0)::BIGINT
             |    + (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50)
             |      ::BIGINT
             |    + (length(props) >= 9)::BIGINT AS n_pos
             |  FROM events),
             |a AS (SELECT count(*)::BIGINT AS n,
             |        sum(n_pos)::BIGINT AS tot_pos,
             |        sum(n_pos * n_pos
             |            + (3 - n_pos) * (3 - n_pos))::BIGINT AS sum_sq
             |      FROM v)
             |SELECT n, 3::BIGINT AS m, tot_pos, sum_sq,
             |  (n * 3 * (sum_sq - n * 3)
             |   - 2 * (tot_pos * tot_pos
             |          + (n * 3 - tot_pos) * (n * 3 - tot_pos)))::BIGINT
             |    AS kappa_num,
             |  (n * n * 9 * 2
             |   - 2 * (tot_pos * tot_pos
             |          + (n * 3 - tot_pos) * (n * 3 - tot_pos)))::BIGINT
             |    AS kappa_den
             |FROM a""".stripMargin)),

    // ---- best-of-n selection: per-context top candidate + margin over
    //      the runner-up (exact cents, smaller-id tiebreak, NULL margin
    //      on single-candidate contexts) ----
    GraftQuery("q_best_of_n",
      (s, dir) => graft.operators.Preference.bestOfN(t(s, dir, "events")),
      Some("""WITH c AS (
             |  SELECT user_id, event_id,
             |    CAST(floor(value * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(floor(value * 100) AS BIGINT) DESC,
             |               event_id ASC) AS rn,
             |    count(*) OVER (PARTITION BY user_id)::BIGINT
             |      AS n_candidates
             |  FROM events)
             |SELECT a.user_id, a.event_id AS chosen_event_id,
             |  a.cents AS chosen_cents,
             |  b.cents AS runner_up_cents,
             |  (a.cents - b.cents)::BIGINT AS margin_cents,
             |  a.n_candidates
             |FROM c a LEFT JOIN c b
             |  ON b.user_id = a.user_id AND b.rn = 2
             |WHERE a.rn = 1""".stripMargin)),

    // ---- SFT chat-template assembly: per-turn loss-mask spans. The
    //      oracle recomputes the template, the per-conversation prefix
    //      sum and the content offsets independently; floor() is
    //      explicit on both sides (BIGINT casts round in DuckDB and
    //      truncate in Spark) ----
    GraftQuery("q_sft_spans",
      (s, dir) => graft.operators.SftAssembly.renderTurns(
        t(s, dir, "events")),
      Some("""WITH tt AS (
             |  SELECT user_id AS conv_id, event_type, value, props,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id)::BIGINT AS turn_idx
             |  FROM events),
             |r AS (
             |  SELECT conv_id, turn_idx,
             |    CASE WHEN turn_idx % 2 = 1 THEN 'user'
             |         ELSE 'assistant' END AS role,
             |    event_type || ' k=' || json_extract_string(props, '$.k')
             |      || ' v=' || CAST(floor(value * 100) AS BIGINT) AS content
             |  FROM tt),
             |x AS (
             |  SELECT conv_id, turn_idx, role, content,
             |    '<|' || role || '|>' || content || chr(10) AS rendered
             |  FROM r),
             |p AS (
             |  SELECT conv_id, turn_idx, role, content,
             |    length('<|system|>conversation ' || conv_id || chr(10))
             |    + coalesce(sum(length(rendered)) OVER (
             |        PARTITION BY conv_id ORDER BY turn_idx
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + length(role) + 4 AS start_off
             |  FROM x)
             |SELECT conv_id, turn_idx, role, content,
             |  start_off::BIGINT AS start_off,
             |  (start_off + length(content))::BIGINT AS end_off
             |FROM p""".stripMargin)),

    // ---- SFT assembled conversations: full chat-templated text +
    //      supervised-character totals, one row per conversation ----
    GraftQuery("q_sft_render",
      (s, dir) => graft.operators.SftAssembly.renderConversations(
        t(s, dir, "events")),
      Some("""WITH tt AS (
             |  SELECT user_id AS conv_id, event_type, value, props,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id)::BIGINT AS turn_idx
             |  FROM events),
             |r AS (
             |  SELECT conv_id, turn_idx,
             |    CASE WHEN turn_idx % 2 = 1 THEN 'user'
             |         ELSE 'assistant' END AS role,
             |    event_type || ' k=' || json_extract_string(props, '$.k')
             |      || ' v=' || CAST(floor(value * 100) AS BIGINT) AS content
             |  FROM tt),
             |x AS (
             |  SELECT conv_id, turn_idx, role, content,
             |    '<|' || role || '|>' || content || chr(10) AS rendered
             |  FROM r),
             |g AS (
             |  SELECT conv_id, count(*)::BIGINT AS n_turns,
             |    sum(CASE WHEN role = 'assistant' THEN length(content)
             |             ELSE 0 END)::BIGINT AS n_mask_chars,
             |    string_agg(rendered, '' ORDER BY turn_idx) AS body
             |  FROM x GROUP BY conv_id)
             |SELECT conv_id, n_turns, n_mask_chars,
             |  '<|system|>conversation ' || conv_id || chr(10) || body
             |    AS text
             |FROM g""".stripMargin)),

    // ---- DPO pair assembly: bestOfN's chosen + runner-up composed
    //      with the SFT chat template into (chosen, rejected) training
    //      pairs with loss spans — the RLHF last mile. One exchange on
    //      the context key (payloads ride the top-2 fold; no join back
    //      on event ids); exact-cents margins, min-id ties; contexts
    //      with one candidate drop ----
    GraftQuery("q_dpo_pairs",
      (s, dir) => graft.operators.Preference.dpoPairs(t(s, dir, "events")),
      Some(dpoOracle)),

    // ---- streamed DPO pairs: candidates over three micro-batches,
    //      each batch emits its contexts' CURRENT rendered pair; the
    //      latest row per context (max n_candidates) equals the batch
    //      operator for ANY arrival order (exact top-2 maintenance),
    //      so the fold shares q_dpo_pairs' oracle VERBATIM. The
    //      MemoryStream transport is the harness (driver staging is
    //      events-table-sized; production swaps in a real source) ----
    GraftQuery("q_dpo_pairs_stream",
      (s, dir) => {
        import s.implicits._
        implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
        import graft.streaming.StreamingPreference.DpoPairRow
        val ev = t(s, dir, "events")
          .select($"event_id", $"user_id", $"event_type", $"value",
            $"props")
          .collect().sortBy(_.getLong(0))
        // rows ride as a typed tuple stream re-assembled to a DataFrame
        val tin = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Long, String, Double, String)]
        val nm = "graft_dpo_pairs_sink"
        s.catalog.dropTempView(nm)
        val df = tin.toDS().toDF(
          "event_id", "user_id", "event_type", "value", "props")
        val q = graft.streaming.StreamingPreference.dpoPairsStream(df)
          .writeStream.format("memory").queryName(nm)
          .outputMode("append").start()
        try {
          val rows = ev.map(r => (r.getLong(0), r.getLong(1),
            r.getString(2), r.getDouble(3), r.getString(4))).toSeq
          val third = (rows.size + 2) / 3
          rows.grouped(math.max(third, 1)).foreach { b =>
            tin.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        s.table(nm).as[DpoPairRow]
          .groupByKey(_.conv_id)
          .mapGroups((_, rs) => rs.maxBy(_.n_candidates))
          .where($"rejected_event_id".isNotNull)
          .select($"conv_id", $"chosen_event_id", $"rejected_event_id",
            $"chosen_cents", $"rejected_cents", $"margin_cents",
            $"n_candidates", $"text_chosen", $"text_rejected",
            $"loss_start", $"chosen_loss_end", $"rejected_loss_end")
      },
      Some(dpoOracle)),

    // ---- DPO pairs × calibrated gate: the reward-gap + quality-gate
    //      last mile — each pair's chosen-text length is isotonic-
    //      calibrated against the margin>=100-cents label and the pair
    //      keeps iff its CALIBRATED keep-probability clears 0.5; fit is
    //      one bin-histogram groupBy + value-range PAV, apply is one
    //      broadcast join (no pair self-join) ----
    GraftQuery("q_dpo_gated",
      (s, dir) => graft.operators.Preference.dpoGatedPairs(
        t(s, dir, "events"), marginThrCents = 100L,
        minPpb = 500000000L, binWidth = 16L, clamp = 64L),
      // NOTE: concatenation, not one interpolated stripMargin — the
      // embedded CTE chain has continuation lines starting with '||'
      // that a second stripMargin would truncate to '|'
      Some(s"WITH $dpoCtes,\n" +
        """g AS (SELECT dp.*,
             |    length(text_chosen)::BIGINT AS gate_score,
             |    (margin_cents >= 100)::BIGINT AS posl
             |  FROM dp),
             |bn AS MATERIALIZED (
             |  SELECT greatest(least(
             |      (CASE WHEN gate_score < 0 THEN -1 ELSE 1 END)
             |        * (abs(gate_score) // 16), 63), -64)::BIGINT AS bin,
             |    count(*)::BIGINT AS tot,
             |    sum(posl)::BIGINT AS pos
             |  FROM g GROUP BY 1),
             |ord AS MATERIALIZED (
             |  SELECT bin, tot, pos,
             |    row_number() OVER (ORDER BY bin)::BIGINT AS i,
             |    (sum(tot) OVER (ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |      ::BIGINT AS ct,
             |    (sum(pos) OVER (ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |      ::BIGINT AS cp
             |  FROM bn),
             |pairs AS MATERIALIZED (
             |  SELECT j.i AS j, k.i AS k,
             |    ((k.cp - j.cp + j.pos) * 1000000000
             |     // (k.ct - j.ct + j.tot))::BIGINT AS a
             |  FROM ord j JOIN ord k ON j.i <= k.i),
             |sm AS MATERIALIZED (
             |  SELECT j, k, min(a) OVER (PARTITION BY j ORDER BY k DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
             |  FROM pairs),
             |iso AS (SELECT k, max(sm)::BIGINT AS iso_ppb FROM sm GROUP BY k),
             |fit AS (SELECT o.bin, iso.iso_ppb
             |        FROM ord o JOIN iso ON iso.k = o.i)
             |SELECT g.conv_id, g.chosen_event_id, g.rejected_event_id,
             |  g.chosen_cents, g.rejected_cents, g.margin_cents,
             |  g.n_candidates, g.text_chosen, g.text_rejected,
             |  g.loss_start, g.chosen_loss_end, g.rejected_loss_end,
             |  g.gate_score, f.bin, f.iso_ppb,
             |  (f.iso_ppb >= 500000000) AS kept
             |FROM g JOIN fit f
             |  ON f.bin = greatest(least(
             |      (CASE WHEN g.gate_score < 0 THEN -1 ELSE 1 END)
             |        * (abs(g.gate_score) // 16), 63), -64)""".stripMargin)),

    // ---- Krippendorff's alpha (nominal) with MISSING ratings: judge B
    //      abstains on view events, judge C on every 7th event id, so
    //      units carry 1-3 ratings and the single-rating ones drop as
    //      unpairable -- the varying-panel case Fleiss cannot express.
    //      The lcm(1,2) clearing keeps s2 exact; both alpha sides are
    //      published as BIGINTs (signed division left to the consumer).
    GraftQuery("q_krippendorff_alpha",
      (s, dir) => graft.operators.Preference.krippendorffAlpha(
        t(s, dir, "events"), athr = 35.0, bthr = 50L, cthr = 9L),
      Some("""WITH v AS (
             |  SELECT (value >= 35.0)::BIGINT AS ja,
             |    CASE WHEN event_type = 'view' THEN NULL
             |      ELSE (CAST(json_extract_string(props, '$.k') AS BIGINT)
             |            >= 50)::BIGINT END AS jb,
             |    CASE WHEN event_id % 7 = 0 THEN NULL
             |      ELSE (length(props) >= 9)::BIGINT END AS jc
             |  FROM events),
             |u AS (
             |  SELECT 1 + (jb IS NOT NULL)::BIGINT + (jc IS NOT NULL)::BIGINT
             |      AS m_u,
             |    ja + coalesce(jb, 0) + coalesce(jc, 0) AS p_u
             |  FROM v),
             |p AS (SELECT * FROM u WHERE m_u >= 2),
             |a AS (SELECT count(*)::BIGINT AS n_units,
             |        sum(m_u)::BIGINT AS n,
             |        sum(p_u)::BIGINT AS n_pos,
             |        sum(2 * p_u * (m_u - p_u)
             |            * CASE WHEN m_u = 2 THEN 2 ELSE 1 END)::BIGINT AS s2
             |      FROM p)
             |SELECT n_units, n, n_pos, s2,
             |  (2 * (n * n - n_pos * n_pos - (n - n_pos) * (n - n_pos))
             |   - (n - 1) * s2)::BIGINT AS alpha_num,
             |  (2 * (n * n - n_pos * n_pos
             |        - (n - n_pos) * (n - n_pos)))::BIGINT AS alpha_den
             |FROM a""".stripMargin)),

    // ---- Cohen's kappa between the value-judge and the props-judge,
    //      published as the exact agreement table + kappa's integer
    //      numerator/denominator (kappa can be negative; signed floor
    //      division differs between engines, so the one division is
    //      left to the consumer) ----
    GraftQuery("q_judge_agreement",
      (s, dir) => graft.operators.Preference.judgeAgreement(
        t(s, dir, "events"), athr = 35.0, bthr = 50L),
      Some("""WITH j AS (
             |  SELECT (value >= 35.0)::BIGINT AS ja,
             |    (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50)
             |      ::BIGINT AS jb
             |  FROM events),
             |a AS (SELECT count(*)::BIGINT AS n, sum(ja)::BIGINT AS a1,
             |        sum(jb)::BIGINT AS b1,
             |        sum((ja = jb)::BIGINT)::BIGINT AS agree
             |      FROM j)
             |SELECT n, a1, b1, agree,
             |  (agree * n - a1 * b1 - (n - a1) * (n - b1))::BIGINT AS kappa_num,
             |  (n * n - a1 * b1 - (n - a1) * (n - b1))::BIGINT AS kappa_den
             |FROM a""".stripMargin)))
}
