package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming preference-pair mining — the incremental half of
  * [[graft.operators.Preference]]: head-to-head trials minted from a
  * LIVE event stream. The batch operator pairs consecutive same-user
  * events with one lag() window; across micro-batches that consecutive
  * pair can STRADDLE a batch boundary (user's last event of batch n,
  * first of batch n+1), so the streaming version keeps exactly one
  * stored event per user — the most recent — and mints the boundary
  * trial on arrival. Fed in per-user arrival order (session/crawl
  * logs — the batch window's (ts, event_id) order), the streamed trial
  * multiset equals the batch [[graft.operators.Preference.wins]] on
  * everything seen; the Bradley–Terry fit then reruns on the folded
  * |types|²-sized matrix via
  * [[graft.operators.Preference.fitWins]] — the stream maintains
  * COUNTS (cheap, mergeable), never model state.
  *
  * State is ONE event per user. For ephemeral-key deployments,
  * [[trialsTtl]] is the event-time-TTL twin (same anchor discipline as
  * [[TrafficMonitor.edgeTriggerTtl]]): a user idle past the TTL is
  * evicted and their next event mints no boundary trial — bounded
  * state traded against one lost trial per resurrection.
  */
object StreamingPreference {

  final case class PrefEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class Trial(winner: String, loser: String)

  private def mint(rows: Iterator[PrefEvent],
      stored: Option[PrefEvent]): (Seq[Trial], Option[PrefEvent]) = {
    // batch-window order within the micro-batch: (ts, event_id). The ts
    // key must carry the FULL timestamp precision (the batch window
    // orders by the microsecond-precision column): getTime alone is
    // millisecond-truncated, so (getTime, getNanos) — nanos carries the
    // whole fractional second — reproduces Timestamp.compareTo exactly.
    val sorted =
      rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    var prev = stored
    val out = Seq.newBuilder[Trial]
    for (e <- sorted) {
      prev match {
        case Some(p) if p.event_type != e.event_type && p.value != e.value =>
          out += (if (e.value > p.value) Trial(e.event_type, p.event_type)
                  else Trial(p.event_type, e.event_type))
        case _ => ()
      }
      prev = Some(e)
    }
    (out.result(), prev)
  }

  /** Trials from a (possibly streaming) event dataset with cross-batch
    * per-user state. Aggregate downstream with a plain
    * `groupBy(winner, loser).count()` fold. */
  def trials(events: Dataset[PrefEvent]): Dataset[Trial] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[PrefEvent], Trial](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[PrefEvent],
            state: GroupState[Option[PrefEvent]]) =>
          val (out, last) = mint(rows, state.getOption.flatten)
          state.update(last)
          out.iterator
      }
  }

  /** [[trials]] with BOUNDED state under user churn (event-time TTL,
    * watermark-clamped anchor — the [[TrafficMonitor.edgeTriggerTtl]]
    * discipline). Requires a watermark on the input's `ts`. */
  def trialsTtl(events: Dataset[PrefEvent],
      ttl: String = "30 minutes"): Dataset[Trial] = {
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    require(iv.months == 0,
      s"ttl '$ttl': calendar months have no fixed millisecond length")
    val ttlMillis = iv.days * 86400000L + iv.microseconds / 1000L
    require(ttlMillis > 0, s"ttl '$ttl' must be a positive duration")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[PrefEvent], Trial](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[PrefEvent],
            state: GroupState[Option[PrefEvent]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val (out, last) = mint(batch.iterator, state.getOption.flatten)
            state.update(last)
            val lastSeen = batch.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastSeen, state.getCurrentWatermarkMs()) + ttlMillis)
            out.iterator
          }
      }
  }

  // ---- streaming best-of-n: the incremental champion log ----

  final case class Candidate(event_id: Long, user_id: Long, value: Double)

  /** Per-context top-2 state: the champion and runner-up under the
    * batch ordering (cents desc, event_id asc), plus the cumulative
    * candidate count. `has2 = false` while only one candidate exists. */
  final case class Top2(n: Long, c1: Long, i1: Long,
      c2: Long, i2: Long, has2: Boolean)

  final case class ChampionRow(user_id: Long, chosen_event_id: Long,
      chosen_cents: Long, runner_up_cents: Option[Long],
      margin_cents: Option[Long], n_candidates: Long)

  // ---- streaming DPO pairs: the incremental pair log ----

  /** A candidate with its pre-rendered chat content (rendered MAP-SIDE
    * by [[dpoPairsStream]] through the batch operator's
    * `SftAssembly.contentExpr`, so streamed pair texts are
    * byte-identical to [[graft.operators.Preference.dpoPairs]]). */
  final case class DpoCand(event_id: Long, user_id: Long, cents: Long,
      content: String)

  /** Top-2 state WITH payloads: champion and runner-up content ride
    * along (bounded — one rendered line each), everything else is the
    * [[Top2]] discipline. */
  final case class PairState(n: Long, c1: Long, i1: Long, t1: String,
      c2: Long, i2: Long, t2: String, has2: Boolean)

  final case class DpoPairRow(conv_id: Long, chosen_event_id: Long,
      rejected_event_id: Option[Long], chosen_cents: Long,
      rejected_cents: Option[Long], margin_cents: Option[Long],
      n_candidates: Long, text_chosen: Option[String],
      text_rejected: Option[String], loss_start: Long,
      chosen_loss_end: Option[Long], rejected_loss_end: Option[Long])

  /** Streaming [[graft.operators.Preference.dpoPairs]]: candidates
    * arrive continuously and each micro-batch with arrivals for a
    * context emits that context's CURRENT (chosen, rejected) pair,
    * fully rendered with prompt, response blocks and loss spans — a
    * pair LOG whose latest row per context (max `n_candidates`, which
    * strictly increases on arrivals) equals the batch operator over
    * everything seen, for ANY arrival order (exact top-2 maintenance:
    * a candidate outside the top-2 can never re-enter it). Rows before
    * a context's second candidate carry a null rejected side and are
    * dropped by the fold, matching the batch single-candidate drop.
    * State per context: the top-2 (ids, cents, rendered contents) +
    * one count. Offsets are CODE-POINT counts, the batch `length()`
    * semantics. */
  def dpoPairsStream(events: org.apache.spark.sql.DataFrame)
      : Dataset[DpoPairRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cands = events.select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      floor(col("value") * 100).cast("long").as("cents"),
      graft.operators.SftAssembly.contentExpr.as("content"))
      .as[DpoCand]
    def cps(s: String): Long = s.codePointCount(0, s.length).toLong
    def beats(c: Long, i: Long, c2: Long, i2: Long): Boolean =
      c > c2 || (c == c2 && i < i2)
    cands.groupByKey(_.user_id)
      .flatMapGroupsWithState[PairState, DpoPairRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[DpoCand], state: GroupState[PairState]) =>
          var st = state.getOption.orNull
          var any = false
          rows.toSeq.sortBy(r => (-r.cents, r.event_id)).foreach { r =>
            any = true
            st =
              if (st == null)
                PairState(1L, r.cents, r.event_id, r.content,
                  0L, 0L, "", has2 = false)
              else if (beats(r.cents, r.event_id, st.c1, st.i1))
                PairState(st.n + 1, r.cents, r.event_id, r.content,
                  st.c1, st.i1, st.t1, has2 = true)
              else if (!st.has2 || beats(r.cents, r.event_id, st.c2, st.i2))
                PairState(st.n + 1, st.c1, st.i1, st.t1,
                  r.cents, r.event_id, r.content, has2 = true)
              else st.copy(n = st.n + 1)
          }
          if (!any) Iterator.empty
          else {
            state.update(st)
            val prompt = s"<|system|>conversation $uid\n" +
              s"<|user|>best_of n=${st.n}\n"
            val lossStart = cps(prompt) + 13L // <|assistant|>
            // a null rendered content (no props.k) nulls the text and
            // its end offset — exactly the batch concat's null
            // propagation
            def text(t: String): Option[String] =
              Option(t).map(prompt + "<|assistant|>" + _ + "\n")
            def end(t: String): Option[Long] =
              Option(t).map(lossStart + cps(_))
            Iterator.single(DpoPairRow(uid, st.i1,
              if (st.has2) Some(st.i2) else None,
              st.c1,
              if (st.has2) Some(st.c2) else None,
              if (st.has2) Some(st.c1 - st.c2) else None,
              st.n,
              text(st.t1),
              if (st.has2) text(st.t2) else None,
              lossStart,
              end(st.t1),
              if (st.has2) end(st.t2) else None))
          }
      }
  }

  /** Streaming [[graft.operators.Preference.bestOfN]]: candidates
    * arrive continuously and each micro-batch with arrivals for a
    * context emits that context's CURRENT champion row — a champion
    * LOG whose latest row per context always equals the batch operator
    * over everything seen (StreamingPreferenceSpec pins it for
    * ascending and reversed arrival). State is the top-2 pair + one
    * count per context — the smallest state that can keep the margin
    * exact, and 32 bytes however many candidates stream through. */
  def bestOfNStream(cands: Dataset[Candidate]): Dataset[ChampionRow] = {
    val spark = cands.sparkSession
    import spark.implicits._
    // (cents, id) ordering: higher cents first, then smaller id — the
    // batch operator's sort_array(desc) on struct(cents, -id)
    def beats(c: Long, i: Long, c2: Long, i2: Long): Boolean =
      c > c2 || (c == c2 && i < i2)
    cands.groupByKey(_.user_id)
      .flatMapGroupsWithState[Top2, ChampionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Candidate], state: GroupState[Top2]) =>
          var st = state.getOption.orNull
          var any = false
          rows.toSeq
            .sortBy(r => (-math.floor(r.value * 100).toLong, r.event_id))
            .foreach { r =>
              any = true
              val c = math.floor(r.value * 100).toLong
              val i = r.event_id
              st =
                if (st == null) Top2(1L, c, i, 0L, 0L, has2 = false)
                else if (beats(c, i, st.c1, st.i1))
                  Top2(st.n + 1, c, i, st.c1, st.i1, has2 = true)
                else if (!st.has2 || beats(c, i, st.c2, st.i2))
                  Top2(st.n + 1, st.c1, st.i1, c, i, has2 = true)
                else st.copy(n = st.n + 1)
            }
          if (!any) Iterator.empty
          else {
            state.update(st)
            Iterator.single(ChampionRow(uid, st.i1, st.c1,
              if (st.has2) Some(st.c2) else None,
              if (st.has2) Some(st.c1 - st.c2) else None, st.n))
          }
      }
  }
}
