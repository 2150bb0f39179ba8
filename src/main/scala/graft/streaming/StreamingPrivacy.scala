package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-anonymity — the hold-until-k release gate, the
  * incremental twin of [[graft.operators.Privacy.kAnonymize]]: a row
  * may only be released once its quasi-identifier combination has at
  * least k members, so early rows of a rare combination BUFFER in
  * state and flush together the moment the k-th arrives; once a
  * combination is open, later rows pass straight through. Over any
  * finite stream the released set equals the batch operator's
  * `kept = true` rows on everything seen (spec-pinned), with the
  * streaming-only property that release happens as early as
  * legality allows.
  *
  * State per combination: a released flag plus at most k−1 held rows
  * — O(k · |combinations|) total, bounded by the quasi space (which,
  * unlike user ids, is a bounded product of attribute domains). For
  * UNBOUNDED quasi spaces (user-id-shaped keys), [[releaseGateTtl]]
  * is the event-time-TTL twin: a combination idle past the TTL is
  * evicted wholesale. Eviction is fail-safe in the privacy direction
  * only — an evicted combination re-buffers from zero, so rows can
  * only ever be WITHHELD relative to the batch gate (held rows of a
  * never-opened combination are discarded, exactly as the batch gate
  * suppresses a forever-rare combination; a re-buffering combination
  * releases again once k NEW rows arrive), never leaked.
  *
  * The quasi key arrives pre-concatenated (`quasi`) — the caller owns
  * column-to-key construction, mirroring the batch operator's
  * `quasi: Seq[String]` surface.
  */
object StreamingPrivacy {

  final case class KRecord(id: Long, quasi: String)
  final case class GateState(released: Boolean, held: List[KRecord])
  final case class KEvent(id: Long, ts: java.sql.Timestamp, quasi: String)
  final case class GateStateT(released: Boolean, held: List[KEvent])

  def releaseGate(records: Dataset[KRecord], k: Int): Dataset[KRecord] = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = records.sparkSession
    import spark.implicits._
    records.groupByKey(_.quasi)
      .flatMapGroupsWithState[GateState, KRecord](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[KRecord], state: GroupState[GateState]) =>
          val st = state.getOption.getOrElse(GateState(false, Nil))
          val batch = rows.toSeq.sortBy(_.id) // deterministic flush order
          if (st.released) {
            state.update(st)
            batch.iterator
          } else {
            val held = st.held ++ batch
            if (held.size >= k) {
              state.update(GateState(released = true, Nil))
              held.iterator
            } else {
              state.update(GateState(released = false, held))
              Iterator.empty
            }
          }
      }
  }

  /** [[releaseGate]] with BOUNDED state under an unbounded quasi space
    * (event-time TTL, watermark-clamped anchor — the
    * [[StreamingPreference.trialsTtl]] discipline). A combination idle
    * past `ttl` is evicted: held rows of a never-opened combination
    * are DISCARDED (they were never legal to release — the batch
    * gate's suppression of a forever-rare combination, decided
    * incrementally), and an evicted combination re-buffers from zero
    * on resurrection. Both directions under-release relative to the
    * batch gate, never leak. Requires a watermark on the input's
    * `ts`. */
  def releaseGateTtl(records: Dataset[KEvent], k: Int,
      ttl: String = "30 minutes"): Dataset[KEvent] = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = records.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    require(iv.months == 0,
      s"ttl '$ttl': calendar months have no fixed millisecond length")
    val ttlMillis = iv.days * 86400000L + iv.microseconds / 1000L
    require(ttlMillis > 0, s"ttl '$ttl' must be a positive duration")
    records.groupByKey(_.quasi)
      .flatMapGroupsWithState[GateStateT, KEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[KEvent], state: GroupState[GateStateT]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(GateStateT(false, Nil))
            // deterministic flush order at the batch window's precision
            val batch = rows.toSeq
              .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.id))
            val out: Seq[KEvent] =
              if (st.released) { state.update(st); batch }
              else {
                val held = st.held ++ batch
                if (held.size >= k) {
                  state.update(GateStateT(released = true, Nil)); held
                } else {
                  state.update(GateStateT(released = false, held)); Nil
                }
              }
            val lastSeen = batch.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastSeen, state.getCurrentWatermarkMs()) + ttlMillis)
            out.iterator
          }
      }
  }
}
