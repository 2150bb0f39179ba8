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
  * unlike user ids, is a bounded product of attribute domains; for
  * unbounded quasi spaces compose the TTL discipline of
  * [[StreamingPreference.trialsTtl]] — an evicted never-opened
  * combination re-buffers from zero, which only ever DELAYS release,
  * never leaks).
  *
  * The quasi key arrives pre-concatenated (`quasi`) — the caller owns
  * column-to-key construction, mirroring the batch operator's
  * `quasi: Seq[String]` surface.
  */
object StreamingPrivacy {

  final case class KRecord(id: Long, quasi: String)
  final case class GateState(released: Boolean, held: List[KRecord])

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
}
