package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streamed TWAP — the incremental half of
  * [[graft.operators.Resample.twap]]: observations arrive continuously
  * and an interval's bucket contributions emit the moment the NEXT
  * observation closes it. State is ONE stored observation per key
  * (the [[StreamingPreference]] discipline), and the terminal
  * observation never emits — exactly the batch operator's
  * unbounded-interval exclusion, so over any finite stream the folded
  * `(key, bucket)` sums equal the batch TWAP verbatim
  * (q_twap_stream shares q_twap's oracle).
  *
  * Arrival contract: per key, observations arrive in `(ts, tie)` order
  * (log/session order — the [[StreamingPreference.trials]] contract);
  * within a micro-batch any order is fine (sorted before folding).
  * Out-of-order arrivals across batches would mis-close intervals —
  * the same late-data boundary every interval stream has; compose a
  * watermark-buffered reorder stage upstream when feeds interleave.
  *
  * Emission is ADDITIVE (bucket slices, not bucket totals), so the
  * consumer folds with a plain `groupBy(key, bucket).sum` — cheap,
  * mergeable, and append-mode-safe (no retractions ever needed).
  */
object StreamingResample {

  final case class Obs(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, value: Double)
  final case class BucketSlice(user_id: Long, bucket: Long,
      held_millis: Long, vw: Long)
  /** Stored observation: (epoch millis, tiebreak id, cents). */
  final case class Held(lo: Long, tie: Long, cents: Long)

  def twapStream(obs: Dataset[Obs],
      bucketMillis: Long = 86400000L): Dataset[BucketSlice] = {
    require(bucketMillis >= 1, s"bucketMillis must be >= 1 (got $bucketMillis)")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.user_id)
      .flatMapGroupsWithState[Held, BucketSlice](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Obs], state: GroupState[Held]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[BucketSlice]
          rows.toSeq
            .sortBy(r => (r.ts.getTime, r.event_id))
            .foreach { r =>
              val lo = r.ts.getTime
              val cents = math.floor(r.value * 100).toLong
              if (st != null && lo > st.lo) {
                // close [st.lo, lo): one slice per covered bucket.
                // floorDiv, not /: pre-1970 negative millis must land
                // on the same floored bucket grid as the batch twin
                var b = java.lang.Math.floorDiv(st.lo, bucketMillis)
                val bHi = java.lang.Math.floorDiv(lo - 1, bucketMillis)
                while (b <= bHi) {
                  val w = math.min(lo, (b + 1) * bucketMillis) -
                    math.max(st.lo, b * bucketMillis)
                  out += BucketSlice(uid, b, w, st.cents * w)
                  b += 1
                }
              }
              // equal-(ts) arrivals: the LATER (ts, tie) holds, matching
              // the batch window's zero-width-interval drop
              if (st == null || lo > st.lo ||
                (lo == st.lo && r.event_id > st.tie))
                st = Held(lo, r.event_id, cents)
            }
          state.update(st)
          out.result().iterator
      }
  }
}
