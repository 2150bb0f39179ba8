package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A group's current leaderboard: the ids and scores of its best `n`
  * rows seen so far, best first. */
final case class TopNBoard(group: String, ids: Seq[Long], scores: Seq[Long])

/** Streaming counterpart of [[graft.operators.TopN]]: each group's
  * top-n (score desc, id asc) maintained incrementally as rows arrive —
  * "current best N pages per domain", updated per micro-batch instead
  * of recomputed over the accumulated corpus.
  *
  * State is the n-entry leaderboard per group (2n longs) — bounded
  * regardless of stream length, the same bounded-state discipline as
  * [[StreamingDedup]]'s one-long buckets and [[StreamingPacking]]'s
  * one-long offsets. Entries are OBSERVATIONS, not keyed by id: the
  * same id re-scored later coexists with its earlier entry (exact
  * duplicate observations collapse); callers wanting best-score-per-id
  * semantics dedup upstream (`max_by` per id within the batch). A batch's rows merge into the board in (score
  * desc, id asc) order, so replays of a committed batch rebuild the
  * identical board (deterministic merge, no arrival-order dependence
  * within a batch). Emits each group's board once per batch it appears
  * in (update semantics via flatMapGroupsWithState Append on changed
  * groups only).
  */
object StreamingTopN {

  def topNPerGroup(rows: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, n: Int): Dataset[TopNBoard] = {
    require(n >= 1, s"need n >= 1, got $n")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(scoreCol).cast("long").as("s"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long)], TopNBoard](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[(String, Long, Long)],
            state: GroupState[Seq[(Long, Long)]]) =>
          val cur = state.getOption.getOrElse(Seq.empty)
          // sortWith, not sortBy(-s): negating Long.MinValue overflows back
          // to Long.MinValue and would sort a minimum score as the best.
          val merged = (cur ++ it.map { case (_, id, s) => (id, s) })
            .distinct
            .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
            .take(n)
          if (merged == cur) Iterator.empty // unchanged board: no emit
          else {
            state.update(merged)
            Iterator.single(
              TopNBoard(g, merged.map(_._1), merged.map(_._2)))
          }
      }
  }
}
