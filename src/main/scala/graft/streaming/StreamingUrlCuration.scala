package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain document cap — the incremental half of
  * [[graft.operators.UrlCuration.domainCap]]: a crawl frontier emits
  * documents continuously, and the cap verdict must be made on
  * ARRIVAL (the whole point of a frontier cap is to stop fetching a
  * domain once its budget is spent, not to rank retroactively).
  *
  * Contract (documented difference from batch): the streamed rank is
  * the ARRIVAL rank — the r-th document of a domain to arrive gets
  * `rnk = r` — with `(doc_id)` ordering inside a micro-batch for
  * determinism. Fed in doc_id order (the batch operator's `orderCol`),
  * the streamed verdicts equal the batch
  * [[graft.operators.UrlCuration.domainCap]] row for row; under
  * arbitrary arrival the KEPT COUNT per domain still equals the
  * batch's `min(cap, n_domain)` (the budget is order-free even when
  * the chosen representatives differ) — both pinned in
  * `StreamingUrlCurationSpec`.
  *
  * State is ONE long per domain (documents seen) — 8 bytes per
  * registrable domain, the smallest possible frontier-cap state, and
  * the same bounded-state discipline as the rest of the streaming
  * family. Domain resolution (URL parse → canonicalize → eTLD+1) runs
  * map-side BEFORE the groupByKey, so the one shuffle is on the
  * registrable domain, exactly like the batch operator's single
  * exchange.
  */
object StreamingUrlCuration {

  final case class CapDoc(doc_id: Long, registrable: String)
  final case class CapVerdict(doc_id: Long, registrable: String,
      rnk: Long, kept: Long)

  /** Arrival-ranked cap verdicts with cross-batch per-domain counts. */
  def capVerdicts(docs: Dataset[CapDoc],
      maxPerDomain: Long): Dataset[CapVerdict] = {
    require(maxPerDomain >= 0, s"maxPerDomain must be >= 0 (got $maxPerDomain)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.registrable)
      .flatMapGroupsWithState[Long, CapVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (domain: String, rows: Iterator[CapDoc],
            state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            seen += 1
            CapVerdict(d.doc_id, domain, seen,
              if (seen <= maxPerDomain) 1L else 0L)
          }
          state.update(seen)
          out.iterator
      }
  }
}
