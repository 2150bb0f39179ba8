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

  final case class DomainDoc(registrable: String, n_words: Long)
  final case class DomainGateRow(registrable: String, n_docs: Long,
      sum_words: Long, mean_words_milli: Long, kept: Boolean)

  /** Streaming [[graft.operators.UrlCuration.domainQualityGate]]: the
    * domain-level curation verdict stays current as documents arrive.
    * URL parse → canonicalize → eTLD+1 (the batch operators, verbatim
    * — the PSL rule dim is a stream-static broadcast join) and the
    * word count run MAP-SIDE; per-domain state is TWO longs
    * `(n_docs, sum_words)` — additive, so the fold is correct under
    * ANY arrival order — and each micro-batch with arrivals emits the
    * domain's current gate row. The latest row per domain (max
    * `n_docs`, strictly increasing on arrivals) equals the batch
    * operator over everything seen
    * (q_domain_quality_gate_stream shares the batch oracle verbatim).
    * The floored-milli mean is non-negative, so `/` here equals the
    * batch `div`. */
  def domainQualityGateStream(docs: org.apache.spark.sql.DataFrame,
      urlCol: String, textCol: String,
      rules: org.apache.spark.sql.DataFrame,
      minDocs: Long = 3L, minMeanWordsMilli: Long = 40000L)
      : Dataset[DomainGateRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val resolved = graft.operators.UrlCuration.registrableDomain(
        graft.operators.UrlCuration.canonicalize(docs, urlCol),
        "host", rules)
      .select(col("registrable"),
        size(expr(graft.operators.Dedup.wordsExpr(textCol)))
          .cast("long").as("n_words"))
      .as[DomainDoc]
    resolved.groupByKey(_.registrable)
      .flatMapGroupsWithState[(Long, Long), DomainGateRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (domain: String, rows: Iterator[DomainDoc],
            state: GroupState[(Long, Long)]) =>
          var (n, sw) = state.getOption.getOrElse((0L, 0L))
          var any = false
          rows.foreach { r => any = true; n += 1L; sw += r.n_words }
          if (!any) Iterator.empty
          else {
            state.update((n, sw))
            val mean = sw * 1000L / n
            Iterator.single(DomainGateRow(domain, n, sw, mean,
              n >= minDocs && mean >= minMeanWordsMilli))
          }
      }
  }

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
