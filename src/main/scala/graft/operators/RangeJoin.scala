package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale path for point-in-interval (range/theta) joins when BOTH sides
  * are large (SURVEY.md §2.3).
  *
  * A raw `p >= lo AND p < hi` join has no equi-key, so Spark plans a
  * nested-loop join — broadcast NLJ when one side is small (fine; that is
  * what q_range_join demonstrates), and a cartesian catastrophe when
  * neither side fits in memory. This operator restores an equi-key by
  * BINNING the value domain: points key on `floor(p / w)`, intervals
  * explode to every bin they cover, the join is a plain hash equi-join on
  * the bin, and a residual predicate removes the bin-edge false
  * positives. Both sides shuffle ONCE on the bin key; no nested loop
  * anywhere.
  *
  * Cost model: intervals generate `(hi - lo) / w + 1` rows each, points
  * one row each, and each point meets only the intervals sharing its bin.
  * Pick `w` near the typical interval width so interval fan-out stays
  * O(1). Skew note: a bin that holds many points AND many intervals goes
  * quadratic locally — AQE skew-join splits oversized bins (see
  * BucketingSpec's activation test), and extremely wide intervals can be
  * routed through a coarser second bin level at 100 TB (also the remedy
  * if an interval's bin fan-out ever approaches Spark's sequence length
  * cap of ~2^31 elements — pick `w` so `max(hi-lo)/w` stays small).
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` where
    * `points(pointCol) ∈ [loCol, hiCol)`. Output columns = point columns
    * then interval columns, like a plain join. */
  def binned(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    // inverted intervals (lo > hi) can never match `p >= lo AND p < hi`,
    // but sequence() would happily count DOWN through every bin between
    // them — drop them before the explode instead of after the join
    val iv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(
          floor(col(loCol) / binWidth).cast("long"),
          floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join — the log-sessions/genomics verb
    * [[binned]] cannot express: inner join of `left` to `right` where
    * the half-open windows `[lLo, lHi)` and `[rLo, rHi)` intersect
    * (`lLo < rHi AND rLo < lHi`), restored to an equi-join by the same
    * bin trick. Column names of the two sides must be disjoint except
    * for `equiKeys`, which join as additional plain equi-columns
    * (e.g. a per-entity overlap join keys on the entity AND the bin).
    *
    * EXACTLY-ONCE semantics without a distinct: a pair whose overlap
    * spans several shared bins would match once per bin, so the match
    * is kept only in the CANONICAL bin — the bin containing the
    * overlap's start `greatest(lLo, rLo)`. Every overlapping pair has
    * exactly one such bin and both sides generated it (each side's
    * explode covers its own interval, and the overlap start lies in
    * both intervals), so the output multiset equals the brute
    * theta-join's — which is what the oracle pins.
    *
    * Cost model as [[binned]]: each side fans out `(hi-lo)/w + 1`
    * rows; both sides shuffle ONCE on `(bin, equiKeys…)`; AQE splits
    * skewed bins. No nested loop at any size. */
  def overlapBinned(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String, binWidth: Double,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def explodeBins(df: DataFrame, lo: String, hi: String) = df
      .where(col(lo) <= col(hi))
      .withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val l = explodeBins(left, lLo, lHi)
    val r = explodeBins(right, rLo, rHi)
    l.join(r, "__bin" +: equiKeys)
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bin") ===
          floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
