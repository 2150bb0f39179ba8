package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated in the
  * maximize-maximize order — `p` survives iff no other point is ≥ on
  * both coordinates and > on at least one (Börzsönyi et al., "The
  * Skyline Operator", ICDE 2001). The multi-criteria "best trade-offs"
  * primitive: best (quality, recency), (size, score), … — a top-k can't
  * express it because the frontier's size is data-dependent.
  *
  * The textbook 2-D algorithm is a sort by x desc + running max of y —
  * a global ORDER BY window, i.e. a single-reducer funnel at scale.
  * This is the same shape as Packing's global cumsum, and gets the same
  * two-phase fix, with max as the (associative) prefix aggregate:
  *
  *   1. collapse to one row per x (only `max(y)` per x can survive —
  *      a same-x point with smaller y is dominated); range-partition
  *      the distinct-x relation by x DESC and compute the EXCLUSIVE
  *      running max within each partition (parallel windows);
  *   2. collect the P per-partition maxima (P doubles — driver-safe at
  *      any size), prefix-max them driver-side, broadcast the partition
  *      base maxima back; a row survives iff its y beats
  *      `greatest(local exclusive max, base)`.
  *
  * Boundary-invariant like the prefix sum: a prefix max is exact
  * wherever the range partitioner cuts. No arithmetic is performed on
  * x or y (only comparisons), so any numeric columns compare exactly
  * in any engine; the internal double cast for the driver-side prefix
  * is exact for integer magnitudes < 2^53.
  *
  * Returns `(cachedDistinctX, frontier)` — the triangleStats-style
  * release contract: the persisted distinct-x relation is referenced
  * both by the frontier plan and by the already-collected partition
  * maxima, so unpersisting it BEFORE the frontier materializes would
  * let a recompute re-sample different range boundaries than the
  * collected bases describe (a stale-base wrong answer, not just a
  * slowdown). Callers materialize the frontier first, then release the
  * handle (registry wrapper uses [[graft.queries.Drain]]).
  *
  * Contract: both coordinates non-null — enforced IN-PLAN with a
  * `raise_error` branch (zero extra passes; a null x would form its own
  * group and a null y neither dominates nor survives comparisons,
  * silently vanishing rows — this fails the job loudly instead).
  */
object Skyline {

  def skyline2D(points: DataFrame, xCol: String, yCol: String,
      numParts: Int = 0): (DataFrame, DataFrame) = {
    val spark = points.sparkSession
    // The guard rewrites yCol itself, so column pruning can never drop
    // it; evaluated once per row inside the existing first pass.
    val guarded = points.withColumn(yCol,
      when(col(xCol).isNull || col(yCol).isNull, raise_error(lit(
        s"skyline2D: $xCol/$yCol must be non-null (a null coordinate " +
          "would silently vanish from the frontier — filter upstream)")))
        .otherwise(col(yCol)))
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions

    val local = guarded
      .groupBy(col(xCol)).agg(max(col(yCol)).as(yCol))
      .repartitionByRange(parts, col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val w = Window.partitionBy("__pid").orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = local.withColumn("__localmax",
      max(col(yCol).cast("double")).over(w))

    val totals = local.groupBy("__pid")
      .agg(max(col(yCol).cast("double")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    // base for a partition = max y over all LOWER pids (= higher x,
    // since the range order is x desc); -inf for the first partition
    val baseByPid = totals.map(_._1).zip(
      totals.scanLeft(Double.NegativeInfinity) {
        case (acc, (_, t)) => math.max(acc, t)
      }.init)
    val baseDf = broadcast(
      spark.createDataFrame(baseByPid.toSeq).toDF("__pid", "__base"))

    val frontier = cum.join(baseDf, "__pid")
      // greatest skips the NULL __localmax of each partition's first row
      .where(col(yCol).cast("double") >
        greatest(col("__localmax"), col("__base")))
      .select(col(xCol), col(yCol))
    (local, frontier)
  }
}
