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
  * The distinct-x relation stays persisted for the caller (registry
  * wrappers drain the cache) — it is referenced both by the output plan
  * and by the already-collected partition maxima, so dropping it early
  * would let a recompute re-sample different range boundaries than the
  * collected bases describe.
  *
  * Contract: both coordinates non-null (a null x forms its own group
  * and a null y neither dominates nor survives comparisons — filter
  * upstream; the fixture columns are non-null by construction).
  */
object Skyline {

  def skyline2D(points: DataFrame, xCol: String, yCol: String,
      numParts: Int = 0): DataFrame = {
    val spark = points.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions

    val local = points
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

    cum.join(baseDf, "__pid")
      // greatest skips the NULL __localmax of each partition's first row
      .where(col(yCol).cast("double") >
        greatest(col("__localmax"), col("__base")))
      .select(col(xCol), col(yCol))
  }
}
