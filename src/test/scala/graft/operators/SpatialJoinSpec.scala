package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Grid-cell radius join: exactly-once pairs, brute-force parity,
  * negative coordinates, no-cartesian plan pin. */
class SpatialJoinSpec extends SparkSpec {

  private def self(pts: Seq[(Long, Long, Long)], r: Long) = {
    import spark.implicits._
    SpatialJoin.radiusSelfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
  }

  test("hand trace: boundary distance included, just-outside excluded, " +
      "cross-cell neighbors found") {
    // r=5: (1,(0,0)) and (2,(3,4)) at dist 5 exactly (25 <= 25);
    // (3,(0,6)) at dist 6 from 1 (36 > 25) but dist 13 from 2 (sq 13);
    // (4,(9,0)) two cells away from 1 (dist 9) but within 5 of
    // nothing... wait: dist((3,4),(9,0)) = sqrt(36+16)=sq 52 > 25.
    val got = self(Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 0L, 6L),
      (4L, 9L, 0L)), 5L)
    assert(got.toSeq === Seq((1L, 2L, 25L), (2L, 3L, 13L)))
  }

  test("each pair appears exactly once even when both points share " +
      "one cell or straddle a boundary") {
    // r=10: same cell (1,2); boundary straddle (3 at x=9, 4 at x=10)
    val got = self(Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 9L, 5L),
      (4L, 10L, 5L)), 10L)
    assert(got.count(p => p._1 == 1L && p._2 == 2L) === 1)
    assert(got.count(p => p._1 == 3L && p._2 == 4L) === 1)
  }

  test("negative coordinates bin correctly (floored cells, not " +
      "truncated toward zero)") {
    // r=10: (-1,-1) and (1,1) are in different cells under floored
    // division but adjacent — dist_sq 8 must be found
    val got = self(Seq((1L, -1L, -1L), (2L, 1L, 1L),
      (3L, -25L, -25L)), 10L)
    assert(got.toSeq === Seq((1L, 2L, 8L)))
  }

  test("brute-force parity on a deterministic scatter, self and " +
      "two-set variants") {
    import spark.implicits._
    val pts = (0L until 200L).map(i =>
      (i, (i * 7919L) % 300L, (i * 104729L) % 300L))
    val r = 25L
    val brute = for {
      a <- pts; b <- pts
      if a._1 < b._1
      d = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d <= r * r
    } yield (a._1, b._1, d)
    val got = self(pts, r)
    assert(got.toSeq === brute.sortBy(p => (p._1, p._2)))

    val probe = pts.filter(_._1 % 2 == 0)
    val build = pts.filter(_._1 % 2 == 1)
    val brute2 = (for {
      a <- probe; b <- build
      d = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d <= r * r
    } yield (a._1, b._1, d)).sortBy(p => (p._1, p._2))
    val got2 = SpatialJoin.radiusJoin(probe.toDF("id", "x", "y"),
        build.toDF("id", "x", "y"), "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(got2.toSeq === brute2)
  }

  test("knnWithinRadius: k closest per probe, dense ranks, ties by " +
      "build id, short probes keep what they found") {
    import spark.implicits._
    val probe = Seq((1L, 0L, 0L), (2L, 100L, 100L)).toDF("id", "x", "y")
    // builds around probe 1: dists 1, 4, 4, 25, 10000 (out of r=20 for
    // the last); probe 2 has exactly one neighbor in radius
    val build = Seq((10L, 1L, 0L), (11L, 0L, 2L), (12L, 2L, 0L),
      (13L, 3L, 4L), (14L, 100L, 0L), (15L, 101L, 100L))
      .toDF("id", "x", "y")
    val got = SpatialJoin.knnWithinRadius(probe, build, "id", "x", "y",
        radius = 20L, k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(p => (p._1, p._4))
    assert(got.filter(_._1 == 1L).toSeq === Seq(
      (1L, 10L, 1L, 1L), (1L, 11L, 4L, 2L), (1L, 12L, 4L, 3L)))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 15L, 1L, 1L)))
  }

  test("the grid join plans as an equi hash join — no cartesian, no " +
      "nested loop") {
    import spark.implicits._
    val pts = (0L until 500L).map(i =>
      (i, (i * 7919L) % 1000L, (i * 104729L) % 1000L)).toDF("id", "x", "y")
    val joined = SpatialJoin.radiusSelfJoin(pts, "id", "x", "y", 50L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan)(
        pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan,
          org.apache.spark.sql.execution.SparkPlan])
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val sub = p.subqueries.flatMap(collectAll(_)(pf))
      p.collect { case x if x.isInstanceOf[
        org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] =>
        collectAll(x.asInstanceOf[
          org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
          .executedPlan)(pf)
      }.flatten ++ p.collect(pf) ++ sub
    }
    val bad = collectAll(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => n
    }
    assert(bad.isEmpty, s"grid join must stay equi:\n$plan")
  }
}
