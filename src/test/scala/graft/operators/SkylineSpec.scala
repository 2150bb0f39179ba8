package graft.operators

import graft.SparkSpec

/** skyline2D: Pareto-frontier semantics (maximize-maximize), same-x
  * collapse, and boundary-invariance of the two-phase prefix max. */
class SkylineSpec extends SparkSpec {

  private def sky(pts: Seq[(Long, Long)], parts: Int = 0): Set[(Long, Long)] = {
    import spark.implicits._
    val (cached, frontier) =
      Skyline.skyline2D(pts.toDF("x", "y"), "x", "y", numParts = parts)
    val out = frontier.as[(Long, Long)].collect().toSet
    cached.unpersist(blocking = true)
    out
  }

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y)
      }
    }.toSet
  }

  test("hand case: staircase survives, dominated interior drops") {
    val pts = Seq[(Long, Long)](
      (10, 1), (8, 5), (5, 8), (1, 10), // the staircase
      (7, 4), (4, 7), (2, 2),           // strictly inside
      (8, 3))                           // dominated by (8,5)
    assert(sky(pts) == Set[(Long, Long)]((10, 1), (8, 5), (5, 8), (1, 10)))
  }

  test("same x keeps only the max y; duplicate points collapse") {
    val pts = Seq[(Long, Long)]((5, 1), (5, 9), (5, 9), (3, 2))
    assert(sky(pts) == Set[(Long, Long)]((5, 9)))
  }

  test("matches brute force on a deterministic pseudo-random set, any partitioning") {
    // md5-free LCG so the fixture is stable across runs
    var s = 12345L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s % 1000 }
    val pts = Seq.fill(500)((next(), next()))
    val expect = brute(pts)
    assert(sky(pts) == expect)
    assert(sky(pts, parts = 1) == expect, "single partition must agree")
    assert(sky(pts, parts = 17) == expect, "odd partition count must agree")
  }

  test("null coordinate fails loudly instead of silently vanishing") {
    import spark.implicits._
    val pts = Seq((java.lang.Long.valueOf(5L), java.lang.Long.valueOf(1L)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long]))
      .toDF("x", "y")
    // the guard can fire inside skyline2D itself (its partition-totals
    // pass is the first action over the guarded column — and on a local
    // relation even plan optimization may evaluate it), so the whole
    // construct-and-collect sequence sits inside the intercept
    val e = intercept[Exception] {
      val (cached, frontier) = Skyline.skyline2D(pts, "x", "y")
      try frontier.collect() finally cached.unpersist(blocking = true)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be non-null")), s"got: $e")
  }

  test("no stranded cache blocks after unpersisting the returned handle") {
    import spark.implicits._
    // the session is shared across suites, so compare against a snapshot:
    // skyline2D must add no NET persistent RDDs, whatever other suites
    // left behind
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pts = Seq.tabulate(50)(i => (i.toLong, (i % 7).toLong)).toDF("x", "y")
    val (cached, frontier) = Skyline.skyline2D(pts, "x", "y")
    frontier.collect()
    cached.unpersist(blocking = true)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"skyline2D must not strand cached blocks once its handle is released: $leaked")
  }
}
