package graft.operators

import graft.SparkSpec

/** Profiler: null counting, exact vs approx distinct, canonical min/max. */
class ProfilerSpec extends SparkSpec {

  test("profile counts nulls and distincts exactly, min/max canonical") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("b"))).toDF("num", "str")
    val got = Profiler.profile(df, Seq("num", "str"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("num") === (("num", 4L, 1L, 2L, "1", "3")))
    assert(got("str") === (("str", 4L, 1L, 2L, "a", "b")))
  }

  test("winsorize clips at exact rank cuts; hand-computed percentiles") {
    import spark.implicits._
    // 10 values 1..10, loPpm=200000 (p20) -> k = ceil(10*0.2) = 2 ->
    // lo_cut = 2.0; hiPpm=800000 -> k = 8 -> hi_cut = 8.0
    val df = (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("event_id", "value")
    val got = Profiler.winsorize(df, "event_id", "value",
        loPpm = 200000L, hiPpm = 800000L)
      .as[(Long, Double, Double, Double, Double, Long)]
      .collect().sortBy(_._1)
    assert(got.forall(r => r._3 == 2.0 && r._4 == 8.0))
    assert(got.map(_._5).toSeq ===
      Seq(2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 8.0, 8.0))
    assert(got.map(_._6).toSeq ===
      Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 1L))
    // duplicate-heavy data: ties leave the cut VALUE well-defined
    val dup = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 100.0))
      .toDF("event_id", "value")
    val g2 = Profiler.winsorize(dup, "event_id", "value",
        loPpm = 0L, hiPpm = 750000L)
      .as[(Long, Double, Double, Double, Double, Long)]
      .collect().sortBy(_._1)
    // k_hi = ceil(4*0.75) = 3 -> hi_cut = 5.0; the 100.0 outlier clips
    assert(g2.map(_._5).toSeq === Seq(5.0, 5.0, 5.0, 5.0))
    assert(g2.map(_._6).sum === 1L)
  }

  test("profileApprox matches exact distincts on a low-cardinality column") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val exact = Profiler.profile(orders, Seq("o_orderstatus"))
      .select("n_distinct").head().getLong(0)
    val approx = Profiler.profileApprox(orders, Seq("o_orderstatus"))
      .select("n_distinct").head().getLong(0)
    assert(exact === approx, "HLL is exact at tiny cardinality")
  }

  test("categoryDrift: exact ppm shares, zero-filled one-sided " +
      "categories, TV distance from the gaps") {
    import spark.implicits._
    val a = Seq("x", "x", "x", "y").map(Tuple1(_)).toDF("c")
    val b = Seq("x", "y", "y", "z").map(Tuple1(_)).toDF("c")
    val got = Profiler.categoryDrift(a, b, "c")
      .selectExpr("category", "n_a", "n_b", "share_a_ppm",
        "share_b_ppm", "gap_ppm")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("x", 3L, 1L, 750000L, 250000L, 500000L),
      ("y", 1L, 2L, 250000L, 500000L, 250000L),
      ("z", 0L, 1L, 0L, 250000L, 250000L)))
    assert(got.map(_._6).sum / 2 === 500000L) // TV distance = 0.5
  }

  test("numericDrift bins sign-safely and reuses the exact TV " +
      "machinery") {
    import spark.implicits._
    // width 10: a has values in bins 0,0,1; b in bins 0,1,1
    val a = Seq(3L, 7L, 15L).map(Tuple1(_)).toDF("v")
    val b = Seq(9L, 12L, 19L).map(Tuple1(_)).toDF("v")
    val got = Profiler.numericDrift(a, b, "v", binWidth = 10L)
      .selectExpr("bin", "n_a", "n_b", "gap_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // bin0: 666666 vs 333333 ppm; bin1 mirrored -> both gaps 333333
    assert(got.toSeq === Seq(
      (0L, 2L, 1L, 333333L),
      (1L, 1L, 2L, 333333L)))
  }

  test("psiDrift hand case: clamped shares, exact micro-nat terms, " +
      "symmetric distributions give symmetric non-negative terms") {
    import spark.implicits._
    val a = Seq("x", "x", "x", "y").map(Tuple1(_)).toDF("c")
    val b = Seq("x", "y", "y", "z").map(Tuple1(_)).toDF("c")
    val got = Profiler.psiDrift(a, b, "c")
      .selectExpr("category", "share_a_ppm", "share_b_ppm",
        "psi_term_pico")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    def term(sa: Long, sb: Long): Long =
      (sa - sb) * math.floor(1e6 *
        math.log(sa.toDouble / sb.toDouble)).toLong
    assert(got.toSeq === Seq(
      ("x", 750000L, 250000L, term(750000L, 250000L)),
      ("y", 250000L, 500000L, term(250000L, 500000L)),
      ("z", 1L, 250000L, term(1L, 250000L)))) // zero side clamps to 1
    assert(got.forall(_._4 >= 0L))
  }

  test("psiNumericDrift equals psiDrift over the sign-safe bins") {
    import spark.implicits._
    val a = Seq(3L, 7L, 15L, -12L).map(Tuple1(_)).toDF("v")
    val b = Seq(9L, 12L, 19L, -3L).map(Tuple1(_)).toDF("v")
    val got = Profiler.psiNumericDrift(a, b, "v", binWidth = 10L)
      .selectExpr("bin", "psi_term_pico")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = Profiler.psiDrift(
        a.selectExpr("(CASE WHEN v < 0 THEN -1 ELSE 1 END) " +
          "* (abs(v) div 10) AS c"),
        b.selectExpr("(CASE WHEN v < 0 THEN -1 ELSE 1 END) " +
          "* (abs(v) div 10) AS c"), "c")
      .selectExpr("CAST(category AS LONG) AS bin", "psi_term_pico")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
    assert(got.exists(_._1 == -1L), "negative bin must be present")
  }

  test("winsorizeByGroup: per-group exact rank cuts — each group " +
      "clips at its OWN p10/p90, and the heavy tail clamps to its " +
      "group's cut, not a global one") {
    import spark.implicits._
    // group g1: 1..10 (tight); g2: 1..9 and 1000 (heavy tail)
    val rows = (1L to 10L).map(i => (i, "g1", i.toDouble)) ++
      (1L to 9L).map(i => (i + 100L, "g2", i.toDouble)) :+
      ((110L, "g2", 1000.0))
    val got = Profiler.winsorizeByGroup(
        rows.toDF("id", "grp", "v"), "id", "grp", "v",
        loPpm = 100000L, hiPpm = 900000L)
      .selectExpr("id", "group", "value", "lo_cut", "hi_cut",
        "winsorized", "clipped")
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect()
    val g1 = got.filter(_._2 == "g1")
    // n=10: klo = ceil(10*0.1)=1 -> lo_cut=1; khi = ceil(10*0.9)=9
    assert(g1.forall(r => r._4 === 1.0 && r._5 === 9.0))
    assert(g1.count(_._7 == 1L) === 1) // only value 10 clips
    val g2 = got.filter(_._2 == "g2")
    assert(g2.forall(r => r._4 === 1.0 && r._5 === 9.0))
    val tail = g2.find(_._1 == 110L).get
    assert(tail._6 === 9.0 && tail._7 === 1L) // 1000 clamps to g2's p90
  }
}
