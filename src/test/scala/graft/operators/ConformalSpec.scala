package graft.operators

import graft.SparkSpec

/** Split-conformal gate: exact order-statistic threshold, fail-open
  * small-n branch, finite-sample coverage. */
class ConformalSpec extends SparkSpec {

  private def gate(rows: Seq[(Long, Long, Boolean)], alphaPpm: Long) = {
    import spark.implicits._
    Calibration.conformalGate(
      rows.toDF("id", "nonconf", "is_cal"),
      "id", "nonconf", "is_cal", alphaPpm)
      .selectExpr("id", "nonconf", "thr", "n_cal", "kept")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
  }

  test("threshold is the ceil((n+1)(1-alpha))-th smallest calibration " +
      "nonconformity, hand trace") {
    // cal 1..10, alpha=0.2: k = ceil(11*0.8) = 9 -> thr = 9
    val cal = (1L to 10L).map(i => (i, i, true))
    val app = Seq((11L, 9L, false), (12L, 10L, false))
    val got = gate(cal ++ app, alphaPpm = 200000L)
    assert(got.forall(_._3 === 9L) && got.forall(_._4 === 10L))
    assert(got.find(_._1 == 11L).get._5 === true)
    assert(got.find(_._1 == 12L).get._5 === false)
  }

  test("k > n fails OPEN: threshold +inf, everything kept") {
    // n=3, alpha=0.1: k = ceil(4*0.9) = 4 > 3
    val rows = Seq((1L, 5L, true), (2L, 7L, true), (3L, 9L, true),
      (4L, 1000000L, false))
    val got = gate(rows, alphaPpm = 100000L)
    assert(got.forall(_._3 === Long.MaxValue))
    assert(got.forall(_._4 === 3L))
    assert(got.forall(_._5))
  }

  test("empty calibration slice fails OPEN with n_cal = 0") {
    val got = gate(Seq((1L, 42L, false), (2L, -7L, false)), 100000L)
    assert(got.forall(r => r._3 === Long.MaxValue && r._4 === 0L && r._5))
  }

  test("duplicate values at the cut rank: the threshold VALUE is " +
      "tiebreak-independent") {
    // cal multiset [5,5,5,7], alpha=0.5: k = floor((5*5e5+999999)/1e6)=3
    // -> thr = 3rd smallest = 5
    val rows = Seq((1L, 5L, true), (2L, 5L, true), (3L, 5L, true),
      (4L, 7L, true), (5L, 5L, false), (6L, 6L, false))
    val got = gate(rows, alphaPpm = 500000L)
    assert(got.forall(_._3 === 5L))
    assert(got.find(_._1 == 5L).get._5 === true)
    assert(got.find(_._1 == 6L).get._5 === false)
  }

  test("conformalGateByGroup: independent thresholds per group, a " +
      "calibration-free group fails open") {
    import spark.implicits._
    // group a: cal 1..10 -> alpha 0.2 gives thr 9 (the global trace);
    // group b: cal all at 100 -> thr 100; group c: no cal rows
    val rows = ((1L to 10L).map(i => (i, "a", i, true)) ++
      (11L to 20L).map(i => (i, "b", 100L, true)) ++
      Seq((21L, "a", 10L, false), (22L, "b", 101L, false),
        (23L, "c", 5L, false)))
      .toDF("id", "g", "nc", "cal")
    val got = Calibration.conformalGateByGroup(rows, "id", "g", "nc",
        "cal", alphaPpm = 200000L)
      .selectExpr("id", "group", "thr", "n_cal", "kept")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === (("a", 9L, 10L, true)))
    assert(got(21L) === (("a", 9L, 10L, false))) // 10 > 9
    assert(got(11L) === (("b", 100L, 10L, true)))
    assert(got(22L) === (("b", 100L, 10L, false)))
    assert(got(23L) === (("c", Long.MaxValue, 0L, true))) // fail open
  }

  test("finite-sample coverage on the calibration slice itself: " +
      "kept fraction >= 1 - alpha") {
    for (alphaPpm <- Seq(100000L, 250000L, 500000L)) {
      val cal = (1L to 100L).map(i => (i, (i * 37) % 101, true))
      val got = gate(cal, alphaPpm)
      val kept = got.count(_._5).toLong
      assert(kept * 1000000L >= (1000000L - alphaPpm) * got.length,
        s"alpha=$alphaPpm kept=$kept of ${got.length}")
    }
  }
}
