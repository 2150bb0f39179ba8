package graft.operators

import graft.SparkSpec

/** Isotonic calibration (PAV via the max-min closed form). */
class CalibrationSpec extends SparkSpec {

  test("isotonicBins pools the adjacent violator, hand trace") {
    import spark.implicits._
    // bins: 0 → (2 rows, 1 pos, praw .5), 1 → (1, 0), 2 → (1, 1).
    // PAV pools bins 0..1 to 1/3; bin 2 stays 1.0.
    val scored = Seq((0L, 1L), (5L, 0L), (16L, 0L), (32L, 1L))
      .toDF("s", "p")
    val got = Calibration.isotonicBins(scored, "s", "p")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 2L, 1L, 500000000L, 333333333L),
      (1L, 1L, 0L, 0L, 333333333L),
      (2L, 1L, 1L, 1000000000L, 1000000000L)))
  }

  test("binning is sign-safe truncation toward zero and clamps") {
    import spark.implicits._
    val scored = Seq((-17L, 0L), (-5L, 1L), (5L, 0L), (100000L, 1L))
      .toDF("s", "p")
    val bins = Calibration.isotonicBins(scored, "s", "p")
      .select("bin").as[Long].collect().sorted
    // -17 → -1; -5 and 5 → 0 (truncation, not floor); 100000 clamps to 63
    assert(bins.toSeq === Seq(-1L, 0L, 63L))
  }

  test("already-isotone inputs come back unchanged") {
    import spark.implicits._
    val scored = Seq((0L, 0L), (16L, 0L), (16L, 1L), (32L, 1L))
      .toDF("s", "p")
    val got = Calibration.isotonicBins(scored, "s", "p")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._4) === got.map(r => r._5),
      s"isotone praw must equal iso: ${got.toSeq}")
  }

  test("calibratedGate maps each score through its fitted bin and " +
      "keeps iff iso_ppb crosses the threshold; gate is monotone") {
    import spark.implicits._
    // bins of width 16: scores 0/16/32; empirical rates 0, 1/2, 1 —
    // already isotone, so iso == praw: 0, 5e8, 1e9
    val scored = Seq(
      (1L, 0L, 0L), (2L, 0L, 0L),
      (3L, 16L, 0L), (4L, 16L, 1L),
      (5L, 32L, 1L), (6L, 32L, 1L))
      .toDF("id", "s", "p")
    val got = Calibration.calibratedGate(scored, "id", "s", "p",
        minPpb = 500000000L)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._4, r._5)).toSeq === Seq(
      (1L, 0L, false), (2L, 0L, false),
      (3L, 500000000L, true), (4L, 500000000L, true),
      (5L, 1000000000L, true), (6L, 1000000000L, true)))
    // monotone gate: kept ids have scores >= every dropped id's score
    val keptMin = got.filter(_._5).map(_._2).min
    val dropMax = got.filterNot(_._5).map(_._2).max
    assert(dropMax < keptMin)
  }

  test("ecdfNormalize hand trace: within-group ppm quantiles, " +
      "cross-group comparability") {
    import spark.implicits._
    // group a scores [1,2,2,4] -> ecdf 25/75/75/100%; group b [10] -> 100%
    val rows = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 2L),
      (4L, "a", 4L), (5L, "b", 10L)).toDF("id", "g", "s")
    val got = Calibration.ecdfNormalize(rows, "id", "g", "s")
      .select("id", "n_grp", "ecdf_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 4L, 250000L), (2L, 4L, 750000L),
      (3L, 4L, 750000L), (4L, 4L, 1000000L), (5L, 1L, 1000000L)))
  }

  test("ecdfNormalize is monotone within each group and binning " +
      "preserves order for negative scores") {
    import spark.implicits._
    val rows = Seq((1L, "a", -17L), (2L, "a", -3L), (3L, "a", 0L),
      (4L, "a", 5L), (5L, "a", 40L)).toDF("id", "g", "s")
    val got = Calibration.ecdfNormalize(rows, "id", "g", "s",
        binWidth = 8L)
      .select("id", "score", "ecdf_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    val ppms = got.map(_._3).toSeq
    assert(ppms === ppms.sorted, s"ECDF must be monotone in score: $got")
    // -3 and 0 and 5 share bin 0 under width 8 -> equal ppm
    val binned = got.filter(r => r._2 >= -3 && r._2 <= 5).map(_._3)
    assert(binned.distinct.length === 1)
  }

  test("calibrationError hand trace: ECE, worst gap, ppk Brier on " +
      "the PAV pooling example") {
    import spark.implicits._
    // same bins as the PAV hand trace: praw 5e8/0/1e9, iso 1/3,1/3,1
    val scored = Seq((0L, 1L), (5L, 0L), (16L, 0L), (32L, 1L))
      .toDF("s", "p")
    val got = Calibration.calibrationError(scored, "s", "p")
      .as[(Long, Long, Long, Long)].collect().head
    // ece = (2*166666667 + 1*333333333 + 0) div 4 = 166666666
    // brier(ppk): bins contribute 444889+110889, 110889, 0 -> 666667/4
    assert(got === ((4L, 166666666L, 333333333L, 166666L)))
  }

  test("a perfectly calibrated (already isotone) slice scores zero " +
      "ECE and zero max gap") {
    import spark.implicits._
    val scored = Seq((0L, 0L), (16L, 0L), (16L, 1L), (32L, 1L))
      .toDF("s", "p")
    val got = Calibration.calibrationError(scored, "s", "p")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._2 === 0L && got._3 === 0L)
  }

  test("calibratePerceptron output is monotone non-decreasing") {
    val got = Calibration.calibratePerceptron(
        graft.Tables.t(spark, sfDir, "documents"), "doc_id", "text")
      .orderBy("bin").select("iso_ppb")
      .collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty)
    assert(got === got.sorted, s"iso must be monotone: $got")
  }
}
