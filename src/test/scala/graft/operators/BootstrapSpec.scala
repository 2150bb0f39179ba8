package graft.operators

import graft.SparkSpec

/** Poisson bootstrap: fixed-point CDF, one-pass replicate statistics. */
class BootstrapSpec extends SparkSpec {

  test("replicate effective sizes scatter around n with Poisson(1) mass") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val n = docs.count()
    val got = Bootstrap.poissonBootstrap(docs, "doc_id", "text", 16)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === 16)
    // E[n_eff] = n, sd(n_eff) = sqrt(n); the mean over 16 replicates
    // has sd sqrt(n/16) — a 5-sigma band cannot flake
    val avg = got.map(_._2).sum.toDouble / got.length
    val tol = 5.0 * math.sqrt(n.toDouble / got.length)
    assert(math.abs(avg - n) <= tol,
      s"avg n_eff $avg vs n $n exceeds $tol")
    // every replicate's mean stat sits near the corpus mean
    val trueMeanMilli = {
      val words = docs.selectExpr(
        "CAST(size(filter(split(text, ' '), w -> w <> '')) AS LONG) nw")
        .as[Long].collect()
      words.sum * 1000L / words.length
    }
    got.foreach { case (_, neff, _, milli) =>
      assert(neff > 0)
      assert(math.abs(milli - trueMeanMilli) < trueMeanMilli / 5,
        s"replicate mean $milli far from $trueMeanMilli")
    }
  }

  test("weights are deterministic and capped at 6") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val a = Bootstrap.poissonBootstrap(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Bootstrap.poissonBootstrap(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b, "bootstrap must be a pure function of (ids, B)")
    // with 2 docs, n_eff per replicate ≤ 2 docs * cap 6
    a.foreach { case (_, neff, _, _) => assert(neff >= 0 && neff <= 12) }
  }

  test("the CDF constants are the Poisson(1) floors") {
    // spot-pin the published constants so a typo cannot silently skew
    // every weight (floor(1e6 * e^-1 * sum_{j<=k} 1/j!))
    val e1 = math.exp(-1.0)
    val expect = Seq(1.0, 2.0, 2.5, 8.0 / 3, 65.0 / 24, 163.0 / 60)
      .map(m => math.floor(1e6 * m * e1).toLong)
    assert(Bootstrap.CdfPpm === expect)
  }
}
