package graft.operators

import graft.{SparkSpec, Tables}

class CoverageSpec extends SparkSpec {

  test("hand-traced greedy: biggest cover first, then best marginal") {
    import spark.implicits._
    // doc 1: shingles {a b c, b c d, c d e} (3); doc 2 repeats doc 1's
    // text (its whole cover vanishes after doc 1 — implicit dedup);
    // doc 3: 2 fresh shingles. Greedy: doc 1 (tie vs doc 2, smaller id
    // wins), doc 3, then the space is exhausted -> k=3 yields 2 rows.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val got = Coverage.maxCoverage(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L, 3L, 3L), (2L, 3L, 2L, 5L)))
  }

  test("greedy dominates on the corpus: gains never increase") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rows = Coverage.maxCoverage(docs, "doc_id", "text", k = 6)
      .collect()
    assert(rows.length === 6)
    val gains = rows.map(_.getLong(2))
    gains.sliding(2).foreach { case Array(a, b) => assert(a >= b)
    case _ => () }
    // covered_total is the running sum and strictly grows while gains > 0
    assert(rows.map(_.getLong(3)).toSeq === gains.scanLeft(0L)(_ + _).tail)
    // first pick is the doc with the most distinct shingles overall
    val first = rows.head
    assert(first.getLong(2) > 0L)
    // no doc is picked twice
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
  }
}
