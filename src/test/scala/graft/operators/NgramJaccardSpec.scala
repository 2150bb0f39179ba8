package graft.operators

import graft.SparkSpec

/** Hot-shingle capping for the exact n-gram Jaccard inverted index
  * ([[Dedup.ngramJaccard]]): a boilerplate shingle shared by every document
  * must not drive the self-join quadratic. Shingles with document frequency
  * > maxDf are dropped from BOTH the intersection and the set sizes (exact
  * Jaccard over the filtered universe), and the loss is observable through
  * [[Dedup.hotShingles]].
  */
class NgramJaccardSpec extends SparkSpec {

  test("exact jaccard on a known pair") {
    import spark.implicits._
    // doc1 shingles {a b c, b c d}, doc2 {b c d, c d e}: |∩|=1, |∪|=3
    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.1)._2
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0.3333)))
  }

  test("a planted hot shingle is dropped from the index and audited") {
    import spark.implicits._
    val n = 200
    val cap = 8
    // every doc shares the boilerplate 3-gram "stop phrase here"; tails are
    // unique, so once the hot shingle is dropped no pair shares anything
    val docs = (1 to n).map(i =>
      (i.toLong, s"stop phrase here u${i}a u${i}b u${i}c")).toDF("doc_id", "text")

    val capped = Dedup.ngramJaccard(docs, "doc_id", "text",
      threshold = 0.01, maxDf = cap)._2
    assert(capped.count() === 0L,
      "hot shingle must be dropped before the self-join")

    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text",
      threshold = 0.01, maxDf = Int.MaxValue)._2
    assert(uncapped.count() === n.toLong * (n - 1) / 2,
      "without the cap every pair shares the boilerplate shingle")

    val audit = Dedup.hotShingles(docs, "doc_id", "text", maxDf = cap)
      .select("df").as[Long].collect()
    assert(audit.toSeq === Seq(n.toLong),
      s"expected exactly the one boilerplate shingle with df=$n audited")
  }

  test("cap is inert when no shingle exceeds it") {
    import spark.implicits._
    val docs = (
      Seq((1L, "x y z w v"), (2L, "x y z w q")) ++
        (10L to 19L).map(i => i -> (1 to 8).map(j => s"u${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", 0.2, maxDf = 8)
      ._2.as[(Long, Long, Double)].collect().toSet
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", 0.2,
      maxDf = Int.MaxValue)._2.as[(Long, Long, Double)].collect().toSet
    assert(capped === uncapped)
    assert(capped.map(p => (p._1, p._2)).contains((1L, 2L)))
  }
}
