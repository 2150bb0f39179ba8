package graft.operators

import graft.SparkSpec

/** Incremental cluster-artifact maintenance ([[Dedup.updateClusters]]):
  * folding a batch of new pairs into a stored cluster assignment must
  * equal the full recompute over the union pair set, for any split —
  * that is what makes clusters a write-once maintained artifact instead
  * of a per-query recomputation.
  */
class IncrementalClustersSpec extends SparkSpec {

  private def pairsDf(ps: Seq[(Long, Long)]) = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  private def clustersOf(ps: Seq[(Long, Long)]): Set[(Long, Long, Boolean)] =
    Dedup.dupClusters(pairsDf(ps))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private def updated(old: Seq[(Long, Long)], batch: Seq[(Long, Long)])
      : Set[(Long, Long, Boolean)] =
    Dedup.updateClusters(Dedup.dupClusters(pairsDf(old)), pairsDf(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("batch merge bridging two old clusters equals full recompute") {
    // old: {1,2} and {3,4}; batch bridges 2-3 and adds a fresh {5,6}
    val old = Seq((1L, 2L), (3L, 4L))
    val batch = Seq((2L, 3L), (5L, 6L))
    assert(updated(old, batch) === clustersOf(old ++ batch))
    assert(clustersOf(old ++ batch) === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (5L, 5L, true), (6L, 5L, false)))
  }

  test("empty batch leaves the artifact unchanged") {
    val old = Seq((1L, 2L), (2L, 7L), (10L, 11L))
    assert(updated(old, Seq.empty) === clustersOf(old))
  }

  test("a batch pair internal to one old cluster is a no-op self-loop") {
    val old = Seq((1L, 2L), (2L, 3L))
    assert(updated(old, Seq((1L, 3L))) === clustersOf(old))
  }

  test("seeded-random pair sets agree with full recompute under any split") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30
      val all = Seq.fill(60)((rnd.nextInt(n).toLong + 1,
        rnd.nextInt(n).toLong + 1)).filter(p => p._1 != p._2).distinct
      val (old, batch) = all.partition(_ => rnd.nextBoolean())
      assert(updated(old, batch) === clustersOf(old ++ batch),
        s"trial $trial: incremental != full recompute")
    }
  }

  test("batches compose: folding two crawls sequentially equals full") {
    val old = Seq((1L, 2L), (4L, 5L), (8L, 9L))
    val b1 = Seq((2L, 4L), (20L, 21L))
    val b2 = Seq((5L, 8L), (21L, 22L), (30L, 31L))
    val afterB1 = Dedup.updateClusters(
      Dedup.dupClusters(pairsDf(old)), pairsDf(b1))
    val got = Dedup.updateClusters(afterB1, pairsDf(b2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === clustersOf(old ++ b1 ++ b2))
  }
}
