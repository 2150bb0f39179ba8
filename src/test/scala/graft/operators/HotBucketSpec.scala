package graft.operators

import graft.SparkSpec

/** Hot-bucket capping + star rescue: a degenerate corpus where every
  * document (or embedding) lands in the same LSH bucket must not drive
  * candidate generation quadratic — but must not lose the dropped
  * members either. With `maxBucket = cap`, each bucket contributes at
  * most C(cap, 2) intra-cap pairs plus ONE star pair per dropped member
  * (vs its bucket representative), all exact-verified; the overflow
  * stays observable through [[Dedup.bucketOverflow]].
  */
class HotBucketSpec extends SparkSpec {

  private val N = 1000
  private val Cap = 32
  private val CapPairs = Cap.toLong * (Cap - 1) / 2 // 496 vs C(1000,2) = 499500
  private val Star = (N - Cap).toLong // one rescued pair per dropped member

  test("minhashPairs bounds candidates on a planted hot bucket and rescues the rest") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = (1 to N).map(i => (i.toLong, text)).toDF("doc_id", "text")

    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.9, maxBucket = Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.length.toLong === CapPairs + Star,
      s"expected C($Cap,2) capped + $Star star pairs, got ${pairs.length}")
    // intra-cap pairs: only the smallest ids survive the cap...
    assert(pairs.filter(_._2 <= Cap).forall { case (a, b) => a <= Cap && b <= Cap })
    // ...and every dropped member is rescued against the representative
    assert(pairs.filter(_._2 > Cap).toSet ===
      ((Cap + 1) to N).map(i => (1L, i.toLong)).toSet,
      "each dropped member must pair with the bucket representative")

    val audit = Dedup.bucketOverflow(
      Dedup.minhashBands(Dedup.signatures(docs, "doc_id", "text")),
      "doc_id", Seq("band", "bhash"), Cap)
      .select("band", "dropped").as[(Int, Long)].collect().toSet
    assert(audit === (0 until Dedup.Bands).map(b => (b, (N - Cap).toLong)).toSet,
      s"expected every band to report ${N - Cap} dropped members, got $audit")
  }

  test("a hot bucket over the DEFAULT 1024 cap still yields its duplicate pairs") {
    import spark.implicits._
    // > DefaultMaxBucket identical docs: the cap engages on the default
    // path (no test-sized cap), and the verified output must still cover
    // every document — C(1024,2) intra-cap pairs + one star pair per
    // dropped member, nothing silently lost.
    val n = Dedup.DefaultMaxBucket + 40
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = (1 to n).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.9)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cap = Dedup.DefaultMaxBucket.toLong
      assert(pairs.count() === cap * (cap - 1) / 2 + (n - cap))
      // no document is orphaned: all n ids appear in some verified pair,
      // so downstream dedup drops every clone of the representative
      val covered = pairs.select("doc_a").union(pairs.select("doc_b"))
        .distinct().count()
      assert(covered === n.toLong, s"only $covered of $n docs reach a pair")
    } finally pairs.unpersist()
  }

  test("rescued pairs reunite the full bucket into one dup cluster") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = (1 to N).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.9, maxBucket = Cap)
    val clusters = Dedup.dupClusters(pairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    assert(clusters.length === N, "every doc must land in the cluster relation")
    assert(clusters.map(_._2).distinct.toSeq === Seq(1L),
      "the capped hot bucket must still collapse to ONE cluster")
  }

  test("simhashPairs bounds candidates on a planted hot bucket and rescues the rest") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"word$i").mkString(" ")
    val docs = (1 to N).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHd = 0, maxBucket = Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.length.toLong === CapPairs + Star)
    assert(pairs.filter(_._2 <= Cap).forall { case (a, b) => a <= Cap && b <= Cap })
    assert(pairs.filter(_._2 > Cap).forall(_._1 === 1L))
  }

  test("lshPairs bounds candidates on a degenerate embedding cluster and rescues the rest") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => ((i % 7) + 1).toFloat)
    val vecs = (1 to N).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val pairs = Similarity.lshPairs(vecs, "vec_id", "embedding", 0.9, maxBucket = Cap)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(pairs.length.toLong === CapPairs + Star)
    assert(pairs.filter(_._2 <= Cap).forall { case (a, b) => a <= Cap && b <= Cap })
    assert(pairs.filter(_._2 > Cap).forall(_._1 === 1L))
  }

  test("bucket overflow is observed as a query metric during the normal action") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = (1 to N).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.9, maxBucket = Cap)
    pairs.collect()
    val overflow = pairs.queryExecution.observedMetrics.collect {
      case (name, row) if name.startsWith("graft_bucket_overflow_") =>
        (row.getAs[Long]("dropped_members"), row.getAs[Long]("max_bucket_members"))
    }
    // every one of the 4 bands drops N - Cap members from the one hot bucket
    assert(overflow.map(_._1).toSeq === Seq(4L * (N - Cap)),
      s"expected one overflow metric with ${4 * (N - Cap)} drops, got $overflow")
    assert(overflow.head._2 === N.toLong)
  }

  test("capping is inert below the cap: distinct docs keep exact banding results") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = (
      Seq((1L, base), (2L, base + " tail")) ++
        (10L to 19L).map(i => i -> (1 to 40).map(j => s"u${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashPairs(docs, "doc_id", "text", 0.5, maxBucket = Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minhashPairs(docs, "doc_id", "text", 0.5,
      maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === uncapped)
    assert(capped.contains((1L, 2L)))
  }
}
