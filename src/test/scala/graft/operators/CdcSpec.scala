package graft.operators

import graft.SparkSpec

/** Content-defined chunking: shift-invariant sub-document dedup. */
class CdcSpec extends SparkSpec {

  private def doc(prefix: String, n: Int, tag: String) =
    (prefix + (1 to n).map(i => s"$tag$i").mkString(" ")).trim

  test("an identical copy is 100% chunk-duplicated") {
    import spark.implicits._
    val s = doc("", 80, "s")
    val got = Cdc.dedupReport(
        Seq((1L, s), (2L, s)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    val (d1, d2) = (got(0), got(1))
    assert(d1._4 === 0L, s"first copy must own every chunk: $d1")
    assert(d2._4 === d2._2 && d2._5 === d2._3 && d2._6 === 1000000L,
      s"second copy must be fully duplicated: $d2")
  }

  test("chunking is shift-invariant: a shared suffix dedups despite " +
      "a different prefix") {
    import spark.implicits._
    // A = 5 junk words + S, B = S alone. Boundary decisions inside S
    // coincide from 2 words in, so after the first common boundary all
    // later chunks are identical across the two documents.
    val s = doc("", 100, "s")
    val a = doc("j1 j2 j3 j4 j5 ", 100, "s")
    val inst = Cdc.chunkInstances(
        Seq((1L, a), (2L, s)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    val dups = inst.filter(_._5 == 1L)
    assert(dups.nonEmpty, "shared suffix must produce duplicate chunks")
    // every duplicate's hash occurs at least twice (internal consistency)
    val byHash = inst.groupBy(_._3).view.mapValues(_.length).toMap
    dups.foreach(d => assert(byHash(d._3) >= 2, s"dangling dup: $d"))
    // and the duplicated mass is substantial: everything after the
    // first common boundary inside the 100-word suffix
    assert(dups.map(_._4).sum >= 50L,
      s"expected most of the suffix deduplicated, got ${dups.map(_._4).sum}")
  }

  test("within-document repetition is caught") {
    import spark.implicits._
    val block = doc("", 60, "b")
    val got = Cdc.dedupReport(
        Seq((1L, block + " " + block)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._5 > 0L, s"repeated block must self-dedup: $got")
  }
}
