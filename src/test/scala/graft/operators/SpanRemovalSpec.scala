package graft.operators

import graft.SparkSpec

/** [[Spans.removeRepeatedSpans]] positional semantics, hand-computed at
  * w=3: coverage is the UNION of duplicated windows (overlaps don't
  * double-remove), intra-document repeats count toward minCount, short
  * docs pass through untouched, and a fully-covered doc survives as an
  * empty row rather than disappearing. */
class SpanRemovalSpec extends SparkSpec {

  test("removeRepeatedSpans: union coverage, intra-doc repeats, full scrub") {
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share the 3-gram "x y z" (cross-doc duplicate);
      // doc 1: words a x y z b -> positions 1..3 covered, keeps "a b"
      1L -> "a x y z b",
      2L -> "c d x y z",        // keeps "c d"
      // doc 3: "p q r p q r" — "p q r" occurs twice INTRA-doc (starts
      // 0 and 3), and "q r p"/"r p q" each occur once; windows 0-2 and
      // 3-5 cover everything -> fully scrubbed
      3L -> "p q r p q r",
      // doc 4: too short for any 3-gram, untouched
      4L -> "s t",
      // doc 5: all unique grams, untouched
      5L -> "e f g h i")
    val got = Spans.removeRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", w = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 5L, 3L, "a b"),
      (2L, 5L, 3L, "c d"),
      (3L, 6L, 6L, ""),
      (4L, 2L, 0L, "s t"),
      (5L, 5L, 0L, "e f g h i")))
  }

  test("removeRepeatedSpans: minCount above the repeat count keeps everything") {
    import spark.implicits._
    val docs = Seq(1L -> "a x y z b", 2L -> "c d x y z")
    val got = Spans.removeRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", w = 3, minCount = 3L)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._3) === Seq(0L, 0L))
    assert(got.map(_._4) === Seq("a x y z b", "c d x y z"))
  }
}
