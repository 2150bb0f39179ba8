package graft.operators

import graft.SparkSpec

/** Exact shared-span detection: planted verbatim runs are found with the
  * right counts, sub-window overlap is NOT reported, within-doc repeats
  * don't inflate counts, and the hot-gram cap bounds ubiquitous spans. */
class SpansSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("planted 4-word span is reported once per pair with the right text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x1 x2 the quick brown fox y1 y2"),
      (2L, "z1 the quick brown fox z2"),
      (3L, "the quick brown dog only")).toDF("doc_id", "text")
    val got = Spans.sharedSpans(docs, "doc_id", "text", w = 4)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set((1L, 2L, 1L, "the quick brown fox")))
  }

  test("a span repeated within one document still counts once per pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d a b c d"), // "a b c d" occurs twice (plus wrap grams)
      (2L, "e a b c d f")).toDF("doc_id", "text")
    val r = Spans.sharedSpans(docs, "doc_id", "text", w = 4)
      .where(col("doc_a") === 1 && col("doc_b") === 2)
      .as[(Long, Long, Long, String)].collect().head
    assert(r._3 === 1L && r._4 === "a b c d")
  }

  test("maxDf drops spans shared by more documents than the cap") {
    import spark.implicits._
    val header = "this license header is everywhere"
    val docs = (1L to 10L).map(i => (i, s"$header unique$i tail$i"))
      .toDF("doc_id", "text")
    val capped = Spans.sharedSpans(docs, "doc_id", "text", w = 5, maxDf = 5)
    assert(capped.count() === 0L, "df=10 gram must fall to the df>5 cap")
    val uncapped = Spans.sharedSpans(docs, "doc_id", "text", w = 5)
    assert(uncapped.count() === 45L, "all C(10,2) pairs without the cap")
  }
}
