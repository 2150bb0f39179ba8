package graft.operators

import graft.{SparkSpec, Tables}

class ReadabilitySpec extends SparkSpec {

  test("hand-traced Flesch: two short sentences") {
    import spark.implicits._
    // words: hello(2 syl) world.(1) this(1) is(1) fine!(2) -> 7 syl,
    // 5 words, 2 sentences; wps=2500 spw=1400:
    // flesch = 206835 - 2537 - 118440 = 85858; grade = 975+16520-15590
    val docs = Seq((1L, "Hello world. This is fine!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((5L, 2L, 7L)))
    assert(r.getLong(4) === 85858L)
    assert(r.getLong(5) === 1905L)
  }

  test("unpunctuated text is one sentence; vowelless words get 1 syllable") {
    import spark.implicits._
    val docs = Seq((1L, "tsk tsk hmm")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text").collect().head
    assert(r.getLong(2) === 1L)
    assert(r.getLong(3) === 3L) // minimum 1 per word
  }

  test("corpus: denser prose scores lower ease than terse notes") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rows = TextAnalysis.readability(docs, "doc_id", "text").collect()
    assert(rows.length > 0)
    // longer docs (1 synthetic 'sentence') must have lower ease:
    // flesch is monotone-decreasing in words-per-sentence at fixed spw
    val byWords = rows.sortBy(_.getLong(1))
    assert(byWords.head.getLong(4) > byWords.last.getLong(4))
  }
}
