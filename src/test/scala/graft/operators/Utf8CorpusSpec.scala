package graft.operators

import graft.SparkSpec

/** The multibyte corpus decorations must actually cover every UTF-8
  * width class — otherwise the q_utf8_* oracle family proves less than
  * it claims. */
class Utf8CorpusSpec extends SparkSpec {

  test("decorations cover 2/3/4-byte UTF-8, a surrogate pair, and a combining mark") {
    val widths = Utf8Corpus.Decos.map(_.getBytes("UTF-8").length)
    val perCp = Utf8Corpus.Decos.map(d =>
      (d.codePointCount(0, d.length), d.getBytes("UTF-8").length))
    // 2-byte: "éñ" = 4 bytes / 2 cps; 3-byte CJK = 6/2; 4-byte emoji =
    // 4/1 (and a JVM surrogate PAIR: .length 2, one code point);
    // combining mark = 3 bytes / 2 cps; € = 3/1
    assert(widths === Seq(4, 6, 4, 3, 3))
    assert(perCp === Seq((2, 4), (2, 6), (1, 4), (2, 3), (1, 3)))
    val emoji = Utf8Corpus.Decos(2)
    assert(emoji.length === 2 && emoji.codePointCount(0, emoji.length) === 1,
      "the 4-byte deco must be a surrogate pair on the JVM")
  }

  test("decorate is reproducible and char/byte counts split as UTF-8 demands") {
    import spark.implicits._
    val docs = Seq((0L, "hello"), (1L, "a b"), (2L, "x"), (3L, "yz"), (4L, "q"))
      .toDF("doc_id", "text")
    val out = Utf8Corpus.decorate(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      val d = Utf8Corpus.Decos(i)
      val txt = r.getString(1)
      assert(txt.startsWith(d + " ") && txt.endsWith(" " + d))
      assert(txt.getBytes("UTF-8").length > txt.codePointCount(0, txt.length),
        "decorated text must have more bytes than code points")
    }
  }
}
