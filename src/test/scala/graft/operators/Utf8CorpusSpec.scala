package graft.operators

import graft.SparkSpec

/** The multibyte corpus decorations must actually cover every UTF-8
  * width class — otherwise the q_utf8_* oracle family proves less than
  * it claims. */
class Utf8CorpusSpec extends SparkSpec {

  test("decorations cover 2/3/4-byte UTF-8, a surrogate pair, and a combining mark") {
    val widths = Utf8Corpus.Decos.take(5).map(_.getBytes("UTF-8").length)
    val perCp = Utf8Corpus.Decos.take(5).map(d =>
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

  test("real-script decorations: CJK run, RTL, mixed-script, U+3000, over-cap") {
    def cps(s: String) = s.codePointCount(0, s.length)
    val cjkRun = Utf8Corpus.Decos(5)
    assert(cps(cjkRun) === 8 && !cjkRun.contains(' '),
      "unspaced CJK run must be ONE word of 8 code points")
    assert(cjkRun.getBytes("UTF-8").length === 24, "all 3-byte chars")
    val rtl = Utf8Corpus.Decos(6)
    assert(rtl.count(_ == ' ') === 1, "RTL deco is two space-separated words")
    assert(rtl.exists(c => c >= 0x05d0 && c <= 0x05ea), "has Hebrew")
    assert(rtl.exists(c => c >= 0x0620 && c <= 0x064a), "has Arabic")
    val mixed = Utf8Corpus.Decos(7)
    assert(mixed.startsWith("foo") && mixed.endsWith("bar") &&
      cps(mixed) === 8, "mixed-script single word")
    val ideo = Utf8Corpus.Decos(8)
    assert(ideo.exists(_ == '\u3000') && !ideo.contains(' '),
      "U+3000 must stay inside the word (not an ASCII split point)")
    val overCap = Utf8Corpus.Decos(9)
    assert(cps(overCap) === UnigramLM.WordCap + 1,
      "over-cap run must exceed WordCap by exactly one")
  }

  test("the word model keeps CJK runs whole and the trainers segment " +
      "them into pieces (the documented space-free-script contract)") {
    import spark.implicits._
    // doc 5 gets the 8-char CJK run; the run must be ONE word that the
    // unigram trainer segments into >= 2 pieces of <= MaxPieceLen
    val docs = Seq((5L, "just ascii here")).toDF("doc_id", "text")
    val dec = Utf8Corpus.decorate(docs, "doc_id", "text")
    val words = dec.selectExpr(
      s"explode(${graft.operators.Dedup.wordsExpr("text")}) AS w")
      .as[String].collect()
    val run = Utf8Corpus.Decos(5)
    assert(words.count(_ == run) === 2, "run must survive as a whole word")
    val enc = UnigramLM.encode(dec, "doc_id", "text", rounds = 1)
      .as[(Long, Long, Long, Long)].collect().head
    assert(enc._2 === 5L, "3 ascii words + 2 runs, all within WordCap")
    assert(enc._3 >= enc._2 + 2,
      "the 8-char runs must each cost >= 2 pieces (MaxPieceLen is 4)")
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
