package graft.operators

import graft.SparkSpec

/** [[MaxMatch]] hand-computed cases: greedy longest-match segmentation,
  * budget-prune dynamics (victims re-segment to singles next round),
  * and code-point (not byte/char) indexing for surrogate-pair emoji. */
class MaxMatchSpec extends SparkSpec {

  test("greedy longest-match keeps whole short words; singles backstop") {
    import spark.implicits._
    val docs = Seq(1L -> "abcd abcd ab cd x").toDF("doc_id", "text")
    val vocab = MaxMatch.train(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // whole words won greedily with their frequencies; every single
    // char of every word survives as the coverage backstop (cnt 0 when
    // a longer piece always won)
    assert(vocab === Set(
      ("abcd", 4L, 2L), ("ab", 2L, 1L), ("cd", 2L, 1L),
      ("a", 1L, 0L), ("b", 1L, 0L), ("c", 1L, 0L), ("d", 1L, 0L),
      ("x", 1L, 1L)))
    val enc = MaxMatch.encode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq === Seq((1L, 5L, 5L))) // one piece per word
  }

  test("budget prune: beyond-budget pieces re-segment to singles") {
    import spark.implicits._
    // 30 distinct 2-char words: 'aa'..'dd' plus frequency skew — the
    // budget (24) keeps the most frequent; the 6 prune victims (cnt
    // ASC, piece DESC boundary) become 2 singles each at encode
    val letters = "abcdef"
    val words = (for { x <- letters; y <- letters } yield s"$x$y").take(30)
    val text = (words ++ words.take(10)).mkString(" ") // skew: first 10 twice
    val docs = Seq(1L -> text).toDF("doc_id", "text")
    val vocab = MaxMatch.train(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val multi = vocab.filter(_._1.length > 1)
    assert(multi.length === MaxMatch.VocabBudget)
    // the kept set is exactly: the 10 doubled words, then the
    // lexicographically-first 14 of the 20 singletons
    val doubled = words.take(10).toSet
    val keptSingletons = words.drop(10).sorted.take(14).toSet
    assert(multi.map(_._1).toSet === (doubled ++ keptSingletons))
    val enc = MaxMatch.encode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // 40 word tokens; kept words = 1 piece, 6 pruned words = 2 pieces
    assert(enc === ((40L, 40L + 6L)))
  }

  test("surrogate-pair emoji segment by code points") {
    import spark.implicits._
    val emoji = new String(Character.toChars(0x1f600))
    val w = emoji + emoji + "ab" // 4 code points, 6 JVM chars, 10 bytes
    val docs = Seq(1L -> s"$w $w cd").toDF("doc_id", "text")
    val vocab = MaxMatch.train(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the whole 4-code-point word is ONE piece of piece_len 4 — byte or
    // JVM-char indexing would shear the surrogate pair and never form it
    assert(vocab.contains((w, 4L, 2L)))
    val enc = MaxMatch.encode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq === Seq((1L, 3L, 3L)))
  }

  test("words over MaxWordChars drop from both outputs identically") {
    import spark.implicits._
    val long = "z" * (MaxMatch.MaxWordChars + 1)
    val docs = Seq(1L -> s"ab $long ab").toDF("doc_id", "text")
    val vocab = MaxMatch.train(docs, "doc_id", "text", rounds = 2)
      .collect().map(_.getString(0))
    assert(!vocab.contains("z")) // the long word never seeds pieces
    val enc = MaxMatch.encode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(enc === ((2L, 2L))) // the dropped word counts nowhere
  }
}
