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

  test("rounds < 1 rejects up front (oracle generator shares the guard)") {
    import spark.implicits._
    val docs = Seq(1L -> "ab").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      MaxMatch.train(docs, "doc_id", "text", rounds = 0)
    }
  }

  test("train runs exactly `rounds` segmentation passes (encode is lazy)") {
    import spark.implicits._
    // count Spark jobs via a listener: train(rounds = 2) runs its two
    // eager training passes; since round 12 the single-join segment has
    // NO eager checkpoints of its own, so building the encode plan adds
    // ZERO jobs over train — the final pass only runs when the consumer
    // acts (the pay-only-when-applied discipline, now fully lazy)
    val docs = Seq(1L -> "abcd ab cd").toDF("doc_id", "text")
    val before = countSegmentJobs { MaxMatch.train(docs, "doc_id", "text", rounds = 2) }
    val planOnly = countSegmentJobs { MaxMatch.encode(docs, "doc_id", "text", rounds = 2) }
    assert(planOnly === before)
    val drained = countSegmentJobs {
      MaxMatch.encode(docs, "doc_id", "text", rounds = 2).collect()
    }
    assert(drained > before)
  }

  private def countSegmentJobs(body: => Any): Int = {
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // the bus is async: spin until the count stabilizes (actions have
      // returned, so every jobStart is already posted — only delivery lags)
      var last = -1
      var spins = 0
      while (jobs != last && spins < 50) {
        last = jobs; spins += 1; Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(l)
    jobs
  }

  test("viterbi beats greedy where longest-match corners itself") {
    import spark.implicits._
    // vocab {abcd, abc, def} + singles: greedy on "abcdef" takes abcd,
    // leaving "ef" to segment as 2 singles (3 tokens); the DP finds
    // abc + def (2 tokens, usage 9 + 7 = 16)
    val wf = Seq(("abcdef", 1L)).toDF("word", "freq")
    val scored = (Seq("abcd" -> 5L, "abc" -> 9L, "def" -> 7L) ++
      "abcdef".map(c => c.toString -> 0L)).toDF("piece", "cnt")
    val pw = MaxMatch.viterbiTokens(wf, scored, maxSteps = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(pw.toSeq === Seq(("abcdef", 2L, 16L)))
  }

  test("viterbi tie-break prefers the higher-usage equal-length split") {
    import spark.implicits._
    // two 2-token splits of "abcd": ab|cd (usage 3+3=6) vs a?|... only
    // via abc|d (9+0=9) — the packed key picks 9
    val wf = Seq(("abcd", 1L)).toDF("word", "freq")
    val scored = (Seq("ab" -> 3L, "cd" -> 3L, "abc" -> 9L) ++
      "abcd".map(c => c.toString -> 0L)).toDF("piece", "cnt")
    val pw = MaxMatch.viterbiTokens(wf, scored, maxSteps = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(pw.toSeq === Seq((2L, 9L)))
  }

  test("per word, viterbi token count never exceeds greedy's") {
    import spark.implicits._
    // one word per doc over a skewed corpus: doc-level n_tokens then IS
    // the per-word count under the SAME trained vocabulary for both
    // decoders, so the optimality invariant is directly comparable
    val letters = "abcde"
    val ws = for { x <- letters; y <- letters; z <- Seq("", "a", "ab") }
      yield s"$x$y$z"
    val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val greedy = MaxMatch.encode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val vit = MaxMatch.viterbiEncode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(vit.keySet === greedy.keySet)
    assert(vit.forall { case (d, n) => n <= greedy(d) })
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
