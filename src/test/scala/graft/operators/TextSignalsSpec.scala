package graft.operators

import graft.SparkSpec

/** Repetition + compressibility signals: hand-computed values on crafted
  * documents, and the discriminative property the filters exist for
  * (degenerate text scores high repetition / low deflate ratio). */
class TextSignalsSpec extends SparkSpec {

  test("repetitionSignals: hand-checked 2-gram stats") {
    import spark.implicits._
    // words: a b a b c  -> 2-grams: "a b","b a","a b","b c"
    // n=4, distinct=3, top=2/4, dup=2/4; words: 5 total 3 distinct -> 2/5
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(r === ((1L, 4L, 3L, 0.5, 0.5, 0.4)))
  }

  test("repetitionSignals: boilerplate scores above natural-ish text") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(50)("buy now").mkString(" ")),
      (2L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .select("doc_id", "dup_gram_frac").as[(Long, Double)].collect().toMap
    assert(m(1L) === 1.0, "pure repetition -> every gram duplicated")
    assert(m(2L) === 0.0, "all-distinct words -> no duplicated grams")
  }

  test("compressionRatio: repetitive text compresses far below varied text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 500),
      (2L, (1 to 500).map(i => (i * 2654435761L).toHexString).mkString(" ")),
      (3L, ""),
      (4L, null: String)).toDF("doc_id", "text")
    val rows = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, c1, ratio1) = rows(1L)
    assert(n1 === 2500L && c1 > 0 && ratio1 < 0.02,
      s"500x-repeated token must deflate hard, got $ratio1")
    assert(rows(2L)._4 > 0.3,
      s"high-entropy text must not, got ${rows(2L)._4}")
    assert(rows(3L)._4 === 1.0, "empty doc pins ratio at 1.0")
    // 8 bytes = zlib's empty-stream frame (header + empty block + adler)
    assert(rows(4L) === ((4L, 0L, 8L, 1.0)), "NULL text reads as empty")
    assert(rows(3L)._2 === 0L && rows(3L)._3 === 8L,
      "empty and NULL text produce identical signals")
    // ratio is exactly compressed/raw rounded to 4dp
    assert(ratio1 === math.rint(c1.toDouble / n1 * 10000) / 10000)
  }

  test("bpeMerges: hand-computed 3-round trainer on a toy corpus") {
    import spark.implicits._
    // corpus words: abab×3, ab×1, cd×1
    // round 1 pairs: (a,b) = 3·2 + 1 = 7, (b,a) = 3, (c,d) = 1 → merge ab
    // round 2 vocab: [ab,ab]×3, [ab]×1, [c,d]×1
    //   pairs: (ab,ab) = 3, (c,d) = 1 → merge abab
    // round 3 vocab: [abab]×3, [ab]×1, [c,d]×1 → only (c,d) = 1 → merge cd
    val docs = Seq((1L, "abab abab"), (2L, "abab ab cd"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bpeMerges(docs, "doc_id", "text", rounds = 3)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "a", "b", 7L),
      (2L, "ab", "ab", 3L),
      (3L, "c", "d", 1L)))
  }

  test("bpeMerges: greedy LEFT-to-right non-overlapping application") {
    import spark.implicits._
    // "aaa": round-1 (a,a) counts 2 (overlapping pairs both count), the
    // merge consumes greedily from the left → [aa, a], so round 2 sees
    // (aa, a) = 1, NOT (a, aa)
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bpeMerges(docs, "doc_id", "text", rounds = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)))
  }

  test("bpeEncode: per-doc token counts under the learned segmentation") {
    import spark.implicits._
    // after 2 merges (ab, then abab): "abab"→1 piece, "ab"→1, "cd"→2
    val docs = Seq((1L, "abab abab"), (2L, "abab ab cd"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 2L, 2L), // 2 words, each "abab" = one piece
      (2L, 3L, 4L))) // abab(1) + ab(1) + cd(2 pieces: no cd merge yet)
    // round 3 learns cd as well → doc 2 drops to 3 tokens
    val got3 = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", rounds = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got3 === Seq((1L, 2L, 2L), (2L, 3L, 3L)))
  }

  test("bpe merge exhaustion: extra rounds are no-ops, never a vocabulary wipe") {
    import spark.implicits._
    // single-char words: ZERO mergeable pairs — every round's argmax is
    // empty; encode must still count one piece per word
    val docs = Seq((1L, "a b"), (2L, "b")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis
      .bpeMerges(docs, "doc_id", "text", rounds = 2).collect()
    assert(merges.isEmpty, "no pairs → no merges emitted")
    val enc = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(enc === Seq((1L, 2L, 2L), (2L, 1L, 1L)))
    // exhaustion AFTER real merges: "ab ab" learns ab in round 1, rounds
    // 2-3 are dry; counts must reflect the round-1 merge only
    val docs2 = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val enc2 = graft.operators.TextAnalysis
      .bpeEncode(docs2, "doc_id", "text", rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc2 === Seq((1L, 2L, 2L)))
  }

  test("bpeMergesBytes: byte-level symbols re-join a multibyte character") {
    import spark.implicits._
    // word "é" (U+00E9) is UTF-8 bytes C3 A9 — at byte level it starts
    // as TWO hex-pair symbols; with "éé" x2 the top pair is (C3, A9)
    // (count 2 words x 2 occurrences... per word "éé": symbols
    // C3 A9 C3 A9 → pairs (C3,A9)x2, (A9,C3)x1; freq 2 → counts 4, 2)
    val docs = Seq((1L, "\u00e9\u00e9 \u00e9\u00e9")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bpeMergesBytes(docs, "doc_id", "text", rounds = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "C3", "A9", 4L),      // the multibyte char re-joined
      (2L, "C3A9", "C3A9", 2L))) // then the full 2-char word
    // encode: after 2 rounds "éé" is ONE piece per word
    val enc = graft.operators.TextAnalysis
      .bpeEncodeBytes(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc === Seq((1L, 2L, 2L)))
    // at CHAR level round 1 already merges the two-codepoint word —
    // byte level needs the extra round, which is exactly the difference
    val charEnc = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", rounds = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(charEnc === Seq((1L, 2L, 2L)))
  }

  test("phraseTag: overlapping and nested dictionary hits all count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),    // "a b" at 1 and 4 (overlap "b c a" at 2)
      (2L, "x b c a y"),    // "b c a" at 2 only
      (3L, "")).toDF("doc_id", "text")
    val dict = Seq("a b", "b c a").toDF("phrase")
    val got = graft.operators.TextAnalysis
      .phraseTag(docs, "doc_id", "text", dict)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, "a b", 2L, 1L), (1L, "b c a", 1L, 2L),
      (2L, "b c a", 1L, 2L)))
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.phraseTag(docs, "doc_id", "text",
        Seq.empty[String].toDF("phrase"))
    }
  }

  test("tokenBudgetMix: equal-share budget, under-budget domains intact") {
    import spark.implicits._
    // domain "big": 60 docs x 10 tokens = 600; "small": 10 docs x 2 = 20
    // global = 620, budget = 620 div 2 = 310: small is under budget
    // (20 <= 310) so EVERY small doc must survive the keep rule; big is
    // ~2x over budget so some docs must fall (md5 buckets are fixed, so
    // the exact kept set is stable — we assert the provable invariants)
    val docs = ((1 to 60).map(i =>
        (i.toLong, ("w" * 3 + " ") * 9 + "www", "big")) ++
      (61 to 70).map(i => (i.toLong, "a b", "small")))
      .toDF("doc_id", "text", "dom")
    val out = graft.operators.TextAnalysis
      .tokenBudgetMix(docs, "doc_id", "text", "dom")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val big = out("big"); val small = out("small")
    assert(big._2 === 60L && big._3 === 600L)
    assert(small._2 === 10L && small._3 === 20L)
    assert(big._4 === 310L && small._4 === 310L) // 620 div 2
    // under budget: all docs and tokens kept, exactly
    assert(small._5 === 10L && small._6 === 20L)
    // over budget: strictly fewer kept; the keep rate targets
    // budget/total ~ 52% — allow a wide deterministic band
    assert(big._5 < 60L && big._5 > 10L)
    assert(big._6 === big._5 * 10L) // every big doc is 10 tokens
  }

  test("codeFences: tagged/untagged blocks, unclosed trailing fence " +
      "runs to EOF, fence-free docs yield nothing") {
    import spark.implicits._
    val md1 = "Intro.\n```scala\nval x = 1\n```\nMid.\n```\nplain\n```\nEnd."
    val md2 = "Open only:\n```py\nwhile True: pass" // unclosed
    val md3 = "no fences at all"
    val got = TextAnalysis.codeFences(
        Seq((1L, md1), (2L, md2), (3L, md3)).toDF("id", "t"), "id", "t")
      .selectExpr("doc_id", "fence_idx", "lang", "code")
      .as[(Long, Long, String, String)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 0L, "scala", "val x = 1\n"),
      (1L, 1L, "", "plain\n"),
      (2L, 0L, "py", "while True: pass")))
  }

  test("confusables map is 1:1 (translate silently drops on length " +
      "mismatch) and every target is ASCII Latin") {
    assert(TextAnalysis.ConfusablesFrom.codePointCount(0,
      TextAnalysis.ConfusablesFrom.length) ===
      TextAnalysis.ConfusablesTo.length)
    assert(TextAnalysis.ConfusablesTo.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    assert(TextAnalysis.ConfusablesFrom.forall(_ > 0x7f),
      "sources must be non-ASCII lookalikes")
  }

  test("homoglyphSkeleton collapses Cyrillic/Greek spoofs onto the " +
      "Latin key and keeps genuinely different texts apart") {
    import spark.implicits._
    val rows = Seq(
      (1L, "paypal offer"),
      (2L, "pаypаl оffеr"), // Cyrillic а о е
      (3L, "PΑYPΑL ΟFFΕR"), // Greek capitals Α Ο Ε
      (4L, "paypal offers")) // different text stays distinct
      .toDF("id", "t")
    val got = rows.select($"id",
        TextAnalysis.homoglyphSkeleton($"t").as("sk"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "paypal offer")
    assert(got(2L) === got(1L))
    assert(got(3L) === got(1L))
    assert(got(4L) !== got(1L))
  }
}
