package graft.operators

import graft.SparkSpec

/** Unigram-LM hard-EM trainer (SURVEY.md §2.11 tokenizer family). */
class UnigramLMSpec extends SparkSpec {

  // floor(1e6·ln(x)) constants used by the hand traces below
  private val Ln3 = 1098612L   // ln(12/4)
  private val Ln1_5 = 405465L  // ln(6/4)
  private val Ln4 = 1386294L   // ln(8/2)

  test("train on a one-word corpus keeps singles and promotes the word") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val got = UnigramLM.train(docs, "doc_id", "text", rounds = 2)
      .as[(String, Long, Long)].collect().toSet
    // seed: a:3 b:3 ab:3 → round 1 scores all ln(12/4): [ab] (1 piece)
    // beats [a,b]; prune keeps singles (unused → 0) + ab (3)
    assert(got === Set(("a", 1L, 0L), ("b", 1L, 0L), ("ab", 2L, 3L)))
  }

  test("encode publishes exact micro-nat segmentation costs") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val got = UnigramLM.encode(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long, Long)].collect().head
    // final scores: tot=3, |V|=3 → s(ab)=floor(1e6·ln(6/4)); each word
    // segments as [ab]: 3 words, 3 tokens, 3·405465 micro-nats
    assert(got === ((1L, 3L, 3L, 3L * Ln1_5)))
  }

  test("equal-score ties break by path code: shortest FIRST piece wins") {
    import spark.implicits._
    val docs = Seq((7L, "abcde")).toDF("doc_id", "text")
    // seed: all 14 substrings have cnt 1 → equal scores → any 2-piece
    // split of 5 chars ties on score; the packed path code is minimal
    // for [a, bcde] (first digit 0), so usage must be exactly {a, bcde}
    val got = UnigramLM.train(docs, "doc_id", "text", rounds = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 1L), ("b", 1L, 0L), ("c", 1L, 0L),
      ("d", 1L, 0L), ("e", 1L, 0L), ("bcde", 4L, 1L)))
    val enc = UnigramLM.encode(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long, Long)].collect().head
    // round-3 scores: tot=2, |V|=6 → s(a)=s(bcde)=floor(1e6·ln(8/2))
    assert(enc === ((7L, 1L, 2L, 2L * Ln4)))
  }

  test("a WordCap-length word segments at the path code's maximum width") {
    import spark.implicits._
    // 12 distinct chars → every multi-char substring is unique (cnt 1,
    // same smoothed score as singles), so the 1-piece... no: pieces are
    // capped at 4 chars, so the best segmentation is 3 pieces of 4; the
    // worst-case PATH (12 single-char digits, the packing's full width)
    // is still representable — pin both ends via a singles-only vocab.
    val w = "abcdefghijkl" // exactly WordCap chars
    val docs = Seq((1L, w)).toDF("doc_id", "text")
    val full = UnigramLM.encode(docs, "doc_id", "text", rounds = 1)
      .as[(Long, Long, Long, Long)].collect().head
    assert(full._3 === 3L, s"4+4+4 pieces expected: $full")
    // singles-only vocabulary forces the 12-digit path — the boundary
    // the 2^26 field width was sized for
    val singles = w.map(c => (c.toString, 1L)).toDF("piece", "cnt")
    val served = UnigramLM.encodeWith(docs, "doc_id", "text", singles)
      .as[(Long, Long, Long, Long)].collect().head
    assert(served._3 === 12L, s"12 single-char pieces expected: $served")
  }

  test("encodeWith a persisted vocabulary equals the inline train→encode") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab abcde"), (2L, "cd ab")).toDF("doc_id", "text")
    val inline = UnigramLM.encode(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("uni_vocab").toString
    UnigramLM.train(docs, "doc_id", "text", rounds = 2)
      .write.mode("overwrite").parquet(dir)
    val served = UnigramLM.encodeWith(docs, "doc_id", "text",
      spark.read.parquet(dir))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(served === inline)
  }

  test("training is deterministic and words over WordCap are dropped") {
    import spark.implicits._
    val long = "x" * (UnigramLM.WordCap + 1)
    val docs = Seq((1L, s"ab $long"), (2L, "ab cd")).toDF("doc_id", "text")
    val a = UnigramLM.train(docs, "doc_id", "text", rounds = 2)
      .as[(String, Long, Long)].collect().toSet
    val b = UnigramLM.train(docs, "doc_id", "text", rounds = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(a === b)
    assert(!a.exists(_._1.contains("x")), "over-cap word must not seed vocab")
    val enc = UnigramLM.encode(docs, "doc_id", "text", rounds = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(enc === Map(1L -> 1L, 2L -> 2L)) // the long word drops from n_words
  }
}
