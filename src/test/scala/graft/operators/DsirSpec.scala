package graft.operators

import graft.SparkSpec

/** DSIR importance weights: sign semantics (target-like positive,
  * anti-target negative), feature-count arithmetic, determinism. */
class DsirSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def score(raw: Seq[(Long, String)],
      target: Seq[(Long, String)], m: Int = 1024)
      : Map[Long, (Long, Long, Boolean)] = {
    import spark.implicits._
    def df(rows: Seq[(Long, String)]): DataFrame =
      rows.toDF("doc_id", "text")
    Dsir.dsirWeights(df(raw), df(target), "doc_id", "text", m)
      .selectExpr("doc_id", "n_feats", "logratio_micro", "kept")
      .as[(Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  // raw corpus: two docs of target-style vocabulary, two of junk;
  // target sample: the target-style vocabulary only
  private val targetDocs = Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "beta gamma alpha"))
  private val rawDocs = Seq(
    (1L, "alpha beta gamma"),
    // word order matters: bigrams are features, so this doc follows
    // the target's alpha->beta->gamma order (a doc with "beta alpha"
    // would carry a never-in-target bigram, and ONE unseen n-gram
    // outweighs many weak positives — correct DSIR behavior, exercised
    // by the junk docs below)
    (2L, "alpha beta gamma alpha"),
    (3L, "zz yy xx ww"),
    (4L, "qq rr ss"))

  test("target-vocabulary docs score positive, junk docs negative; " +
      "kept mirrors the sign") {
    val got = score(rawDocs, targetDocs)
    assert(got(1L)._2 > 0L && got(1L)._3, s"target-like must keep: $got")
    assert(got(2L)._2 > 0L && got(2L)._3)
    assert(got(3L)._2 < 0L && !got(3L)._3, s"junk must drop: $got")
    assert(got(4L)._2 < 0L && !got(4L)._3)
  }

  test("n_feats counts unigrams plus bigrams WITH multiplicity: a " +
      "3-word doc has 3 + 2 = 5 features; a 1-word doc has 1") {
    val got = score(Seq((1L, "a b c"), (2L, "solo")), targetDocs)
    assert(got(1L)._1 === 5L)
    assert(got(2L)._1 === 1L)
  }

  test("empty-text docs emit no features and drop; scoring is " +
      "deterministic across runs") {
    val a = score(rawDocs :+ (9L, "   "), targetDocs)
    assert(!a.contains(9L))
    assert(a === score(rawDocs :+ (9L, "   "), targetDocs))
  }

  test("a doc repeating target n-grams outranks one merely touching " +
      "them (multiplicity matters)") {
    val got = score(Seq(
      (1L, "alpha beta gamma alpha beta gamma"),
      (2L, "alpha zz yy xx ww qq")), targetDocs)
    assert(got(1L)._2 > got(2L)._2)
  }

  test("Gumbel resample: k rows, dense rank in key order, " +
      "reproducible under the same salt, redrawn under another") {
    import spark.implicits._
    def draw(salt: Long) = Dsir.dsirResample(
        rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
        "doc_id", "text", k = 2, salt = salt)
      .selectExpr("doc_id", "key_micro", "rk")
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val a = draw(0L)
    assert(a.size === 2 && a.map(_._3) === Seq(1L, 2L))
    assert(a.head._2 >= a(1)._2, "rank must follow the key order")
    assert(a === draw(0L), "same salt must reproduce the draw")
    // different salts redraw the noise; keys must differ even when
    // the sampled SET happens to coincide
    val b = draw(1L)
    assert(a.map(_._2) !== b.map(_._2))
  }
}
