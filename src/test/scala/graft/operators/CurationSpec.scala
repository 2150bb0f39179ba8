package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation-surface operators: BM25 retrieval, Gopher rule gates,
  * asymmetric n-gram containment (q_bm25 / q_gopher_rules /
  * q_ngram_containment). */
class CurationSpec extends SparkSpec {

  test("bm25TopK matches the hand-computed integer-exact scores") {
    import spark.implicits._
    // corpus: d1 = "x x y" (dl 3), d2 = "x z z z" (dl 4), d3 = "y y y"
    // (dl 3); query = {x}. N = 3, S = 10.
    //   df(x) = 2 → idf_ppm = (2·1+1)·10⁶ div 5 = 600000
    //   d1: tf 2 → floor(600000·2·22·10 / (10·10·2 + 3·10 + 9·3·3))
    //            = floor(264e6 / 311) = 848874
    //   d2: tf 1 → floor(132e6 / (100 + 30 + 108)) = floor(132e6/238)
    //            = 554621
    //   d3: no x → absent
    val docs = Seq((1L, "x x y"), (2L, "x z z z"), (3L, "y y y"))
      .toDF("doc_id", "text")
    val terms = Seq("x").toDF("word")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, 10)
      ._2.as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 848874L, 1L), (2L, 554621L, 2L)))
  }

  test("bm25TopK rewards shorter documents at equal term frequency") {
    import spark.implicits._
    val docs = Seq((1L, "x a b c d e f g"), (2L, "x a b")).toDF("doc_id", "text")
    val terms = Seq("x").toDF("word")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, 2)
      ._2.as[(Long, Long, Long)].collect()
      .map { case (id, sc, _) => id -> sc }.toMap
    assert(got(2L) > got(1L), s"short doc must outrank long: $got")
  }

  test("gopherRules: each gate fires on its designed violation, keep is the conjunction") {
    import spark.implicits._
    // g: n=10, chars=36, stop {the,the,and}=3, max_tf(the)=2 → all pass
    // s: n=4 ≥ 3 but zero stopwords → r_stop = 0
    // l: n=2 < minWords 3 → r_len = 0
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog runs far"),
      (2L, "quick brown foxes jump"),
      (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9)))
      .toMap
    assert(got(1L) === ((1, 1, 1, 1, 1)))
    // doc 2: len ok, wordlen ok (18 chars, 12..40), no stopwords,
    // max_tf 1 → 5 > 4 fails dominance too
    assert(got(2L)._1 === 1)
    assert(got(2L)._3 === 0)
    assert(got(2L)._5 === 0)
    // doc 3: too short; 1-char words also fail the mean-word-length gate
    assert(got(3L)._1 === 0)
    assert(got(3L)._5 === 0)
  }

  test("importanceWeights matches the hand-computed ppm likelihood ratios") {
    import spark.implicits._
    // target t1 = "x y", raw r1 = "x z"; tot_t = 2, tot_r = 4 (the raw
    // pool is the WHOLE corpus, target included).
    //   x: cnt_r 2, cnt_t 1 → (1·4·10⁶) div (2·2) = 1e6   (same rate)
    //   y: cnt_r 1, cnt_t 1 → (1·4·10⁶) div (1·2) = 2e6   (target-heavy)
    //   z: cnt_r 1, cnt_t 0 → 0                            (absent)
    //   t1: weight 3e6, w_per_tok 1.5e6; r1: weight 1e6, w_per_tok 5e5
    val docs = Seq((1L, "x y", 1), (2L, "x z", 0)).toDF("doc_id", "text", "t")
    val got = Retrieval.importanceWeights(docs, "doc_id", "text", col("t") === 1)
      ._2.as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, w, wpt) => id -> ((n, w, wpt)) }.toMap
    assert(got(1L) === ((2L, 3000000L, 1500000L)))
    assert(got(2L) === ((2L, 1000000L, 500000L)))
  }

  test("bpePairCounts weights pairs by corpus word frequency") {
    import spark.implicits._
    // corpus words: abc ×2, ab ×1 → pairs: ab = 2(abc) + 1(ab) = 3, bc = 2
    val docs = Seq((1L, "abc ab"), (2L, "abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(got === Map("ab" -> 3L, "bc" -> 2L))
  }

  test("ngramContainment is directional: a quoted doc hits 1.0, its container does not") {
    import spark.implicits._
    // A's 3 shingles all occur in B (A is a prefix quote of B);
    // B has 5 shingles, only 3 shared → containment B→A = 0.6 < 0.7.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val got = Dedup.ngramContainment(docs, "doc_id", "text", threshold = 0.7)
      ._2.as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0)))
  }

  test("ngramContainment emits both directions for exact duplicates") {
    import spark.implicits._
    val docs = Seq((1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramContainment(docs, "doc_id", "text", threshold = 0.99)
      ._2.as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("the returned cache handle releases the tf relation on unpersist") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val terms = Seq("x").toDF("word")
    val (cached, out) = Retrieval.bm25TopK(docs, "doc_id", "text", terms, 10)
    out.collect()
    assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk,
      "tf relation should be persisted while the result is alive")
    cached.unpersist(blocking = true)
    assert(cached.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "library callers must be able to release the cache without clearCache()")
  }
}
