package graft.operators

import graft.SparkSpec

/** [[LanguageModel.perplexity]] vs a plain-Scala stupid-backoff LM,
  * on a corpus built to hit every branch: seen bigram, unseen bigram
  * over seen words (backoff), and a fully OOV word (backoff through the
  * Laplace +1 floor). */
class LanguageModelSpec extends SparkSpec {

  test("perplexity matches a hand-rolled stupid-backoff bigram LM") {
    import spark.implicits._
    val train = Seq(
      10L -> "a b a b c",
      12L -> "b c a a")
    val score = Seq(
      1L -> "a b c",   // bigrams (a,b) seen, (b,c) seen
      3L -> "c b a",   // (c,b) UNSEEN -> backoff; (b,a) seen in train
      5L -> "a zzz b") // zzz fully OOV: backoff with c1=0, then (zzz,b) backoff
    val got = LanguageModel.perplexity(
        train.toDF("doc_id", "text"), score.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

    // reference: counts from train
    val toks = train.map(_._2.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val big = toks.flatMap(ws => ws.zip(ws.tail)).groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }
    val n = uni.values.sum; val v = uni.size.toLong
    def s(prev: Option[String], w: String): (Double, Boolean) = prev match {
      case None => ((uni.getOrElse(w, 0L) + 1).toDouble / (n + v + 1), false)
      case Some(p) => big.get((p, w)) match {
        case Some(c12) => (c12.toDouble / uni(p), false)
        case None =>
          ((2 * (uni.getOrElse(w, 0L) + 1)).toDouble / (5 * (n + v + 1)), true)
      }
    }
    val exp = score.map { case (id, t) =>
      val ws = t.split(" ").toSeq
      val scores = ws.zipWithIndex.map { case (w, i) =>
        s(if (i == 0) None else Some(ws(i - 1)), w) }
      val nll = -scores.map(x => math.floor(1e6 * math.log(x._1)).toLong).sum
      (id, ws.size.toLong, scores.count(_._2).toLong, nll, nll / ws.size)
    }
    assert(got === exp)
    // the branches this corpus exists to hit
    assert(exp.find(_._1 == 1L).get._3 === 0L) // no backoff
    assert(exp.find(_._1 == 3L).get._3 === 1L) // (c,b) backs off
    assert(exp.find(_._1 == 5L).get._3 === 2L) // OOV path taken
  }

  test("ccnetBuckets: per-language terciles ordered by binned ppl") {
    import spark.implicits._
    val train = Seq(10L -> "a b a b c a b c", 12L -> "b c a a b")
      .toDF("doc_id", "text")
    // 9 scored docs in one language, increasingly OOV (higher ppl),
    // plus a 2-doc language to exercise a tiny stratum
    val score = ((1 to 9).map(i =>
        (i.toLong, ("a b c " * (10 - i)) + ("zz" * i + " ") * i, "en")) ++
      Seq((100L, "a b c", "de"), (101L, "zzz zzz", "de")))
      .toDF("doc_id", "text", "lang")
    val got = LanguageModel.ccnetBuckets(
        train, score, "doc_id", "text", "lang")
      .as[(Long, String, Long, Long, String)].collect()
    assert(got.length === 11)
    val byLang = got.groupBy(_._2)
    // buckets are ordered: every head bin <= every middle bin <= tail
    for ((_, rows) <- byLang) {
      def bins(b: String) = rows.filter(_._5 == b).map(_._4)
      for (h <- bins("head"); m <- bins("middle")) assert(h <= m)
      for (m <- bins("middle"); t <- bins("tail")) assert(m <= t)
      for (h <- bins("head"); t <- bins("tail")) assert(h <= t)
      // head reaches at least ceil(n/3) docs (ties can push it higher)
      val n = rows.length
      assert(bins("head").length >= (n + 2) / 3)
    }
    // the 2-doc language: cum*3 >= tot at the first doc -> both
    // thresholds land such that the lower doc is head
    val de = byLang("de").sortBy(_._3)
    assert(de.head._5 === "head")
  }
}
