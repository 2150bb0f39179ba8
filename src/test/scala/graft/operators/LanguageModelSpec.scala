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
}
