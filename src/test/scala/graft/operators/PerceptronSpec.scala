package graft.operators

import graft.SparkSpec

/** [[Perceptron.train]] vs an independent plain-Scala batch perceptron
  * (same hash, same tie rule, written loop-imperatively): trajectory and
  * predictions must agree row-for-row — the brute-force-oracle pattern
  * the dedup and fuzzy-join families use. */
class PerceptronSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("train matches a plain-Scala batch perceptron, both outputs") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "the a of and is to in scan",
      2L -> "scan table merge join sort key row value part hash batch",
      3L -> "the the the scan scan",
      4L -> "key agg row scan slow fast table value part hash value",
      5L -> "a the window of sort",
      6L -> "spark line sort window table key agg batch merge row fast")
    val (d, rounds) = (8, 3)
    val (trajDf, predDf) = Perceptron.train(
      corpus.toDF("doc_id", "text"), "doc_id", "text", d = d, rounds = rounds)

    // ---- reference implementation ----
    val stop = Perceptron.StopWords.toSet
    val ws = corpus.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val y = ws.map { case (id, w) =>
      id -> (if (10 * w.count(stop) >= w.size) 1L else -1L) }.toMap
    val feat: Map[Long, Map[Int, Long]] = ws.map { case (id, w) =>
      id -> (w.groupBy(x => (h60(x) % d).toInt)
        .map { case (j, g) => j -> g.size.toLong } + (d -> 1L))
    }.toMap
    val w = Array.fill(d + 1)(0L)
    def margin(id: Long): Long =
      feat(id).map { case (j, x) => x * w(j) }.sum
    val expTraj = Seq.newBuilder[(Long, Long, Long)]
    for (r <- 1 to rounds) {
      val miss = corpus.map(_._1).filter(id => y(id) * margin(id) <= 0L)
      val dw = Array.fill(d + 1)(0L)
      miss.foreach(id => feat(id).foreach { case (j, x) =>
        dw(j) += y(id) * x })
      for (j <- 0 to d) { w(j) += dw(j); expTraj += ((r.toLong, j.toLong, w(j))) }
    }
    val expPred = corpus.map(_._1).map(id =>
      (id, y(id), margin(id), if (margin(id) > 0) 1L else -1L))

    // both classes must be present or the test proves nothing
    assert(y.values.toSet === Set(1L, -1L))
    val gotTraj = trajDf.as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(gotTraj === expTraj.result())
    // and training must have moved the weights
    assert(gotTraj.exists(_._3 != 0L))
    val gotPred = predDf.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotPred === expPred.sortBy(_._1))
  }

  test("classifierEval: hand-computed confusion, degenerate classes " +
      "score 0 not null") {
    import spark.implicits._
    // labels/preds: (1,1)x3, (1,-1)x1, (-1,1)x2, (-1,-1)x4, and one
    // label-only class 7 (never predicted)
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, -1L),
      (-1L, 1L), (-1L, 1L), (-1L, -1L), (-1L, -1L), (-1L, -1L),
      (-1L, -1L), (7L, 1L)).toDF("y", "p")
    val got = Perceptron.classifierEval(rows, "y", "p")
      .selectExpr("class", "tp", "fp", "fn", "precision_ppm",
        "recall_ppm", "f1_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toMap2
    val m = got
    // class 1: tp=3 fp=3 (two -1 + one 7 predicted 1) fn=1
    assert(m(1L) === ((3L, 3L, 1L, 500000L, 750000L, 600000L)))
    // class -1: tp=4 fp=1 fn=2
    assert(m(-1L) === ((4L, 1L, 2L, 800000L, 666666L,
      2L * 800000L * 666666L / (800000L + 666666L))))
    // class 7: never predicted -> precision 0, recall 0, f1 0
    assert(m(7L) === ((0L, 0L, 1L, 0L, 0L, 0L)))
  }

  private implicit class Tup7Ops(
      rows: Array[(Long, Long, Long, Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long, Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
  }
}
