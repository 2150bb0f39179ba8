package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MixingSpec extends SparkSpec {

  test("temperature rates: rarest domain keeps all, order preserved") {
    val docs = Tables.t(spark, sfDir, "documents")
    val kept = Mixing.temperatureSample(docs, "doc_id", "lang")
    val rates = kept.select("domain", "rate_ppm").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = counts.minBy { case (l, n) => (n, l) }._1
    assert(rates(rarest) === 1000000L)
    // rate is monotone decreasing in domain size: sqrt smoothing
    val bySize = counts.toSeq.sortBy(_._2).map(_._1)
    bySize.sliding(2).foreach { case Seq(s, b) =>
      assert(rates.getOrElse(s, 1000000L) >= rates.getOrElse(b, 0L))
    case _ => ()
    }
    // alpha = 1/2 arithmetic on one domain, exactly
    val (big, nBig) = counts.maxBy(_._2)
    val m = counts.values.min
    assert(rates(big) ===
      math.floor(1e6 * math.sqrt(m.toDouble / nBig.toDouble)).toLong)
  }

  test("waterfill: brute-force level search agrees with the closed form") {
    import spark.implicits._
    val docs = Seq(
      ("a", "w " * 10), ("b", "w " * 20), ("c", "w " * 30))
      .zipWithIndex.map { case ((d, t), i) => (i.toLong, d, t.trim) }
      .toDF("doc_id", "lang", "text")
    // budget = 45 of 60 tokens -> first feasible j=2: level (45-10)/2=17
    val got = Mixing.waterfill(docs, "text", "lang", budgetPpm = 750000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.forall(_._4 === 45L))
    assert(got.forall(_._5 === 17L))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq(("a", 10L, 10L), ("b", 20L, 17L), ("c", 30L, 17L)))
    // brute force: the chosen level is optimal — level+1 overshoots
    val c = Seq(10L, 20L, 30L)
    def tot(l: Long) = c.map(math.min(_, l)).sum
    assert(tot(17L) <= 45L && tot(18L) > 45L)
  }

  test("waterfill edges: zero budget and a budget beyond the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x", "a b c"), (2L, "y", "d e"))
      .toDF("doc_id", "lang", "text")
    val zero = Mixing.waterfill(docs, "text", "lang", 0L).collect()
    assert(zero.forall(_.getLong(2) === 0L))
    val all = Mixing.waterfill(docs, "text", "lang", 1000000L).collect()
    assert(all.forall(r => r.getLong(2) === r.getLong(1)))
    // over-budget (impossible ppm > 1e6 is allowed: budget > corpus)
    val over = Mixing.waterfill(docs, "text", "lang", 2000000L).collect()
    assert(over.forall(r => r.getLong(2) === r.getLong(1)))
  }

  test("waterfill on the corpus: allocation lands within a domain of budget") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rows = Mixing.waterfill(docs, "text", "lang", 700000L).collect()
    val budget = rows.head.getLong(3)
    val alloc = rows.map(_.getLong(2)).sum
    assert(alloc <= budget)
    assert(budget - alloc < rows.length) // residual < |domains|
    assert(rows.exists(r => r.getLong(2) === r.getLong(1)) ||
      rows.forall(r => r.getLong(2) === rows.head.getLong(4)))
  }
}
