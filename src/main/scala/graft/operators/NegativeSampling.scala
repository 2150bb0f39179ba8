package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word2vec-style negative-sampling table construction (Mikolov et
  * al., NeurIPS 2013 §2.2): negatives are drawn from the unigram
  * distribution raised to the 3/4 power — the published smoothing
  * that up-weights rare words just enough — and every trainer
  * materializes that as a CUMULATIVE table a sampler binary-searches
  * with a uniform draw. This operator builds exactly that artifact:
  *
  *   `(word, f, weight_micro, lo_micro, hi_micro, prob_ppm)`
  *
  * with `weight = f^(3/4)` and `[lo, hi)` the word's slice of the
  * cumulative weight axis; a draw `u ∈ [0, total)` lands in exactly
  * one interval.
  *
  * Determinism contract: `f^(3/4)` is evaluated as
  * `sqrt(f · sqrt(f))` — two IEEE-correctly-rounded sqrts and one
  * multiply, bit-identical in any engine, where a general
  * `pow(f, 0.75)` is NOT correctly rounded and may differ by ulps
  * between the JVM and the oracle's libm (the [[Mixing]] α = 1/2
  * argument, extended to the rational power 3/4). Weights floor to
  * micro BIGINTs; `prob_ppm` is one floored division by the total.
  *
  * Distribution shape (the 100 TB contract): ONE map-side-combinable
  * word-count groupBy reduces the corpus to a VOCABULARY-sized
  * relation (word types, not tokens), and the cumulative axis is
  * [[Packing.cumSumOrdered]]'s two-phase splitter-bucketed prefix sum
  * — no unpartitioned window even at a hundred-million-type web
  * vocabulary. Interval order is plain `word` ascending (any fixed
  * total order serves a sampler; this one needs no second sort key).
  *
  * Reference scope: the reference has no sampling surface
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:44-63);
  * training-data preparation belongs to the declared extension
  * surface (SURVEY.md §2.11).
  */
object NegativeSampling {

  def table(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(expr(Dedup.wordsExpr(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("f"))
      .withColumn("weight_micro", expr(
        """CAST(floor(1000000 * sqrt(CAST(f AS DOUBLE)
          |  * sqrt(CAST(f AS DOUBLE)))) AS BIGINT)""".stripMargin))
    Packing.cumSumOrdered(counts, "word", "weight_micro",
      cumCol = "hi_micro", totalCol = Some("total_micro"))
      .select(col("word"), col("f"), col("weight_micro"),
        (col("hi_micro") - col("weight_micro")).as("lo_micro"),
        col("hi_micro"),
        expr("(weight_micro * 1000000) div total_micro").as("prob_ppm"))
  }
}
