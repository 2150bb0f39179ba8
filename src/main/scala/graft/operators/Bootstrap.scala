package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Poisson bootstrap — error bars for corpus statistics in ONE pass:
  * instead of resampling n rows with replacement (which needs n known
  * and a pass per replicate), each document enters replicate b with an
  * independent Poisson(1) weight, the standard streaming/distributed
  * bootstrap (Chamandy, Muralidharan, Najmi & Naidu, "Estimating
  * Uncertainty for Massive Data Streams", Google tech report 2012; the
  * per-replicate totals converge to the classic bootstrap as n grows).
  * The consumer reads the spread of the B replicate statistics as the
  * statistic's sampling error — no second pass, no global count needed.
  *
  * Determinism (so the verdict hash-matches): the Poisson draw is the
  * inverse CDF applied to the engine-wide md5-derived uniform
  * `h60("<doc_id>:<replicate>") % 1e6`; the CDF is FIXED-POINT — the
  * published ppm constants 367879 / 735758 / 919698 / 981011 / 996340 /
  * 999405 (floor(1e6·P(K≤k)) for Poisson(1)) with weights capped at 6
  * (the residual 595 ppm of mass lands on k = 6; at any corpus size the
  * cap's bias on a mean statistic is below the quantization floor —
  * documented, not hidden). No transcendentals at query time: e enters
  * only through the six published constants.
  *
  * Distribution shape (the 100 TB contract): one corpus scan exploded
  * ×B map-side, weights computed per row, then a groupBy on the B
  * replicate keys — map-side combinable down to B rows. Nothing is
  * corpus-sized after the partial aggregate.
  *
  * Reference scope: the reference publishes raw per-key totals with no
  * uncertainty surface
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:54-55);
  * bootstrap error bars belong to the declared extension surface
  * (SURVEY.md §2.11).
  */
object Bootstrap {

  /** floor(1e6 · P(K ≤ k)) for K ~ Poisson(1), k = 0..5. */
  val CdfPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)

  /** B replicate rows of the weighted corpus word-count statistic:
    * `(replicate, n_eff, sum_words, mean_words_milli)`. */
  def poissonBootstrap(docs: DataFrame, idCol: String, textCol: String,
      replicates: Int = 16): DataFrame = {
    require(replicates >= 1, s"replicates must be >= 1 (got $replicates)")
    val kCol = {
      val u = col("u")
      CdfPpm.zipWithIndex.foldRight(lit(6L)) { case ((c, k), elseCol) =>
        when(u < c, k.toLong).otherwise(elseCol)
      }
    }
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(expr(Dedup.wordsExpr(textCol))).cast("long").as("n_words"))
      .withColumn("b", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("u", expr(s"""${Dedup.h60raw(
        "concat(CAST(doc_id AS STRING), ':', CAST(b AS STRING))")}
        | % 1000000""".stripMargin))
      .withColumn("k", kCol)
      .groupBy(col("b").cast("long").as("replicate"))
      .agg(sum(col("k")).cast("long").as("n_eff"),
        sum(col("k") * col("n_words")).cast("long").as("sum_words"))
      .select(col("replicate"), col("n_eff"), col("sum_words"),
        expr("sum_words * 1000L div greatest(n_eff, 1L)")
          .as("mean_words_milli"))
  }
}
