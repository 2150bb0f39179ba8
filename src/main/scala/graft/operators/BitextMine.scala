package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining over two embedding shards (the
  * ratio-margin criterion of Artetxe & Schwenk, "Margin-based Parallel
  * Corpus Mining with Multilingual Sentence Embeddings", ACL 2019 —
  * the CCMatrix/LASER construction): raw cosine is a poor pairing
  * score because some vectors are "hubs" that are close to everything,
  * so each candidate pair is rescored by its cosine RELATIVE to the
  * two endpoints' average k-NN cosine,
  *
  *   `margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)`,
  *
  * and each x keeps only its best-margin y ("max" retrieval strategy),
  * flagged `mutual` when y's best-margin partner is x back. This is
  * the standard aligner for mining translation pairs / duplicate pairs
  * across two corpora embedded in one space.
  *
  * Integer-exactness contract: the 6-dp cosines from the k-NN relation
  * are lifted to exact micro BIGINTs (`floor(c·1e6 + 0.5)` — the value
  * is within 1e-7 of an integer, so this is nearest-int for either
  * sign in both engines), per-endpoint k-NN sums are BIGINT, and the
  * margin is ONE floored division of cross-multiplied BIGINTs
  *
  *   `margin_ppm = (2·c·kx·ky·1e6) div (Sx·ky + Sy·kx)`
  *
  * (the actual neighbor counts kx, ky handle endpoints with fewer than
  * k neighbors). Pairs whose denominator is ≤ 0 (possible when k-NN
  * cosines are predominantly negative) are dropped on both engines —
  * the ratio margin is meaningless there.
  *
  * Distribution shape (the 100 TB contract): the operator consumes
  * PRE-BUILT neighbor relations `(query_id, rank, vec_id, cosine)` —
  * exact [[Similarity.bruteTopK]] for oracle parity at test SFs, the
  * IVF/IVFPQ family for production scale, identical downstream code.
  * The rescore itself is scale-free: two endpoint-sized
  * map-side-combinable groupBys (the k-NN sums), two equi-joins keyed
  * on the endpoints, and per-endpoint rank windows over ≤ k rows —
  * never a corpus-sized window, never a cartesian.
  *
  * Reference scope: the reference has no vector surface at all
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:44-47);
  * similarity search belongs to the declared extension surface
  * (SURVEY.md §2.11).
  *
  * Output: `(a, b, c_micro, margin_ppm, mutual)` — x-side id, its
  * best-margin y-side partner, their cosine in micro units, the
  * margin, and whether the pairing is reciprocal.
  */
object BitextMine {

  private def microCol(c: String): org.apache.spark.sql.Column =
    expr(s"CAST(floor($c * 1000000 + 0.5D) AS BIGINT)")

  /** `fwd`: x-side k-NN lists into the y shard; `bwd`: y-side k-NN
    * lists into the x shard (both in [[Similarity.bruteTopK]]'s
    * `(query_id, rank, vec_id, cosine)` shape). Keeps each x's single
    * best-margin pair with `margin_ppm >= minMarginPpm`. */
  def marginPairs(fwd: DataFrame, bwd: DataFrame,
      minMarginPpm: Long): DataFrame = {
    val fm = fwd.select(col("query_id").as("a"), col("vec_id").as("b"),
      microCol("cosine").as("c_micro"))
    val bm = bwd.select(col("vec_id").as("a"), col("query_id").as("b"),
      microCol("cosine").as("c_micro"))
    val sx = fm.groupBy(col("a")).agg(
      sum(col("c_micro")).as("sx"), count(lit(1)).cast("long").as("kx"))
    val sy = bm.groupBy(col("b")).agg(
      sum(col("c_micro")).as("sy"), count(lit(1)).cast("long").as("ky"))
    def withMargin(pairs: DataFrame): DataFrame =
      pairs.join(sx, Seq("a")).join(sy, Seq("b"))
        .where(col("sx") * col("ky") + col("sy") * col("kx") > 0L)
        .withColumn("margin_ppm", expr(
          "(2 * c_micro * kx * ky * 1000000) div (sx * ky + sy * kx)"))
    val fBest = withMargin(fm)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("a"))
          .orderBy(col("margin_ppm").desc, col("b").asc)))
      .where(col("__rn") === 1).drop("__rn")
      .where(col("margin_ppm") >= minMarginPpm)
    val bBest = withMargin(bm)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("b"))
          .orderBy(col("margin_ppm").desc, col("a").asc)))
      .where(col("__rn") === 1)
      .select(col("b"), col("a").as("__bwd_best_a"))
    fBest.join(bBest, Seq("b"), "left")
      .select(col("a"), col("b"), col("c_micro"), col("margin_ppm"),
        coalesce(col("__bwd_best_a") === col("a"), lit(false))
          .as("mutual"))
  }
}
