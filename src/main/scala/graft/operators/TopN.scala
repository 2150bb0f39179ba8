package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-n-per-group WITHOUT a full per-group sort — the per-source
  * document cap of web-corpus curation ("at most N pages per domain",
  * keep the best) and every other "best N per key" variant.
  *
  * The textbook `row_number() OVER (PARTITION BY g ORDER BY s)` sorts
  * EVERY group's full row set; one hot domain = one straggler task.
  * With an integer (or otherwise low-cardinality) score the exact same
  * result falls out of the histogram-threshold pattern (the per-group
  * top-N sibling of TextAnalysis.adaptiveQualityGate):
  *
  *   1. (group, score) COUNT histogram — map-side combined, tiny
  *      relative to the corpus;
  *   2. per-group running count of strictly-better scores, windowed
  *      over the HISTOGRAM rows (not documents);
  *   3. scores whose entire tie-class fits the remaining budget pass
  *      wholesale (no per-row ranking at all); the single boundary
  *      score per group ranks only its own ties by id.
  *
  * The one per-row window runs over boundary ties only — bounded by the
  * number of rows sharing one score within one group, not group size.
  * Ties at the boundary break by smallest id (deterministic, mirrors
  * the `ORDER BY score DESC, id` oracle exactly).
  *
  * Contract: scores must be non-null — the histogram rejoin is an
  * equi-join on (group, score), and SQL NULL never equi-matches, so a
  * null-scored row would otherwise silently vanish rather than rank
  * last. Enforced IN-PLAN with a `raise_error` branch (zero extra
  * passes, evaluated inside the existing histogram scan): a null score
  * fails the job loudly instead. Filter or coalesce nulls upstream
  * (q_source_cap's quality is non-null by construction).
  */
object TopN {

  def topNPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    // The guard rewrites scoreCol itself, so column pruning can never
    // drop it; both the histogram and the rejoin read the guarded column.
    val guarded = df.withColumn(scoreCol,
      when(col(scoreCol).isNull, raise_error(lit(
        s"topNPerGroup: $scoreCol must be non-null (a null score would " +
          "silently vanish from the top-N — filter or coalesce upstream)")))
        .otherwise(col(scoreCol)))
    val hist = guarded.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__cnt"))
    val wh = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("__above",
      coalesce(sum(col("__cnt")).over(wh), lit(0L)))
    // __take: how many rows of this (group, score) tie-class survive;
    // -1 marks "all of them" so the pass-through path skips ranking
    val marks = cum
      .where(col("__above") < n)
      .withColumn("__take",
        when(col("__above") + col("__cnt") <= n, lit(-1L))
          .otherwise(lit(n.toLong) - col("__above")))
      .select(col(groupCol), col(scoreCol), col("__take"))

    val joined = guarded.join(marks, Seq(groupCol, scoreCol))
    val pass = joined.where(col("__take") === -1L)
    // boundary rows are ONE score per group, so this window's partitions
    // hold only that score's ties
    val wb = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val boundary = joined.where(col("__take") =!= -1L)
      .withColumn("__rn", row_number().over(wb))
      .where(col("__rn") <= col("__take"))
      .drop("__rn")
    pass.union(boundary).select(df.columns.map(col): _*)
  }
}
