package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy governance operators. [[TextAnalysis]] owns content-level
  * redaction (emails/phones inside text); this module owns RECORD-level
  * guarantees over structured columns — the release gate a training
  * corpus with user-derived metadata passes before leaving the
  * warehouse.
  *
  * k-anonymity by suppression: every released row must share its
  * quasi-identifier combination with at least k−1 others; rows in
  * rarer groups keep their payload but have ALL quasi columns masked
  * (suppression must be all-or-nothing per row — masking only the rare
  * column would leak the rest of the combination).
  *
  * Distribution shape: one aggregation for group sizes (map-side
  * combinable; the group relation is |distinct combinations|-sized,
  * far below the data) joined back — Spark broadcasts it when small,
  * and at 100 TB the join stays a shuffled equi-join on the quasi key
  * with AQE owning skew. No windows over the full table.
  */
object Privacy {

  /** Suppression-based k-anonymity: `(idCol, <quasi cols as strings,
    * masked with '*' when the row's group is smaller than k>, group_n,
    * kept)`. The size join is null-safe (`<=>`), so rows whose quasi
    * value is NULL form their own group like any other value — every
    * input row appears in the release output exactly once. */
  def kAnonymize(df: DataFrame, idCol: String, quasi: Seq[String],
      k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    val sizes = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).cast("long").as("group_n"))
      .select(quasi.map(q => col(q).as(s"__g_$q")) :+ col("group_n"): _*)
    val cond = quasi.map(q => col(q) <=> col(s"__g_$q")).reduce(_ && _)
    val masked = quasi.map { q =>
      when(col("group_n") >= k, col(q).cast("string"))
        .otherwise(lit("*")).as(q)
    }
    df.join(sizes, cond)
      .select(col(idCol) +: masked :+ col("group_n") :+
        (col("group_n") >= k).cast("long").as("kept"): _*)
  }
}
