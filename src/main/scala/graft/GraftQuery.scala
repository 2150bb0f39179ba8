package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query in the engine's inventory (SURVEY.md §2).
  *
  * @param name   stable key; shows up in CORRECTNESS/BENCH reports
  * @param build  Spark-native implementation; `dir` is an sf data dir
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None → the op is not SQL-expressible and gets a
  *               rows-only check plus a ScalaTest spec instead
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def queries: Seq[GraftQuery]
}
