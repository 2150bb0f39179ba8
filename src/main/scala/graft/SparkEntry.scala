package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in [[QueryModule]]s; this object is the
  * flat registry the driver consumes.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    graft.queries.RefParity,
    graft.queries.Builtins,
    graft.queries.Extensions,
    graft.queries.SqlSurface,
    graft.queries.Pipeline,
    graft.queries.Warehouse,
    graft.queries.Curation,
    graft.queries.Preference,
    graft.queries.WebClean,
    graft.queries.Unigram,
    graft.queries.UrlCuration,
    graft.queries.Mining)

  private lazy val registry: Seq[GraftQuery] = {
    val all = modules.flatMap(_.queries)
    // Loud duplicate guard (r14): two registrations sharing a name
    // collapse silently in the Map below — the LOSER, a green oracled
    // query, just vanishes from the driver's gate (exactly what
    // happened when a second q_dsir_weights landed; only a
    // query-count diff in the bench record exposed it).
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate registry names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query (SURVEY.md §7.1) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RefParity.trafficWindow(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
