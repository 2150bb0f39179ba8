package graft

import org.apache.spark.sql.SparkSession

/** Front door for library users: a SparkSession builder pre-loaded with the
  * engine's recommended configuration and native functions.
  *
  * On a real cluster the same settings apply (only master/partitions
  * change): AQE with skew-join handling on, shuffle partitions sized to
  * cores (not the 200 default), UTC session time, and the engine's
  * Catalyst functions registered — equivalent to launching with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")

  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    // idempotent — covers sessions created before the extensions conf
    functions.VectorFunctions.register(spark)
    spark
  }
}
