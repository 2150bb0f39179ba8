package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialize a driver-bounded result and release the cached blocks an
  * operator left behind (its `(cached, result)` tuple). Registry queries
  * are the end of the line for those caches; without a drain each
  * invocation in a long-lived session strands MEMORY_AND_DISK blocks
  * (r4 verdict: stranded rank cuts contaminated the bench query that ran
  * next). Only for driver-small outputs — cluster-scale callers should
  * consume the operator's cached relation directly, then unpersist it
  * themselves once their downstream job has run.
  */
object Drain {

  def drained(s: SparkSession, cached: DataFrame, out: DataFrame): DataFrame =
    drainedAll(s, Seq(cached), out)

  def drainedAll(s: SparkSession, cached: Seq[DataFrame],
      out: DataFrame): DataFrame = {
    val rows = out.collect()
    cached.foreach(_.unpersist(blocking = true))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }
}
