package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces LSH bucket-cap recall loss ([[Dedup.capBuckets]]) the moment
  * it happens: a per-session QueryExecutionListener that scans each
  * completed query's observed metrics for `graft_bucket_overflow_*`
  * entries and logs a WARNING when memberships were dropped. The metrics
  * are computed by an `observe` node inside the existing action — the
  * audit costs zero extra jobs, unlike running [[Dedup.bucketOverflow]]
  * eagerly — so pipelines like [[CorpusClean.clean]] can no longer lose
  * near-dup recall on a boilerplate-heavy corpus with no signal.
  */
object OverflowWarner extends org.apache.spark.internal.Logging {

  private val counter = new AtomicLong()

  /** Unique observe-node suffix (observation names must be distinct
    * within one query — e.g. a pipeline that caps MinHash AND SimHash
    * bands in a single plan). */
  def nextId(): Long = counter.incrementAndGet()

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently install the listener on this session. */
  def ensure(spark: SparkSession): Unit =
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_bucket_overflow_") &&
                // sum/max observe aggregates are SQL NULL over zero rows
                // (an empty/fully-filtered corpus) — don't unbox them
                !row.isNullAt(row.fieldIndex("dropped_members"))) {
              val dropped = row.getAs[Long]("dropped_members")
              if (dropped > 0)
                logWarning(
                  s"LSH bucket cap engaged: $dropped memberships dropped " +
                    s"(largest bucket ${row.getAs[Long]("max_bucket_members")} " +
                    s"members) — near-dup recall is reduced; inspect " +
                    "Dedup.bucketOverflow for the affected buckets")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
