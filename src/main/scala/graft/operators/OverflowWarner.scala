package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces LSH bucket-cap engagement ([[Dedup.capBuckets]]) the moment
  * it happens: a per-session QueryExecutionListener that scans each
  * completed query's observed metrics for `graft_bucket_overflow_*`
  * entries and logs a WARNING when memberships were dropped. The metrics
  * are computed by an `observe` node inside the existing action — the
  * audit costs zero extra jobs, unlike running [[Dedup.bucketOverflow]]
  * eagerly. Since the dropped members re-enter candidate generation as
  * [[Dedup.bucketRescuePairs]] star candidates, the warning signals a
  * degenerate corpus layout (and the extra rescue work), not recall loss.
  *
  * Semantics caveat: `observe` metrics fire when the subtree EXECUTES.
  * The pair generators persist the capped band relation immediately, so
  * the metric reports on the action that first materializes the cache;
  * later queries served from the cache re-run the observe over cached
  * rows only if Spark re-executes the node — treat the warning as
  * at-least-once per cache lifetime, not per query. For exact per-bucket
  * detail at any time, run [[Dedup.bucketOverflow]].
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
                    s"members) — dropped members were star-rescued against " +
                    "their bucket representative; inspect " +
                    "Dedup.bucketOverflow for the affected buckets")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
