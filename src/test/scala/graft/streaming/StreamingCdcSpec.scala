package graft.streaming

import graft.SparkSpec
import graft.operators.TableDiff
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC maintenance: a change-log stream applied per micro-batch
  * through [[TableDiff.applyChanges]] onto the keyed upsert sink — the
  * batch CDC verb composing with the streaming table-maintenance story.
  *
  * The change version rides BOTH as the log-collapse key (`log_seq`, so
  * within-batch conflicts resolve exactly like the batch operator) and as
  * row payload; an explicit fence drops changes at or below the stored
  * version BEFORE the apply (the sink replaces whatever key the batch
  * carries, so staleness must be rejected upstream) — a late
  * lower-version update loses to the stored row, and a tombstone's
  * version blocks resurrection. Only rows the batch touched are written:
  * the untouched table is never rewritten.
  */
class StreamingCdcSpec extends SparkSpec {

  test("change-log stream maintains the table across micro-batches") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"

    UpsertSink.upsertBatch(
      Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L))
        .toDF("k", "v", "version"),
      path, "k", "version", numBuckets = 4)

    val input = MemoryStream[(Long, String, Long, String)]
    val q = input.toDF().toDF("k", "v", "version", "op")
      .withColumn("log_seq", $"version")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val stored = UpsertSink.read(batch.sparkSession, path)
        // fence: drop changes at or below the stored version (tombstones
        // included — that is what blocks resurrection)
        val fresh = batch.join(
            stored.select(col("k"), col("version").as("__cur")),
            Seq("k"), "left")
          .where(col("__cur").isNull || col("version") > col("__cur"))
          .drop("__cur")
        val live = stored.where(col("v").isNotNull)
        val applied = TableDiff.applyChanges(live, fresh,
          Seq("k"), "op", "log_seq") // (k, v, version)
        // deletes that won their key: tombstone at the delete's version
        val wonDeletes = fresh.where(col("op") === "D")
          .groupBy(col("k")).agg(max(col("version")).as("version"))
          .join(applied, Seq("k"), "left_anti")
          .select(col("k"), lit(null: String).as("v"), col("version"))
        // bounded write: only keys the batch touched
        val touched = applied.join(
          fresh.select(col("k")).distinct(), Seq("k"), "left_semi")
        UpsertSink.upsertBatch(touched.unionByName(wonDeletes),
          path, "k", "version", numBuckets = 4)
      }
      .start()

    def state(): Set[(Long, String)] = UpsertSink.read(spark, path)
      .where(col("v").isNotNull).select("k", "v")
      .as[(Long, String)].collect().toSet

    // batch 1: update k=2, insert k=9
    input.addData((2L, "B", 1L, "U"), (9L, "z", 1L, "U"))
    q.processAllAvailable()
    assert(state() === Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "z")))

    // batch 2: delete k=1; same-version U/D tie on k=3 breaks to delete;
    // a STALE lower-version update on k=2 must lose to the stored row
    input.addData((1L, "x", 2L, "D"), (3L, "c2", 2L, "U"),
      (3L, "c3", 2L, "D"), (2L, "late", 0L, "U"))
    q.processAllAvailable()
    assert(state() === Set((2L, "B"), (9L, "z")),
      "deletes applied, tie broke to delete, stale update fenced")

    // batch 3: resurrection guard — an update BELOW the tombstone's
    // version stays dead, one above it revives the key
    input.addData((1L, "ghost", 1L, "U"), (3L, "c4", 3L, "U"))
    q.processAllAvailable()
    q.stop()
    assert(state() === Set((2L, "B"), (9L, "z"), (3L, "c4")),
      "tombstone version blocks the stale revive, admits the newer one")
  }
}
