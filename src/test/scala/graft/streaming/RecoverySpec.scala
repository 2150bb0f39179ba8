package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** State durability across query restarts (SURVEY.md §2.9 T4/T5) — the
  * semantics the reference loses with its per-executor static alert map
  * (/root/reference/src/main/java/org/test/pcap4j/KafkaProducer.java:15).
  */
class RecoverySpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("foreachBatch gives idempotent per-batch writes keyed by batchId") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("fb").toString
    val in = MemoryStream[Traffic]
    // the exactly-once pattern: partition output by batch id; a replayed
    // batch overwrites its own partition instead of duplicating rows
    val q = in.toDS().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Traffic], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
    }.start()
    try {
      in.addData(Traffic("eth0", ts(0), 10L), Traffic("eth1", ts(0), 20L))
      q.processAllAvailable()
      in.addData(Traffic("eth0", ts(5), 30L))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$out/batch_id=0", s"$out/batch_id=1")
      assert(rows.count() === 3)
    } finally q.stop()
  }

  test("edge-trigger state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ck").toString
    val out = java.nio.file.Files.createTempDirectory("alerts").toString
    val in = MemoryStream[Traffic]

    // memory sink can't recover from a checkpoint; the file sink can
    def start() = TrafficMonitor.edgeTrigger(in.toDS(), maxLimit = 100L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    in.addData(Traffic("eth0", ts(0), 500L)) // over → emit (first obs)
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: state must remember eth0 is in alert
    val q2 = start()
    in.addData(Traffic("eth0", ts(5), 400L)) // still over → NO emit
    in.addData(Traffic("eth0", ts(10), 5L))  // flip down → emit
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out).as[Alert].collect()
      .sortBy(_.windowStart.getTime).map(a => (a.windowStart, a.alert)).toSeq
    assert(got === Seq((ts(0), true), (ts(10), false)))
  }
}
