package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** DataSource V2 packet source (SURVEY.md §2.1 S1 replacement). */
class PacketSourceSpec extends SparkSpec {

  test("emits packetsPerTrigger rows per nif per micro-batch with stable schema") {
    import spark.implicits._
    val q = spark.readStream
      .format("graft.streaming.PacketSourceProvider")
      .option("nifs", "eth0,eth1,lo")
      .option("packetsPerTrigger", "25")
      .load()
      .writeStream.format("memory").queryName("pk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val df = spark.table("pk")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("nif", "string"), ("raw", "binary"), ("ts", "timestamp")))
    val counts = df.groupBy("nif").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("eth0", "eth1", "lo"))
    assert(counts.values.forall(_ == 25L))
  }

  test("payloads are deterministic per (nif, index) and bounded") {
    val a = PacketSource.payload("eth0", 7L)
    val b = PacketSource.payload("eth0", 7L)
    val c = PacketSource.payload("eth1", 7L)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(a.length >= 60 && a.length < 1460)
  }

  test("packet source feeds the windowed-traffic pipeline end to end") {
    import spark.implicits._
    val packets = spark.readStream
      .format("graft.streaming.PacketSourceProvider")
      .option("nifs", "eth0")
      .option("packetsPerTrigger", "10")
      .option("microsPerPacket", "60000000") // 1 packet/min → 2 windows per 10
      .load()
    // continuous micro-batches: the watermark from batch N finalizes
    // batch N's windows during batch N+1 (append-mode semantics)
    val q = TrafficMonitor.windowedTraffic(packets, lateness = "0 seconds")
      .writeStream.format("memory").queryName("pkw")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("pkw").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("pkw").as[Traffic].collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.nif == "eth0"))
      assert(rows.forall(_.bytes > 0))
    } finally q.stop()
  }
}
