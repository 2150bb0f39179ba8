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

  test("full reference pipeline: source → windows → limits → edge trigger → kafka shape") {
    import spark.implicits._
    val limits = Seq(("min", 10), ("max", 4000)).toDF("limit_name", "limit_value")
    val packets = spark.readStream
      .format("graft.streaming.PacketSourceProvider")
      .option("nifs", "eth0,eth1")
      .option("packetsPerTrigger", "8")
      .option("microsPerPacket", "60000000") // 1 packet/min
      .load()
    val alerts = TrafficMonitor.pipeline(packets, limits, lateness = "0 seconds")
    val q = TrafficMonitor.toKafkaMessages(alerts)
      .writeStream.format("memory").queryName("e2e")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("e2e").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("e2e").collect()
      assert(rows.nonEmpty)
      // kafka shape: key = nif, value = json payload with the alert fields
      assert(rows.forall(r => Set("eth0", "eth1")(r.getAs[String]("key"))))
      assert(rows.forall(_.getAs[String]("value").contains("\"alert\":")))
    } finally q.stop()
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
