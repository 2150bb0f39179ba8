package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming parity for the reference pipeline (SURVEY.md §2.9 T1-T5):
  * event-time windowed sums and the edge-triggered alert dedup, run through
  * real micro-batches via MemoryStream.
  */
class TrafficMonitorSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private def pkt(nif: String, min: Int, sec: Int, size: Int): Packet =
    Packet(nif, new Array[Byte](size), ts(min, sec))

  test("edgeTriggerTtl evicts idle keys by watermark and re-emits on resurrection") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Traffic]
    val traffic = in.toDF().withWatermark("windowStart", "0 seconds").as[Traffic]
    val q = TrafficMonitor.edgeTriggerTtl(traffic, maxLimit = 100L, ttl = "10 minutes")
      .writeStream.format("memory").queryName("ttl").outputMode("append").start()
    try {
      in.addData(Traffic("eth0", ts(0), 500L)) // over → first-obs emit
      q.processAllAvailable()
      in.addData(Traffic("eth9", ts(20), 5L))  // other key; wm → 20 min
      q.processAllAvailable()
      // this batch runs with watermark 20 min > eth0's (0 + 10 min)
      // timeout → eth0's state evicts; eth9 stays under limit (no emit)
      in.addData(Traffic("eth9", ts(25), 6L))
      q.processAllAvailable()
      // eth0 returns STILL OVER the limit: with surviving state this
      // would be suppressed; after eviction it re-emits as a first obs
      in.addData(Traffic("eth0", ts(30), 450L))
      q.processAllAvailable()
      val got = spark.table("ttl").as[Alert].collect()
        .map(a => (a.nif, a.windowStart, a.alert)).toSet
      assert(got === Set(
        ("eth0", ts(0), true),
        ("eth9", ts(20), false),
        ("eth0", ts(30), true))) // the resurrection emit
    } finally q.stop()
  }

  test("edgeTriggerTtl survives a watermark jump far beyond the ttl") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Traffic]
    val traffic = in.toDF().withWatermark("windowStart", "0 seconds").as[Traffic]
    val q = TrafficMonitor.edgeTriggerTtl(traffic, maxLimit = 100L, ttl = "10 minutes")
      .writeStream.format("memory").queryName("ttl_jump").outputMode("append").start()
    try {
      in.addData(Traffic("eth0", ts(0), 500L))
      q.processAllAvailable()
      // watermark leaps 50 min (> ttl) in one batch — anchoring the
      // timeout at the key's own event time made setTimeoutTimestamp
      // throw here and killed the query
      in.addData(Traffic("eth9", ts(50), 500L))
      q.processAllAvailable()
      in.addData(Traffic("eth9", ts(55), 500L)) // eviction batch for eth0
      q.processAllAvailable()
      in.addData(Traffic("eth0", ts(58), 450L)) // resurrection
      q.processAllAvailable()
      val got = spark.table("ttl_jump").as[Alert].collect()
        .map(a => (a.nif, a.windowStart, a.alert)).toSet
      assert(got === Set(
        ("eth0", ts(0), true), ("eth9", ts(50), true), ("eth0", ts(58), true)))
    } finally q.stop()
  }

  test("windowedTraffic sums bytes per 5-min event-time window per nif") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.windowedTraffic(in.toDF())
      .writeStream.format("memory").queryName("wt").outputMode("append").start()
    try {
      in.addData(
        pkt("eth0", 0, 10, 100), pkt("eth0", 4, 59, 50), // window [0,5)
        pkt("eth0", 5, 0, 7),                            // window [5,10)
        pkt("eth1", 1, 0, 9))                            // window [0,5)
      q.processAllAvailable()
      // advance the watermark far enough to finalize all windows
      in.addData(pkt("eth0", 30, 0, 1))
      q.processAllAvailable()
      val got = spark.table("wt").as[Traffic].collect()
        .map(t => (t.nif, t.windowStart, t.bytes)).toSet
      assert(got.contains(("eth0", ts(0), 150L)))
      assert(got.contains(("eth0", ts(5), 7L)))
      assert(got.contains(("eth1", ts(0), 9L)))
    } finally q.stop()
  }

  test("edgeTrigger emits only state transitions; first observation always emits") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Traffic]
    val q = TrafficMonitor.edgeTrigger(in.toDS(), maxLimit = 100L)
      .writeStream.format("memory").queryName("et").outputMode("append").start()
    try {
      // eth0: under, under, OVER, OVER, under → emits at w0(first), w10, w20
      // eth1: OVER first → emits once, stays over → nothing more
      in.addData(Traffic("eth0", ts(0), 50L), Traffic("eth1", ts(0), 500L))
      q.processAllAvailable()
      in.addData(Traffic("eth0", ts(5), 80L), Traffic("eth1", ts(5), 300L))
      q.processAllAvailable()
      in.addData(Traffic("eth0", ts(10), 180L)) // flip up
      q.processAllAvailable()
      in.addData(Traffic("eth0", ts(15), 120L)) // still over
      in.addData(Traffic("eth0", ts(20), 10L))  // flip down
      q.processAllAvailable()
      val got = spark.table("et").as[Alert].collect()
        .map(a => (a.nif, a.windowStart, a.alert)).toSet
      assert(got === Set(
        ("eth0", ts(0), false), ("eth0", ts(10), true), ("eth0", ts(20), false),
        ("eth1", ts(0), true)))
    } finally q.stop()
  }

  test("edgeTrigger state survives across many batches and orders within a batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Traffic]
    val q = TrafficMonitor.edgeTrigger(in.toDS(), maxLimit = 100L)
      .writeStream.format("memory").queryName("et2").outputMode("append").start()
    try {
      // one batch, out of order: w5 over arrives before w0 under
      in.addData(Traffic("x", ts(5), 200L), Traffic("x", ts(0), 1L))
      q.processAllAvailable()
      val got = spark.table("et2").as[Alert].collect()
        .sortBy(_.windowStart.getTime).map(a => (a.windowStart, a.alert)).toSeq
      // processed in windowStart order: under(first emit), then flip to over
      assert(got === Seq((ts(0), false), (ts(5), true)))
    } finally q.stop()
  }

  test("full pipeline: packets → windows → edge-triggered alerts") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val limits = Seq(("min", 10), ("max", 120)).toDF("limit_name", "limit_value")
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.pipeline(in.toDF(), limits, lateness = "0 seconds")
      .writeStream.format("memory").queryName("pl").outputMode("append").start()
    try {
      in.addData(pkt("eth0", 0, 0, 200))  // w0: 200 > 120 → over
      q.processAllAvailable()
      in.addData(pkt("eth0", 6, 0, 30))   // finalizes w0
      q.processAllAvailable()
      in.addData(pkt("eth0", 12, 0, 10))  // finalizes w5 (30 <= 120 → under)
      in.addData(pkt("eth0", 40, 0, 10))  // finalizes w10
      q.processAllAvailable()
      val got = spark.table("pl").as[Alert].collect()
        .sortBy(_.windowStart.getTime).map(a => (a.windowStart, a.alert)).toSeq
      assert(got.take(2) === Seq((ts(0), true), (ts(5), false)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped, not double-counted") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.windowedTraffic(in.toDF(), lateness = "0 seconds")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      in.addData(pkt("eth0", 0, 0, 100))
      q.processAllAvailable()
      in.addData(pkt("eth0", 20, 0, 1)) // watermark → 20:00; finalizes [0,5)
      q.processAllAvailable()
      in.addData(pkt("eth0", 1, 0, 999)) // LATE: for already-finalized [0,5)
      in.addData(pkt("eth0", 40, 0, 1))  // advances watermark further
      q.processAllAvailable()
      val w0 = spark.table("late").as[Traffic].collect()
        .filter(_.windowStart == ts(0))
      // the finalized window emitted once, without the late packet
      assert(w0.map(_.bytes).toSeq === Seq(100L))
    } finally q.stop()
  }

  test("slidingTraffic counts packets toward every overlapping window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.slidingTraffic(in.toDF(), lateness = "0 seconds")
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    try {
      in.addData(pkt("eth0", 7, 0, 100)) // in [0,10) and [5,15)
      q.processAllAvailable()
      in.addData(pkt("eth0", 40, 0, 1))  // advance watermark
      q.processAllAvailable()
      val got = spark.table("sw").as[Traffic].collect()
        .map(t => (t.windowStart, t.bytes)).toSet
      assert(got.contains((ts(0), 100L)))
      assert(got.contains((ts(5), 100L)))
    } finally q.stop()
  }

  test("sessionTraffic closes a session after the gap and sums its bytes") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.sessionTraffic(in.toDF(), gap = "5 minutes",
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // burst 1: 0:00..1:00 (merges, 150 B); silence > 5 min; burst 2: 20:00
      in.addData(pkt("eth0", 0, 0, 100), pkt("eth0", 1, 0, 50))
      q.processAllAvailable()
      in.addData(pkt("eth0", 20, 0, 7))
      q.processAllAvailable()
      in.addData(pkt("eth0", 59, 0, 1)) // advance watermark, close burst 2
      q.processAllAvailable()
      val got = spark.table("sess").as[Traffic].collect()
        .map(t => (t.windowStart, t.bytes)).toSet
      assert(got.contains((ts(0), 150L)))
      assert(got.contains((ts(20), 7L)))
    } finally q.stop()
  }

  test("windowedWithLimits applies the limit via a stream-static broadcast join") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val limits = Seq(("min", 10), ("max", 120)).toDF("limit_name", "limit_value")
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.windowedWithLimits(in.toDF(), limits,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("wl").outputMode("append").start()
    try {
      in.addData(pkt("eth0", 0, 0, 200), pkt("eth1", 0, 0, 5))
      q.processAllAvailable()
      in.addData(pkt("eth0", 30, 0, 1)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("wl").collect()
        .map(r => (r.getAs[String]("nif"), r.getAs[Boolean]("alert"))).toSet
      assert(got.contains(("eth0", true)))   // 200 > 120
      assert(got.contains(("eth1", false)))  // 5 <= 120
    } finally q.stop()
  }

  test("dedupPackets drops duplicate deliveries within the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.dedupPackets(in.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      val p = pkt("eth0", 0, 0, 10)
      in.addData(p, p) // duplicate in one batch
      q.processAllAvailable()
      in.addData(p)    // duplicate across batches
      in.addData(pkt("eth0", 0, 0, 99)) // same (nif, ts), different payload
      q.processAllAvailable()
      val rows = spark.table("dd").collect()
      assert(rows.length === 2) // the dup collapsed; distinct payload kept
    } finally q.stop()
  }

  test("observe publishes per-batch packet metrics on progress events") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.observed(in.toDF())
      .writeStream.format("memory").queryName("obs").outputMode("append").start()
    try {
      in.addData(pkt("eth0", 0, 0, 100), pkt("eth1", 0, 0, 50))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("packet_stats"))).last
      assert(m.getAs[Long]("n_packets") === 2L)
      assert(m.getAs[Long]("total_bytes") === 150L)
    } finally q.stop()
  }

  test("toKafkaMessages shapes alerts as (key, value) records") {
    import spark.implicits._
    val alerts = Seq(Alert("eth0", ts(0), 500L, alert = true, "over")).toDS()
    val msgs = TrafficMonitor.toKafkaMessages(alerts).collect()
    assert(msgs.length === 1)
    assert(msgs.head.getAs[String]("key") === "eth0")
    val v = msgs.head.getAs[String]("value")
    assert(v.contains("\"nif\":\"eth0\"") && v.contains("\"alert\":true"))
  }

  test("complete output mode keeps updating per-nif running totals") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Packet]
    val q = TrafficMonitor.packetSizes(in.toDF())
      .groupBy($"nif").agg(org.apache.spark.sql.functions.sum($"bytes").as("total"))
      .writeStream.format("memory").queryName("cm").outputMode("complete").start()
    try {
      in.addData(pkt("eth0", 0, 0, 100))
      q.processAllAvailable()
      in.addData(pkt("eth0", 1, 0, 50))
      q.processAllAvailable()
      val got = spark.table("cm").as[(String, Long)].collect().toMap
      assert(got("eth0") === 150L) // the table is the full refreshed result
    } finally q.stop()
  }

  test("batch analogue matches streaming edge-trigger semantics") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0, 30), 50.0), (1L, ts(1, 0), 120.0), // w0 sum 170 → over
      (1L, ts(5, 0), 10.0),                         // w5 → under
      (2L, ts(0, 0), 5.0))                          // w0 → under
      .toDF("user_id", "ts", "value")
    val got = TrafficMonitor.batchEdgeTrigger(events, 150.0)
      .as[(Long, Long, Boolean)].collect().toSet
    val base = ts(0).getTime / 1000
    assert(got === Set(
      (1L, base, true), (1L, base + 300, false), (2L, base, false)))
  }
}
