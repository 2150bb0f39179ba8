package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream join (§2.3 streaming side): correlate each alert with the
  * packets that produced it, within a bounded time range — both sides
  * watermarked so join state is evictable.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("watermarked stream-stream interval join correlates packets with alerts") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val packets = MemoryStream[Packet]
    val alerts = MemoryStream[Alert]

    val p = packets.toDF()
      .select($"nif", $"ts".as("pkt_ts"), octet_length($"raw").as("bytes"))
      .withWatermark("pkt_ts", "10 minutes")
    val a = alerts.toDF()
      .select($"nif".as("a_nif"), $"windowStart".as("alert_ts"))
      .withWatermark("alert_ts", "10 minutes")

    val joined = p.join(a,
      $"nif" === $"a_nif" &&
        $"pkt_ts" >= $"alert_ts" && $"pkt_ts" < $"alert_ts" + expr("INTERVAL 5 MINUTES"))
      .select($"nif", $"alert_ts", $"pkt_ts", $"bytes")

    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      packets.addData(
        Packet("eth0", new Array[Byte](10), ts(1)),  // inside [0,5) alert
        Packet("eth0", new Array[Byte](20), ts(7)),  // outside
        Packet("eth1", new Array[Byte](30), ts(2)))  // other nif, no alert
      alerts.addData(Alert("eth0", ts(0), 999L, alert = true, "over"))
      q.processAllAvailable()
      val got = spark.table("ssj").collect()
        .map(r => (r.getAs[String]("nif"), r.getAs[Long]("bytes"))).toSet
      assert(got === Set(("eth0", 10L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null matches only after the watermark closes") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val packets = MemoryStream[Packet]
    val alerts = MemoryStream[Alert]

    val p = packets.toDF()
      .select($"nif", $"ts".as("pkt_ts"), octet_length($"raw").as("bytes"))
      .withWatermark("pkt_ts", "5 minutes")
    val a = alerts.toDF()
      .select($"nif".as("a_nif"), $"windowStart".as("alert_ts"))
      .withWatermark("alert_ts", "5 minutes")

    // LEFT OUTER: every packet appears once — enriched when an alert
    // window covers it, with NULLs once the watermark proves none can
    val joined = p.join(a,
      $"nif" === $"a_nif" &&
        $"pkt_ts" >= $"alert_ts" && $"pkt_ts" < $"alert_ts" + expr("INTERVAL 5 MINUTES"),
      "left_outer")
      .select($"nif", $"pkt_ts", $"bytes", $"alert_ts")

    val q = joined.writeStream.format("memory").queryName("ssjlo")
      .outputMode("append").start()
    try {
      packets.addData(
        Packet("eth0", new Array[Byte](10), ts(1)), // will match
        Packet("eth1", new Array[Byte](30), ts(2))) // never matches
      alerts.addData(Alert("eth0", ts(0), 999L, alert = true, "over"))
      q.processAllAvailable()
      // the unmatched eth1 row must NOT have been emitted yet: the
      // watermark can't rule out a late matching alert
      val early = spark.table("ssjlo").collect()
        .map(r => r.getAs[String]("nif")).toSet
      assert(!early.contains("eth1"),
        "unmatched row emitted before the watermark closed its window")

      // advance event time far enough that eth1's join window is closed
      packets.addData(Packet("eth2", new Array[Byte](1), ts(40)))
      alerts.addData(Alert("eth2", ts(40), 1L, alert = false, "advance"))
      q.processAllAvailable()
      val rows = spark.table("ssjlo").collect()
      val eth1 = rows.filter(_.getAs[String]("nif") == "eth1")
      assert(eth1.length === 1 && eth1.head.isNullAt(3),
        s"expected exactly one null-enriched eth1 row, got ${rows.mkString(", ")}")
      val eth0 = rows.filter(_.getAs[String]("nif") == "eth0")
      assert(eth0.length === 1 && !eth0.head.isNullAt(3))
    } finally q.stop()
  }
}
