package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One captured packet: the engine's streaming input record.
  * Mirrors the reference's `Tuple2<String, byte[]>` receiver output
  * (/root/reference/src/main/java/org/test/pcap4j/CaptureNetworkReceiver.java:101)
  * plus an explicit event-time column the reference lacks (SURVEY.md §7.0
  * delta 5 — processing-time batches upgraded to event-time windows).
  */
final case class Packet(nif: String, raw: Array[Byte], ts: Timestamp)

/** Per-(window, nif) traffic total — the A1 aggregate output. */
final case class Traffic(nif: String, windowStart: Timestamp, bytes: Long)

/** An emitted alert-state transition — the engine's Kafka payload, as a
  * typed struct instead of the reference's bare string
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:59,61).
  */
final case class Alert(
    nif: String,
    windowStart: Timestamp,
    bytes: Long,
    alert: Boolean,
    message: String)

/** The reference's whole streaming pipeline, Structured-Streaming-first
  * (SURVEY.md §3.2): packets → per-5-min-window per-NIF byte totals →
  * threshold compare → EDGE-TRIGGERED alerts (emit only when a NIF's
  * over/under-limit state flips; first observation always emits —
  * /root/reference/src/main/java/org/test/pcap4j/KafkaProducer.java:34-41).
  *
  * Scale design: the windowed sum is a streaming HashAggregate (partial on
  * the map side, final after one hash exchange on (window, nif)); the
  * edge-trigger keeps ONE Boolean per NIF in the checkpointed state store —
  * upgraded from the reference's lossy per-executor-JVM static map
  * (SURVEY.md §2.9 T4). At 1000 executors state is hash-partitioned by nif;
  * nothing here is driver-bound.
  */
object TrafficMonitor {

  /** P1 projection (MainApp.java:41-42): packet → byte count. Sums are
    * LONG, not the reference's int (overflows at 2 GiB/window — SURVEY.md
    * §7.0 delta 3). */
  def packetSizes(packets: DataFrame): DataFrame =
    packets.select(col("nif"), octet_length(col("raw")).cast("long").as("bytes"),
      col("ts"))

  /** A1+T1/T2: event-time 5-minute tumbling window sum per NIF, with a
    * watermark so state is bounded and late packets beyond `lateness` drop. */
  def windowedTraffic(packets: DataFrame, lateness: String = "1 minute"): Dataset[Traffic] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packetSizes(packets)
      .withWatermark("ts", lateness)
      .groupBy(window($"ts", "5 minutes"), $"nif")
      .agg(sum($"bytes").as("bytes"))
      .select($"nif", $"window.start".as("windowStart"), $"bytes")
      .as[Traffic]
  }

  /** Shared transition detector: walk a key's windows in windowStart
    * order, emit only flips (first observation always emits), return the
    * emissions plus the final flag — the one implementation both
    * [[edgeTrigger]] and [[edgeTriggerTtl]] run. */
  private def transitions(nif: String, rows: Iterator[Traffic],
      last0: Option[Boolean], maxLimit: Long): (Seq[Alert], Option[Boolean]) = {
    var last = last0
    val out = rows.toSeq.sortBy(_.windowStart.getTime).flatMap { t =>
      val isAlert = t.bytes > maxLimit
      if (last.contains(isAlert)) None
      else {
        last = Some(isAlert)
        val msg =
          if (isAlert) s"traffic on $nif exceeds limit: ${t.bytes} > $maxLimit"
          else s"traffic on $nif back under limit: ${t.bytes} <= $maxLimit"
        Some(Alert(nif, t.windowStart, t.bytes, isAlert, msg))
      }
    }
    (out, last)
  }

  /** T3: the edge-trigger. State = last known alert flag per NIF
    * (None on first observation → always emit, matching
    * KafkaProducer.java:36-37 where `curFlag == null` always sends).
    * Windows may arrive out of order across triggers; within one batch we
    * process a key's windows in windowStart order for determinism. */
  def edgeTrigger(perWindow: Dataset[Traffic], maxLimit: Long): Dataset[Alert] = {
    val spark = perWindow.sparkSession
    import spark.implicits._

    perWindow.groupByKey(_.nif)
      .flatMapGroupsWithState[Option[Boolean], Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (nif: String, rows: Iterator[Traffic], state: GroupState[Option[Boolean]]) =>
          val (out, last) = transitions(nif, rows, state.getOption.flatten, maxLimit)
          state.update(last)
          out.iterator
      }
  }

  /** [[edgeTrigger]] with BOUNDED state under key churn: a NIF idle while
    * the watermark advances `ttl` past its last batch has its one-Boolean
    * state evicted (EventTimeTimeout — deterministic, unlike wall-clock
    * timeouts), and its next observation emits like a first observation
    * again. At 100 TB scale with ephemeral keys (flows, containers,
    * session ids) an evict-never state store grows without bound; this is
    * the standard TTL escape hatch, traded against one duplicate
    * "first-observation" alert per key resurrection.
    *
    * The timeout anchors at CURRENT WATERMARK + ttl (never at the key's
    * own event time): `setTimeoutTimestamp` rejects timestamps at or
    * below the watermark, so an idle gap or restart catch-up where the
    * watermark jumps more than ttl would otherwise crash the query.
    * Caveat inherited from Spark's EventTimeTimeout path: input rows
    * whose event time is below the operator's input watermark are
    * dropped before the function runs — safe downstream of
    * [[windowedTraffic]] (chained-watermark propagation delays the input
    * watermark by the window length), but a custom upstream must keep
    * emitted event times within watermark reach. */
  def edgeTriggerTtl(perWindow: Dataset[Traffic], maxLimit: Long,
      ttl: String = "30 minutes"): Dataset[Alert] = {
    val spark = perWindow.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    require(iv.months == 0,
      s"ttl '$ttl': calendar months have no fixed millisecond length")
    val ttlMillis = iv.days * 86400000L + iv.microseconds / 1000L
    require(ttlMillis > 0, s"ttl '$ttl' must be a positive duration")

    perWindow.groupByKey(_.nif)
      .flatMapGroupsWithState[Option[Boolean], Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (nif: String, rows: Iterator[Traffic], state: GroupState[Option[Boolean]]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: forget the flag, free the store
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val (out, last) = transitions(nif, batch.iterator,
              state.getOption.flatten, maxLimit)
            state.update(last)
            // anchor at the key's OWN latest activity, clamped up to the
            // current watermark: the raw event-time anchor throws when the
            // watermark has already passed it (idle gap / restart
            // catch-up), and a bare wm+ttl anchor uses the PREVIOUS
            // batch's lagging watermark and evicts still-active keys
            val lastSeen = batch.map(_.windowStart.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastSeen, state.getCurrentWatermarkMs()) + ttlMillis)
            out.iterator
          }
      }
  }

  /** T6 (extension surface): sliding-window traffic — each packet counts
    * toward every overlapping window (e.g. 10-min windows advancing every
    * 5 min for smoothed alerting). */
  def slidingTraffic(packets: DataFrame, windowLen: String = "10 minutes",
      slide: String = "5 minutes", lateness: String = "1 minute"): Dataset[Traffic] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packetSizes(packets)
      .withWatermark("ts", lateness)
      .groupBy(window($"ts", windowLen, slide), $"nif")
      .agg(sum($"bytes").as("bytes"))
      .select($"nif", $"window.start".as("windowStart"), $"bytes")
      .as[Traffic]
  }

  /** T6 (extension surface): session-window traffic — a session closes
    * after `gap` of silence on a NIF; emits total bytes per burst. */
  def sessionTraffic(packets: DataFrame, gap: String = "5 minutes",
      lateness: String = "1 minute"): Dataset[Traffic] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packetSizes(packets)
      .withWatermark("ts", lateness)
      .groupBy(session_window($"ts", gap), $"nif")
      .agg(sum($"bytes").as("bytes"))
      .select($"nif", $"session_window.start".as("windowStart"), $"bytes")
      .as[Traffic]
  }

  /** §2.11 × streaming: exactly-once packet dedup inside the watermark —
    * duplicate (nif, ts, fingerprint) deliveries (receiver retries,
    * at-least-once upstreams) collapse to one row; state for seen keys is
    * dropped once the watermark passes them, so it stays bounded. */
  def dedupPackets(packets: DataFrame, lateness: String = "1 minute"): DataFrame =
    packets
      .withColumn("fp", xxhash64(col("raw")))
      .withWatermark("ts", lateness)
      .dropDuplicates("nif", "ts", "fp")
      .drop("fp")

  /** S5: per-batch observability — the reference logs per-batch counts and
    * totals (MainApp.java:52,57); `observe` publishes them as metrics on
    * the query progress events instead of log lines. */
  def observed(packets: DataFrame): DataFrame =
    packets.observe("packet_stats",
      count(lit(1)).as("n_packets"),
      sum(octet_length(col("raw"))).as("total_bytes"))

  /** S3: the limits lookup (MainApp.java:44-49), generalized: read the
    * `max` threshold from a limits DataFrame with (limit_name, limit_value)
    * — explicit name selection instead of the reference's brittle
    * sort-position indexing (SURVEY.md §7.0 delta 4). */
  def maxLimit(limits: DataFrame): Long = {
    import limits.sparkSession.implicits._
    limits.where($"limit_name" === "max")
      .select($"limit_value".cast("long")).as[Long].head()
  }

  /** The full pipeline as one streaming Dataset: packets in, alert
    * transitions out. Wire to any sink — memory (tests), console (dev), or
    * kafka via [[toKafkaMessages]]. */
  def pipeline(packets: DataFrame, limits: DataFrame,
      lateness: String = "1 minute"): Dataset[Alert] =
    edgeTrigger(windowedTraffic(packets, lateness), maxLimit(limits))

  /** The pipeline with the limit applied via a STREAM-STATIC BROADCAST
    * JOIN instead of a driver-side collect: the static side is re-read per
    * micro-batch, so limit-table updates take effect on the next trigger
    * without a query restart (SURVEY.md §2.3 upgrade note). Output marks
    * every window (alert flag per row); pair with [[edgeTrigger]] when only
    * transitions should emit. */
  def windowedWithLimits(packets: DataFrame, limits: DataFrame,
      lateness: String = "1 minute"): DataFrame = {
    val spark = packets.sparkSession
    import spark.implicits._
    windowedTraffic(packets, lateness).toDF()
      .join(broadcast(limits.where($"limit_name" === "max")
        .select($"limit_value".cast("long").as("max_limit"))))
      .select($"nif", $"windowStart", $"bytes",
        ($"bytes" > $"max_limit").as("alert"))
  }

  /** S4: shape alerts as Kafka records — (key, value) exactly what
    * `writeStream.format("kafka").option("topic", "alerts")` consumes.
    * Key = nif (keeps a NIF's transitions in one Kafka partition, in
    * order — an upgrade over the reference's null key,
    * KafkaProducer.java:38). */
  def toKafkaMessages(alerts: Dataset[Alert]): DataFrame =
    alerts.select(
      col("nif").as("key"),
      to_json(struct(col("nif"), col("windowStart"), col("bytes"),
        col("alert"), col("message"))).as("value"))

  /** Batch analogue of [[pipeline]] over the events table — same logical
    * program, lets the DuckDB oracle check the operator's semantics
    * (q_edge_trigger_batch in graft.queries.RefParity). */
  def batchEdgeTrigger(events: DataFrame, maxLimit: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"w")
    events
      .groupBy($"user_id",
        (floor(unix_timestamp($"ts") / 300) * 300).cast("long").as("w"))
      .agg(sum($"value").as("traffic"))
      .select($"user_id", $"w", (round($"traffic", 2) > maxLimit).as("alert"))
      .withColumn("prev", lag($"alert", 1).over(w))
      .filter($"prev".isNull || $"alert" =!= $"prev")
      .select($"user_id", $"w".as("window_start"), $"alert")
  }
}
