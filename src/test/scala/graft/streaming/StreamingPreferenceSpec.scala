package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingPreference.{PrefEvent, Trial}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming preference-pair mining (cross-batch per-user state). */
class StreamingPreferenceSpec extends SparkSpec {

  private def ev(id: Long, sec: Long, uid: Long, tpe: String, v: Double) =
    PrefEvent(id, new Timestamp(sec * 1000L), uid, tpe, v)

  /** Two users whose sequences straddle batch boundaries. */
  private val all = Seq(
    ev(1, 10, 1, "a", 10.0), ev(2, 20, 1, "b", 20.0),   // batch 1
    ev(3, 30, 1, "a", 5.0), ev(4, 10, 2, "b", 1.0),     // batch 2
    ev(5, 40, 1, "c", 5.0), ev(6, 20, 2, "c", 2.0))     // batch 3

  test("streamed trials equal the batch window across batch boundaries") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[PrefEvent]
    val q = StreamingPreference.trials(in.toDS())
      .writeStream.format("memory").queryName("sp").outputMode("append")
      .start()
    try {
      in.addData(all.take(2)); q.processAllAvailable()
      in.addData(all.slice(2, 4)); q.processAllAvailable()
      in.addData(all.drop(4)); q.processAllAvailable()
      val streamed = spark.table("sp").as[Trial].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      // batch truth on the full input (user 1: b>a at 10→20 crosses no
      // boundary, a<b at 20→30 CROSSES batch 1→2, c ties a at 30→40
      // drops; user 2: c>b crosses batch 2→3)
      val batch = graft.operators.Preference
        .winRate(spark.createDataset(all).toDF()
          .withColumnRenamed("tpe", "event_type"))
      assert(streamed === Map(
        Trial("b", "a") -> 2L, Trial("c", "b") -> 1L))
      // and the BT fit from the folded streamed matrix equals the
      // batch fit from raw events
      val mat = spark.table("sp").groupBy($"winner", $"loser")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).cast("long").as("cnt"))
      val fromStream = graft.operators.Preference.fitWins(mat, rounds = 3)
        .as[(Long, String, Long)].collect().toSet
      val fromBatch = graft.operators.Preference.bradleyTerry(
          spark.createDataset(all).toDF(
            "event_id", "ts", "user_id", "event_type", "value"), rounds = 3)
        .as[(Long, String, Long)].collect().toSet
      assert(fromStream === fromBatch)
      assert(batch.count() >= 1) // sanity: the batch path sees the pairs
    } finally q.stop()
  }

  test("bestOfNStream: latest champion row per user equals the batch " +
      "operator, any arrival order") {
    import spark.implicits._
    import StreamingPreference.{Candidate, ChampionRow}
    val cands = Seq(
      Candidate(1, 1, 10.0), Candidate(2, 1, 10.0), // tie → id 1
      Candidate(3, 1, 5.0), Candidate(4, 2, 2.345))
    for ((order, name) <- Seq((cands, "bofa"), (cands.reverse, "bofb"))) {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[Candidate]
      val q = StreamingPreference.bestOfNStream(in.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      try {
        in.addData(order.take(2)); q.processAllAvailable()
        in.addData(order.drop(2)); q.processAllAvailable()
        // the log's LAST row per user (max n_candidates) is the verdict
        val last = spark.table(name).as[ChampionRow].collect()
          .groupBy(_.user_id).view
          .mapValues(_.maxBy(_.n_candidates)).toMap
        assert(last(1L) ===
          ChampionRow(1L, 1L, 1000L, Some(1000L), Some(0L), 3L))
        assert(last(2L) === ChampionRow(2L, 4L, 234L, None, None, 1L))
        // and it equals the batch operator on the full input
        val batch = graft.operators.Preference.bestOfN(
            spark.createDataset(cands).toDF()
              .selectExpr("event_id", "user_id", "value"))
          .as[(Long, Long, Long, Option[Long], Option[Long], Long)]
          .collect().map(r => r._1 -> r).toMap
        assert(batch(1L) === ((1L, 1L, 1000L, Some(1000L), Some(0L), 3L)))
        assert(batch(2L) === ((2L, 4L, 234L, None, None, 1L)))
      } finally q.stop()
    }
  }

  test("dpoPairsStream: latest pair row per context equals the batch " +
      "dpoPairs, any arrival order; pre-pair rows drop") {
    import spark.implicits._
    import StreamingPreference.DpoPairRow
    val rows = Seq( // (event_id, user_id, event_type, value, props)
      (1L, 1L, "click", 10.0, """{"k":7}"""),
      (2L, 1L, "view", 10.0, """{"k":8}"""),
      (3L, 1L, "buy", 99.0, """{"k":9}"""), // late champion change
      (4L, 2L, "a", 2.345, "{}"))           // single candidate
    for ((order, name) <- Seq((rows, "dpoa"), (rows.reverse, "dpob"))) {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[(Long, Long, String, Double, String)]
      val q = StreamingPreference.dpoPairsStream(in.toDS().toDF(
          "event_id", "user_id", "event_type", "value", "props"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      try {
        in.addData(order.take(2)); q.processAllAvailable()
        in.addData(order.drop(2)); q.processAllAvailable()
        val last = spark.table(name).as[DpoPairRow].collect()
          .groupBy(_.conv_id).view
          .mapValues(_.maxBy(_.n_candidates)).toMap
        // user 1: event 3 (9900c) chosen, tie pair (1,2) → 1 rejected
        val r1 = last(1L)
        assert(r1.chosen_event_id === 3L)
        assert(r1.rejected_event_id === Some(1L))
        assert(r1.margin_cents === Some(8900L))
        val prompt = "<|system|>conversation 1\n<|user|>best_of n=3\n"
        assert(r1.text_chosen ===
          Some(prompt + "<|assistant|>buy k=9 v=9900\n"))
        assert(r1.text_rejected ===
          Some(prompt + "<|assistant|>click k=7 v=1000\n"))
        assert(r1.text_chosen.get.substring(r1.loss_start.toInt,
          r1.chosen_loss_end.get.toInt) === "buy k=9 v=9900")
        // user 2 never forms a pair: latest row carries null rejected
        assert(last(2L).rejected_event_id === None)
        // and the folded pair equals the batch operator verbatim
        val batch = graft.operators.Preference.dpoPairs(
            spark.createDataset(rows).toDF(
              "event_id", "user_id", "event_type", "value", "props")
              .withColumn("ts", org.apache.spark.sql.functions
                .lit(new Timestamp(0L))))
          .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
        assert(batch.keySet === Set(1L))
        val b1 = batch(1L)
        assert(b1.getAs[Long]("chosen_event_id") === r1.chosen_event_id)
        assert(b1.getAs[Long]("rejected_event_id") ===
          r1.rejected_event_id.get)
        assert(b1.getAs[String]("text_chosen") === r1.text_chosen.get)
        assert(b1.getAs[String]("text_rejected") === r1.text_rejected.get)
        assert(b1.getAs[Long]("loss_start") === r1.loss_start)
        assert(b1.getAs[Long]("chosen_loss_end") === r1.chosen_loss_end.get)
        assert(b1.getAs[Long]("rejected_loss_end") ===
          r1.rejected_loss_end.get)
      } finally q.stop()
    }
  }

  test("TTL evicts idle users: the boundary trial after eviction is lost") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[PrefEvent]
    val q = StreamingPreference.trialsTtl(
        in.toDS().withWatermark("ts", "0 seconds").as[PrefEvent],
        ttl = "1 minute")
      .writeStream.format("memory").queryName("spt").outputMode("append")
      .start()
    try {
      in.addData(ev(1, 10, 9, "a", 1.0)); q.processAllAvailable()
      // watermark jumps 10 minutes past user 9's last event → evicted
      in.addData(ev(2, 610, 8, "b", 1.0)); q.processAllAvailable()
      // user 9 returns: stored event gone, no boundary trial minted
      in.addData(ev(3, 620, 9, "c", 9.0)); q.processAllAvailable()
      assert(spark.table("spt").count() === 0)
      // but a NEW within-batch pair after resurrection still mints
      in.addData(ev(4, 625, 9, "d", 1.0)); q.processAllAvailable()
      val got = spark.table("spt").as[Trial].collect().toSet
      assert(got === Set(Trial("c", "d")))
    } finally q.stop()
  }
}
