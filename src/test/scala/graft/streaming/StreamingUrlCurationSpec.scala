package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingUrlCuration.{CapDoc, CapVerdict}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming per-domain cap (cross-batch per-domain count state). */
class StreamingUrlCurationSpec extends SparkSpec {

  private val docs = Seq(
    CapDoc(1, "a.com"), CapDoc(2, "b.com"), CapDoc(3, "a.com"),
    CapDoc(4, "a.com"), CapDoc(5, "b.com"), CapDoc(6, "a.com"),
    CapDoc(7, "c.com"))

  test("id-ordered arrival reproduces the batch domain cap row for row") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[CapDoc]
    val q = StreamingUrlCuration.capVerdicts(in.toDS(), maxPerDomain = 2L)
      .writeStream.format("memory").queryName("cap1").outputMode("append")
      .start()
    try {
      in.addData(docs.take(3)); q.processAllAvailable()
      in.addData(docs.slice(3, 5)); q.processAllAvailable()
      in.addData(docs.drop(5)); q.processAllAvailable()
      val streamed = spark.table("cap1").as[CapVerdict].collect()
        .map(v => (v.doc_id, v.registrable, v.rnk, v.kept)).toSet
      // batch truth: rankWithinGroups on (registrable, doc_id)
      val batch = graft.operators.Packing.rankWithinGroups(
          spark.createDataset(docs).toDF(), "registrable", "doc_id")
        .selectExpr("doc_id", "registrable", "CAST(rnk AS LONG) rnk",
          "CAST(rnk <= 2 AS LONG) kept")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (1L, "a.com", 1L, 1L), (3L, "a.com", 2L, 1L),
        (4L, "a.com", 3L, 0L), (6L, "a.com", 4L, 0L),
        (2L, "b.com", 1L, 1L), (5L, "b.com", 2L, 1L),
        (7L, "c.com", 1L, 1L)))
    } finally q.stop()
  }

  test("domainQualityGateStream: latest gate row per domain equals the " +
      "batch gate, any arrival order") {
    import spark.implicits._
    import StreamingUrlCuration.DomainGateRow
    // two domains under the same eTLD+1 rule; word counts chosen so
    // one domain passes both thresholds and the other fails the mean
    val rows = Seq( // (doc_id, url, text)
      (1L, "https://a.good.org/1", "w1 w2 w3 w4 w5"),
      (2L, "https://b.good.org/2", "w1 w2 w3 w4 w5 w6"),
      (3L, "https://good.org/3", "w1 w2 w3 w4"),
      (4L, "https://bad.org/1", "w1"),
      (5L, "https://bad.org/2", "w1 w2"),
      (6L, "https://bad.org/3", "w1"))
    val rules = Seq(Tuple1("org")).toDF("rule")
    for ((order, name) <- Seq((rows, "dqga"), (rows.reverse, "dqgb"))) {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[(Long, String, String)]
      val q = StreamingUrlCuration.domainQualityGateStream(
          in.toDS().toDF("doc_id", "url", "text"), "url", "text",
          rules, minDocs = 3L, minMeanWordsMilli = 2000L)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      try {
        in.addData(order.take(2)); q.processAllAvailable()
        in.addData(order.drop(2)); q.processAllAvailable()
        val last = spark.table(name).as[DomainGateRow].collect()
          .groupBy(_.registrable).view
          .mapValues(_.maxBy(_.n_docs)).toMap
        // good.org: 3 docs, 15 words, mean 5000 milli >= 2000 → kept
        assert(last("good.org") ===
          DomainGateRow("good.org", 3L, 15L, 5000L, kept = true))
        // bad.org: 3 docs, 4 words, mean 1333 milli < 2000 → dropped
        assert(last("bad.org") ===
          DomainGateRow("bad.org", 3L, 4L, 1333L, kept = false))
        // equals the batch operator on the full input
        val batch = graft.operators.UrlCuration.domainQualityGate(
            spark.createDataset(rows).toDF("doc_id", "url", "text"),
            "url", "text", minDocs = 3L, minMeanWordsMilli = 2000L,
            rules = Some(rules))
          .as[(String, Long, Long, Long, Boolean)].collect()
          .map(r => r._1 -> DomainGateRow(r._1, r._2, r._3, r._4, r._5))
          .toMap
        assert(batch === last.toMap)
      } finally q.stop()
    }
  }

  test("arbitrary arrival keeps exactly min(cap, n) per domain") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[CapDoc]
    val q = StreamingUrlCuration.capVerdicts(in.toDS(), maxPerDomain = 2L)
      .writeStream.format("memory").queryName("cap2").outputMode("append")
      .start()
    try {
      // reversed arrival: the kept REPRESENTATIVES differ from batch
      // (arrival rank, by contract), but the kept counts cannot
      in.addData(docs.reverse.take(4)); q.processAllAvailable()
      in.addData(docs.reverse.drop(4)); q.processAllAvailable()
      val kept = spark.table("cap2").as[CapVerdict].collect()
        .filter(_.kept == 1L).groupBy(_.registrable)
        .view.mapValues(_.length.toLong).toMap
      assert(kept === Map("a.com" -> 2L, "b.com" -> 2L, "c.com" -> 1L))
      // and the first-arrived are the keepers: reversed order → max ids
      val keptIds = spark.table("cap2").as[CapVerdict].collect()
        .filter(v => v.kept == 1L && v.registrable == "a.com")
        .map(_.doc_id).toSet
      assert(keptIds === Set(6L, 4L))
    } finally q.stop()
  }
}
