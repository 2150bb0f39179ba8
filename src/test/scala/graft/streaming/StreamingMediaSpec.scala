package graft.streaming

import graft.SparkSpec
import graft.multimodal.{MediaRecord, Multimodal}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The media-decode family composes with Structured Streaming unchanged:
  * the decoders are per-partition maps over a typed Dataset, so the same
  * call sites run on a stream — incremental metadata extraction + running
  * per-format counts is the online half of the q_media_route rollup. */
class StreamingMediaSpec extends SparkSpec {

  test("streaming decode: per-format running counts over incoming payloads") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[MediaRecord]
    val counts = Multimodal.decodeFeatures(in.toDS())
      .groupBy($"format").count()
    val q = counts.writeStream.format("memory").queryName("media_counts")
      .outputMode("complete").start()
    try {
      in.addData(MediaRecord(0L, Multimodal.MediaFixtures.payload(0L)), // png
        MediaRecord(1L, Multimodal.MediaFixtures.payload(1L))) // bmp
      q.processAllAvailable()
      val r1 = spark.table("media_counts").as[(String, Long)].collect().toMap
      assert(r1 === Map("png" -> 1L, "bmp" -> 1L))
      // later micro-batch: another png, a wav, and a corrupt payload
      in.addData(MediaRecord(5L, Multimodal.MediaFixtures.payload(5L)), // png
        MediaRecord(2L, Multimodal.MediaFixtures.payload(2L)), // wav
        MediaRecord(99L, Array[Byte](1, 2, 3))) // not a container
      q.processAllAvailable()
      val r2 = spark.table("media_counts").as[(String, Long)].collect().toMap
      assert(r2 === Map("png" -> 2L, "bmp" -> 1L, "wav" -> 1L,
        "unknown" -> 1L))
    } finally q.stop()
  }

  test("streaming dHash: perceptual fingerprints emitted per micro-batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[MediaRecord]
    val q = Multimodal.imageDHash(in.toDS())
      .writeStream.format("memory").queryName("media_dhash")
      .outputMode("append").start()
    try {
      in.addData(MediaRecord(0L, Multimodal.pngNearFixture(0L)),
        MediaRecord(1L, Multimodal.pngNearFixture(1L)), // near-dup of 0
        MediaRecord(99L, Array[Byte](9, 9, 9))) // undecodable: dropped
      q.processAllAvailable()
      val rows = spark.table("media_dhash")
        .as[(Long, Long, String)].collect().toMap2
      assert(rows.keySet === Set(0L, 1L))
      val ham = java.lang.Long.bitCount(rows(0L)._1 ^ rows(1L)._1)
      assert(ham <= 1, s"in-group stream fingerprints must stay near: $ham")
    } finally q.stop()
  }

  test("streaming image near-dup: 3-batch streamed clusters equal the batch recompute") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // two near-dup groups of 8 (pngNearFixture: in-group hamming 0-1),
    // members deliberately split ACROSS micro-batches
    val ids = (0L until 16L).toSeq
    val corpus = ids.map(id => MediaRecord(id, Multimodal.pngNearFixture(id)))
    val corpusHashes = Multimodal.imageDHash(corpus.toDS())
      .select("doc_id", "dhash")
    val verified = scala.collection.mutable.Set[(Long, Long)]()
    val in = MemoryStream[MediaRecord]
    val q = StreamingDedup.nearDupCandidatesImage(in.toDS())
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[DupCandidate], _: Long) =>
          StreamingDedup.verifyCandidatesHamming(batch, corpusHashes)
            .select("doc_id", "prior_id").as[(Long, Long)]
            .collect().foreach(verified += _)
      }.start()
    try Seq(0 until 6, 6 until 11, 11 until 16).foreach { r =>
      in.addData(r.map(corpus(_)): _*); q.processAllAvailable()
    } finally q.stop()

    val streamPairs = verified.toSeq
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
    val streamed = graft.operators.Dedup.dupClusters(streamPairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    val (h, batchPairs) = Multimodal.imageNearDupPairs(corpus.toDS())
    val batch = graft.operators.Dedup.dupClusters(
      batchPairs.select("doc_a", "doc_b"))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    h.unpersist()
    // the stream's star candidates (vs the bucket's first claimant) must
    // recover the same connected components as the batch's full buckets
    assert(streamed === batch)
    assert(streamed.map(_._2) === Set(0L, 8L)) // one cluster per group
  }

  test("streaming audio near-dup: 3-batch streamed clusters equal the batch recompute") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // two near-dup groups of 8 (audioNearFixture: in-group hamming ≤ 2)
    val ids = (0L until 16L).toSeq
    val corpus = ids.map(id => MediaRecord(id, Multimodal.audioNearFixture(id)))
    val corpusFps = Multimodal.audioFingerprint64(corpus.toDS())
      .select($"doc_id", $"fingerprint".as("dhash"))
    val verified = scala.collection.mutable.Set[(Long, Long)]()
    val in = MemoryStream[MediaRecord]
    val q = StreamingDedup.nearDupCandidatesAudio(in.toDS())
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[DupCandidate], _: Long) =>
          StreamingDedup.verifyCandidatesHamming(batch, corpusFps)
            .select("doc_id", "prior_id").as[(Long, Long)]
            .collect().foreach(verified += _)
      }.start()
    try Seq(0 until 6, 6 until 11, 11 until 16).foreach { r =>
      in.addData(r.map(corpus(_)): _*); q.processAllAvailable()
    } finally q.stop()

    val streamPairs = verified.toSeq
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
    val streamed = graft.operators.Dedup.dupClusters(streamPairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    val (h, batchPairs) = Multimodal.audioNearDupPairs(corpus.toDS())
    val batch = graft.operators.Dedup.dupClusters(
      batchPairs.select("doc_a", "doc_b"))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    h.unpersist()
    assert(streamed === batch)
    assert(streamed.map(_._2) === Set(0L, 8L)) // one cluster per group
  }

  test("streaming archive ingestion: .warc.gz records explode per micro-batch") {
    import spark.implicits._
    import graft.multimodal.{Archives, ArchiveRecord}
    implicit val sql = spark.sqlContext
    // archives arrive as a stream (the crawl-delivery shape); the same
    // batch warcSplit call runs per micro-batch unchanged
    def warcOf(ids: Range) = Archives.warcFixture(
      ids.map(i => i.toLong -> s"doc $i body".getBytes("UTF-8")))
    val in = MemoryStream[ArchiveRecord]
    val q = Archives.warcSplit(in.toDS())
      .writeStream.format("memory").queryName("warc_records")
      .outputMode("append").start()
    try {
      in.addData(ArchiveRecord(0L, warcOf(0 until 3)))
      q.processAllAvailable()
      assert(spark.table("warc_records").count() === 3)
      in.addData(ArchiveRecord(1L, warcOf(3 until 8)),
        ArchiveRecord(2L, Array[Byte](1, 2, 3))) // corrupt archive: drops
      q.processAllAvailable()
      val rows = spark.table("warc_records")
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      assert(rows === (0 until 8).map(i => i.toLong -> s"doc $i body").toMap)
    } finally q.stop()
  }

  private implicit class Tuple3Ops(rows: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, (Long, String)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
