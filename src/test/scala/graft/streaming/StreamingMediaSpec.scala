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

  private implicit class Tuple3Ops(rows: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, (Long, String)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
