package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamingMixingSpec extends SparkSpec {

  private def freshBase(name: String): String = {
    val base = s"/tmp/graft_test_tempmix/$name"
    StreamingMixing.init(spark, base)
    base
  }

  test("folded sample equals the batch operator for any split") {
    val docs = Tables.t(spark, sfDir, "documents")
    val base = freshBase("split")
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    for (i <- 0L until 3L)
      StreamingMixing.fold(spark, base,
        docs.where(col("doc_id") >= i * maxId / 3 &&
          col("doc_id") < (i + 1) * maxId / 3),
        "lang", batchTag = Some(i))
    val streamed = StreamingMixing.sample(spark, base, docs,
      "doc_id", "lang").collect().map(_.toSeq).toSet
    val batch = graft.operators.Mixing.temperatureSample(
      docs, "doc_id", "lang").collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("mid-run compaction is answer-preserving") {
    val docs = Tables.t(spark, sfDir, "documents")
    val base = freshBase("compact")
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    for (i <- 0L until 3L) {
      StreamingMixing.fold(spark, base,
        docs.where(col("doc_id") >= i * maxId / 3 &&
          col("doc_id") < (i + 1) * maxId / 3),
        "lang", batchTag = Some(i))
      if (i == 1L) StreamingMixing.compact(spark, base)
    }
    val streamed = StreamingMixing.sample(spark, base, docs,
      "doc_id", "lang").collect().map(_.toSeq).toSet
    val batch = graft.operators.Mixing.temperatureSample(
      docs, "doc_id", "lang").collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("content checksum separates count-profile-identical batches") {
    import spark.implicits._
    val base = freshBase("alias")
    // same row count (2) and count sum (2), DIFFERENT domains — the
    // domain-hash checksum must keep both deltas alive
    StreamingMixing.fold(spark, base,
      Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "lang"), "lang")
    StreamingMixing.fold(spark, base,
      Seq((3L, "cc"), (4L, "dd")).toDF("doc_id", "lang"), "lang")
    val sampled = StreamingMixing.sample(spark, base,
      Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"))
        .toDF("doc_id", "lang"), "doc_id", "lang")
    // all four domains have count 1 -> every rate is 1e6 -> all kept
    assert(sampled.count() === 4L)
    assert(sampled.select("rate_ppm").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1000000L))
  }
}
