package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CrossContaminationSpec extends SparkSpec {

  test("planted copy is flagged; unrelated doc is not; anti-join cleans") {
    import spark.implicits._
    val benchmark = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different benchmark question about spark joins"))
      .toDF("doc_id", "text")
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"), // copy
      (101L, "an unrelated training document covering batch windows"),
      (102L, "another clean document about shuffle partitions here"))
      .toDF("doc_id", "text")
    val got = Dedup.crossContaminated(train, benchmark,
      "doc_id", "text", 0.5)
    val rows = got.collect()
    assert(rows.map(_.getLong(0)).toSet === Set(100L))
    val r = rows.head
    assert(r.getLong(1) === 1L) // best match is the copied benchmark doc
    assert(r.getDouble(2) === 1.0)
    assert(r.getLong(3) === 1L)
    // the documented clean-corpus recipe drops exactly the flagged doc
    val clean = train.join(got, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(101L, 102L))
  }

  test("real corpus: flags only train ids, jaccard over threshold") {
    val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val got = Dedup.crossContaminated(
      docs.where(col("doc_id") >= 20),
      docs.where(col("doc_id") < 20), "doc_id", "text", 0.3)
      .collect()
    assert(got.nonEmpty) // the sf0.01 corpus has planted near-dups
    assert(got.forall(_.getLong(0) >= 20L))
    assert(got.forall(_.getLong(1) < 20L))
    assert(got.forall(_.getDouble(2) >= 0.3))
    assert(got.forall(r => r.getLong(3) >= 1L))
    assert(got.map(_.getLong(0)).distinct.length === got.length)
  }
}
