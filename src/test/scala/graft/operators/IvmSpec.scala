package graft.operators

import graft.SparkSpec

/** IVM refresh must equal a full recompute over the effective row set —
  * including vanishing groups (count hits 0) and brand-new groups. */
class IvmSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("refresh(view, inserts, deletes) == build(effective base)") {
    import spark.implicits._
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
      .toDF("k", "v")
    val inserts = Seq(("a", 1L), ("d", 100L)).toDF("k", "v") // new group d
    val deletes = Seq(("c", 7L), ("a", 10L)).toDF("k", "v")  // c vanishes
    val got = Ivm.refresh(Ivm.build(base, Seq("k"), "v"),
        inserts, deletes, Seq("k"), "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 2L, 2L, 21L), ("b", 1L, 1L, 5L),
      ("d", 1L, 1L, 100L)))
  }

  test("incremental result matches full recompute on real data") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
    val base = orders.where(col("o_orderkey") % 3 =!= 0)
    val inserts = orders.where(col("o_orderkey") % 3 === 0)
    val deletes = base.where(col("o_orderkey") % 7 === 0)
    val incremental = Ivm.refresh(
      Ivm.build(base, Seq("o_orderstatus"), "cents"),
      inserts, deletes, Seq("o_orderstatus"), "cents")
    val full = Ivm.build(
      orders.where(col("o_orderkey") % 3 === 0 ||
        col("o_orderkey") % 7 =!= 0),
      Seq("o_orderstatus"), "cents")
    assert(incremental.exceptAll(full).isEmpty &&
      full.exceptAll(incremental).isEmpty)
  }

  test("NULL-keyed groups merge instead of duplicating") {
    import spark.implicits._
    val base = Seq((Some("a"), 10L), (None: Option[String], 7L))
      .toDF("k", "v")
    val inserts = Seq((None: Option[String], 5L)).toDF("k", "v")
    val got = Ivm.refresh(Ivm.build(base, Seq("k"), "v"),
        inserts, inserts.limit(0), Seq("k"), "v")
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(got === Set((Some("a"), 1L, 1L, 10L), (None, 2L, 2L, 12L)),
      "groupBy treats NULL as one group; the delta merge must too")
  }

  test("all-NULL-valued groups keep total = NULL through refresh") {
    import spark.implicits._
    val base = Seq(("a", None: Option[Long]), ("b", Some(3L)))
      .toDF("k", "v")
    val inserts = Seq(("a", None: Option[Long])).toDF("k", "v")
    val got = Ivm.refresh(Ivm.build(base, Seq("k"), "v"),
        inserts, inserts.limit(0), Seq("k"), "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(("a", 2L, 0L, None), ("b", 1L, 1L, Some(3L))),
      "sum over only NULLs is NULL in build(); refresh must not coin a 0")
  }

  test("deleting the last non-NULL value turns total back to NULL") {
    import spark.implicits._
    val base = Seq(("a", Some(5L)), ("a", None: Option[Long])).toDF("k", "v")
    val deletes = Seq(("a", Some(5L))).toDF("k", "v")
    val got = Ivm.refresh(Ivm.build(base, Seq("k"), "v"),
        deletes.limit(0), deletes, Seq("k"), "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(("a", 1L, 0L, None)),
      "the nn counter is what distinguishes total=0 from total=NULL")
  }

  test("deleting more than was inserted leaves a visible negative count") {
    import spark.implicits._
    val base = Seq(("a", 1L)).toDF("k", "v")
    val deletes = Seq(("a", 1L), ("a", 1L)).toDF("k", "v")
    val got = Ivm.refresh(Ivm.build(base, Seq("k"), "v"),
        base.limit(0), deletes, Seq("k"), "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", -1L, -1L, -1L)),
      "contract violations stay visible for reconciliation, not clamped")
  }

  test("refreshJoin folded over batches equals the full rejoin, duplicates preserved") {
    import spark.implicits._
    val a0 = Seq((1L, "x"), (2L, "y"), (2L, "y2")).toDF("k", "av")
    val b0 = Seq((1L, 10L), (1L, 11L), (3L, 30L)).toDF("k", "bv")
    // two maintenance rounds with inserts on BOTH sides each round
    val rounds = Seq(
      (Seq((3L, "z"), (1L, "x2")), Seq((2L, 20L))),
      (Seq((2L, "y3")), Seq((2L, 21L), (1L, 12L))))
    var aCur = a0
    var bCur = b0
    var view = a0.join(b0, Seq("k"))
    for ((da, db) <- rounds) {
      val dA = da.toDF("k", "av")
      val dB = db.toDF("k", "bv")
      val bNew = bCur.unionByName(dB)
      view = Ivm.refreshJoin(view, dA, aCur, dB, bNew, Seq("k"))
      aCur = aCur.unionByName(dA)
      bCur = bNew
    }
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    assert(multiset(view) === multiset(aCur.join(bCur, Seq("k"))),
      "incremental decomposition must equal the full rejoin as a MULTISET")
  }
}
