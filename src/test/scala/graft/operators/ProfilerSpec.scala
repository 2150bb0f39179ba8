package graft.operators

import graft.SparkSpec

/** Profiler: null counting, exact vs approx distinct, canonical min/max. */
class ProfilerSpec extends SparkSpec {

  test("profile counts nulls and distincts exactly, min/max canonical") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("b"))).toDF("num", "str")
    val got = Profiler.profile(df, Seq("num", "str"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("num") === (("num", 4L, 1L, 2L, "1", "3")))
    assert(got("str") === (("str", 4L, 1L, 2L, "a", "b")))
  }

  test("profileApprox matches exact distincts on a low-cardinality column") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val exact = Profiler.profile(orders, Seq("o_orderstatus"))
      .select("n_distinct").head().getLong(0)
    val approx = Profiler.profileApprox(orders, Seq("o_orderstatus"))
      .select("n_distinct").head().getLong(0)
    assert(exact === approx, "HLL is exact at tiny cardinality")
  }
}
