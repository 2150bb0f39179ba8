package graft

/** Mergeable-sketch accuracy: per-group HLL sketches unioned into one
  * estimate must track the exact global distinct count — the contract that
  * makes per-shard pre-aggregation sound at 100 TB. */
class SketchSpec extends SparkSpec {

  test("unioned per-group HLL sketches estimate the global distinct within 5%") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head()
    val row = SparkEntry.queries("q_hll_merge")(spark, sfDir).collect().head
    val est = row.getAs[Long]("est_union")
    assert(est > 0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"union estimate $est drifted >5% from exact $exact")
  }
}
