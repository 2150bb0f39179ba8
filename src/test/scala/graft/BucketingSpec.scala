package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed co-located joins (the 100 TB shuffle-elimination path): two
  * tables bucketed on the join key join WITHOUT any Exchange in the
  * physical plan — the pre-partitioning substitutes for the shuffle.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.t(spark, sfDir, "orders")
      val customer = Tables.t(spark, sfDir, "customer")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").count()

      val exec = joined.queryExecution.executedPlan
      val shufflesInJoin = exec.collect { case s: ShuffleExchangeExec => s }
      // exactly one exchange is allowed: the groupBy after the join
      // (keyed on c_mktsegment); the JOIN itself must not shuffle
      assert(shufflesInJoin.length <= 1,
        s"expected bucketed join to avoid shuffles, got:\n$exec")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("AQE skew-join splits a manufactured hot key at runtime") {
    import spark.implicits._
    // one key owns ~90% of the left side; thresholds lowered so the test
    // data qualifies as "skewed" under the same machinery a 100 TB run
    // relies on (OptimizeSkewedJoin splitting oversized partitions)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = (1 to 200000).map(i =>
        (if (i % 10 == 0) (i % 50).toLong + 1 else 0L, s"payload_$i"))
        .toDF("k", "v")
      val right = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
        .repartition(4) // defeat broadcast sizing; force a shuffle join
      val joined = left.join(right, "k").groupBy("name").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skewed"),
        s"AQE did not mark/split the hot partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
