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
}
