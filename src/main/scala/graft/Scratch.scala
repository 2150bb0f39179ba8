package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/plan-audit harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val audit = Seq("q_multijoin_revenue", "q_tpch_q1", "q_traffic_window",
      "q_sim_topk", "q_dedup_exact", "q_asof_join")
    for (name <- audit if args.contains("explain") || args.isEmpty) {
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, dir).write.format("noop")
        .mode("overwrite").save()
    time("warmup")(runNoop("q_grouped_sum"))
    for (q <- Seq("q_simhash_sig", "q_dedup_simhash", "q_minhash_sig",
        "q_dedup_minhash", "q_embed_neardup"))
      time(q)(runNoop(q))
    spark.stop()
  }
}
