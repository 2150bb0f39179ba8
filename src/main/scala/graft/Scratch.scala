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

    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, dir).write.format("noop")
        .mode("overwrite").save()

    for (name <- args.filter(_.startsWith("explain:")).map(_.stripPrefix("explain:"))) {
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    time("warmup")(runNoop("q_grouped_sum"))
    for (q <- args.filterNot(_.startsWith("explain:")))
      time(q)(runNoop(q))
    spark.stop()
  }
}
