package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * All queries read through here so that scan-level concerns (format,
  * partition discovery, future bucketing) live in one place. Parquet scans
  * get predicate pushdown + column pruning from Catalyst for free; at
  * 100 TB the same call works over a partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw long nanos and rebuild a micro-precision
    * timestamp with exact integer division (a double division would lose
    * precision above 2^53 ns). DuckDB truncates ns→µs the same way, so
    * oracle timestamps match bit-for-bit.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
}
