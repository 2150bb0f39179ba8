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

  /** `events.ts` has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects, so it is read as raw long nanos and
    * rebuilt as a micro-precision timestamp with exact integer division (a
    * double division would lose precision above 2^53 ns; DuckDB truncates
    * ns→µs the same way, so oracle timestamps match bit-for-bit) — or as
    * plain TIMESTAMP(MICROS), which needs only a cast from the inferred
    * TIMESTAMP_NTZ to the session-zone type every downstream window/agg
    * expects (session tz is pinned UTC, so the instant is unchanged).
    * Branch on the type the reader actually produced.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts", raw("ts").cast("timestamp"))
    }
  }
}
