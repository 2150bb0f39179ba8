package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Each query is fully materialized through the
  * built-in `noop` sink — `count()` would let Catalyst prune every computed
  * column and time only the scan+agg skeleton.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Untimed warmup: pays one-time JVM/codegen/classloading cost (~5 s)
    // so per-query numbers measure the queries, not startup.
    SparkEntry.queries.get("q_grouped_sum").foreach(fn =>
      try run(fn) catch { case _: Throwable => () })
    spark.catalog.clearCache()

    // optional subset (args) for timing-isolation experiments; the driver
    // passes no args and times the full registry
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // Isolation (untimed): drop blocks a query left persisted so no
      // query's residue contaminates the next timing (r4 verdict: the
      // pagerank queries' stranded rank cuts inflated q_project_scalar
      // 40× purely by alphabetical adjacency).
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver captures stdout with a tail that can truncate the
    // alphabetical head of the per-query map; persist the full line so
    // round-over-round comparisons never lose queries. SUBSET runs skip
    // the side file (unless explicitly redirected) — a timing experiment
    // must never clobber the full-registry record it exists to explain.
    if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_OUT"))
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_full.json")),
      line + "\n")
    catch { case e: Throwable =>
      // never fail the bench over the side file, but never lose the
      // signal either — a stale BENCH_full.json silently poisons
      // round-over-round comparisons
      System.err.println(s"[bench] WARNING: could not persist full JSON: $e")
    }
    spark.stop()
  }
}
