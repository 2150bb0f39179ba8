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
    val registry = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }

    // Median-of-3: single-run numbers on this box swing up to 4× with no
    // code change (r5 verdict: q_group_split 4.33 vs 11.72 s across two
    // runs of identical code — one GC/JIT episode smearing a contiguous
    // alphabetical stretch). Running the FULL registry three times (rather
    // than 3 back-to-back reps per query) separates the reps of any one
    // query by minutes, so a transient GC episode can poison at most one
    // of its three samples — the median survives.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val runs: Seq[Map[String, Double]] = (1 to reps).map { _ =>
      registry.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try run(fn) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        // Isolation (untimed): drop blocks a query left persisted so no
        // query's residue contaminates the next timing (r4 verdict: the
        // pagerank queries' stranded rank cuts inflated q_project_scalar
        // 40× purely by alphabetical adjacency).
        spark.catalog.clearCache()
        name -> dt
      }.toMap
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val stats = registry.map { case (name, _) =>
      val samples = runs.map(_(name))
      (name, median(samples), samples.min, samples.max)
    }
    def fmt(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    // stdout line: per-query MEDIANS as plain scalars (the shape every
    // prior round's record uses, so round-over-round diffs keep working)
    val qs = stats.map { case (k, med, _, _) => s"\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val total = stats.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$reps,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // full per-query detail (median + min/max spread) for the side file
    val detail = stats.map { case (k, med, mn, mx) =>
      s"\"" + k + s"""":{"med":${fmt(med)},"min":${fmt(mn)},"max":${fmt(mx)},"spread":${fmt(mx - mn)}}"""
    }.mkString("{", ",", "}")
    val detailLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$reps,"queries":$detail,"sf":"$sfDir"}"""
    // The driver captures stdout with a tail that can truncate the
    // alphabetical head of the per-query map; persist the full line so
    // round-over-round comparisons never lose queries. SUBSET runs skip
    // the side file (unless explicitly redirected) — a timing experiment
    // must never clobber the full-registry record it exists to explain.
    if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_OUT"))
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_full.json")),
      detailLine + "\n")
    catch { case e: Throwable =>
      // never fail the bench over the side file, but never lose the
      // signal either — a stale BENCH_full.json silently poisons
      // round-over-round comparisons
      System.err.println(s"[bench] WARNING: could not persist full JSON: $e")
    }
    spark.stop()
  }
}
