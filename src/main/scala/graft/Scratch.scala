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

    if (args.isEmpty) {
      println(
        """usage: Scratch [explain:<query>]... [ngramprof] [cleanprof] [<query>]...
          |  explain:<name>  print the formatted physical plan
          |  ngramprof       stage-by-stage n-gram Jaccard profile
          |  cleanprof       stage-by-stage corpus-clean profile
          |  <name>          time the query through the noop sink
          |running the default audit set (5 most expensive from the last
          |bench) since no args were given...""".stripMargin)
    }
    val defaults = Seq("q_ngram_jaccard", "q_corpus_clean", "q_dedup_minhash",
      "q_percentile", "q_multijoin_revenue")

    time("warmup")(runNoop("q_grouped_sum"))
    if (args.contains("cleanprof")) {
      import org.apache.spark.sql.functions._
      import graft.operators.{CorpusClean, Dedup, TextAnalysis}
      // mirrors CorpusClean.clean stage for stage (same persist points)
      graft.functions.VectorFunctions.register(spark)
      val docs = Tables.t(spark, dir, "documents")
      val filtered = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          call_function("norm_ws", col("text")).as("norm_text"))
        .where(call_function("clean_gate",
          col("norm_text"), lit("en"), lit(3000L)))
      time("scan+norm+gate")(
        filtered.write.format("noop").mode("overwrite").save())
      val exactKeep = Dedup.dropExactDuplicates(filtered, "doc_id", "norm_text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("exact")(exactKeep.write.format("noop").mode("overwrite").save())
      val sigs = Dedup.signatures(exactKeep, "doc_id", "norm_text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("signatures")(sigs.write.format("noop").mode("overwrite").save())
      val pairs = Dedup.minhashPairs(exactKeep, "doc_id", "norm_text", 0.8)
      time("minhash(bands+verify)")(
        pairs.write.format("noop").mode("overwrite").save())
      val dropIds = pairs.select(col("doc_b").as("doc_id")).distinct()
      val out = exactKeep.join(dropIds, Seq("doc_id"), "left_anti")
      time("antijoin")(out.write.format("noop").mode("overwrite").save())
    }
    if (args.contains("ngramprof")) {
      import org.apache.spark.sql.functions._
      val sh = Tables.t(spark, dir, "documents")
        .select(col("doc_id"),
          expr(graft.operators.Dedup.shinglesExpr(
            graft.operators.Dedup.wordsExpr("text"))).as("sh"))
        .where(expr("size(sh) >= 1"))
      time("shingles")(sh.write.format("noop").mode("overwrite").save())
      val e = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      time("explode")(e.write.format("noop").mode("overwrite").save())
      val c = e.as("a")
        .join(e.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
      time("join+agg")(c.write.format("noop").mode("overwrite").save())
    }
    val modes = Set("ngramprof", "cleanprof")
    val toTime =
      if (args.isEmpty) defaults
      else args.toSeq.filterNot(a => a.startsWith("explain:") || modes(a))
    for (q <- toTime)
      if (q == "clearcache") spark.catalog.clearCache()
      else if (q == "gc") System.gc()
      else time(q)(runNoop(q))
    spark.stop()
  }
}
