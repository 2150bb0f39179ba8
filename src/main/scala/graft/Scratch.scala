package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.t(spark, dir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("simhashes")(operators.Dedup.simhashes(docs, "doc_id", "text").count())
    time("simhash_pairs")(operators.Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    time("minhash_signatures")(operators.Dedup.signatures(docs, "doc_id", "text").count())
    time("minhash_pairs")(operators.Dedup.minhashPairs(docs, "doc_id", "text", 0.5).count())
    operators.Similarity.ensureRegistered(spark)
    val emb = Tables.t(spark, dir, "embeddings")
    time("lsh_pairs")(operators.Similarity.lshPairs(emb, "vec_id", "embedding", 0.4).count())
    spark.stop()
  }
}
