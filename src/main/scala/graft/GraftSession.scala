package graft

import org.apache.spark.sql.SparkSession

/** Front door for library users: a SparkSession builder pre-loaded with the
  * engine's recommended configuration and native functions.
  *
  * On a real cluster the same settings apply (only master/partitions
  * change): AQE with skew-join handling on, shuffle partitions sized to
  * cores (not the 200 default), UTC session time, and the engine's
  * Catalyst functions registered — equivalent to launching with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftSession {

  /** RocksDB-backed streaming state (SURVEY.md §2.9 scale note): the
    * default HDFS-backed store keeps every key of every stateful operator
    * on the executor HEAP — fine for the reference's one-Boolean-per-NIF
    * state, fatal for 100 TB-scale state like [[streaming.StreamingDedup]]'s
    * per-bucket claims. RocksDB spills state to local disk with bounded
    * memory and incremental checkpointing. Session-wide default here;
    * per-query override via the same key in `writeStream` options'
    * sibling conf if mixed workloads need it. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      rocksDbState: Boolean = false, cbo: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val b1 =
      if (rocksDbState)
        b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
      else b
    // cost-based optimization: meaningful only after `ANALYZE TABLE ...
    // COMPUTE STATISTICS FOR ALL COLUMNS` on the catalog tables — with
    // stats, the optimizer reorders multi-way joins from estimated
    // cardinalities instead of relying on AQE + hints at runtime (the
    // difference between the right plan and a lucky one on a 6-way join
    // over 100 TB). Histograms sharpen selectivity on skewed columns.
    // See CboSpec for the measured effect.
    if (cbo)
      b1.config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.statistics.histogram.enabled", "true")
    else b1
  }

  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    // idempotent — covers sessions created before the extensions conf
    functions.VectorFunctions.register(spark)
    multimodal.MediaFunctions.register(spark)
    spark
  }
}
