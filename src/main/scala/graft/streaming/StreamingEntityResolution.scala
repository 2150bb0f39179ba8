package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental (streaming) entity resolution: new records fold into a
  * stored entity artifact per micro-batch, so the master-data view is
  * always current without ever re-resolving the full corpus.
  *
  * Composition of two individually-proven parts:
  *  - blocking: FastSS deletion-variant keys
  *    ([[graft.operators.FuzzyJoin.deletionVariantKeys]]) persisted as an
  *    append-only index — an arriving record probes the stored keys, so
  *    candidates touch only records sharing a variant (lossless for
  *    edit distance ≤ k), never the corpus;
  *  - clustering: [[graft.operators.Dedup.updateClusters]]' contraction —
  *    verified pairs contract through the stored assignment and connected
  *    components run over the batch-sized contracted graph only.
  *
  * State lives in three artifacts under `base`, not in operator state:
  *  - `members`   (id, s): every record seen, append-only;
  *  - `variants`  (id, h): the blocking index, append-only;
  *  - `clusters`  (doc_id, cluster_id, keep): the assignment as a
  *    doc_id-bucketed partitioned table maintained through
  *    [[UpsertSink.upsertBatch]]'s dynamic-partition-overwrite
  *    discipline — each fold upserts only the CHANGED rows
  *    ([[graft.operators.Dedup.updateClustersDelta]]: members of
  *    clusters the batch touched, plus new docs), so buckets holding
  *    only untouched clusters are NOT rewritten (their files stay
  *    byte-identical, asserted by the spec).
  *
  * Scale notes (100 TB): per batch, work is proportional to the BATCH —
  * its variant keys, the candidate pairs they select, the contracted
  * component graph, and the storage buckets its delta lands in. The two
  * appends are partitioned writes; the variant probe is a shuffled
  * equi-join on 8-byte hashes (a hot variant key is a skewed join key,
  * handled by AQE, never driver memory). The r8 design rewrote the FULL
  * assignment per fold (epoch dirs) — batch-proportional compute but
  * corpus-proportional IO; the bucketed delta upsert removes that last
  * corpus-sized term from the fold.
  *
  * Invariant inherited from the batch operator: cluster labels are the
  * minimum member id, so a streamed fold over any batch split equals the
  * batch recompute on the union (asserted by StreamingEntityResolutionSpec
  * and hash-matched against the brute-force DuckDB oracle by
  * `q_entity_resolution_stream`).
  */
object StreamingEntityResolution {

  private val memberSchema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))
  private val variantSchema = StructType(Seq(
    StructField("id", LongType), StructField("h", LongType)))
  private val clusterSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster_id", LongType),
    StructField("keep", BooleanType)))

  private def membersPath(base: String) = s"$base/members"
  private def variantsPath(base: String) = s"$base/variants"
  private def clustersRoot(base: String) = s"$base/clusters"

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Wipe the artifact directory (fresh run). */
  def init(spark: SparkSession, base: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    hadoopFs(spark, base).delete(p, true)
    ()
  }

  /** Read an artifact with its declared schema — an absent or empty dir
    * (no fold has written yet) reads as an empty relation instead of
    * failing parquet schema inference. */
  private def readOr(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val fs = hadoopFs(spark, path)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Docs-per-bucket partitioning of the clusters table; a fold rewrites
    * only the buckets its delta lands in. 8 here (single-box scale —
    * fewer commit-protocol round trips per fold); on a cluster size it
    * so one bucket ≈ one comfortable task (e.g. 4096 at 100 TB). */
  val ClusterBuckets = 8

  /** The current assignment (doc_id, cluster_id, keep); empty before the
    * first fold. */
  private def readClusters(spark: SparkSession, base: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(clustersRoot(base))
    val fs = hadoopFs(spark, clustersRoot(base))
    if (fs.exists(root))
      spark.read.parquet(clustersRoot(base)).drop("bucket")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], clusterSchema)
  }

  /** Fold one micro-batch of `(idCol, strCol)` records into the artifact.
    * Candidate pairs = batch-vs-stored (variant-index probe) plus
    * batch-vs-batch (variant self-join), exact-verified with thresholded
    * Levenshtein before clustering — blocking is lossless, so the fold
    * result is independent of how records were split into batches. */
  def foldBatch(spark: SparkSession, base: String, batch: DataFrame,
      idCol: String, strCol: String, k: Int): Unit = {
    import graft.operators.{Dedup, FuzzyJoin}
    val storedV = readOr(spark, variantsPath(base), variantSchema)
    val storedM = readOr(spark, membersPath(base), memberSchema)
    // drop ids already folded: makes a replayed micro-batch (foreachBatch
    // is at-least-once after recovery) a no-op instead of a member dup
    val b = batch.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"))
      .join(storedM.select(col("id")), Seq("id"), "left_anti")
      .persist()
    try {
      val bv = FuzzyJoin.deletionVariantKeys(b, "id", "s", k).persist()

      // candidates: new-vs-stored through the persisted index, new-vs-new
      // within the batch; both are equi-joins on the 8-byte variant hash
      val candOld = bv
        .join(storedV.select(col("h"), col("id").as("id_o")), Seq("h"))
        .where(col("id") =!= col("id_o"))
        .select(least(col("id"), col("id_o")).as("id_a"),
          greatest(col("id"), col("id_o")).as("id_b"))
      val candNew = bv
        .join(bv.select(col("h"), col("id").as("id_o")), Seq("h"))
        .where(col("id") < col("id_o"))
        .select(col("id").as("id_a"), col("id_o").as("id_b"))
      val cands = candOld.unionByName(candNew).distinct()

      // exact verify on the candidate rows only (thresholded DP exits
      // early on distant pairs); names come from stored ∪ batch
      val names = storedM.unionByName(b)
      val pairs = cands
        .join(names.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
        .join(names.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
        .withColumn("dist", levenshtein(col("s_a"), col("s_b"), k))
        .where(col("dist") >= 0 && col("dist") <= k)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))

      // changed-rows-only fold (r8 verdict #4): merge the delta into the
      // doc_id-bucketed table; untouched clusters' buckets are untouched
      // files, so fold IO is delta-proportional, not corpus-sized.
      // Leaner than UpsertSink.upsertBatch on purpose — delta keys are
      // unique by construction (no window dedupe) and the affected
      // buckets are collected as LITERALS so the existing-rows read is
      // statically partition-pruned instead of semi-joined.
      val old = readClusters(spark, base)
      val delta = Dedup.updateClustersDelta(old, pairs)
        .withColumn("bucket",
          pmod(xxhash64(col("doc_id")), lit(ClusterBuckets.toLong)))
        .persist()
      try {
        val affected = delta.select("bucket").distinct()
          .collect().map(_.getLong(0))
        if (affected.nonEmpty) {
          val root = clustersRoot(base)
          val exists = hadoopFs(spark, root)
            .exists(new org.apache.hadoop.fs.Path(root))
          val merged =
            if (!exists) delta
            else spark.read.parquet(root)
              .where(col("bucket").isin(affected.toSeq: _*))
              .join(delta.select(col("doc_id").as("__k")),
                col("doc_id") === col("__k"), "left_anti")
              .drop("__k")
              .unionByName(delta)
          // materialize before overwriting the path the merge just read
          val mat = merged.localCheckpoint(true)
          UpsertSink.withDynamicOverwrite(spark) {
            mat.write.mode("overwrite").partitionBy("bucket").parquet(root)
          }
        }
      } finally delta.unpersist()

      // append the batch's index keys and members AFTER the fold has
      // materialized, so this batch never probes its own stored keys
      bv.write.mode("append").parquet(variantsPath(base))
      b.write.mode("append").parquet(membersPath(base))
      bv.unpersist()
    } finally b.unpersist()
  }

  /** The resolved view: every member with its entity id (min custkey of
    * its cluster, itself when unmatched) and the entity's canonical
    * name — same shape as the batch `q_entity_resolution` capstone. */
  def resolved(spark: SparkSession, base: String): DataFrame = {
    val m = readOr(spark, membersPath(base), memberSchema)
    val c = readClusters(spark, base)
    m.join(c.select(col("doc_id").as("id"), col("cluster_id")), Seq("id"), "left")
      .withColumn("entity_id", coalesce(col("cluster_id"), col("id")))
      .join(m.select(col("id").as("entity_id"), col("s").as("canonical_name")),
        Seq("entity_id"))
      .select(col("id"), col("entity_id"), col("canonical_name"))
  }

  /** Attach the fold to a record stream: one artifact fold per
    * micro-batch via foreachBatch. foreachBatch is at-least-once after
    * recovery; the fold's already-seen anti-join makes a replayed batch a
    * no-op (ids must be stable across replay, which exactly-once sources
    * guarantee). */
  def attach(records: DataFrame, base: String, idCol: String, strCol: String,
      k: Int, checkpoint: String): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, _: Long) =>
        foldBatch(df.sparkSession, base, df, idCol, strCol, k)
      }
      .start()
}
