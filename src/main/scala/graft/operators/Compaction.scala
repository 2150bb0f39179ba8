package graft.operators

import scala.collection.parallel.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the `OPTIMIZE` verb. Streaming sinks and
  * over-parallel writers leave 100 TB tables as millions of KB-sized
  * parquet files; every subsequent scan then pays per-file open/footer
  * costs that dwarf the data read. Compaction bin-packs small files into
  * target-sized ones without touching row contents.
  *
  * Mechanics (the same shape Delta/Iceberg `OPTIMIZE` uses):
  *  1. list the table's files — a driver-side METADATA operation (file
  *     count × ~100 B; at a million files that is 100 MB of listing, the
  *     known ceiling of path-listing table layouts — table formats move
  *     this into a manifest, the bin-pack below is unchanged);
  *  2. greedy best-fit-decreasing pack into bins of ≤ `targetBytes`
  *     (files already ≥ target stay alone — never rewritten into
  *     something bigger);
  *  3. one Spark job per bin batch, each reading ITS OWN file list and
  *     writing `coalesce(1)` — bins rewrite in parallel (driver-side
  *     `.par` over bins), each task streams one bin's rows; no shuffle
  *     anywhere, the only data movement is read+rewrite of the small
  *     files themselves.
  *
  * Row contents, ordering within a file, and schema are preserved
  * bit-for-bit (CompactionSpec asserts content identity and the output
  * file-count bound).
  */
object Compaction {

  final case class Bin(files: Seq[String], bytes: Long)

  /** Greedy best-fit-decreasing pack of (path, size) into ≤targetBytes
    * bins. Deterministic: files sorted by (size desc, path); capacity
    * ties pick the lowest bin index. A TreeMap keyed on remaining
    * capacity makes each placement O(log bins) — a linear first-fit scan
    * is O(files·bins), minutes of driver stall at the million-file scale
    * this metadata pass is budgeted for. */
  def pack(files: Seq[(String, Long)], targetBytes: Long): Seq[Bin] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    // remaining capacity -> bin indices at that capacity (lowest first)
    val byCap = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]()
    def offer(cap: Long, idx: Int): Unit =
      if (cap > 0)
        byCap.computeIfAbsent(cap, _ => new java.util.TreeSet[Integer]())
          .add(Integer.valueOf(idx))
    for ((path, sz) <- files.sortBy { case (p, s) => (-s, p) }) {
      val entry = byCap.ceilingEntry(sz) // tightest bin that still fits
      if (entry == null) {
        val idx = bins.length
        bins += ((scala.collection.mutable.ArrayBuffer(path), sz))
        offer(targetBytes - sz, idx) // oversized files stay alone
      } else {
        val idx = entry.getValue.first()
        entry.getValue.remove(idx)
        if (entry.getValue.isEmpty) byCap.remove(entry.getKey)
        val (ps, used) = bins(idx)
        ps += path
        bins(idx) = (ps, used + sz)
        offer(entry.getKey - sz, idx)
      }
    }
    bins.map { case (ps, used) => Bin(ps.toSeq, used) }.toSeq
  }

  /** Compact the parquet table at `inPath` into `outPath` with files of
    * roughly `targetBytes`. Returns per-bin stats (bin, n_input_files,
    * input_bytes) — the rewrite audit. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): DataFrame = {
    import spark.implicits._
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // FLAT layouts only, and loudly so: a partitioned table would list
    // zero files here, and silently writing an empty "compacted" output
    // is how maintenance jobs lose data. Partitioned tables compact per
    // leaf directory (partition values live in the path, not the rows —
    // a recursive rewrite would drop those columns).
    val files = fs.listStatus(new Path(inPath))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen))
      .toSeq
    require(files.nonEmpty,
      s"no parquet files directly under $inPath (partitioned/nested " +
        "layout? compact each leaf directory instead)")
    val bins = pack(files, targetBytes)
    val out = new Path(outPath)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    // parallel per-bin rewrite: independent no-shuffle jobs
    bins.zipWithIndex.par.foreach { case (bin, i) =>
      spark.read.parquet(bin.files: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outPath/bin_$i")
    }
    bins.zipWithIndex.map { case (bin, i) =>
      (i.toLong, bin.files.size.toLong, bin.bytes)
    }.toDF("bin", "n_input_files", "input_bytes")
  }

  /** Read back a compacted table (the `bin_*` subdirectories as one
    * relation). */
  def readCompacted(spark: SparkSession, outPath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(outPath)
}
