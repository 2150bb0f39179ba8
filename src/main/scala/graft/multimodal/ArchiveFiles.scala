package graft.multimodal

import java.util.zip.Inflater

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

/** FILE-backed splittable archive ingestion — the missing half of
  * [[Archives]] (whose walkers take in-memory `BinaryType` rows, capped
  * at 2 GiB and one task per archive). A real 100 TB corpus is
  * `.warc.gz` / `.warc.zst` / `.tar` FILES in object storage; this
  * module makes those files splittable the way a production pipeline
  * actually does it:
  *
  *  1. '''Index pass''' ([[buildIndex]]) — one streaming task per file
  *     walks member boundaries with the REAL parsers (gzip member
  *     inflate + CRC, zstd frame-header walk, tar 512-block arithmetic)
  *     through a bounded sliding window (memory is O(window), not
  *     O(file)), and persists a boundary index `(path, member_offset,
  *     member_len)` as parquet. Tar never reads payload bytes at all —
  *     the header states the size, so the walk SEEKS over members.
  *     This pass is sequential per file because the formats make it so
  *     (a gzip member's length is only discoverable by inflating it);
  *     it is paid ONCE, and it is exactly what petabyte WARC pipelines
  *     ship as sidecar index files.
  *  2. '''Serve pass''' ([[readWarcMembers]] / [[readTarMembers]]) —
  *     splits are planned FROM the
  *     index (`member_offset / targetSplitBytes`), so one large archive
  *     fans out to many tasks, each doing ranged reads (seek + read per
  *     member) of only its byte range. No task ever materializes a
  *     whole file; a 10 GiB archive with a 128 MiB split target becomes
  *     ~80 parallel tasks.
  *
  * File access goes through the Hadoop [[FileSystem]] API, so the same
  * code paths serve `file://` here and `hdfs://`/`s3a://` on a cluster.
  * Corrupt files follow the package's never-throw contract: the index
  * walk stops at the first unparseable boundary (downstream boundaries
  * are unknowable), a corrupt member at serve time is dropped.
  *
  * Reference scope: the reference tails a packed capture stream from ONE
  * process (/root/reference/src/main/java/org/test/pcap4j/
  * CaptureNetworkReceiver.java:23-128); file-backed boundary-indexed
  * ingestion is that same stream-to-records step re-expressed for a
  * distributed filesystem corpus.
  */
object ArchiveFiles {

  /** Initial sliding-window size for boundary walks; grows geometrically
    * (up to [[MaxWindowBytes]]) if a single member outsizes it. */
  val WindowBytes: Int = 4 << 20
  val MaxWindowBytes: Int = 512 << 20

  final case class MemberBoundary(path: String, member_offset: Long,
      member_len: Long)

  /** Hadoop [[org.apache.hadoop.conf.Configuration]] is a Writable, not
    * Serializable; ship it to executors through its own wire format so
    * scheme-specific settings (s3a credentials providers, hdfs
    * nameservices) survive. (Spark's internal equivalent is
    * private[spark].) */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  // ================================================= fixture files

  /** Materialize archive records as real files `<dir>/archive-<id><ext>`
    * (ext includes the dot, e.g. ".warc.gz"). Distributed write, one
    * file per record, via the Hadoop FS API (atomic-rename semantics on
    * file:// and hdfs://). An existing file is kept only when its
    * CONTENT matches (length + CRC-32 of the stored bytes) — length
    * alone would keep a stale fixture whenever a changed generator
    * produces same-length different bytes, and the resulting oracle
    * mismatch would point at the wrong code. Tmp names carry the task
    * attempt id so speculative duplicate attempts never collide; both
    * then rename to the same final bytes. */
  def writeDir(ds: Dataset[ArchiveRecord], dir: String, ext: String): Unit = {
    val spark = ds.sparkSession
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val base = new Path(dir)
    val fs0 = base.getFileSystem(conf.value)
    fs0.mkdirs(base)
    ds.foreachPartition { (it: Iterator[ArchiveRecord]) =>
      val fs = new Path(dir).getFileSystem(conf.value)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      it.foreach { rec =>
        val f = new Path(dir, f"archive-${rec.archive_id}%06d$ext")
        val keep = try {
          val st = fs.getFileStatus(f)
          st.getLen == rec.archive.length && {
            val want = new java.util.zip.CRC32
            want.update(rec.archive)
            val got = new java.util.zip.CRC32
            val in = fs.open(f)
            try {
              val buf = new Array[Byte](64 << 10)
              var n = in.read(buf)
              while (n > 0) { got.update(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            got.getValue == want.getValue
          }
        } catch { case _: java.io.FileNotFoundException => false }
        if (!keep) {
          val tmp = new Path(dir,
            f".archive-${rec.archive_id}%06d$ext.$attempt%d.tmp")
          val out = fs.create(tmp, true)
          out.write(rec.archive)
          out.close()
          fs.delete(f, false)
          fs.rename(tmp, f)
        }
      }
    }
  }

  // ================================================= index pass

  /** List the archive files of `dir` with extension `ext`, sorted —
    * deterministic task assignment. */
  private def listArchives(spark: SparkSession, dir: String,
      ext: String): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(ext) &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
      .sorted
  }

  /** A bounded sliding window over one file. `view(off, want)` returns
    * (buffer, idx) such that buffer(idx) is file offset `off` and AT
    * LEAST min(want, bytes-to-EOF) bytes are present — and, crucially,
    * EVERY byte of the returned buffer is a valid file byte (the member
    * parsers bound themselves by `buffer.length`, so a partially-filled
    * window would let them read stale garbage past EOF). */
  private final class FileWindow(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long) {
    private var buf = Array.emptyByteArray
    private var bufStart = 0L

    def view(off: Long, want: Int): (Array[Byte], Int) = {
      val avail = math.min(want.toLong, fileLen - off).toInt
      if (off >= bufStart && off - bufStart + avail <= buf.length)
        return (buf, (off - bufStart).toInt)
      val size = math.max(math.min(WindowBytes.toLong, fileLen - off).toInt,
        avail)
      buf = new Array[Byte](size)
      in.readFully(off, buf, 0, size)
      bufStart = off
      (buf, 0)
    }
  }

  /** Read a ZIP file's central directory WITHOUT scanning the file: the
    * EOCD lives in the last 22+65535 bytes, names the CD's offset/size,
    * and the CD names every member's local-header offset — ZIP is the
    * one archive format whose boundary index is free (two tail-ranged
    * reads instead of a full sequential walk; a ZIP64 archive adds one
    * more ranged read for the ZIP64 EOCD record). ZIP64-aware end to
    * end — locator + EOCD record for the CD extent and entry count,
    * [[Archives.parseCentralDirectory]] for per-entry 0xFFFFFFFF
    * placeholders — since streaming writers emit that layout at ANY
    * size, and >4 GiB archives require it. Returns (cdOffset, entries)
    * or None on any structural violation. */
  private def readZipDirectory(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long): Option[(Long, Vector[Archives.ZipEntry])] = {
    if (fileLen < 22) return None
    val tailLen = math.min(fileLen, 22L + 65535L).toInt
    val tailStart = fileLen - tailLen
    val tail = new Array[Byte](tailLen)
    in.readFully(tailStart, tail, 0, tailLen)
    var eocd = -1
    var p = tailLen - 22
    while (eocd < 0 && p >= 0) {
      if (tail(p) == 0x50 && tail(p + 1) == 0x4b && tail(p + 2) == 0x05 &&
          tail(p + 3) == 0x06 &&
          ByteIo.le16(tail, p + 20) == tailLen - (p + 22)) eocd = p
      p -= 1
    }
    if (eocd < 0) return None
    var entries: Long = ByteIo.le16(tail, eocd + 10)
    if (ByteIo.le16(tail, eocd + 8) != entries) return None // single disk
    var cdSize = ByteIo.le32u(tail, eocd + 12)
    var cdOff = ByteIo.le32u(tail, eocd + 16)
    val eocdAbs = tailStart + eocd
    if (eocdAbs >= 20) {
      // ZIP64 EOCD locator directly precedes the EOCD when present
      val loc: Array[Byte] =
        if (eocd >= 20) java.util.Arrays.copyOfRange(tail, eocd - 20, eocd)
        else {
          val buf = new Array[Byte](20)
          in.readFully(eocdAbs - 20, buf, 0, 20)
          buf
        }
      if (ByteIo.le32u(loc, 0) == 0x07064b50L) {
        if (ByteIo.le32u(loc, 4) != 0 || ByteIo.le32u(loc, 16) != 1)
          return None
        val z64 = ByteIo.le64(loc, 8)
        // subtraction form: z64 + 56 overflows for hostile offsets
        if (z64 < 0 || z64 > eocdAbs - 76) return None
        val rec = new Array[Byte](56)
        in.readFully(z64, rec, 0, 56)
        if (ByteIo.le32u(rec, 0) != 0x06064b50L) return None
        if (ByteIo.le32u(rec, 16) != 0 || ByteIo.le32u(rec, 20) != 0)
          return None // single disk, CD starts on it
        entries = ByteIo.le64(rec, 24)
        if (entries != ByteIo.le64(rec, 32)) return None
        cdSize = ByteIo.le64(rec, 40)
        cdOff = ByteIo.le64(rec, 48)
        if (entries < 0 || cdSize < 0 || cdOff < 0 || cdSize > z64 ||
            cdOff > z64 - cdSize) return None // overflow-safe sum guard
      }
    }
    if (cdSize > (64 << 20) || cdOff > eocdAbs - cdSize) return None
    val cd =
      if (cdOff >= tailStart && cdOff + cdSize <= fileLen) // inside the tail
        java.util.Arrays.copyOfRange(tail, (cdOff - tailStart).toInt,
          (cdOff - tailStart + cdSize).toInt)
      else {
        val buf = new Array[Byte](cdSize.toInt)
        in.readFully(cdOff, buf, 0, buf.length)
        buf
      }
    Archives.parseCentralDirectory(cd, entries).map(es => (cdOff, es))
  }

  /** Member extents [localOffset, nextLocalOffset) derived from the
    * central directory — descriptor-proof (the span includes any data
    * descriptor; decode uses the CD's authoritative sizes). Strictly
    * validated: offsets must be increasing and end at the CD. */
  private def zipBoundaries(cdOff: Long,
      entries: Vector[Archives.ZipEntry]): Option[Vector[(Long, Long)]] = {
    val sorted = entries.map(_.localOffset).sorted
    if (sorted.isEmpty) return Some(Vector.empty)
    val ends = sorted.drop(1) :+ cdOff
    val spans = sorted.zip(ends).map { case (a, b) => (a, b - a) }
    val ok = sorted.head >= 0 &&
      sorted.zip(sorted.drop(1)).forall { case (a, b) => a < b } &&
      spans.forall(_._2 >= 30)
    if (!ok) return None
    // extents derive from ALL entries (consecutive offsets), but members
    // beyond the decode cap are excluded from the index up front — the
    // EXACT bound Archives.zipMember enforces (uncompSize only: an
    // incompressible DEFLATE member whose compSize tops the cap while
    // uncompSize stays under it is still servable, and the row-based
    // zipExplode serves it — the twins must agree). compSize ≤ extent is
    // a CD-sanity check only: a lying compSize would fail the ranged
    // decode anyway.
    val byEntry = entries.map(e => e.localOffset -> e).toMap
    Some(spans.filter { case (o, len) =>
      byEntry.get(o).exists(e =>
        e.uncompSize <= Gzip.MaxDecodedBytes.toLong && e.compSize <= len) })
  }

  /** Walk ONE file's member boundaries. `fmt` ∈ {"warc.gz", "warc.zst",
    * "tar", "zip"}. Never throws: stops at the first boundary it cannot
    * prove (zip: all-or-nothing — the boundaries come from one trusted
    * central directory, and a lying CD invalidates every extent). */
  private def walkBoundaries(fs: FileSystem, path: String, fmt: String,
      inf: Inflater): Vector[MemberBoundary] = {
    val out = Vector.newBuilder[MemberBoundary]
    val p = new Path(path)
    val fileLen =
      try fs.getFileStatus(p).getLen
      catch { case scala.util.control.NonFatal(_) => return out.result() }
    val in =
      try fs.open(p)
      catch { case scala.util.control.NonFatal(_) => return out.result() }
    try {
      val win = new FileWindow(in, fileLen)
      var off = 0L
      var done = false
      while (!done && off < fileLen) {
        fmt match {
          case "tar" =>
            // header-only walk: read 512 bytes, trust the (checksummed)
            // size field, SEEK over the payload — no member bytes read.
            // GNU @LongLink ('L') / PAX ('x'/'g') meta members extend
            // the CURRENT extent instead of closing one: a ranged read
            // of a long-name member must start at its meta header so
            // the serve-side parse sees the whole logical member.
            val start = off
            var metas = 0
            var chain = true
            while (chain) {
              if (off + 512 > fileLen) { done = true; chain = false }
              else {
                val (b, i) = win.view(off, 512)
                Archives.tarRawHeader(b, i) match {
                  // same member-size cap as the row-based
                  // Archives.tarMembers walk, so no indexed boundary can
                  // exceed what the serve pass will materialize — the
                  // serve-side len guard is defense-in-depth only
                  case Some((_, size, tf))
                      if size <= Gzip.MaxDecodedBytes.toLong =>
                    val mlen = 512L + ((size + 511) / 512) * 512
                    if (off + mlen > fileLen) { done = true; chain = false }
                    else if (tf == 'L' || tf == 'x' || tf == 'g') {
                      // >8-meta chain = structural violation, same rule
                      // as the row-based tarLogicalMember (metas <= 8
                      // loop guard): STOP the walk — emitting the 9th
                      // meta as a bogus terminal boundary would make
                      // the twins diverge on the same input
                      if (metas < 8) { off += mlen; metas += 1 }
                      else { done = true; chain = false }
                    } else {
                      out += MemberBoundary(path, start, off + mlen - start)
                      off += mlen
                      chain = false
                    }
                  case _ => done = true; chain = false
                }
              }
            }
          case "warc.gz" =>
            // a gzip member's length is only discoverable by inflating;
            // grow the window geometrically if a member outsizes it
            var want = WindowBytes
            var parsed: Option[(Long, Array[Byte])] = None
            var give = false
            while (parsed.isEmpty && !give) {
              if (want > MaxWindowBytes) give = true
              else {
                val (b, i) = win.view(off, want)
                parsed = Archives.gzipMemberAt(b, i, inf)
                if (parsed.isEmpty) {
                  val covered = b.length - i // valid bytes from off
                  if (off + covered >= fileLen) give = true // true corruption
                  else want = covered * 2
                }
              }
            }
            parsed match {
              case Some((mlen, _)) =>
                out += MemberBoundary(path, off, mlen); off += mlen
              case None => done = true
            }
          case "zip" =>
            // NO walk at all: two tail-ranged reads (EOCD, then CD)
            // yield every member extent — the cheapest index any
            // format here offers
            val spans = for {
              (cdOff, entries) <- readZipDirectory(in, fileLen)
              s <- zipBoundaries(cdOff, entries)
            } yield s
            spans.getOrElse(Vector.empty).foreach { case (offm, len) =>
              out += MemberBoundary(path, offm, len)
            }
            done = true
          case "warc.zst" =>
            // frame-header walk (block sizes are declared): the frame's
            // bytes must be present but are never decompressed
            var want = WindowBytes
            var size = -1L
            var give = false
            while (size <= 0 && !give) {
              if (want > MaxWindowBytes) give = true
              else {
                val (b, i) = win.view(off, want)
                val covered = b.length - i
                val s =
                  try com.github.luben.zstd.Zstd.findFrameCompressedSize(b, i)
                  catch { case scala.util.control.NonFatal(_) => -1L }
                if (s > 0 && !com.github.luben.zstd.Zstd.isError(s) &&
                    s <= covered) size = s
                else if (off + covered >= fileLen) give = true
                else want = covered * 2
              }
            }
            if (size <= 0) done = true
            else { out += MemberBoundary(path, off, size); off += size }
          case _ => done = true
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    finally in.close()
    out.result()
  }

  /** Index pass: one streaming task per file; returns `(path,
    * member_offset, member_len)`. Persist the result with
    * [[writeIndex]] — the index is the write-once artifact every later
    * read plans its splits from. */
  def buildIndex(spark: SparkSession, dir: String, fmt: String): DataFrame =
    indexFiles(spark, listArchives(spark, dir, "." + fmt), fmt)

  /** Index an EXPLICIT file list (the incremental entry point: a file
    * stream hands each micro-batch the newly-discovered archives and
    * only those are walked — see
    * [[graft.streaming.StreamingCorpusClean.attachWarcZstFiles]]). */
  def indexFiles(spark: SparkSession, paths: Seq[String],
      fmt: String): DataFrame = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    // each file is walked sequentially (the formats force it), but tiny
    // files batch several-per-task: one task per file across a 100k-file
    // crawl directory is pure scheduling overhead (measured: the three
    // file-backed queries fell from 5.7-6.3 s to 2.2-3.0 s medians at
    // sf0.1 — ~55% was the 625-single-file-task floor)
    val n = math.max(1, math.min(paths.size,
      spark.sparkContext.defaultParallelism * 2))
    spark.createDataset(paths).repartition(n)
      .mapPartitions { it =>
        val inf = new Inflater(true)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => inf.end())
        it.flatMap { path =>
          val fs = new Path(path).getFileSystem(conf.value)
          walkBoundaries(fs, path, fmt, inf)
        }
      }
      .toDF()
  }

  /** Persist + reload the boundary index (overwrite: the index derives
    * entirely from the files; rebuilding is idempotent). */
  def writeIndex(index: DataFrame, path: String): DataFrame = {
    index.write.mode(SaveMode.Overwrite).parquet(path)
    index.sparkSession.read.parquet(path)
  }

  /** The archive listing an index was (or would be) built from: one
    * line per file, `path \t length \t mtime`, sorted — byte-equal
    * listings mean byte-equal indexes, because the boundary walk is a
    * pure function of file contents and (length, mtime) is the
    * object-store-grade change signal. */
  private def listingManifest(spark: SparkSession, dir: String,
      fmt: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    listArchives(spark, dir, "." + fmt).map { p =>
      val st = new Path(p).getFileSystem(conf).getFileStatus(new Path(p))
      s"$p\t${st.getLen}\t${st.getModificationTime}"
    }.mkString("\n")
  }

  /** Reuse-or-rebuild entry point — the index is the WRITE-ONCE artifact
    * every later read plans splits from, so the steady-state path must
    * be serve-only: re-walking unchanged archives on every query is pure
    * waste (at 100 TB it is the difference between a metadata check and
    * re-streaming the corpus). The index dir carries a sidecar manifest
    * of the exact (path, length, mtime) listing it was built from; when
    * the current listing matches and the index committed (`_SUCCESS`),
    * the walk is skipped entirely. Any drift — new, deleted, grown, or
    * rewritten file — rebuilds the whole index (boundary walks are
    * per-file sequential anyway, and correctness beats cleverness at the
    * rebuild boundary). */
  def ensureIndex(spark: SparkSession, dir: String, fmt: String,
      indexPath: String): DataFrame = {
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestPath = new Path(indexPath + ".manifest")
    val current = listingManifest(spark, dir, fmt)
    val valid =
      try {
        fs.exists(manifestPath) &&
        fs.exists(new Path(indexPath, "_SUCCESS")) && {
          val in = fs.open(manifestPath)
          val stored =
            try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          stored == current
        }
      } catch { case scala.util.control.NonFatal(_) => false }
    if (valid) spark.read.parquet(indexPath)
    else {
      val idx = writeIndex(buildIndex(spark, dir, fmt), indexPath)
      val out = fs.create(manifestPath, true)
      out.write(current.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      idx
    }
  }

  // ================================================= serve pass

  /** Shared serve scaffolding: bucket the index rows into
    * `member_offset / targetSplitBytes` ranges, run one task per
    * (path, bucket), open the file once per group with task-scoped
    * cleanup, and hand each member's ranged bytes to the format's
    * decoder. `makeDecoder` runs once per group — it may allocate
    * per-task native state (Inflater) or prime per-file metadata (the
    * ZIP central directory) and register its own completion listeners.
    * Members above [[MaxWindowBytes]] cannot occur in OUR indexes (the
    * index passes cap member sizes — see [[walkBoundaries]]); the guard
    * protects against a foreign or hand-edited index and follows the
    * package's drop-not-throw contract. */
  private def serveSplits[T: org.apache.spark.sql.Encoder](index: DataFrame,
      targetSplitBytes: Long)(
      makeDecoder: (String, FileSystem, org.apache.hadoop.fs.FSDataInputStream)
        => (Long, Long) => Option[T]): org.apache.spark.sql.Dataset[T] = {
    val spark = index.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    planSplits(index, targetSplitBytes)
      .groupByKey { case (path, split, _, _) => (path, split) }
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val path = key._1
        val fs = new Path(path).getFileSystem(conf.value)
        val in = fs.open(new Path(path))
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        val decode = makeDecoder(path, fs, in)
        it.flatMap { case (_, _, off, len) =>
          if (len > MaxWindowBytes) None else decode(off, len)
        }
      }
  }

  /** One member's bytes via a positioned read. */
  private def readRange(in: org.apache.hadoop.fs.FSDataInputStream,
      off: Long, len: Long): Array[Byte] = {
    val member = new Array[Byte](len.toInt)
    in.readFully(off, member, 0, len.toInt)
    member
  }

  /** A per-task Inflater wired to the task-completion listener. */
  private def taskInflater(): Inflater = {
    val inf = new Inflater(true)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => inf.end())
    inf
  }

  /** Serve WARC members (`.warc.gz` / `.warc.zst`) from a boundary
    * index with per-split parallelism. Output matches
    * [[Archives.warcSplit]] byte for byte: (doc_id, member_offset,
    * member_len, text). */
  def readWarcMembers(index: DataFrame, fmt: String,
      targetSplitBytes: Long = 128L << 20): DataFrame = {
    require(fmt == "warc.gz" || fmt == "warc.zst", s"bad warc format $fmt")
    val spark = index.sparkSession
    import spark.implicits._
    serveSplits[(Long, Long, Long, String)](index, targetSplitBytes) {
      (_, _, in) =>
        val inf = taskInflater()
        (off, len) => {
          val member = readRange(in, off, len)
          val payload =
            if (fmt == "warc.gz") Archives.gzipMemberAt(member, 0, inf).map(_._2)
            else Compressed.zstdDecompress(member)
          payload.flatMap(Archives.warcRecord).flatMap {
            case (Archives.RecordIdPattern(id), data) =>
              Some((id.toLong, off, len,
                new String(data, java.nio.charset.StandardCharsets.UTF_8)))
            case _ => None
          }
        }
    }.toDF("doc_id", "member_offset", "member_len", "text")
  }

  /** Serve ZIP document members from a boundary index; output matches
    * [[Archives.zipExplode]]: (doc_id, text). Each (path, split) task
    * re-reads the tiny central directory once (two tail-ranged reads)
    * for the authoritative per-member metadata — local headers written
    * with data descriptors (e.g. by `ZipOutputStream`) carry zero size
    * fields, so CD-driven decode is what makes streamed-writer zips
    * servable at all — then ranged-reads and CRC-verifies only its
    * assigned members. */
  def readZipMembers(index: DataFrame,
      targetSplitBytes: Long = 128L << 20): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    serveSplits[(Long, String)](index, targetSplitBytes) { (path, fs, in) =>
      val inf = taskInflater()
      val fileLen = fs.getFileStatus(new Path(path)).getLen
      val byOffset: Map[Long, Archives.ZipEntry] =
        readZipDirectory(in, fileLen)
          .map(_._2.map(e => e.localOffset -> e).toMap)
          .getOrElse(Map.empty)
      (off, len) =>
        byOffset.get(off).flatMap { e =>
          Archives.zipMember(readRange(in, off, len),
              e.copy(localOffset = 0), inf)
            .flatMap { data =>
              e.name match {
                case Archives.NamePattern(id) =>
                  Some((id.toLong,
                    new String(data, java.nio.charset.StandardCharsets.UTF_8)))
                case _ => None
              }
            }
        }
    }.toDF("doc_id", "text")
  }

  /** One logical tar member from its ranged bytes: the full GNU/PAX
    * meta-chain parse ([[Archives.tarLogicalMember]] — the extent starts
    * at the meta header for long-name members), id matched on the path's
    * basename. */
  private def tarServeMember(member: Array[Byte], off: Long,
      len: Long): Option[(Long, String, Long, String)] =
    Archives.tarLogicalMember(member, 0).flatMap {
      case (name, tf, poff, size, _) =>
        Archives.baseName(name) match {
          case Archives.NamePattern(id)
              if (tf == '0' || tf == 0) && poff + size <= len =>
            Some((id.toLong, name, off, new String(member, poff, size.toInt,
              java.nio.charset.StandardCharsets.UTF_8)))
          case _ => None
        }
    }

  /** Serve tar members from a boundary index; output matches
    * [[Archives.tarExplode]]: (doc_id, member_offset, text). */
  def readTarMembers(index: DataFrame,
      targetSplitBytes: Long = 128L << 20): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    serveSplits[(Long, Long, String)](index, targetSplitBytes) { (_, _, in) =>
      (off, len) =>
        tarServeMember(readRange(in, off, len), off, len)
          .map { case (id, _, o, text) => (id, o, text) }
    }.toDF("doc_id", "member_offset", "text")
  }

  /** [[readTarMembers]] with the member's full PATH — the surface the
    * long-name (GNU `@LongLink` / PAX `path=`) queries check, since the
    * >100-char path is exactly what a plain ustar header cannot carry. */
  def readTarMemberNames(index: DataFrame,
      targetSplitBytes: Long = 128L << 20): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    serveSplits[(Long, String, String)](index, targetSplitBytes) { (_, _, in) =>
      (off, len) =>
        tarServeMember(readRange(in, off, len), off, len)
          .map { case (id, name, _, text) => (id, name, text) }
    }.toDF("doc_id", "name", "text")
  }

  /** Split planning: (path, split_id, member_offset, member_len), one
    * split per `targetSplitBytes` range of each file. Exposed for the
    * parallelism spec. */
  private[multimodal] def planSplits(index: DataFrame,
      targetSplitBytes: Long): Dataset[(String, Long, Long, Long)] = {
    val spark = index.sparkSession
    import spark.implicits._
    val target = math.max(1L, targetSplitBytes)
    index.select("path", "member_offset", "member_len")
      .as[(String, Long, Long)]
      .map { case (path, off, len) => (path, off / target, off, len) }
  }
}
