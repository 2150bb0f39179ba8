package graft.multimodal

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media payload: opaque bytes + structured metadata. */
final case class MediaRecord(doc_id: Long, media: Array[Byte])

/** Decoded features of a media payload: cheap byte stats plus the REAL
  * container-header metadata from [[MediaHeader]] (None where the field
  * does not apply to the container, or the payload is not recognized). */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    byte_sum: Long,
    header_hex: String,
    format: String,
    width: Option[Long],
    height: Option[Long],
    bit_depth: Option[Long],
    channels: Option[Long],
    sample_rate: Option[Long])

/** Multimodal-column plumbing (SURVEY.md §2.11): image/audio/video as
  * opaque `BinaryType` columns with typed metadata, processed by batched
  * per-partition decoders.
  *
  * The Spark-side shape is real and scale-correct: `Dataset[MediaRecord]`
  * with a `BinaryType` payload, decode as `mapPartitions` (one decoder
  * instance per partition, streaming iterator — no per-row setup, no
  * driver collect; the 100 TB path is "binary parquet in, features out,
  * no shuffle"). The decoders are real, pure-JVM implementations of the
  * published specs: container metadata via [[MediaHeader]] (PNG / BMP /
  * RIFF-WAV / JPEG / GIF) and [[Mp4]], PNG pixels via [[PngCodec]]
  * (java.util.zip.Inflater IS the real zlib), baseline JPEG pixels via
  * [[JpegCodec]] (T.81 Huffman + IDCT, implemented per spec), 16-bit
  * PCM samples read directly (PCM is its own decoded form), GIF frames
  * via [[GifCodec]] (real LZW, interlace, animation), gzip members via
  * [[Gzip]]. Derived on top: perceptual image dHash + banded near-dup
  * pairs over ALL three image formats ([[ImageCodecs]] routing), audio
  * energy-envelope fingerprints, MP4 sample-table frame sampling, real
  * pixel-space resize for every supported format, per-format routing.
  */
object Multimodal {

  /** Bytes shown in `header_hex`: covers the full fixed-layout metadata
    * region of every supported container (PNG IHDR data ends at 28; BMP
    * bpp low byte is 28; WAV sample-rate field ends at 27) while staying
    * strictly short of the PNG IHDR CRC at 29..32 — so a SQL oracle can
    * reconstruct the prefix from first principles without a CRC32. */
  val HeaderHexBytes = 29

  /** Two-stage MULTIPLICATIVE fixture mix, exact in 63 bits on both
    * engines (every intermediate < 2^63, so the DuckDB oracle reproduces
    * it verbatim with xor + integer division). The multiplicative
    * coupling of the group key `a` and the element key `b` is the point:
    * an ADDITIVE mix (a·C1 + b·C2 folded once) decomposes as u(a) + v(b),
    * so the element-to-element DIFFERENCES every gradient-bit signature
    * compares are the SAME for all groups — cross-group hashes correlate
    * and a scale ladder over replicated fixtures manufactures quadratic
    * near-dup pairs (measured: q_crossformat_neardup 31× at 10× data
    * before this mix). Here the per-element stride scales with the group
    * key, so the folds decorrelate across groups.
    *
    * Bounds: `a` is pre-reduced mod 1000003 before the multiply, so the
    * first-stage product stays < 2^63 for ANY non-negative `a` and any
    * `b` ≲ 1.8e8 (element keys here are < 1e5). The remaining ceiling is
    * the CALLER's `base * 131` fold: exact up to doc_id ≈ 7e16, far past
    * any ladder. Without the pre-reduction the first stage overflowed at
    * doc_id ≈ 1.9e8 — silently wrapped on the JVM, raised by DuckDB. */
  private[multimodal] def mix2(a: Long, b: Long): Long = {
    val v = ((a % 1000003L) + 48271L) * b * 48271L
    val w = v ^ (v / 512)
    val x = (w % 1000003L) * 2654435761L
    x ^ (x / 8192)
  }

  /** doc_id → deterministic REAL container payload, for exercising the
    * header parsers without binary files on disk. Valid headers per spec:
    * kind 0 = PNG (signature + IHDR incl a correct CRC32), kind 1 = BMP
    * (54-byte BITMAPINFOHEADER file header, BI_RGB so zero image bytes is
    * legal), kind 2 = canonical WAV (fmt + a 64-byte PCM data chunk whose
    * 16-bit samples follow a fixed arithmetic fill — PCM IS the decoded
    * form, so WAV "decode" here is fully real), kind 3 = JPEG/JFIF (SOI +
    * APP0 + SOF0 + EOI), kind 4 = GIF89a screen descriptor. */
  object MediaFixtures {
    /** Total 16-bit samples in the WAV fixture's data chunk. */
    val WavSamples = 32

    /** Sample i of doc `docId`'s WAV fixture: full signed 16-bit range. */
    def wavSample(docId: Long, i: Int): Int =
      (((docId * 17 + i * 13) % 65536) - 32768).toInt
    import ByteIo.{be32b => be32, le16b => le16, le32b => le32}

    def payload(docId: Long): Array[Byte] = {
      val w = docId % 300 + 1
      val h = docId % 200 + 1
      docId % 5 match {
        case 0 =>
          val colorType = 2 + 4 * (docId % 2) // truecolor / truecolor+alpha
          val typeAndData = "IHDR".getBytes("US-ASCII") ++ be32(w) ++
            be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
          val crc = new CRC32
          crc.update(typeAndData)
          Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
            be32(13) ++ typeAndData ++ be32(crc.getValue)
        case 1 =>
          "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
            le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
            le32(0) ++ le32(0) ++ le32(2835) ++ le32(2835) ++
            le32(0) ++ le32(0)
        case 2 =>
          val ch = docId % 2 + 1
          val sr = (docId % 4) match {
            case 0 => 8000L; case 1 => 16000L; case 2 => 44100L
            case _ => 48000L
          }
          val data = new Array[Byte](WavSamples * 2)
          var i = 0
          while (i < WavSamples) {
            val s = wavSample(docId, i)
            data(2 * i) = (s & 0xff).toByte
            data(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          "RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
            "WAVE".getBytes("US-ASCII") ++
            "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
            le16(ch) ++ le32(sr) ++ le32(sr * ch * 2) ++ le16(ch * 2) ++
            le16(16) ++
            "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
        case 3 =>
          // SOI + JFIF APP0 + SOF0 (3 components) + EOI: every segment
          // length per T.81, dims big-endian in the frame header
          val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x10) ++
            "JFIF".getBytes("US-ASCII") ++
            Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
          val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 8,
            ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
            ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3,
            1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
          Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
            Array[Byte](0xff.toByte, 0xd9.toByte)
        case _ =>
          "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
            Array[Byte](0x70, 0, 0)
      }
    }
  }

  /** doc_id → a complete REAL PNG (IHDR + stored-zlib IDAT + IEND, real
    * CRC32/Adler-32) whose truecolor pixels follow a fixed arithmetic
    * fill — so a SQL oracle can reconstruct the DECODED pixel values
    * from first principles while the Spark side must run the actual
    * zlib+unfilter decode to produce them. Geometry: w = id%8+1,
    * h = id%6+1; pixel(x, y, c) = (id*31 + y*7 + x*3 + c) mod 256. */
  def pngFixture(docId: Long): Array[Byte] = {
    val w = (docId % 8 + 1).toInt
    val h = (docId % 6 + 1).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px((y * w + x) * 3 + c) =
            ((docId * 31 + y * 7 + x * 3 + c) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.encode(PngCodec.Image(w, h, 3, px))
  }

  def pngFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(pngFixture)

  /** doc_id → a complete REAL baseline TIFF whose pixels follow a fixed
    * arithmetic fill — so the SQL oracle reconstructs the decoded
    * values from first principles while the Spark side must run the
    * actual IFD walk + strip assembly. The fixture sweeps the format's
    * structural axes: BYTE ORDER alternates per id ("II" even, "MM"
    * odd — every field flips), photometric alternates (RGB when
    * id % 3 == 0, grayscale otherwise), and RowsPerStrip = 2 forces
    * MULTI-strip assembly for h > 2 (offset/count arrays external when
    * strips > 1, inline when 1 — both spec paths exercised). Geometry
    * w = id%7+1, h = id%5+1; pixel(x, y, c) =
    * (id·29 + y·11 + x·5 + c·3) mod 256. */
  def tiffFixture(docId: Long): Array[Byte] = {
    val le = docId % 2 == 0
    val rgb = docId % 3 == 0
    val spp = if (rgb) 3 else 1
    val w = (docId % 7 + 1).toInt
    val h = (docId % 5 + 1).toInt
    val rps = 2
    val strips = (h + rps - 1) / rps
    def w16(v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def w32(v: Long): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val px = new Array[Byte](w * h * spp)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < spp) {
          px((y * w + x) * spp + c) =
            ((docId * 29 + y * 11 + x * 5 + c * 3) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val stripLens = (0 until strips)
      .map(s => (math.min(rps * (s + 1), h) - rps * s) * w * spp)
    val stripOffs = stripLens.scanLeft(8L)(_ + _).dropRight(1)
    val dataEnd = 8 + px.length
    var ext = dataEnd.toLong
    val bitsOff = if (rgb) { val r = ext; ext += 6; r } else -1L
    val offsOff = if (strips > 1) { val r = ext; ext += 4L * strips; r }
      else -1L
    val cntsOff = if (strips > 1) { val r = ext; ext += 4L * strips; r }
      else -1L
    val ifdOff = ext
    def entry(tag: Int, tpe: Int, count: Long,
        value: Array[Byte]): Array[Byte] =
      w16(tag) ++ w16(tpe) ++ w32(count) ++ value
    val shortInline = (v: Int) => w16(v) ++ w16(0) // left-justified
    val ifd = w16(9) ++
      entry(256, 3, 1, shortInline(w)) ++
      entry(257, 3, 1, shortInline(h)) ++
      (if (rgb) entry(258, 3, 3, w32(bitsOff))
       else entry(258, 3, 1, shortInline(8))) ++
      entry(259, 3, 1, shortInline(1)) ++
      entry(262, 3, 1, shortInline(if (rgb) 2 else 1)) ++
      (if (strips > 1) entry(273, 4, strips, w32(offsOff))
       else entry(273, 4, 1, w32(8L))) ++
      entry(277, 3, 1, shortInline(spp)) ++
      entry(278, 3, 1, shortInline(rps)) ++
      (if (strips > 1) entry(279, 4, strips, w32(cntsOff))
       else entry(279, 4, 1, w32(px.length.toLong))) ++
      w32(0L)
    (if (le) "II".getBytes("US-ASCII") else "MM".getBytes("US-ASCII")) ++
      w16(42) ++ w32(ifdOff) ++ px ++
      (if (rgb) w16(8) ++ w16(8) ++ w16(8) else Array.empty[Byte]) ++
      (if (strips > 1) stripOffs.toArray.flatMap(w32) ++
        stripLens.toArray.flatMap(l => w32(l.toLong))
       else Array.empty[Byte]) ++
      ifd
  }

  def tiffFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(tiffFixture)

  /** Real pixel decode + per-image stats in one per-partition pass (one
    * reused Inflater per partition — the "per-partition decoder setup"
    * the mapPartitions shape exists for), routed by container magic
    * ([[ImageCodecs]]: PNG, baseline JPEG, GIF). Exact integer channel
    * sums, no floats. Unrecognized/corrupt payloads surface as n-null
    * rows rather than exceptions. */
  def decodeImageStats(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val inf = partitionInflater()
      it.map { r =>
        ImageCodecs.decode(r.media, inf) match {
          case Some(img) =>
            val sums = new Array[Long](3)
            var i = 0
            while (i < img.pixels.length) {
              val c = i % img.channels
              if (c < 3) sums(c) += img.pixels(i) & 0xff // alpha not summed
              i += 1
            }
            val px0 = img.pixels.take(3).map(b => f"${b & 0xff}%02x").mkString
            (r.doc_id, Some(img.width.toLong), Some(img.height.toLong),
              Some(img.channels.toLong), Some(sums(0)), Some(sums(1)),
              Some(sums(2)), Some(px0))
          case None =>
            (r.doc_id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[String])
        }
      }
    }.toDF("doc_id", "width", "height", "channels",
      "sum_r", "sum_g", "sum_b", "px0_hex")
  }

  /** Real PCM decode + per-clip stats in one per-partition pass. For
    * 16-bit PCM WAV the data chunk's bytes ARE the decoded samples (no
    * codec exists to stub): reassemble each signed little-endian sample
    * and reduce to exact integer stats — peak, sum of |s|, sum of s² (the
    * integer core of RMS/loudness features). Non-WAV / non-16-bit
    * payloads surface as null-stat rows, never exceptions. */
  def decodeWavStats(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val none7 = (0L, None: Option[Long], None: Option[Long],
      None: Option[Long], None: Option[Long], None: Option[Long],
      None: Option[Long])
    ds.mapPartitions(_.map { r =>
      val m = MediaHeader.parse(r.media)
      if (m.format != "wav" || m.bitDepth != 16) none7.copy(_1 = r.doc_id)
      else MediaHeader.wavData(r.media) match {
        case Some((off, len)) =>
          val n = len / 2
          var peak = 0L
          var sumAbs = 0L
          var sumSq = 0L
          var i = 0
          while (i < n) {
            // signed 16-bit LE: high byte keeps its sign, low byte is raw
            val s = (r.media(off + 2 * i + 1) << 8) |
              (r.media(off + 2 * i) & 0xff)
            val a = math.abs(s.toLong)
            if (a > peak) peak = a
            sumAbs += a
            sumSq += s.toLong * s
            i += 1
          }
          (r.doc_id, Some(m.channels), Some(m.sampleRate), Some(n.toLong),
            Some(peak), Some(sumAbs), Some(sumSq))
        case None => none7.copy(_1 = r.doc_id)
      }
    }).toDF("doc_id", "channels", "sample_rate", "n_samples",
      "peak", "sum_abs", "sum_sq")
  }

  /** 8×8-bit difference hash (dHash) over REALLY decoded pixels: NN
    * resize to a 9×8 grayscale grid (integer luma 299R+587G+114B, no
    * division — the comparison is scale-free), one bit per horizontally
    * adjacent pair. The standard perceptual fingerprint an image-dedup
    * pipeline computes right after decode. Byte j (row j's 8 gradient
    * bits) is packed at bits 8j of `dhash` and rendered first in
    * `dhash_hex`. Decode is routed by container magic ([[ImageCodecs]]:
    * PNG + baseline JPEG + GIF, the formats that dominate a web corpus);
    * undecodable payloads are dropped (flatMap). */
  def imageDHash(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val inf = partitionInflater()
      it.flatMap { r =>
        ImageCodecs.decode(r.media, inf).map { img =>
          val v = dhashOf(img)
          (r.doc_id, v,
            (0 until 8).map(j => f"${(v >>> (8 * j)) & 0xffL}%02x").mkString)
        }
      }
    }.toDF("doc_id", "dhash", "dhash_hex")
  }

  /** The 9×8 grayscale gradient dHash of one decoded image — byte j is
    * row j's 8 left-to-right luma-gradient bits on the NN-sampled grid. */
  def dhashOf(img: PngCodec.Image): Long = {
    def gray(x: Int, y: Int): Int = {
      val o = (y * img.width + x) * img.channels
      299 * (img.pixels(o) & 0xff) + 587 * (img.pixels(o + 1) & 0xff) +
        114 * (img.pixels(o + 2) & 0xff)
    }
    var v = 0L
    var j = 0
    while (j < 8) {
      val sy = j * img.height / 8
      var prev = gray(0, sy)
      var bits = 0
      var i = 0
      while (i < 8) {
        val cur = gray((i + 1) * img.width / 9, sy)
        if (cur > prev) bits |= 1 << i
        prev = cur
        i += 1
      }
      v |= bits.toLong << (8 * j)
      j += 1
    }
    v
  }

  /** Perceptual near-duplicate pairs: dHash → four 16-bit bands →
    * equi-join per band (bucketed, NOT all-pairs — the banding guarantees
    * every pair within hamming ≤ 3 shares at least one exact band) →
    * exact hamming verify on the candidates. Hot buckets are capped with
    * the same guard as text/embedding LSH (`Dedup.capBuckets`): a corpus
    * with 100k copies of one image would otherwise put them all in one
    * bucket in all four bands and the self-join would emit 4·C(100k, 2)
    * candidates. Dropped members pair with their bucket representative
    * instead (`bucketRescuePairs` star — O(dropped), and the exact
    * hamming verify below still applies, so precision is untouched and
    * cluster-level recall survives transitively). PAIR-level recall
    * caveat: when the cap engages in ALL four bands, a pair of two
    * dropped members is only recovered through their shared
    * representative, so the emitted pair SET is star-shaped there —
    * cluster membership is preserved, the full pairwise closure is not
    * (a brute-force oracle would list pairs this path never emits). The
    * default cap is therefore 8× the text-LSH default: these bands are
    * 16-bit values, so legitimate buckets are tiny and only a truly
    * degenerate corpus (>8192 byte-identical hashes) engages the cap.
    * Returns (cached dhash relation, pairs); the caller releases the
    * cache after consuming. */
  def imageNearDupPairs(ds: Dataset[MediaRecord], maxHamming: Int = 3,
      maxBucket: Int = 8 * graft.operators.Dedup.DefaultMaxBucket)
      : (DataFrame, DataFrame) = {
    require(maxHamming <= 3,
      s"4-band LSH only guarantees recall up to hamming 3, got $maxHamming")
    val h = imageDHash(ds).select("doc_id", "dhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (h, bandedHammingPairs(h, "dhash", maxHamming, maxBucket))
  }

  /** The banded near-dup core shared by every 64-bit perceptual
    * signature (image dHash, audio envelope fingerprint): four 16-bit
    * bands → per-band bucket equi-join (capped hot buckets + star
    * rescue, see [[imageNearDupPairs]]) → exact hamming verify. `h` must
    * be persisted by the caller (it is referenced three times). */
  def bandedHammingPairs(h: DataFrame, sigCol: String, maxHamming: Int,
      maxBucket: Int): DataFrame = {
    val rawBanded = h.select(col("doc_id"), col(sigCol).as("sig"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("v", expr("shiftrightunsigned(sig, 16 * band) & 65535"))
    val banded = graft.operators.Dedup.capBuckets(
      rawBanded, "doc_id", Seq("band", "v"), maxBucket)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .union(graft.operators.Dedup.bucketRescuePairs(
        rawBanded, "doc_id", Seq("band", "v"), maxBucket))
      .distinct()
    cand
      .join(h.select(col("doc_id").as("doc_a"), col(sigCol).as("ha")), "doc_a")
      .join(h.select(col("doc_id").as("doc_b"), col(sigCol).as("hb")), "doc_b")
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Real-PNG fixtures with CONTROLLED near-duplicates for the perceptual
    * dedup surface: ids in the same group of 8 share base geometry and
    * pixels; non-canonical members differ only in the (0,0) pixel — one
    * resized sample — so in-group hamming is 0-1 while cross-group hashes
    * are uncorrelated. The pixel fill is a NONLINEAR integer mix (a
    * linear-in-x ramp would give every image the same mostly-ones
    * gradient hash): u = (base·131 + y·37 + x·11 + c + 1) · 2654435761,
    * pixel = (u XOR u/1024) mod 256 — exact in 64-bit on both engines
    * (u < 2^51, no overflow), so a SQL oracle reproduces it verbatim. */
  def pngNearFixture(docId: Long): Array[Byte] = {
    val base = docId - (docId % 8)
    val w = (base % 16 + 9).toInt
    val h = (base % 12 + 8).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val u = (base * 131 + y * 37 + x * 11 + c + 1) * 2654435761L
          val bump = if (x == 0 && y == 0 && docId % 8 != 0)
            (docId % 8) * 40 else 0L
          px((y * w + x) * 3 + c) =
            ((((u ^ (u >> 10)) % 256) + bump) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.encode(PngCodec.Image(w, h, 3, px))
  }

  def pngNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(pngNearFixture)

  /** doc_id → a complete REAL baseline JPEG, 16×16, alternating 4:4:4
    * (even ids) and 4:2:0 (odd ids), restart markers every 2 MCUs when
    * id%3==0 — so the oracle-checked corpus exercises Huffman DC chains,
    * AC run/size coding, both subsampling layouts, and RSTn resync.
    *
    * The quantized coefficients live on the {(0,0),(4,0),(0,4),(4,4)}
    * basis, where every IDCT term is exactly F/8 (cos((2x+1)·4π/16) =
    * ±√2/2): with luma quant 8 and chroma quant 16 the decoded samples
    * are EXACT integers a SQL oracle rebuilds from first principles —
    * luma Y(x,y) = 128 + a + sx·b + sy·c + sx·sy·d per 8×8 block (sx =
    * +1 for x%8 ∈ {0,3,4,7} else −1), DC-only chroma = 128 + 2·dc, and
    * the fixed-point YCbCr→RGB of [[JpegCodec]] is integer arithmetic
    * the oracle mirrors verbatim. Any decode slip — wrong Huffman table,
    * predictor reset, dequant index, IDCT scale, upsample index, or
    * conversion constant — lands in the channel sums. */
  private[multimodal] def jpegFixtureBlock(docId: Long)(comp: Int, by: Int, bx: Int): Array[Int] = {
    val c = new Array[Int](64)
    comp match {
      case 0 =>
        c(0) = ((docId * 7 + by * 5 + bx * 3) % 48).toInt - 24
        c(4) = ((docId * 11 + by * 7 + bx * 5) % 24).toInt - 12
        c(32) = ((docId * 13 + by * 3 + bx * 7) % 24).toInt - 12
        c(36) = ((docId * 5 + by * 11 + bx * 13) % 16).toInt - 8
      case 1 =>
        c(0) = ((docId * 3 + by * 2 + bx) % 20).toInt - 10
      case _ =>
        c(0) = ((docId * 9 + by + bx * 2) % 20).toInt - 10
    }
    c
  }

  def jpegFixture(docId: Long): Array[Byte] = {
    val q8 = Array.fill(64)(8)
    val q16 = Array.fill(64)(16)
    JpegCodec.encode(16, 16, docId % 2 == 1, q8, q16, jpegFixtureBlock(docId),
      restartInterval = if (docId % 3 == 0) 2 else 0)
  }

  def jpegFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(jpegFixture)

  /** The PROGRESSIVE (SOF2) twin of [[jpegFixture]]: the SAME quantized
    * coefficients transmitted through the libjpeg-shaped 10-scan script
    * (DC first/refinement, AC spectral bands, AC successive-approximation
    * refinements with EOB runs — [[JpegCodec.DefaultProgScript]]).
    * Progressive transmission is a lossless rearrangement, so the decoded
    * pixels are IDENTICAL to the sequential fixture's and
    * q_jpeg_progressive shares q_jpeg_pixels' first-principles oracle —
    * which therefore pins the ENTIRE Annex G decode path. */
  def jpegProgressiveFixture(docId: Long): Array[Byte] = {
    val q8 = Array.fill(64)(8)
    val q16 = Array.fill(64)(16)
    JpegCodec.encodeProgressive(16, 16, docId % 2 == 1, q8, q16,
      jpegFixtureBlock(docId))
  }

  def jpegProgressiveFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(jpegProgressiveFixture)

  /** Real-JPEG fixtures with CONTROLLED near-duplicates, the JPEG twin of
    * [[pngNearFixture]]: ids in the same group of 8 share coefficients;
    * non-canonical members bump the DC of luma block (0,1) by 1–2, which
    * shifts that block's Y uniformly and can flip only the dHash bits
    * whose comparison touches that block — in-group hamming stays small
    * while cross-group hashes are uncorrelated. Geometry is 72×16 — nine
    * luma block COLUMNS, so each of the nine dHash sample columns lands
    * in a different block and every gradient bit compares two
    * independently-seeded blocks (a 16×16 two-block design concentrates
    * the hash into a handful of sign patterns, and at 50k docs the
    * cross-group hamming≤3 collisions explode quadratically). Chroma
    * coefficients are zero (Cb = Cr = 128), so RGB = Y exactly under the
    * fixed-point conversion and the oracle works in luma alone. Groups
    * alternate 4:4:4 / 4:2:0 (72 is not a multiple of 16, so the 4:2:0
    * groups also exercise padded-MCU decode), and members with id%4 ≥ 2
    * ship as PROGRESSIVE (SOF2) streams of the same coefficients — so
    * in-group near-dup pairs span sequential↔progressive transmission
    * (a real recompression corpus mixes both) while the pixel-level
    * oracle is untouched, progressive decode being lossless. */
  def jpegNearFixture(docId: Long): Array[Byte] = {
    val base = docId - docId % 8
    val m = docId % 8
    val bump = if (m == 0) 0 else (m % 2).toInt + 1
    val q8 = Array.fill(64)(8)
    val q16 = Array.fill(64)(16)
    // NONLINEAR coefficient mix (same Knuth-multiplier construction as
    // pngNearFixture, and for the same reason: linear-in-index formulas
    // make every gradient comparison the sign of a near-constant step,
    // collapsing the corpus to a handful of distinct hashes): exact in
    // 64-bit on both engines, so the SQL oracle reproduces it verbatim.
    def mix(by: Int, bx: Int, slot: Int, range: Int): Int = {
      val u = (base * 131 + by * 37 + bx * 11 + slot * 29 + 1) * 2654435761L
      (((u ^ (u >> 10)) % range) - range / 2).toInt
    }
    def block(comp: Int, by: Int, bx: Int): Array[Int] = {
      val c = new Array[Int](64)
      if (comp == 0) {
        c(0) = mix(by, bx, 0, 48) + (if (by == 0 && bx == 1) bump else 0)
        c(4) = mix(by, bx, 1, 24)
        c(32) = mix(by, bx, 2, 24)
        c(36) = mix(by, bx, 3, 16)
      }
      c
    }
    if (docId % 4 >= 2)
      JpegCodec.encodeProgressive(72, 16, (base / 8) % 2 == 1, q8, q16, block)
    else
      JpegCodec.encode(72, 16, mode420 = (base / 8) % 2 == 1, q8, q16, block)
  }

  def jpegNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(jpegNearFixture)

  /** Canonical 16 kHz mono WAV whose 64 16-bit samples follow a NONLINEAR
    * integer mix (u = (id·131 + i·29 + 1)·2654435761; s = (u XOR u/512)
    * mod 65536 − 32768) — exact in 64-bit on both engines, and free of
    * the monotone-envelope structure a linear ramp would give the
    * fingerprint below. */
  def audioFixture(docId: Long): Array[Byte] = {
    import ByteIo.{le16b => le16, le32b => le32}
    val n = 64
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val u = (docId * 131 + i * 29 + 1) * 2654435761L
      val s = (((u ^ (u >> 9)) % 65536) - 32768).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    "RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(16000) ++ le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
  }

  def audioFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(audioFixture)

  /** G.711 companded WAV fixture: 8 kHz mono 8-bit, wFormatTag 7
    * (µ-law) for even ids and 6 (A-law) for odd, 32 code bytes
    * `(id·29 + i·11) mod 256` — every µ-law/A-law code point is hit
    * across ids, so the decoder's full segment/mantissa/sign space is
    * exercised and the oracle can restate the expanded PCM from the
    * same fill. */
  def g711Fixture(docId: Long): Array[Byte] = {
    import ByteIo.{le16b => le16, le32b => le32}
    val n = 32
    val data = new Array[Byte](n)
    var i = 0
    while (i < n) {
      data(i) = ((docId * 29 + i * 11) % 256).toByte
      i += 1
    }
    val tag = if (docId % 2 == 0) 7L else 6L
    "RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(tag) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
  }

  def g711Fixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(g711Fixture)

  /** ITU-T G.711 µ-law expansion: one code byte → linear PCM. The
    * published table-free form: complement, then
    * `t = ((mant<<3) + 0x84) << exp`, sign via `0x84 − t` / `t − 0x84`. */
  def ulawToLinear(code: Int): Int = {
    val inv = ~code & 0xff
    val t = (((inv & 0x0f) << 3) + 0x84) << ((inv & 0x70) >> 4)
    if ((inv & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion: XOR 0x55, segment 0 is linear
    * `(mant<<4)+8`, higher segments shift `(mant<<4)+0x108`; bit 7 SET
    * means positive (A-law's sign convention is inverted vs µ-law). */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    val mant = a & 0x0f
    val seg = (a & 0x70) >> 4
    val t =
      if (seg == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** G.711 decode — the REAL byte-level path: RIFF walk to the fmt
    * chunk, wFormatTag 6/7 selects A-law/µ-law, 8-bit code bytes from
    * the data chunk expand through the published segment arithmetic to
    * linear PCM. Output one row per sample:
    * `(doc_id, codec, sample_rate, idx, pcm16)`; non-G.711 / non-8-bit
    * / truncated payloads are dropped (never throw — the corpus-scan
    * contract of every codec here). One tight per-partition loop, no
    * per-sample allocation beyond the row. */
  def decodeG711(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { r =>
      val b = r.media
      MediaHeader.wavFmt(b) match {
        case Some((f, fl)) if fl >= 16 =>
          val tag = ((b(f) & 0xff) | ((b(f + 1) & 0xff) << 8))
          val bits = ((b(f + 14) & 0xff) | ((b(f + 15) & 0xff) << 8))
          val sr = (b(f + 4) & 0xffL) | ((b(f + 5) & 0xffL) << 8) |
            ((b(f + 6) & 0xffL) << 16) | ((b(f + 7) & 0xffL) << 24)
          if ((tag != 6 && tag != 7) || bits != 8) Iterator.empty
          else MediaHeader.wavData(b) match {
            case Some((off, len)) =>
              val codec = if (tag == 7) "ulaw" else "alaw"
              (0 until len).iterator.map { i =>
                val c = b(off + i) & 0xff
                val pcm =
                  if (tag == 7) ulawToLinear(c) else alawToLinear(c)
                (r.doc_id, codec, sr, i.toLong, pcm.toLong)
              }
            case None => Iterator.empty
          }
        case _ => Iterator.empty
      }
    }).toDF("doc_id", "codec", "sample_rate", "idx", "pcm16")
  }

  /** Perceptual audio fingerprint over really-decoded PCM: the clip's
    * energy envelope (sum |s| per frame, 16 equal frames) reduced to 15
    * gradient bits — the audio analogue of [[imageDHash]]'s dHash, and
    * the same exact-integer arithmetic discipline (no FFT dependency; an
    * envelope gradient is the first stage of chromaprint-style
    * fingerprints). Non-WAV / too-short clips are dropped. */
  def audioFingerprint(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap(r =>
      envelopeGradientBits(r, frames = 16).map((r.doc_id, _))))
      .toDF("doc_id", "fingerprint")
  }

  /** Energy-envelope gradient bits over really-decoded 16-bit PCM:
    * `frames` equal frames of sum |s|, bit b set iff e(b+1) > e(b) —
    * frames−1 bits. Non-WAV / non-16-bit / too-short clips → None. */
  private def envelopeGradientBits(r: MediaRecord, frames: Int): Option[Long] = {
    val m = MediaHeader.parse(r.media)
    if (m.format != "wav" || m.bitDepth != 16) None
    else MediaHeader.wavData(r.media).flatMap { case (off, len) =>
      val n = len / 2
      if (n < frames) None
      else {
        val frameLen = n / frames
        val e = new Array[Long](frames)
        var f = 0
        while (f < frames) {
          var k = 0
          var acc = 0L
          while (k < frameLen) {
            val idx = off + 2 * (f * frameLen + k)
            val s = (r.media(idx + 1) << 8) | (r.media(idx) & 0xff)
            acc += math.abs(s.toLong)
            k += 1
          }
          e(f) = acc
          f += 1
        }
        var fp = 0L
        var b = 0
        while (b < frames - 1) {
          if (e(b + 1) > e(b)) fp |= 1L << b
          b += 1
        }
        Some(fp)
      }
    }
  }

  /** 64-bit audio fingerprint (65 envelope frames → 64 gradient bits) —
    * wide enough for the 4×16-bit banded near-dup core. Emitted as a
    * per-byte hex string alongside the raw bits so the oracle can pin
    * the exact value without 64-bit sign gymnastics. */
  def audioFingerprint64(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { r =>
      envelopeGradientBits(r, frames = 65).map { fp =>
        val hex = (0 until 8)
          .map(j => f"${(fp >>> (8 * j)) & 0xffL}%02x").mkString
        (r.doc_id, fp, hex)
      }
    }).toDF("doc_id", "fingerprint", "fp_hex")
  }

  /** Perceptual audio near-duplicate pairs: 64-bit envelope fingerprint
    * through the same banded core as [[imageNearDupPairs]] (four 16-bit
    * bands, capped hot buckets + star rescue, exact hamming verify).
    * Same recall contract: every pair within hamming ≤ 3 is guaranteed;
    * see the image variant's scaladoc for the cap's pair-level caveat.
    * Returns (cached fingerprint relation, pairs); caller releases. */
  def audioNearDupPairs(ds: Dataset[MediaRecord], maxHamming: Int = 3,
      maxBucket: Int = 8 * graft.operators.Dedup.DefaultMaxBucket)
      : (DataFrame, DataFrame) = {
    require(maxHamming <= 3,
      s"4-band LSH only guarantees recall up to hamming 3, got $maxHamming")
    val h = audioFingerprint64(ds).select("doc_id", "fingerprint")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (h, bandedHammingPairs(h, "fingerprint", maxHamming, maxBucket))
  }

  /** WAV fixtures with CONTROLLED near-duplicates for the audio dedup
    * surface: 260 samples = 65 envelope frames × 4. Ids in the same
    * group of 8 share base samples ([[mix2]] keyed by the group base, so
    * the envelope decorrelates across groups — see mix2's scaladoc for
    * why an additive mix does not); non-canonical member m replaces every sample of frame 7·m
    * with a fixed loud value, flipping at most gradient bits 7·m−1 and
    * 7·m — in-group hamming ≤ 2 vs base, ≤ 4 variant-to-variant. */
  def audioNearFixture(docId: Long): Array[Byte] = {
    import ByteIo.{le16b => le16, le32b => le32}
    val base = docId - docId % 8
    val m = (docId % 8).toInt
    val n = 260
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s =
        if (m > 0 && i / 4 == 7 * m) 30000
        else (mix2(base * 131, i * 29 + 1) % 65536 - 32768).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    "RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(16000) ++ le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
  }

  def audioNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(audioNearFixture)

  /** Decode (routed: PNG, baseline JPEG, or GIF) → nearest-neighbor resize in
    * PIXEL space → RE-ENCODE as a real PNG: the full image-preprocessing
    * round trip of a training pipeline, per partition with a reused
    * Inflater. PNG is the canonical output container (lossless — a
    * resize stage must not add a second generation of DCT loss to JPEG
    * inputs). Payloads that don't decode pass through unchanged
    * (route-elsewhere semantics). Replaces the byte-stride `resizeStub`
    * this engine shipped through r7 — every supported image format now
    * takes the real pixel path. */
  def resizeImage(ds: Dataset[MediaRecord], dw: Int, dh: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val inf = partitionInflater()
      it.map { r =>
        ImageCodecs.decode(r.media, inf) match {
          case Some(img) => MediaRecord(r.doc_id,
            PngCodec.encode(PngCodec.resizeNearest(img, dw, dh)))
          case None => r
        }
      }
    }
  }

  /** doc_id → a structurally REAL ISO-BMFF/MP4: ftyp(isom) + moov(mvhd v0
    * + n trak boxes, the LAST encoded with a 64-bit largesize header) +
    * a size-0 ("to end") mdat — so the oracle-checked corpus itself
    * exercises all three box-size encodings of ISO 14496-12.
    * timescale = 1000·(id%5+1), duration = (id·37)%100000 ticks,
    * tracks = id%3+1. */
  def mp4Fixture(docId: Long): Array[Byte] = {
    import ByteIo.{be32b => be32, be64b => be64}
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    val timescale = 1000L * (docId % 5 + 1)
    val duration = (docId * 37) % 100000
    val nTracks = (docId % 3 + 1).toInt

    val ftyp = be32(24) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
      cc("isom") ++ cc("mp41")
    // mvhd v0 (§8.2.2): 100 data bytes; rate 1.0, volume 1.0, unity matrix
    val mvhd = be32(108) ++ cc("mvhd") ++ be32(0) /* v0+flags */ ++
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
      be32(0x00010000L) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
      (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x40000000L)) ++ new Array[Byte](24) ++ be32(nTracks + 1L)
    // tkhd v0 (§8.3.2): 84 data bytes — ver/flags, creation, modification,
    // track_ID, then reserved/duration/layer/matrix/width/height zeros
    def tkhd(id: Int): Array[Byte] = be32(92) ++ cc("tkhd") ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(id.toLong) ++ new Array[Byte](68)
    def trak(id: Int, largesize: Boolean): Array[Byte] = {
      val body = tkhd(id)
      if (!largesize) be32(8L + body.length) ++ cc("trak") ++ body
      else be32(1) ++ cc("trak") ++ be64(16L + body.length) ++ body
    }
    val traks = (1 to nTracks).toArray.flatMap(i =>
      trak(i, largesize = i == nTracks))
    val moov = be32(8L + mvhd.length + traks.length) ++ cc("moov") ++
      mvhd ++ traks
    // trailing mdat with size 0 = "extends to end of file" (§4.2)
    val mdat = be32(0) ++ cc("mdat") ++
      Array.tabulate((docId % 7).toInt)(i => ((docId + i) % 256).toByte)
    ftyp ++ moov ++ mdat
  }

  def mp4Fixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(mp4Fixture)

  /** Box-walk metadata per clip: brand, movie timescale/duration (exact
    * integer ms), track count. Null row fields when the payload is not a
    * parseable ISO-BMFF container. */
  def mp4Meta(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val hex = r.media.take(32).map(b => f"${b & 0xff}%02x").mkString
      Mp4.parse(r.media) match {
        case Some(i) => (r.doc_id, hex, Some(i.brand), Some(i.timescale),
          Some(i.duration), Some(i.durationMs), Some(i.nTracks.toLong))
        case None => (r.doc_id, hex, None: Option[String],
          None: Option[Long], None: Option[Long], None: Option[Long],
          None: Option[Long])
      }
    }).toDF("doc_id", "hdr_hex", "brand", "timescale", "duration",
      "duration_ms", "n_tracks")
  }

  /** One deterministic payload per input id, built distributedly — the
    * single wrapper behind every fixture family (payload fn is the only
    * thing that varies). */
  private def fixtureDs(docs: DataFrame, idCol: String)(
      f: Long => Array[Byte]): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaRecord(id, f(id))))
  }

  /** Per-partition Inflater whose native zlib buffers are released
    * DETERMINISTICALLY at task end (a bare `new Inflater` waits for GC
    * finalization — off-heap memory the JVM heap accounting never sees,
    * accumulating on long-lived executors). */
  private def partitionInflater(): java.util.zip.Inflater = {
    val inf = new java.util.zip.Inflater()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => inf.end())
    inf
  }

  /** documents(text) → MediaRecord with the UTF-8 bytes as the payload —
    * the test stand-in for reading a binary media column from parquet. */
  def fromText(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** One deterministic real-header payload per input id — media-column
    * test data generated distributedly (no driver-side byte building). */
  def fixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(MediaFixtures.payload)

  /** Batched decode: one decoder per partition, streamed. Byte stats are
    * one tight loop; metadata is the real [[MediaHeader]] parse. */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val b = r.media
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += b(i) & 0xff; i += 1 }
      val hex = b.take(HeaderHexBytes).map(x => f"${x & 0xff}%02x").mkString
      val m = MediaHeader.parse(b)
      def slot(v: Long): Option[Long] = if (v < 0) None else Some(v)
      MediaFeatures(r.doc_id, b.length.toLong, sum, hex, m.format,
        slot(m.width), slot(m.height), slot(m.bitDepth), slot(m.channels),
        slot(m.sampleRate))
    })
  }

  /** Feature extraction: L2-normalized 64-bin byte histogram as an
    * `Array[Float]` embedding — the plumbing shape of an image/audio
    * feature extractor (fixed-dim float vector per payload, pure
    * per-partition map). Output plugs directly into
    * [[graft.operators.Similarity]] (bruteTopK / lshPairs / ivfTopK),
    * closing the decode → featurize → ANN-search pipeline. */
  def featureVectors(ds: Dataset[MediaRecord], dim: Int = 64): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val h = new Array[Float](dim)
      var i = 0
      while (i < r.media.length) { h((r.media(i) & 0xff) % dim) += 1f; i += 1 }
      var n2 = 0.0
      var j = 0
      while (j < dim) { n2 += h(j).toDouble * h(j); j += 1 }
      val inv = if (n2 > 0) (1.0 / math.sqrt(n2)).toFloat else 0f
      j = 0
      while (j < dim) { h(j) *= inv; j += 1 }
      (r.doc_id, h)
    }).toDF("doc_id", "embedding")
  }

  /** MP4 fixture with a full sample-table leg (§8.5–8.7): one video trak
    * carrying mdhd (media timescale), a minimal 'avc1' stsd entry, a
    * two-run stts and a per-sample stsz (uniform for doc%4==0 — both
    * stsz branches exercised) — everything [[sampleFrames]] needs. Kept
    * SEPARATE from [[mp4Fixture]], whose exact box layout is byte-pinned
    * by q_mp4_meta's hdr_hex oracle. */
  def mp4SampleFixture(docId: Long): Array[Byte] = {
    import ByteIo.{be32b => be32}
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val n = (docId % 50 + 10).toInt       // sample count, 10..59
    val n1 = n / 2                        // first stts run length
    val d1 = (docId % 5 + 1) * 100        // ticks/sample, run 1
    val d2 = d1 + 40                      // ticks/sample, run 2
    val mts = 1000L * (docId % 4 + 1)     // media timescale
    val dur = n1 * d1 + (n - n1) * d2

    val ftyp = be32(24) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
      cc("isom") ++ cc("mp41")
    val mvhd = be32(108) ++ cc("mvhd") ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(mts) ++ be32(dur) ++
      be32(0x00010000L) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
      (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x40000000L)) ++ new Array[Byte](24) ++ be32(2)
    val tkhd = be32(92) ++ cc("tkhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(1) ++ new Array[Byte](68)
    // mdhd v0 (§8.4.2): creation/modification, timescale, duration,
    // language 'und' (0x55c4) + pre_defined
    val mdhd = be32(32) ++ cc("mdhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(mts) ++ be32(dur) ++ be32(0x55c40000L)
    // stsd: one minimal SampleEntry — 6 reserved bytes + data_ref_index
    val stsdEntry = be32(16) ++ cc("avc1") ++ new Array[Byte](6) ++
      Array[Byte](0, 1)
    val stsd = be32(16L + stsdEntry.length) ++ cc("stsd") ++ be32(0) ++
      be32(1) ++ stsdEntry
    val stts = be32(32) ++ cc("stts") ++ be32(0) ++ be32(2) ++
      be32(n1.toLong) ++ be32(d1) ++ be32((n - n1).toLong) ++ be32(d2)
    val stszBody =
      if (docId % 4 == 0) be32(docId % 200 + 100) ++ be32(n.toLong)
      else be32(0) ++ be32(n.toLong) ++
        Array.range(0, n).flatMap(i => be32((docId * 13 + i * 7) % 991 + 1))
    val stsz = be32(12L + stszBody.length) ++ cc("stsz") ++ be32(0) ++
      stszBody
    val stbl = be32(8L + stsd.length + stts.length + stsz.length) ++
      cc("stbl") ++ stsd ++ stts ++ stsz
    val minf = be32(8L + stbl.length) ++ cc("minf") ++ stbl
    val mdia = be32(8L + mdhd.length + minf.length) ++ cc("mdia") ++
      mdhd ++ minf
    val trak = be32(8L + tkhd.length + mdia.length) ++ cc("trak") ++
      tkhd ++ mdia
    val moov = be32(8L + mvhd.length + trak.length) ++ cc("moov") ++
      mvhd ++ trak
    val mdat = be32(0) ++ cc("mdat")
    ftyp ++ moov ++ mdat
  }

  def mp4SampleFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(mp4SampleFixture)

  // ============================ MJPEG ============================

  /** Frames per MJPEG clip fixture. */
  val MjpegFrames = 3

  /** Per-(group, frame) JPEG fixture id: mix2-decorrelated (a linear id
    * would correlate gradient-bit hashes across groups — the banned
    * additive-mix failure) and EVEN, so every frame is the 4:4:4 layout
    * with per-block chroma. SQL twin: `2 * (dMix2(base*131, f+1) %
    * 500000)`. */
  private[multimodal] def mjpegJid(base: Long, f: Int): Long =
    2L * (mix2(base * 131, f + 1L) % 500000L)

  /** A REAL MJPEG MP4: full sample-table leg — stsd entry '''jpeg''' (the
    * QuickTime Motion-JPEG 4CC), stts (one uniform run, 100 ticks/frame
    * at timescale 1000 → exactly 100 ms/frame), per-sample stsz, stsc +
    * stco (one chunk holding all frames) — and an mdat whose samples ARE
    * complete baseline JPEG streams. The one codec an MP4 can carry that
    * our pure-JVM decoders fully decode: sample location (chunk-offset
    * resolution) and sample decode (T.81) are both real. Built in two
    * passes because stco's offset depends on moov's own length. */
  def mjpegClip(frames: Seq[Array[Byte]]): Array[Byte] = {
    import ByteIo.{be32b => be32}
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    require(frames.nonEmpty, "an MJPEG clip needs at least one frame")
    val n = frames.length
    val mts = 1000L
    val delta = 100L
    val dur = n * delta

    def assemble(mdatPayloadOff: Long): Array[Byte] = {
      val ftyp = be32(24) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
        cc("isom") ++ cc("mp41")
      val mvhd = be32(108) ++ cc("mvhd") ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(mts) ++ be32(dur) ++
        be32(0x00010000L) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x40000000L)) ++ new Array[Byte](24) ++ be32(2)
      val tkhd = be32(92) ++ cc("tkhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(1) ++ new Array[Byte](68)
      val mdhd = be32(32) ++ cc("mdhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(mts) ++ be32(dur) ++ be32(0x55c40000L)
      val stsdEntry = be32(16) ++ cc("jpeg") ++ new Array[Byte](6) ++
        Array[Byte](0, 1)
      val stsd = be32(16L + stsdEntry.length) ++ cc("stsd") ++ be32(0) ++
        be32(1) ++ stsdEntry
      val stts = be32(24) ++ cc("stts") ++ be32(0) ++ be32(1) ++
        be32(n.toLong) ++ be32(delta)
      val stsz = be32(20L + 4L * n) ++ cc("stsz") ++ be32(0) ++ be32(0) ++
        be32(n.toLong) ++ frames.toArray.flatMap(fr => be32(fr.length.toLong))
      val stsc = be32(28) ++ cc("stsc") ++ be32(0) ++ be32(1) ++
        be32(1) ++ be32(n.toLong) ++ be32(1)
      val stco = be32(20) ++ cc("stco") ++ be32(0) ++ be32(1) ++
        be32(mdatPayloadOff)
      val stbl = be32(8L + stsd.length + stts.length + stsz.length +
        stsc.length + stco.length) ++ cc("stbl") ++
        stsd ++ stts ++ stsz ++ stsc ++ stco
      val minf = be32(8L + stbl.length) ++ cc("minf") ++ stbl
      val mdia = be32(8L + mdhd.length + minf.length) ++ cc("mdia") ++
        mdhd ++ minf
      val trak = be32(8L + tkhd.length + mdia.length) ++ cc("trak") ++
        tkhd ++ mdia
      val moov = be32(8L + mvhd.length + trak.length) ++ cc("moov") ++
        mvhd ++ trak
      val payload = frames.toArray.flatten
      val mdat = be32(8L + payload.length) ++ cc("mdat") ++ payload
      ftyp ++ moov ++ mdat
    }
    // pass 1 with offset 0 fixes every box length; pass 2 writes the
    // real first-payload offset (header sizes are offset-independent)
    val probe = assemble(0L)
    val payloadLen = frames.map(_.length).sum
    assemble(probe.length.toLong - payloadLen)
  }

  /** The per-clip MJPEG fixture: [[MjpegFrames]] exact-basis JPEG frames
    * keyed by [[mjpegJid]] in a full [[mjpegClip]] container. */
  def mjpegFixture(docId: Long): Array[Byte] = {
    val q8 = Array.fill(64)(8)
    val q16 = Array.fill(64)(16)
    mjpegClip((0 until MjpegFrames).map(f =>
      JpegCodec.encode(16, 16, mode420 = false, q8, q16,
        jpegFixtureBlock(mjpegJid(docId, f)))))
  }

  def mjpegFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(mjpegFixture)

  /** The locate-guard-decode step shared by [[mjpegFrameStats]] and
    * [[videoFrameHashes]]: 'jpeg'-codec samples resolved through the
    * chunk tables, range-checked in OVERFLOW-SAFE subtraction form (a
    * hostile co64 offset near Long.MaxValue must drop — an `off + len`
    * sum wraps negative, slips past the guard, and turns the contract's
    * route-elsewhere into a throwing copyOfRange), then decoded through
    * the full T.81 path. One fix site for both callers. */
  private[multimodal] def mjpegSampleFrames(media: Array[Byte],
      t: Mp4.Samples, maxFrames: Int): Seq[(Int, PngCodec.Image)] =
    if (t.codec != "jpeg") Seq.empty
    else t.sampleOffsets.take(maxFrames).zipWithIndex.flatMap {
      case ((off, len), i) =>
        if (off < 0 || len <= 0 || len > media.length ||
            off > media.length - len) None
        else JpegCodec.decode(java.util.Arrays.copyOfRange(
          media, off.toInt, (off + len).toInt)).map(img => (i, img))
    }

  /** REALLY-decoded MP4 frames: locate each sample through the parsed
    * chunk tables ([[Mp4.Samples.sampleOffsets]]), route 'jpeg'-codec
    * samples through the full T.81 decode, and emit exact per-frame
    * channel sums + the stts-derived timestamp. Non-MP4 / non-MJPEG /
    * corrupt-sample payloads drop (route-elsewhere), shuffle-free. */
  def mjpegFrameStats(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      Mp4.parseSamples(r.media).toSeq.flatMap { t =>
        mjpegSampleFrames(r.media, t, Int.MaxValue).map { case (i, img) =>
          val sums = new Array[Long](3)
          var j = 0
          while (j < img.pixels.length) {
            sums(j % 3) += img.pixels(j) & 0xff
            j += 1
          }
          (r.doc_id, i.toLong, t.dtsOf(i.toLong) * 1000L / t.mediaTimescale,
            img.width.toLong, img.height.toLong, sums(0), sums(1), sums(2))
        }
      }
    }.toDF("doc_id", "frame_idx", "t_ms", "width", "height",
      "sum_r", "sum_g", "sum_b")
  }

  /** Mixed-container video near-dup fixtures: group members share three
    * frames (member m ≠ 0 bumps the DC of luma block (0,1) in frame m%3
    * by 1 + m%2 — a small uniform Y shift on one block, the dHash-near
    * edit); EVEN members ship as MJPEG MP4 clips, ODD members as
    * animated GIFs encoding the SAME decoded RGB (GIF is lossless and
    * the exact-basis JPEG decode is integer-exact, so cross-container
    * twin frames are pixel-identical). A video dedup must cluster them
    * together — the capability a byte-level or single-container dedup
    * can never have.
    *
    * Geometry is the PROVEN 72×16 nine-block-column design of
    * [[jpegNearFixture]] with per-(group, frame, block) mix2
    * coefficients and ZERO chroma (RGB = Y exactly, so the oracle works
    * in luma alone): a first 16×16 four-block cut concentrated the hash
    * into a handful of sign patterns and cross-group hamming≤3 pairs
    * grew 98× across a 10× data step — the exact quadratic blowup the
    * mix discipline exists to prevent (measured before this rewrite). */
  def mixedVideoNearFixture(docId: Long): Array[Byte] = {
    val base = docId - docId % 8
    val m = (docId % 8).toInt
    val q8 = Array.fill(64)(8)
    val q16 = Array.fill(64)(16)
    // SQL twin: dMix2(base*3 + f, by*37 + bx*11 + slot*29 + 1) % range
    // - range/2 (a = base*3+f is distinct per (group, frame); b stays
    // far under mix2's 1.8e8 operand bound)
    def coef(f: Int, by: Int, bx: Int, slot: Int, range: Int): Int =
      (mix2(base * 3 + f, by * 37 + bx * 11 + slot * 29 + 1L) % range -
        range / 2).toInt
    val frames = (0 until MjpegFrames).map { f =>
      val block: (Int, Int, Int) => Array[Int] = (c, by, bx) => {
        val blk = new Array[Int](64)
        if (c == 0) {
          blk(0) = coef(f, by, bx, 0, 48) +
            (if (by == 0 && bx == 1 && m != 0 && f == m % MjpegFrames)
              1 + m % 2 else 0)
          blk(4) = coef(f, by, bx, 1, 24)
          blk(32) = coef(f, by, bx, 2, 24)
          blk(36) = coef(f, by, bx, 3, 16)
        }
        blk
      }
      JpegCodec.encode(72, 16, mode420 = false, q8, q16, block)
    }
    if (m % 2 == 0) mjpegClip(frames)
    else {
      // GIF twin: decode each JPEG frame (integer-exact) and re-encode
      // losslessly on one global palette (grayscale — ≤4 distinct Y per
      // block × 18 blocks × 3 frames ≤ 216 ≤ 256 colors)
      val rgbs = frames.map(fb => JpegCodec.decode(fb).getOrElse(
        throw new IllegalStateException(s"mjpeg frame of $docId failed to decode")))
      val distinct = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      rgbs.foreach { img =>
        var i = 0
        while (i < img.pixels.length) {
          val c = ((img.pixels(i) & 0xff) << 16) |
            ((img.pixels(i + 1) & 0xff) << 8) | (img.pixels(i + 2) & 0xff)
          if (!distinct.contains(c)) distinct(c) = distinct.size
          i += 3
        }
      }
      require(distinct.size <= 256,
        s"mixed fixture $docId needs ${distinct.size} colors (> 256)")
      val pal = new Array[Byte](256 * 3)
      distinct.foreach { case (c, j) =>
        pal(j * 3) = ((c >> 16) & 0xff).toByte
        pal(j * 3 + 1) = ((c >> 8) & 0xff).toByte
        pal(j * 3 + 2) = (c & 0xff).toByte
      }
      val gifFrames = rgbs.map { img =>
        val idx = new Array[Byte](img.width * img.height)
        var i = 0
        while (i < idx.length) {
          val c = ((img.pixels(3 * i) & 0xff) << 16) |
            ((img.pixels(3 * i + 1) & 0xff) << 8) | (img.pixels(3 * i + 2) & 0xff)
          idx(i) = distinct(c).toByte
          i += 1
        }
        (10, idx)
      }
      GifCodec.encodeAnimated(72, 16, pal, gifFrames, minCode = 8)
    }
  }

  def mixedVideoNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs.where(col(idCol) % 3 === 0), idCol)(mixedVideoNearFixture)

  /** Shared 16-color GIF fixture palette: entry j, channel c =
    * (docId·17 + j·29 + c·13) mod 256 — exact in 64-bit, SQL-rebuildable. */
  private def gifPalette(docId: Long): Array[Byte] =
    Array.tabulate(16 * 3) { i =>
      ((docId * 17 + (i / 3) * 29 + (i % 3) * 13) % 256).toByte
    }

  /** Real single-frame GIF fixture: LZW-compressed 16-color frame with
    * index(x,y) = (docId + x·3 + y·5) mod 16 over [[gifPalette]];
    * docId % 5 == 0 streams are INTERLACED — the decoder must de-weave
    * them back to scan order, so the (weave-invariant) oracle pins the
    * four-pass logic too. */
  def gifFixture(docId: Long): Array[Byte] = {
    val w = (docId % 9 + 2).toInt
    val h = (docId % 7 + 2).toInt
    val idx = Array.tabulate(w * h) { i =>
      ((docId + (i % w) * 3 + (i / w) * 5) % 16).toByte
    }
    GifCodec.encodeIndexed(w, h, gifPalette(docId), idx, minCode = 4,
      interlaced = docId % 5 == 0)
  }

  def gifFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(gifFixture)

  /** Animated GIF fixture: docId % 3 + 2 frames on the shared palette,
    * frame f delayed (docId + f·7) % 100 + 1 cs with
    * index(x,y,f) = (docId + f·11 + x·3 + y·5) mod 16. */
  def gifAnimFixture(docId: Long): Array[Byte] = {
    val w = (docId % 9 + 2).toInt
    val h = (docId % 7 + 2).toInt
    val frames = (0 until (docId % 3 + 2).toInt).map { f =>
      val delay = ((docId + f * 7) % 100 + 1).toInt
      val idx = Array.tabulate(w * h) { i =>
        ((docId + f * 11 + (i % w) * 3 + (i / w) * 5) % 16).toByte
      }
      (delay, idx)
    }
    GifCodec.encodeAnimated(w, h, gifPalette(docId), frames, minCode = 4)
  }

  def gifAnimFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(gifAnimFixture)

  /** GIF twin of [[pngNearFixture]]/[[jpegNearFixture]]: ids in the same
    * group of 8 share geometry (the PNG family's w/h), a palette from
    * the MULTIPLICATIVE [[mix2]] (entry = mix2(base·131, k·37+c·11+1)
    * mod 256 — a linear palette recurs across bases and whole groups
    * collide; an additive nonlinear one correlates gradient bits
    * cross-group, see mix2's scaladoc) and index plane
    * ((base + x·3 + y·5) mod 16); non-canonical members remap ONLY the
    * (0,0) index to (base + (id%8)·7) mod 16 — never the canonical value
    * for id%8 ∈ 1..7 — so in-group dHashes differ in at most bit 0 of
    * row 0 while cross-group palettes decorrelate the hashes. */
  def gifNearFixture(docId: Long): Array[Byte] = {
    val base = docId - (docId % 8)
    val w = (base % 16 + 9).toInt
    val h = (base % 12 + 8).toInt
    val pal = Array.tabulate(16 * 3) { i =>
      (mix2(base * 131, (i / 3) * 37 + (i % 3) * 11 + 1) % 256).toByte
    }
    val idx = Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      if (x == 0 && y == 0 && docId % 8 != 0)
        ((base + (docId % 8) * 7) % 16).toByte
      else ((base + x * 3 + y * 5) % 16).toByte
    }
    GifCodec.encodeIndexed(w, h, pal, idx, minCode = 4)
  }

  def gifNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(gifNearFixture)

  /** Mixed-format corpus: each doc id yields TWO payloads with the SAME
    * pixel content — media id 2·id is the GIF near-fixture, 2·id+1 is a
    * real PNG re-encode of its decoded RGB. A web corpus stores the same
    * image under many containers; a perceptual dedup must find the
    * cross-format pair (byte/hash dedup never can). The PNG twin is
    * produced by really decoding the GIF and re-encoding — so the query
    * path exercises both codecs plus the format routing in one pass. */
  def crossFormatNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions(_.flatMap { id =>
      val gif = gifNearFixture(id)
      // our own encoder's stream always decodes; a None here is a codec
      // bug and should fail loudly in tests, not silently thin the corpus
      val img = GifCodec.decode(gif).getOrElse(
        throw new IllegalStateException(s"gif fixture $id failed to decode"))
      Seq(MediaRecord(2 * id, gif), MediaRecord(2 * id + 1, PngCodec.encode(img)))
    })
  }

  /** Three-format container-blind variant: every document's footage as
    * a GIF (3id), a PNG re-encode (3id+1) and a TIFF re-encode (3id+2)
    * — the near-dup core must cluster all three at hamming 0 because
    * the dHash works on DECODED pixels, not container bytes. */
  def crossFormat3NearFixtures(docs: DataFrame,
      idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val gif = gifNearFixture(id)
        val img = GifCodec.decode(gif).getOrElse(
          throw new IllegalStateException(
            s"gif fixture $id failed to decode"))
        Seq(MediaRecord(3 * id, gif),
          MediaRecord(3 * id + 1, PngCodec.encode(img)),
          MediaRecord(3 * id + 2, TiffCodec.encode(img)))
      })
  }

  /** Four-format container-blind variant: GIF (4id), PNG (4id+1),
    * TIFF (4id+2) and QOI (4id+3) re-encodes of the same footage — the
    * QOI path proves the newest codec joins the family: identical
    * decoded pixels ⇒ hamming-0 clusters across all four containers. */
  def crossFormat4NearFixtures(docs: DataFrame,
      idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val gif = gifNearFixture(id)
        val img = GifCodec.decode(gif).getOrElse(
          throw new IllegalStateException(
            s"gif fixture $id failed to decode"))
        Seq(MediaRecord(4 * id, gif),
          MediaRecord(4 * id + 1, PngCodec.encode(img)),
          MediaRecord(4 * id + 2, TiffCodec.encode(img)),
          MediaRecord(4 * id + 3, QoiCodec.encode(img)))
      })
  }

  /** QOI fixture: w = id%8+1, h = id%6+1, channels 3|4 by id parity.
    * Even rows alternate two colors in horizontal PAIRS
    * (`((x div 2) mod 2)·29`) — the A A B B A A pattern forces RUN on
    * the pair repeat and INDEX on each color's return; odd rows run
    * the `(x div 2)·7` gradient — small steps force DIFF/LUMA; the
    * row-to-row +13 and the 4-channel odd ids force RGB/RGBA. Every op
    * kind is exercised across the corpus (asserted in QoiCodecSpec). */
  def qoiFixture(docId: Long): Array[Byte] = {
    val w = (docId % 8 + 1).toInt
    val h = (docId % 6 + 1).toInt
    val ch = (3 + docId % 2).toInt
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          val xoff =
            if (y % 2 == 0) ((x / 2) % 2) * 29L else (x / 2) * 7L
          px((y * w + x) * ch + c) =
            ((docId * 37 + y * 13 + xoff + c * 5) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    QoiCodec.encode(PngCodec.Image(w, h, ch, px))
  }

  def qoiFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs, idCol)(qoiFixture)

  /** Frames per video the near-dup fid packing reserves. */
  val MaxVideoFrames = 1024L

  /** Per-frame perceptual hashes of an animated clip — one row per
    * really-decoded frame with its 9×8 dHash, the shot-level signature
    * video dedup works from. Routed by CONTAINER: animated GIFs through
    * the LZW frame walk, MP4s whose stsd names the 'jpeg' codec (Motion
    * JPEG) through chunk-offset sample location + the full T.81 decode —
    * so the same clip stored in either container hashes identically.
    * Other/undecodable payloads drop. */
  def videoFrameHashes(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val gif = GifCodec.decodeFrames(r.media).toSeq.flatMap(_.zipWithIndex
        .take(MaxVideoFrames.toInt).map { case (f, i) =>
          (r.doc_id, i.toLong,
            dhashOf(PngCodec.Image(f.width, f.height, 3, f.pixels)))
        })
      if (gif.nonEmpty) gif
      else Mp4.parseSamples(r.media).toSeq.flatMap { t =>
        mjpegSampleFrames(r.media, t, MaxVideoFrames.toInt)
          .map { case (i, img) => (r.doc_id, i.toLong, dhashOf(img)) }
      }
    }.toDF("doc_id", "frame", "dhash")
  }

  /** Shot-level video near-dup: two clips match when ANY frame pair is
    * within `maxHamming` — no temporal alignment assumed (a re-edit
    * reorders/crops the timeline but reuses the footage). Frame hashes
    * go through the SAME banded core as stills (fid = doc·1024 + frame
    * packs the frame dimension into the pair machinery), then pairs
    * collapse per video pair with the evidence a dedup policy needs:
    * how many near-frame pairs and how close the closest. Work scales
    * with frames, not frames² — the banding is the point at 100 TB.
    * Returns (cached frame-hash relation, pairs); caller releases. */
  def videoNearDupPairs(ds: Dataset[MediaRecord], maxHamming: Int = 3,
      maxBucket: Int = 8 * graft.operators.Dedup.DefaultMaxBucket)
      : (DataFrame, DataFrame) = {
    require(maxHamming <= 3,
      s"4-band LSH only guarantees recall up to hamming 3, got $maxHamming")
    val fh = videoFrameHashes(ds)
      .select((col("doc_id") * MaxVideoFrames + col("frame")).as("doc_id"),
        col("dhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val framePairs = bandedHammingPairs(fh, "dhash", maxHamming, maxBucket)
    val pairs = framePairs
      .withColumn("va", expr(s"doc_a div $MaxVideoFrames"))
      .withColumn("vb", expr(s"doc_b div $MaxVideoFrames"))
      .where(col("va") < col("vb"))
      .groupBy(col("va").as("doc_a"), col("vb").as("doc_b"))
      .agg(count(lit(1)).as("n_near_frames"),
        min(col("hamming")).as("min_hamming"))
    (fh, pairs)
  }

  /** Animated fixtures with CONTROLLED near-duplicate clips: ids in the
    * same group of 8 share the [[gifNearFixture]] geometry/palette and
    * three frames with index plane (base + f·11 + x·3 + y·5) mod 16;
    * non-canonical member m remaps ONLY pixel (0,0) of frame m mod 3 —
    * so any two group members share at least one bit-exact frame and
    * their edited frames stay within dHash hamming 1, while cross-group
    * palettes decorrelate everything. Built over a doc subset (id%3=0)
    * to keep the brute-force oracle's frame-pair join bounded. */
  def videoNearFixture(docId: Long): Array[Byte] = {
    val base = docId - (docId % 8)
    val m = (docId % 8).toInt
    val w = (base % 16 + 9).toInt
    val h = (base % 12 + 8).toInt
    val pal = Array.tabulate(16 * 3) { i =>
      (mix2(base * 131, (i / 3) * 37 + (i % 3) * 11 + 1) % 256).toByte
    }
    val frames = (0 until 3).map { f =>
      val idx = Array.tabulate(w * h) { i =>
        val x = i % w
        val y = i / w
        if (x == 0 && y == 0 && m != 0 && f == m % 3)
          ((base + m * 7) % 16).toByte
        else ((base + f * 11 + x * 3 + y * 5) % 16).toByte
      }
      (10, idx)
    }
    GifCodec.encodeAnimated(w, h, pal, frames, minCode = 4)
  }

  def videoNearFixtures(docs: DataFrame, idCol: String): Dataset[MediaRecord] =
    fixtureDs(docs.where(col(idCol) % 3 === 0), idCol)(videoNearFixture)

  /** Animated-GIF frame walk: one row per decoded frame with its GCE
    * delay and exact RGB channel sums — the video-adjacent sampling
    * surface over REAL LZW-decoded frames. Non-GIF payloads drop
    * (flatMap); shuffle-free per-partition work. */
  def gifFrameStats(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      GifCodec.decodeFrames(r.media).toSeq.flatMap(_.zipWithIndex.map {
        case (f, i) =>
          val sums = new Array[Long](3)
          var j = 0
          while (j < f.pixels.length) {
            sums(j % 3) += f.pixels(j) & 0xff
            j += 1
          }
          (r.doc_id, i.toLong, f.delayCs.toLong, sums(0), sums(1), sums(2))
      })
    }.toDF("doc_id", "frame_idx", "delay_cs", "sum_r", "sum_g", "sum_b")
  }

  /** REAL frame sampling: every `stride`-th sample of the clip's first
    * complete track, located through the parsed sample tables
    * ([[Mp4.parseSamples]]) — decode timestamp in exact integer ms from
    * the stts runs, byte size from stsz, codec from stsd. Non-ISO-BMFF
    * payloads are dropped (flatMap), same route-elsewhere contract as
    * the other decoders; shuffle-free per-partition work. */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      Mp4.parseSamples(r.media) match {
        case Some(t) =>
          (0L until t.sampleCount by stride.toLong).map { i =>
            (r.doc_id, i, t.dtsOf(i) * 1000L / t.mediaTimescale,
              t.sizeOf(i.toInt), t.codec)
          }
        case None => Seq.empty
      }
    }.toDF("doc_id", "sample_idx", "t_ms", "n_bytes", "codec")
  }
}
