package graft.multimodal

/** ISO base-media / MP4 box walk (ISO 14496-12) — the video-container
  * member of the real-parser family. Boxes are [size BE32][type 4CC]
  * [payload], nested; size == 1 switches to a 64-bit largesize, size == 0
  * means "to end of enclosing box" (both handled — real muxers emit
  * both). Metadata read here:
  *
  *  - `ftyp`: major brand (4CC).
  *  - `moov`/`mvhd` (FullBox): movie timescale (ticks/second) and
  *    duration in ticks — version 0 (32-bit times) and version 1
  *    (64-bit) layouts both per spec §8.2.2.
  *  - `moov`/`trak` count — one per stream (video/audio/subs).
  *
  * Malformed input (short box, overrunning size, missing moov/mvhd)
  * returns None — route-elsewhere, never throw, same contract as
  * [[MediaHeader.parse]].
  */
object Mp4 {

  final case class Info(brand: String, timescale: Long, duration: Long,
      nTracks: Int) {
    /** Exact integer milliseconds (floor), the pipeline-facing duration. */
    def durationMs: Long = if (timescale <= 0) -1L else
      duration * 1000L / timescale
  }

  import ByteIo.{be32, be64, fourCC}

  /** Walk sibling boxes in [from, until), invoking f(type, payloadFrom,
    * payloadUntil). Returns false on any structural violation. */
  private def walk(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var o = from
    while (o < until) {
      if (o + 8 > until) return false
      val size32 = be32(b, o)
      val typ = fourCC(b, o + 4)
      var payload = o + 8
      val end: Long =
        if (size32 == 0L) until.toLong // "to end of enclosing box"
        else if (size32 == 1L) { // 64-bit largesize follows the type
          if (o + 16 > until) return false
          payload = o + 16
          o + be64(b, o + 8)
        } else o + size32
      if (end < payload || end > until) return false
      if (!f(typ, payload, end.toInt)) return false
      o = end.toInt
    }
    true
  }

  def parse(b: Array[Byte]): Option[Info] = {
    if (b == null || b.length < 16 || fourCC(b, 4) != "ftyp") return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    val ok = walk(b, 0, b.length) { (typ, from, until) =>
      typ match {
        case "ftyp" =>
          if (until - from < 4) false
          else { brand = fourCC(b, from); true }
        case "moov" =>
          walk(b, from, until) { (t2, f2, u2) =>
            t2 match {
              case "mvhd" =>
                // FullBox: version(1) + flags(3), then the timed fields
                if (u2 - f2 < 4) false
                else (b(f2) & 0xff) match {
                  case 0 if u2 - f2 >= 20 => // 32-bit times (§8.2.2)
                    timescale = be32(b, f2 + 12)
                    duration = be32(b, f2 + 16)
                    true
                  case 1 if u2 - f2 >= 32 => // 64-bit times
                    timescale = be32(b, f2 + 20)
                    duration = be64(b, f2 + 24)
                    true
                  case _ => false
                }
              case "trak" => tracks += 1; true
              case _ => true // udta, meta, iods... skipped by size
            }
          }
        case _ => true // mdat, free, skip...
      }
    }
    if (!ok || brand == null || timescale <= 0 || duration < 0) None
    else Some(Info(brand, timescale, duration, tracks))
  }

  /** Sample tables of the first complete track (§8.5–8.7): codec 4CC from
    * `stsd`, media timescale from `mdhd`, decode-time runs from `stts`
    * (run-length (count, delta) pairs) and per-sample byte sizes from
    * `stsz` (uniform when `sample_size != 0`). Everything a frame sampler
    * needs to pick samples by timestamp without touching `mdat`. */
  final case class Samples(codec: String, mediaTimescale: Long,
      sampleCount: Long, runs: Vector[(Long, Long)], uniformSize: Long,
      sizes: Vector[Long],
      stsc: Vector[(Long, Long)] = Vector.empty,
      chunkOffsets: Vector[Long] = Vector.empty) {
    /** Decode timestamp (media ticks) of 0-based sample `i`: the prefix
      * sum of the stts run deltas before it. */
    def dtsOf(i: Long): Long = {
      var left = i
      var dts = 0L
      var r = 0
      while (r < runs.length && left > 0) {
        val (cnt, delta) = runs(r)
        val take = math.min(left, cnt)
        dts += take * delta
        left -= take
        r += 1
      }
      dts
    }
    def sizeOf(i: Int): Long =
      if (uniformSize > 0) uniformSize else sizes(i)

    /** Absolute (fileOffset, byteSize) per sample, resolved through the
      * sample-to-chunk map (§8.7.4: stsc runs of (first_chunk,
      * samples_per_chunk)) and the chunk-offset table — the lookup that
      * turns sample METADATA into readable payload ranges. Empty when
      * the track carries no chunk tables (metadata-only fixtures) or the
      * tables are inconsistent; never throws. */
    def sampleOffsets: Vector[(Long, Long)] = {
      if (stsc.isEmpty || chunkOffsets.isEmpty || sampleCount <= 0 ||
          sampleCount > (1 << 22)) return Vector.empty
      if (stsc.head._1 != 1) return Vector.empty // §8.7.4: runs start at chunk 1
      if (uniformSize <= 0 && sizes.length < sampleCount) return Vector.empty
      val out = Vector.newBuilder[(Long, Long)]
      var sample = 0
      var ci = 0
      var si = 0
      while (ci < chunkOffsets.length && sample < sampleCount) {
        while (si + 1 < stsc.length && stsc(si + 1)._1 <= ci + 1) si += 1
        val spc = stsc(si)._2
        if (spc <= 0) return Vector.empty
        var off = chunkOffsets(ci)
        var k = 0L
        while (k < spc && sample < sampleCount) {
          val sz = sizeOf(sample)
          if (sz < 0) return Vector.empty
          out += ((off, sz))
          off += sz
          sample += 1
          k += 1
        }
        ci += 1
      }
      val res = out.result()
      if (res.length == sampleCount) res else Vector.empty
    }
  }

  def parseSamples(b: Array[Byte]): Option[Samples] = {
    if (b == null || b.length < 16 || fourCC(b, 4) != "ftyp") return None
    var codec: String = null
    var mts = -1L
    var count = -1L
    var runs = Vector.empty[(Long, Long)]
    var uni = -1L
    var sizes = Vector.empty[Long]
    var stsc = Vector.empty[(Long, Long)]
    var stco = Vector.empty[Long]
    var done = false
    val ok = walk(b, 0, b.length) { (typ, from, until) =>
      if (typ != "moov") true
      else walk(b, from, until) { (t1, f1, u1) =>
        if (t1 != "trak" || done) true
        else {
          // reset per trak so a metadata-only track can't half-fill state
          codec = null; mts = -1L; count = -1L
          runs = Vector.empty; uni = -1L; sizes = Vector.empty
          stsc = Vector.empty; stco = Vector.empty
          val trakOk = walk(b, f1, u1) { (t2, f2, u2) =>
            if (t2 != "mdia") true
            else walk(b, f2, u2) { (t3, f3, u3) =>
              t3 match {
                case "mdhd" =>
                  if (u3 - f3 < 4) false
                  else (b(f3) & 0xff) match {
                    case 0 if u3 - f3 >= 20 => mts = be32(b, f3 + 12); true
                    case 1 if u3 - f3 >= 28 => mts = be32(b, f3 + 20); true
                    case _ => false
                  }
                case "minf" =>
                  walk(b, f3, u3) { (t4, f4, u4) =>
                    if (t4 != "stbl") true
                    else walk(b, f4, u4) { (t5, f5, u5) =>
                      t5 match {
                        case "stsd" =>
                          // FullBox + entry_count, then entry [size][4CC]
                          if (u5 - f5 < 16 || be32(b, f5 + 4) < 1) false
                          else { codec = fourCC(b, f5 + 12); true }
                        case "stts" =>
                          if (u5 - f5 < 8) false
                          else {
                            val ec = be32(b, f5 + 4)
                            if (8 + ec * 8 > u5 - f5) false
                            else {
                              var j = 0
                              val acc = Vector.newBuilder[(Long, Long)]
                              while (j < ec) {
                                acc += ((be32(b, f5 + 8 + j * 8),
                                  be32(b, f5 + 12 + j * 8)))
                                j += 1
                              }
                              runs = acc.result()
                              true
                            }
                          }
                        case "stsz" =>
                          if (u5 - f5 < 12) false
                          else {
                            uni = be32(b, f5 + 4)
                            count = be32(b, f5 + 8)
                            if (uni != 0L) true
                            else if (12 + count * 4 > u5 - f5) false
                            else {
                              var j = 0
                              val acc = Vector.newBuilder[Long]
                              while (j < count) {
                                acc += be32(b, f5 + 12 + j * 4)
                                j += 1
                              }
                              sizes = acc.result()
                              true
                            }
                          }
                        case "stsc" =>
                          // §8.7.4: (first_chunk, samples_per_chunk,
                          // description_index) runs — the map from
                          // sample numbers to chunks
                          if (u5 - f5 < 8) false
                          else {
                            val ec = be32(b, f5 + 4)
                            if (8 + ec * 12 > u5 - f5) false
                            else {
                              var j = 0
                              val acc = Vector.newBuilder[(Long, Long)]
                              var prev = 0L
                              var mono = true
                              while (j < ec) {
                                val first = be32(b, f5 + 8 + j * 12)
                                if (first <= prev) mono = false
                                prev = first
                                acc += ((first, be32(b, f5 + 12 + j * 12)))
                                j += 1
                              }
                              if (!mono) false
                              else { stsc = acc.result(); true }
                            }
                          }
                        case "stco" | "co64" =>
                          // chunk offsets, 32-bit (stco) or 64-bit (co64)
                          if (u5 - f5 < 8) false
                          else {
                            val wid = if (t5 == "stco") 4 else 8
                            val ec = be32(b, f5 + 4)
                            if (8 + ec * wid > u5 - f5) false
                            else {
                              var j = 0
                              val acc = Vector.newBuilder[Long]
                              while (j < ec) {
                                acc += (if (wid == 4) be32(b, f5 + 8 + j * 4)
                                  else be64(b, f5 + 8 + j * 8))
                                j += 1
                              }
                              stco = acc.result()
                              true
                            }
                          }
                        case _ => true // ctts, stss... not needed
                      }
                    }
                  }
                case _ => true // hdlr etc.
              }
            }
          }
          if (!trakOk) false
          else {
            // consistency: stts run counts must cover the stsz count
            if (codec != null && mts > 0 && count >= 0 &&
              runs.map(_._1).sum == count) done = true
            true
          }
        }
      }
    }
    if (!ok || !done) None
    else Some(Samples(codec, mts, count, runs, uni, sizes, stsc, stco))
  }
}
