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
}
