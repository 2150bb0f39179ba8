package graft.multimodal

/** Shared byte-level primitives for the container parsers/encoders. One
  * copy, deliberately: the subtle parts (unsigned reads returned as Long
  * so bounds arithmetic can never overflow Int, the stored-deflate block
  * loop's empty-input termination) must not drift between the five
  * formats that use them.
  */
object ByteIo {

  /** Unsigned big-endian 32-bit read, as Long — callers do bounds math in
    * Long so a hostile 0x7fffffff length cannot wrap Int arithmetic. */
  def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  def be64(b: Array[Byte], o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)

  /** Signed little-endian int32 (BMP dimensions are signed by spec). */
  def le32s(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)).toLong

  def le32u(b: Array[Byte], o: Int): Long = le32s(b, o) & 0xffffffffL

  def le16(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toLong

  /** Little-endian 64-bit read as a signed Long. ZIP64 size/offset
    * fields are unsigned u64 by spec, but any real value tops out far
    * below 2^63 — callers reject negatives as hostile. */
  def le64(b: Array[Byte], o: Int): Long =
    le32u(b, o) | (le32u(b, o + 4) << 32)

  def le64b(v: Long): Array[Byte] =
    le32b(v & 0xffffffffL) ++ le32b((v >>> 32) & 0xffffffffL)

  def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def be32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def be64b(v: Long): Array[Byte] = be32b(v >>> 32) ++ be32b(v & 0xffffffffL)

  def le16b(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def le32b(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** RFC 1951 stored-mode blocks for `data` (no zlib/gzip wrapper):
    * deterministic across platforms, legal input to any inflater. Handles
    * empty input (one final zero-length block) and payloads past the
    * 65535-byte per-block cap. */
  def writeStoredBlocks(out: java.io.OutputStream, data: Array[Byte]): Unit = {
    var off = 0
    var done = false
    while (!done) {
      val n = math.min(65535, data.length - off)
      val last = off + n == data.length
      out.write(if (last) 1 else 0)
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >> 8) & 0xff)
      out.write(data, off, n)
      off += n
      done = last
    }
  }
}
