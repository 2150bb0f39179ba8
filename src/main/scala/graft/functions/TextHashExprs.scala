package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document hashing kernels for the dedup surface
  * (SURVEY.md §2.11). These reproduce graft.operators.Dedup's SQL-expression
  * formulations BIT-FOR-BIT (same md5-derived token hashes, same vote and
  * fold algebra — the DuckDB oracles in graft.queries.Extensions remain
  * valid), but run as one tight JVM loop per row instead of interpreted
  * higher-order-function lambdas: no per-token array allocation, one
  * reused MessageDigest, ~10× less per-document cost. At 100 TB these
  * kernels touch every document — they are the scan's inner loop.
  *
  * CodegenFallback is deliberate: the work is inside the eval loop (md5 +
  * arithmetic), so whole-stage fusion would save one virtual call per ROW
  * while complicating the md5 state management; the interpreted-lambda
  * overhead this class removes was per TOKEN.
  */
object TextHash {
  val P = 1000000007L

  /** Raw 60-bit md5 hash: first 15 hex digits of md5(s), base 16 —
    * identical to SQL `conv(substring(md5(s), 1, 15), 16, 10)`. */
  def h60raw(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    // 15 hex digits = 60 bits = top 7.5 bytes of the digest
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Whitespace tokens, empties dropped — identical to SQL
    * `filter(split(text, ' '), w -> w <> '')`. */
  def words(text: UTF8String): Array[UTF8String] =
    text.split(UTF8String.fromString(" "), -1).filter(_.numBytes() > 0)
}

/** simhash60(text): 60-bit SimHash over whitespace tokens — mirrors
  * [[graft.operators.Dedup.simhashExpr]]. NULL for texts with no tokens
  * (callers filter `size(words) >= 1`, matching the oracle's WHERE). */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash60"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val ws = TextHash.words(input.asInstanceOf[UTF8String])
    if (ws.isEmpty) return null
    val md = MessageDigest.getInstance("MD5")
    val bal = new Array[Int](60)
    var w = 0
    while (w < ws.length) {
      val h = TextHash.h60raw(md, ws(w))
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) bal(i) += 1 else bal(i) -= 1
        i += 1
      }
      w += 1
    }
    var acc = 0L
    var i = 59
    while (i >= 0) { acc = acc * 2 + (if (bal(i) > 0) 1L else 0L); i -= 1 }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_hashes(text[, k]): DISTINCT 60-bit md5 hashes of the word
  * k-shingles of `text` (k defaults to 3) — the inverted-index key
  * material for exact n-gram Jaccard and decontamination (distinctness is
  * on the hash value, mirroring the oracle's
  * `list_distinct(list_transform(shingles, s -> md5-hash(s)))`; a 2^-60
  * collision would merge two shingles identically in both engines). NULL
  * when there are fewer than k tokens, matching the oracle's WHERE. One
  * tight loop per row — the interpreted HOF form (transform + slice +
  * concat_ws + array_distinct) measured ~0.8 ms/doc on 54-word docs. */
case class ShingleHashes(child: Expression, kExpr: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  def this(child: Expression) =
    this(child, org.apache.spark.sql.catalyst.expressions.Literal(3))

  override def left: Expression = child
  override def right: Expression = kExpr
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, org.apache.spark.sql.types.IntegerType)
          if kExpr.foldable =>
        // reject bad k at ANALYSIS time: a negative k would throw per-row
        // inside the eval loop, and k = 0 silently hashes the empty
        // shingle for every doc (poisoning a decontamination join)
        kExpr.eval(null) match {
          case kk: Int if kk >= 1 => TypeCheckResult.TypeCheckSuccess
          case kk => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires k >= 1, got $kk")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def nullSafeEval(input: Any, kIn: Any): Any = {
    val ws = TextHash.words(input.asInstanceOf[UTF8String])
    if (ws.length < k) return null
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + k - 1 < ws.length) {
      seen.add(TextHash.h60raw(md,
        UTF8String.concatWs(space, java.util.Arrays.copyOfRange(ws, i, i + k): _*)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, kExpr = newRight)
}

/** trigram_hits(text, profile): number of character trigrams of
  * lower(text) (with multiplicity) that appear in the profile array —
  * mirrors `size(filter(transform(sequence(1, length(lower(t))-2),
  * i -> substring(lower(t), i, 3)), g -> array_contains(profile, g)))`
  * but lowercases ONCE and slides in a single loop; the SQL form
  * re-evaluates lower(t) per gram (O(len²)) and is re-inlined per
  * language column by CollapseProject (measured 16 s for 4 languages on
  * 5k docs at sf0.1). */
case class TrigramHits(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def prettyName: String = "trigram_hits"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>), got ${l.simpleString}, ${r.simpleString}")
  }

  // profile is a foldable literal in practice; evaluate it once per instance
  @transient private lazy val profile: java.util.HashSet[String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i).toString); i += 1 }
    s
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    // materialize the lowercase text once; slide over CODEPOINT offsets so
    // char semantics match SQL substring (UTF8String.substringSQL would
    // seek from the string start per gram — O(len²))
    val str = t.asInstanceOf[UTF8String].toLowerCase.toString
    val n = str.length
    val starts = new Array[Int](n + 1)
    var cp = 0
    var i = 0
    while (i < n) {
      starts(cp) = i
      i += Character.charCount(str.codePointAt(i))
      cp += 1
    }
    starts(cp) = n
    var hits = 0L
    var c = 0
    while (c + 2 < cp) {
      if (profile.contains(str.substring(starts(c), starts(c + 3)))) hits += 1
      c += 1
    }
    hits
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** srp_sig16(embedding): 16-bit signed-random-projection LSH signature of
  * a 64-dim float vector — mirrors [[graft.operators.Similarity.srpSignature]]
  * (same md5-seeded hyperplanes, same sequential double fold per plane, so
  * the DuckDB oracle reproduces it). Bit j = (v · plane_j) > 0, folded
  * MSB-first. */
case class SrpSig16(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "srp_sig16"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val planes = SrpSig16.planes
    val n = math.min(v.numElements(), 64)
    var sig = 0L
    var j = 15
    while (j >= 0) {
      val p = planes(j)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v.getFloat(d).toDouble * p(d); d += 1 }
      sig = sig * 2 + (if (acc > 0) 1L else 0L)
      j -= 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSig16 {
  /** The fixed 16×64 hyperplane matrix (md5-seeded; see
    * [[graft.operators.Similarity.hyperplanes]]). */
  lazy val planes: Array[Array[Double]] =
    graft.operators.Similarity.hyperplanes(16, 64)
}

/** minhash_sig(text): 16-wide MinHash signature over distinct word
  * 3-shingles — mirrors [[graft.operators.Dedup.sigExpr]] over
  * [[graft.operators.Dedup.shinglesExpr]]. NULL when there are fewer than
  * 3 tokens (no shingles), matching the oracle's WHERE. */
case class MinHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  private val NumHashes = 16
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val ws = TextHash.words(input.asInstanceOf[UTF8String])
    if (ws.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(NumHashes)(TextHash.P)
    val seen = new java.util.HashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + 2 < ws.length) {
      val shingle = UTF8String.concatWs(space, ws(i), ws(i + 1), ws(i + 2))
      if (seen.add(shingle)) {
        val h = TextHash.h60raw(md, shingle) % TextHash.P
        var j = 0
        while (j < NumHashes) {
          val v = ((2 * j + 1) * h + 12345L * j + 678L) % TextHash.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
