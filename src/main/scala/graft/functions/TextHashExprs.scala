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
  // a token-less doc yields null even for a non-null (non-nullable) input
  override def nullable: Boolean = true
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
  // a doc shorter than k words yields null even for a non-null input
  override def nullable: Boolean = true
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
    // the per-instance profile cache below is only sound for a constant
    // profile — reject a varying column at analysis time
    case (StringType, ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a foldable (constant) profile argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>), got ${l.simpleString}, ${r.simpleString}")
  }

  // profile is a foldable literal (enforced above); evaluate once per instance
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

/** norm_ws(text): whitespace-collapse + trim + lowercase in ONE byte pass —
  * byte-identical to `lower(trim(regexp_replace(text, '\s+', ' ')))`
  * ([[graft.operators.CorpusClean.normExpr]]): runs of Java-regex `\s`
  * bytes (space, \t, \n, \x0B, \f, \r — all ASCII, so byte-level scanning
  * is UTF-8-safe) collapse to one space, leading/trailing spaces drop
  * (Spark `trim` strips 0x20 only, which is all that remains post-collapse),
  * then UTF8String.toLowerCase (exactly what Catalyst `Lower` calls). The
  * regex engine this replaces dominated the corpus-clean scan's norm stage. */
case class NormWs(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "norm_ws"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var prevWs = false
    var i = 0
    while (i < in.length) {
      if (isWs(in(i))) {
        if (!prevWs) { out(n) = 0x20; n += 1 }
        prevWs = true
      } else {
        out(n) = in(i); n += 1
        prevWs = false
      }
      i += 1
    }
    var start = 0
    while (start < n && out(start) == 0x20) start += 1
    var end = n
    while (end > start && out(end - 1) == 0x20) end -= 1
    UTF8String.fromBytes(out, start, end - start).toLowerCase
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** decode_numrefs(text): decode HTML numeric character references —
  * `&#D;` (1–8 decimal digits) and `&#xH;`/`&#XH;` (1–6 hex digits) —
  * to their Unicode scalar values in ONE left-to-right pass. A
  * reference whose code point is 0, beyond U+10FFFF, or a UTF-16
  * surrogate (U+D800–U+DFFF) stays literal text, as does anything
  * malformed (no terminating `;`, too many digits, `&#` with no
  * digits). Decoded output is FINAL text, never rescanned — so a
  * double-escaped `&amp;#65;` (whose `&amp;` is decoded LAST by
  * [[graft.operators.Boilerplate.decodeEntities]]) correctly yields
  * the literal text `&#65;`, the HTML single-pass semantics. */
case class DecodeNumRefs(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "decode_numrefs"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (!s.contains("&#")) return u
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var decoded = false
      if (c == '&' && i + 2 < n && s.charAt(i + 1) == '#') {
        var code = -1L
        var end = -1
        val j = i + 2
        if (s.charAt(j) == 'x' || s.charAt(j) == 'X') {
          var k = j + 1
          var v = 0L
          while (k < n && k - j - 1 < 6 && hexVal(s.charAt(k)) >= 0) {
            v = v * 16 + hexVal(s.charAt(k)); k += 1
          }
          // at least one digit, and the NEXT char (even a 7th hex
          // digit, which makes the ref malformed) must be ';'
          if (k > j + 1 && k < n && s.charAt(k) == ';') { code = v; end = k }
        } else if (s.charAt(j) >= '0' && s.charAt(j) <= '9') {
          var k = j
          var v = 0L
          while (k < n && k - j < 8 && s.charAt(k) >= '0' && s.charAt(k) <= '9') {
            v = v * 10 + (s.charAt(k) - '0'); k += 1
          }
          if (k < n && s.charAt(k) == ';') { code = v; end = k }
        }
        if (end >= 0 && code >= 1 && code <= 0x10FFFFL &&
            !(code >= 0xD800L && code <= 0xDFFFL)) {
          sb.appendCodePoint(code.toInt)
          i = end + 1
          decoded = true
        }
      }
      if (!decoded) { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** luhn_redact(text): checksum-VALIDATED payment-card redaction — the
  * precision upgrade over blanket digit masking: a candidate is a
  * maximal run of digits/spaces/dashes, trimmed to its first..last
  * digit, carrying 13–19 digits total; it is replaced by `<CARD>` iff
  * its digit sequence passes the Luhn check (ISO/IEC 7812: from the
  * rightmost digit double every second, subtract 9 above 9, sum ≡ 0
  * mod 10). Invalid checksums, short/long runs, and everything else
  * pass through untouched — order numbers and timestamps survive,
  * real PANs do not. One left-to-right pass, never throws. */
case class LuhnRedact(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "luhn_redact"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isRun(c: Char): Boolean = isDigit(c) || c == ' ' || c == '-'

  private def luhnValid(digits: Array[Int]): Boolean = {
    var sum = 0
    var i = digits.length - 1
    var second = false
    while (i >= 0) {
      var d = digits(i)
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (isDigit(s.charAt(i))) {
        // maximal [0-9 -] run from here, then trim to the last digit
        var j = i
        var lastDigit = i
        while (j < n && isRun(s.charAt(j))) {
          if (isDigit(s.charAt(j))) lastDigit = j
          j += 1
        }
        val run = s.substring(i, lastDigit + 1)
        val digits = run.iterator.filter(isDigit).map(_ - '0').toArray
        if (digits.length >= 13 && digits.length <= 19 &&
            luhnValid(digits)) {
          sb.append("<CARD>")
          i = lastDigit + 1
        } else {
          sb.append(run)
          i = lastDigit + 1
        }
      } else {
        sb.append(s.charAt(i))
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** iban_redact(text): checksum-VALIDATED bank-account redaction — the
  * IBAN sibling of [[LuhnRedact]] (ISO 13616 / ECBS mod-97): a
  * candidate starts at an uppercase letter on a non-alphanumeric
  * boundary and spans a maximal run of `[A-Z0-9 ]`; the LONGEST
  * space-stripped prefix ending on a group boundary that is 15–34
  * chars shaped `[A-Z]{2}[0-9]{2}[A-Z0-9]+` (country + check digits +
  * BBAN) AND passes mod-97 — move the first four chars to the end,
  * map A→10..Z→35, resulting integer ≡ 1 (mod 97), computed as a
  * running remainder so no big-integer materializes — becomes
  * `<IBAN>`. Prefix-wise matching means neither a leading uppercase
  * word ("IBAN DE89 …": the invalid head advances one group and the
  * IBAN re-enters at its own boundary) nor trailing glued groups
  * ("… 0130 00 EUR") can mask a valid IBAN. Everything else (checksum
  * breaks, wrong shape, lowercase, bare uppercase words) passes
  * through untouched. Country-specific LENGTH tables are out of scope
  * (documented precision trade: a mod-97-valid string of a wrong
  * per-country length still redacts — fail-closed for PII). Never
  * throws; work per run is bounded by its group count × 34. */
case class IbanRedact(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "iban_redact"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAlnum(c: Char): Boolean =
    isUpper(c) || isDigit(c) || (c >= 'a' && c <= 'z')
  private def isRun(c: Char): Boolean = isUpper(c) || isDigit(c) || c == ' '

  private def mod97Valid(s: String): Boolean = {
    // shape: CC dd BBAN(>= 11)
    if (s.length < 15 || s.length > 34) return false
    if (!isUpper(s.charAt(0)) || !isUpper(s.charAt(1))) return false
    if (!isDigit(s.charAt(2)) || !isDigit(s.charAt(3))) return false
    var acc = 0L
    var i = 4
    // rearranged = s[4..) ++ s[0..4): one pass, wrapping the index
    var seen = 0
    val n = s.length
    while (seen < n) {
      val c = s.charAt(if (i < n) i else i - n)
      if (isDigit(c)) acc = (acc * 10 + (c - '0')) % 97
      else if (isUpper(c)) acc = (acc * 100 + (c - 'A' + 10)) % 97
      else return false
      i += 1
      seen += 1
    }
    acc == 1L
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isUpper(c) && (i == 0 || !isAlnum(s.charAt(i - 1)))) {
        // maximal [A-Z0-9 ] run, trimmed to the last alphanumeric;
        // redact the LONGEST space-stripped prefix ending on a group
        // boundary that mod-97-validates, so trailing glued groups
        // ("DE89 … 00 EUR") can't mask the IBAN before them
        var j = i
        var last = i
        while (j < n && isRun(s.charAt(j))) {
          if (s.charAt(j) != ' ') last = j
          j += 1
        }
        var bestEnd = -1
        val packed = new java.lang.StringBuilder(34)
        var p = i
        while (p <= last && packed.length <= 34) {
          val ch = s.charAt(p)
          if (ch != ' ') {
            packed.append(ch)
            val groupEnd = p == last || s.charAt(p + 1) == ' '
            if (groupEnd && mod97Valid(packed.toString)) bestEnd = p
          }
          p += 1
        }
        if (bestEnd >= 0) { sb.append("<IBAN>"); i = bestEnd + 1 }
        else {
          // advance past the FIRST space-delimited group only, so an
          // uppercase word glued to the run ("IBAN DE89 …", "USD DE89
          // …") cannot swallow the valid IBAN after it; later groups
          // re-enter the scan at their own boundaries (re-scan work is
          // bounded by the run's group count — runs are line-local)
          var k = i
          while (k < n && isRun(s.charAt(k)) && s.charAt(k) != ' ') k += 1
          sb.append(s, i, k)
          i = k
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** clean_gate(text, lang, minQuality): the corpus-clean keep/drop decision
  * as ONE boolean kernel — language-ID argmax + integer quality score in a
  * single tokenization pass, replacing six interpreted filter/contains
  * lambdas plus two regexes per row in the clean pipeline's scan. Exactly
  * reproduces [[graft.operators.TextAnalysis.languageId]] (stopword counts
  * with multiplicity, alphabetically-first argmax) and
  * [[graft.operators.TextAnalysis.qualityScore]] (4-dp-rounded ratios →
  * 3/3/4-weighted integer score; rounding via BigDecimal(toString)
  * HALF_UP, the exact algebra of Catalyst `Round`), so the DuckDB
  * corpus-clean oracle keeps matching bit-for-bit. False when the doc has
  * no tokens (the pipeline's `size(words) >= 1` gate). */
case class CleanGate(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with CodegenFallback {

  override def prettyName: String = "clean_gate"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, LongType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string literal, bigint literal), " +
          s"got ${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  @transient private lazy val targetLang: String =
    second.eval(null).asInstanceOf[UTF8String].toString
  @transient private lazy val minQuality: Long =
    third.eval(null).asInstanceOf[Long]
  @transient private lazy val stopSets: Array[java.util.HashSet[UTF8String]] =
    CleanGate.stopSets
  @transient private lazy val langNames: Array[String] = CleanGate.langNames
  @transient private lazy val enIdx: Int = langNames.indexOf("en")

  /** Catalyst Round(double, s) for non-negative inputs: BigDecimal of the
    * double's STRING form, HALF_UP. */
  private def r(x: Double, scale: Int): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(textIn: Any, langIn: Any, minQIn: Any): Any = {
    val text = textIn.asInstanceOf[UTF8String]
    val ws = TextHash.words(text)
    if (ws.length == 0) return false

    val scores = new Array[Long](stopSets.length)
    val distinct = new java.util.HashSet[UTF8String](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      distinct.add(w)
      var l = 0
      while (l < stopSets.length) {
        if (stopSets(l).contains(w)) scores(l) += 1
        l += 1
      }
      i += 1
    }
    // alphabetically-first argmax (langNames is sorted; strict > keeps
    // the earlier language on ties — same as the CASE chain)
    var best = 0
    var l = 1
    while (l < scores.length) {
      if (scores(l) > scores(best)) best = l
      l += 1
    }
    if (langNames(best) != targetLang) return false

    // alpha ratio over codepoints: [a-zA-Z] is ASCII, so count letter
    // bytes vs numChars (multibyte codepoints contain no ASCII bytes)
    val bytes = text.getBytes
    var alpha = 0
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) alpha += 1
      i += 1
    }
    val n = ws.length.toDouble
    val ttr4 = r(distinct.size / n, 4)
    val stop4 = r(scores(enIdx) / n, 4)
    val alpha4 = r(alpha.toDouble / text.numChars(), 4)
    val q = r(ttr4 * 10000, 0).toLong * 3 + r(stop4 * 10000, 0).toLong * 3 +
      r(alpha4 * 10000, 0).toLong * 4
    q >= minQuality
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CleanGate {
  /** Shared with [[graft.operators.TextAnalysis.stopwords]] (already in
    * alphabetical language order). */
  lazy val langNames: Array[String] =
    graft.operators.TextAnalysis.stopwords.map(_._1).toArray
  lazy val stopSets: Array[java.util.HashSet[UTF8String]] =
    graft.operators.TextAnalysis.stopwords.map { case (_, sw) =>
      val s = new java.util.HashSet[UTF8String](sw.length * 2)
      sw.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
}

/** minhash_from_hashes(hv): 16-wide MinHash signature computed from an
  * ALREADY-HASHED distinct shingle array (raw 60-bit values, e.g. from
  * [[ShingleHashes]]) — the same mins as [[MinHashSig]] over the same text
  * (each hash is folded mod P before the affine permutes; a 2^-60 shingle
  * collision dedupes identically in both formulations). Pure arithmetic,
  * no md5: lets one `shingle_hashes` pass feed BOTH the Jaccard-verify
  * shingle sets and the signature, halving the per-document digest work
  * in the MinHash dedup scan. NULL propagates (docs with < k tokens). */
case class MinHashFromHashes(child: Expression) extends UnaryExpression
  with CodegenFallback {
  private val NumHashes = 16
  override def prettyName: String = "minhash_from_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val mins = Array.fill(NumHashes)(TextHash.P)
    var i = 0
    while (i < hv.numElements()) {
      val h = hv.getLong(i) % TextHash.P
      var j = 0
      while (j < NumHashes) {
        val v = ((2 * j + 1) * h + 12345L * j + 678L) % TextHash.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sig(text): 16-wide MinHash signature over distinct word
  * 3-shingles — mirrors [[graft.operators.Dedup.sigExpr]] over
  * [[graft.operators.Dedup.shinglesExpr]]. NULL when there are fewer than
  * 3 tokens (no shingles), matching the oracle's WHERE. */
case class MinHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  private val NumHashes = 16
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a doc shorter than 3 words yields null even for a non-null input
  override def nullable: Boolean = true
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

/** unicode_norm(text, form): Unicode normalization (NFC/NFD/NFKC/NFKD)
  * as a native kernel — the canonicalization step every dedup/hash
  * pipeline runs before comparing text, since canonically-equivalent
  * strings (precomposed é vs e + combining acute) are byte-DIFFERENT
  * and byte-exact dedup misses them. The form argument must be a
  * string LITERAL so the java.text.Normalizer.Form resolves once per
  * plan, not per row. CodegenFallback like the file's other kernels:
  * the work is the normalizer's own scan, not dispatch overhead.
  * DuckDB twin: `nfc_normalize` (the oracles pin the NFC path; the
  * other forms are spec-covered). */
case class UnicodeNorm(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def prettyName: String = "unicode_norm"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        if (formOpt.isDefined) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName form must be one of NFC, NFD, NFKC, NFKD")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string literal), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  private lazy val formOpt: Option[java.text.Normalizer.Form] = {
    val v = right.eval(null)
    if (v == null) None
    else scala.util.Try(java.text.Normalizer.Form.valueOf(
      v.asInstanceOf[UTF8String].toString.toUpperCase)).toOption
  }

  override def nullSafeEval(input: Any, form: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan that skips the
    // rebuild for the (dominant, in real corpora) already-normal case
    val f = formOpt.get
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
