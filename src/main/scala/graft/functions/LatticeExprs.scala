package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-local lattice kernels for the tokenizer family (r14
  * optimization round, guide §1.2 "fix the distributed algorithm"):
  * the Viterbi / forward–backward DPs in [[graft.operators.UnigramLM]]
  * and [[graft.operators.MaxMatch.viterbiTokens]] used to run as
  * `maxSteps` (≤16) SEQUENTIAL Spark jobs per pass — one
  * join + groupBy + eager localCheckpoint per DP position — even
  * though each word's lattice is tiny (≤16 positions × ≤4 piece
  * lengths) and entirely word-local once its vocabulary hits are
  * known. These kernels replace the position loop with: ONE
  * (position, length) candidate explode, ONE equi-join against the
  * scored vocabulary, ONE `collect_list` per word, and a per-row DP
  * replay — the [[graft.operators.MaxMatch]] round-12 greedy-walk
  * restructure, applied to the optimal-segmentation DPs (measured
  * there: identical output, maxSteps-fold fewer jobs).
  *
  * EXACTNESS CONTRACT: every recurrence below reproduces the replaced
  * step-loop SQL integer-for-integer — same packed keys
  * (`score · 2^26 + base-4 path`), same per-TERM floored divisions in
  * the nano-unit lattice, same min/total-order tie-breaks — so the
  * DP-unrolled DuckDB oracles remain valid cell for cell (re-proven by
  * the oracle gate at 3 SFs after the swap; the candidate arrays
  * arrive via `collect_list`, whose nondeterministic ORDER is
  * irrelevant because min() and integer sums are commutative).
  *
  * CodegenFallback is deliberate (the [[TextHash]] rationale): these
  * evaluate once per word TYPE — a bounded relation — and the work is
  * the DP loop itself, not call overhead.
  */
object Lattice {
  /** Occurrence struct consumed by all kernels: start (0-based, code
    * points), piece length, and the piece's integer score/prob. */
  val OccType: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("l", IntegerType, nullable = false),
    StructField("s", LongType, nullable = false)))

  private[functions] def checkOccs(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) =>
      st.length == 3 &&
        st(0).dataType == IntegerType &&
        st(1).dataType == IntegerType &&
        st(2).dataType == LongType
    case _ => false
  }

  /** Code-point count (Spark SQL `length`) of a UTF8String. */
  @inline private[functions] def cps(u: UTF8String): Int = u.numChars()
}

/** unigram_viterbi(word, occs): the [[graft.operators.UnigramLM]] hard
  * E-step for ONE word — min over segmentations of the packed
  * `(Σ score) · 2^26 + sentinel-led base-4 length path` key, exactly
  * the replaced per-position recurrence
  * `(prev div 2^26 + s) · 2^26 + ((prev mod 2^26) · 4 + (l − 1))`
  * seeded at 1. Returns `struct(key, pieces)` where `pieces` is the
  * winning segmentation's piece multiset (popped off the path exactly
  * like the replaced decode loop: last piece first), or NULL when the
  * word has no full-coverage segmentation under the scored vocabulary
  * (= the word silently dropping out of the old step-loop's final
  * frontier — inner-join semantics downstream, unchanged). */
case class UnigramViterbi(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  private val PathShift = 1L << 26

  override def prettyName: String = "unigram_viterbi"
  override def dataType: DataType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, r) if Lattice.checkOccs(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<struct<i:int,l:int,s:bigint>>)," +
          s" got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(wordIn: Any, occsIn: Any): Any = {
    val word = wordIn.asInstanceOf[UTF8String]
    val occs = occsIn.asInstanceOf[ArrayData]
    val len = Lattice.cps(word)
    if (len == 0) return null
    // (i, l) -> score lookup; absent = not in the scored vocabulary
    val sc = new Array[Long](len * 4)
    val has = new Array[Boolean](len * 4)
    var t = 0
    val n = occs.numElements()
    while (t < n) {
      val r = occs.getStruct(t, 3)
      val i = r.getInt(0); val l = r.getInt(1)
      if (i >= 0 && l >= 1 && l <= 4 && i + l <= len) {
        sc(i * 4 + (l - 1)) = r.getLong(2)
        has(i * 4 + (l - 1)) = true
      }
      t += 1
    }
    val dp = new Array[Long](len + 1)
    val ok = new Array[Boolean](len + 1)
    dp(0) = 1L; ok(0) = true
    var j = 1
    while (j <= len) {
      var best = 0L; var any = false
      var l = 1
      val lMax = math.min(4, j)
      while (l <= lMax) {
        val at = (j - l) * 4 + (l - 1)
        if (ok(j - l) && has(at)) {
          val prev = dp(j - l)
          val cand = (prev / PathShift + sc(at)) * PathShift +
            ((prev % PathShift) * 4L + (l - 1))
          if (!any || cand < best) { best = cand; any = true }
        }
        l += 1
      }
      ok(j) = any; dp(j) = best
      j += 1
    }
    if (!ok(len)) return null
    var path = dp(len) % PathShift
    var pend = len
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (path > 1L) {
      val l = (path % 4L).toInt + 1
      buf += word.substringSQL(pend - l + 1, l)
      pend -= l
      path /= 4L
    }
    new GenericInternalRow(
      Array[Any](dp(len), new GenericArrayData(buf.toArray)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** additive_viterbi(len, occs): min-sum segmentation key over a
  * length-`len` word whose occurrence scores are ALREADY the additive
  * step costs (e.g. [[graft.operators.MaxMatch]]'s
  * `TokWeight − cnt`) — the replaced recurrence `prev + s` seeded at
  * 0. NULL when unreachable (word absent from the old final
  * frontier). */
case class AdditiveViterbi(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "additive_viterbi"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, r) if Lattice.checkOccs(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, array<struct<i:int,l:int,s:bigint>>)," +
          s" got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(lenIn: Any, occsIn: Any): Any = {
    val len = lenIn.asInstanceOf[Int]
    val occs = occsIn.asInstanceOf[ArrayData]
    if (len <= 0) return null
    val sc = new Array[Long](len * 4)
    val has = new Array[Boolean](len * 4)
    var t = 0
    val n = occs.numElements()
    while (t < n) {
      val r = occs.getStruct(t, 3)
      val i = r.getInt(0); val l = r.getInt(1)
      if (i >= 0 && l >= 1 && l <= 4 && i + l <= len) {
        sc(i * 4 + (l - 1)) = r.getLong(2)
        has(i * 4 + (l - 1)) = true
      }
      t += 1
    }
    val dp = new Array[Long](len + 1)
    val ok = new Array[Boolean](len + 1)
    dp(0) = 0L; ok(0) = true
    var j = 1
    while (j <= len) {
      var best = 0L; var any = false
      var l = 1
      val lMax = math.min(4, j)
      while (l <= lMax) {
        val at = (j - l) * 4 + (l - 1)
        if (ok(j - l) && has(at)) {
          val cand = dp(j - l) + sc(at)
          if (!any || cand < best) { best = cand; any = true }
        }
        l += 1
      }
      ok(j) = any; dp(j) = best
      j += 1
    }
    if (!ok(len)) null else java.lang.Long.valueOf(dp(len))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** unigram_posteriors(word, occs): the [[graft.operators.UnigramLM]]
  * SOFT E-step for ONE word — the nano-unit fixed-point
  * forward–backward lattice, reproducing the replaced step-loops
  * exactly: per-TERM floored products
  * (`α̃(j) = Σ_l α̃(j−l)·p div 1e9`, `β̃(m) = Σ_l p·β̃(m−l) div 1e9`,
  * both seeded at 1e9), `z = α̃(len)`, and per occurrence `(i, l)`
  * the posterior
  * `((α̃(i)·p div 1e9)·β̃(len−i−l) div 1e9)·1e9 div max(z, 1)`.
  * An occurrence whose α̃(i) or β̃(m) frontier was unreachable emits
  * nothing (= the old af/bt inner joins dropping the row). Returns
  * `struct(z, posts: array<struct<piece, post>>)`; NULL when the word
  * has no full-coverage lattice (= the old z inner join dropping the
  * word). */
case class UnigramPosteriors(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  private val Scale = 1000000000L

  override def prettyName: String = "unigram_posteriors"
  override def dataType: DataType = StructType(Seq(
    StructField("z", LongType, nullable = false),
    StructField("posts", ArrayType(StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("post", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, r) if Lattice.checkOccs(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<struct<i:int,l:int,s:bigint>>)," +
          s" got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(wordIn: Any, occsIn: Any): Any = {
    val word = wordIn.asInstanceOf[UTF8String]
    val occs = occsIn.asInstanceOf[ArrayData]
    val len = Lattice.cps(word)
    if (len == 0) return null
    val p = new Array[Long](len * 4)
    val has = new Array[Boolean](len * 4)
    var t = 0
    val n = occs.numElements()
    while (t < n) {
      val r = occs.getStruct(t, 3)
      val i = r.getInt(0); val l = r.getInt(1)
      if (i >= 0 && l >= 1 && l <= 4 && i + l <= len) {
        p(i * 4 + (l - 1)) = r.getLong(2)
        has(i * 4 + (l - 1)) = true
      }
      t += 1
    }
    // forward: a(j) over the first j code points; aOk = frontier reachable
    val a = new Array[Long](len + 1); val aOk = new Array[Boolean](len + 1)
    a(0) = Scale; aOk(0) = true
    var j = 1
    while (j <= len) {
      var sum = 0L; var any = false
      var l = 1
      val lMax = math.min(4, j)
      while (l <= lMax) {
        val at = (j - l) * 4 + (l - 1)
        if (aOk(j - l) && has(at)) {
          sum += a(j - l) * p(at) / Scale // floored per TERM, then summed
          any = true
        }
        l += 1
      }
      aOk(j) = any; a(j) = sum
      j += 1
    }
    if (!aOk(len)) return null
    val z = a(len)
    // backward, indexed by REMAINING code points m (piece starts at len−m)
    val b = new Array[Long](len + 1); val bOk = new Array[Boolean](len + 1)
    b(0) = Scale; bOk(0) = true
    var m = 1
    while (m <= len) {
      var sum = 0L; var any = false
      var l = 1
      val lMax = math.min(4, m)
      while (l <= lMax) {
        val at = (len - m) * 4 + (l - 1)
        if (bOk(m - l) && has(at)) {
          sum += p(at) * b(m - l) / Scale
          any = true
        }
        l += 1
      }
      bOk(m) = any; b(m) = sum
      m += 1
    }
    val zDen = math.max(z, 1L)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    t = 0
    while (t < n) {
      val r = occs.getStruct(t, 3)
      val i = r.getInt(0); val l = r.getInt(1)
      if (i >= 0 && l >= 1 && l <= 4 && i + l <= len) {
        val mm = len - i - l
        if (aOk(i) && bOk(mm)) {
          val pp = p(i * 4 + (l - 1))
          val post = ((a(i) * pp / Scale) * b(mm) / Scale) * Scale / zDen
          out += new GenericInternalRow(
            Array[Any](word.substringSQL(i + 1, l), post))
        }
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](z, new GenericArrayData(out.toArray)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
