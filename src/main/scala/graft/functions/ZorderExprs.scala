package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType}

/** z_interleave(x, y): the Morton (Z-order) code of two keys — the low
  * 32 bits of each, bit-interleaved into one 64-bit value (x on even
  * bit positions, y on odd). Sorting by the z-value clusters rows that
  * are close in BOTH dimensions, which is what makes multi-dimensional
  * min/max pruning work (see [[graft.operators.Zorder]]).
  *
  * Native + codegen'd: this runs once per row of a 100 TB table during
  * the layout write, so it must stay inside whole-stage codegen. Inputs
  * are masked to 32 bits (callers normalize negative / wide domains
  * first — e.g. `pmod`, day-offsets, or rank buckets). */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "z_interleave"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave requires two longs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long] & 0xFFFFFFFFL
    val y = b.asInstanceOf[Long] & 0xFFFFFFFFL
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh local names: two z_interleave calls can share one codegen
    // method, where fixed names would collide
    val (x, y, z, i) = (ctx.freshName("zx"), ctx.freshName("zy"),
      ctx.freshName("zv"), ctx.freshName("zi"))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |long $x = $a & 0xFFFFFFFFL;
      |long $y = $b & 0xFFFFFFFFL;
      |long $z = 0L;
      |for (int $i = 0; $i < 32; $i++) {
      |  $z |= (($x >> $i) & 1L) << (2 * $i);
      |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
      |}
      |${ev.value} = $z;""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object ZorderFunctions {
  val fns: Seq[(String, FunctionBuilder, String)] = Seq(
    ("z_interleave", (e: Seq[Expression]) => ZInterleave(e(0), e(1)),
      "z_interleave(x, y) - 64-bit Morton code of two 32-bit keys"))

  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    fns.map { case (name, builder, usage) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ZorderExprs", name, usage),
        builder)
    }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
