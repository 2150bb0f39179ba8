package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach value columns from the
  * latest right row with `right.ts <= left.ts` for the same key.
  *
  * The reference engine has no as-of support (SURVEY.md §2.3 — no joins at
  * all); this is part of the declared extension surface. Implementation is
  * Spark-first and scale-first: instead of the naive theta-join
  * (`l.key = r.key && r.ts <= l.ts` + row_number), which explodes to
  * O(|L|·|R|) rows per key before pruning, we UNION the two sides with a
  * side tag and take a running `last(ignoreNulls)` over a single
  * (key, ts, side) sort. Cost: ONE shuffle of |L|+|R| rows and one sort —
  * the same plan shape a 1000-executor cluster wants at 100 TB (sort-merge
  * within hash partitions, no skew amplification beyond key skew itself).
  *
  * Tie semantics: a right row with ts equal to a left row's ts IS visible
  * to it (side tag sorts right-before-left), matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsOfJoin {

  /** Tiebreak column for right rows sharing a timestamp: with
    * `rightTie = Some(c)` (a unique right column, cast to long) the
    * matched row among equal right timestamps is the SMALLEST-tie row
    * in every direction — deterministic regardless of partition sort
    * order. With None (default) equal right timestamps are matched in
    * partition-sort order, which is only deterministic when right
    * timestamps are unique per key or the pulled valueCols are
    * functions of the timestamp itself. */
  private def rtieCol(right: DataFrame, rightTie: Option[String]): Column =
    rightTie.map(right(_).cast("long")).getOrElse(lit(0L))

  /** @param valueCols (rightColumn, outputAlias) pairs pulled from the
    *                  matched right row; null when no right row precedes.
    * @param rightTie  optional unique right column breaking equal-ts
    *                  right rows (smallest wins); see [[rtieCol]].
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[(String, String)],
      rightTie: Option[String] = None): DataFrame = {
    val leftRow = struct(left.columns.map(left(_)): _*)
    val rightVal = struct(valueCols.map { case (c, a) => right(c).as(a) }: _*)

    val lTagged = left.select(
      left(key).as("__k"), left(leftTs).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__rtie"), leftRow.as("__lrow"))
    val lrowType = lTagged.schema("__lrow").dataType
    val rTagged0 = right.select(
      right(key).as("__k"), right(rightTs).as("__t"), lit(0).as("__side"),
      rtieCol(right, rightTie).as("__rtie"), rightVal.as("__rval"))
    val rvalType = rTagged0.schema("__rval").dataType

    val l = lTagged.withColumn("__rval", lit(null).cast(rvalType))
    val r = rTagged0.withColumn("__lrow", lit(null).cast(lrowType))
      .select("__k", "__t", "__side", "__rtie", "__lrow", "__rval")
    val u = l.select("__k", "__t", "__side", "__rtie", "__lrow", "__rval")
      .union(r)

    // __rtie DESC: among equal-(ts) right rows the smallest tie sorts
    // LAST, so the running last() picks it — the documented contract
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__rtie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols: Seq[Column] =
      left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq ++
        valueCols.map { case (_, a) => col(s"__asof.$a").as(a) }

    u.withColumn("__asof", last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outCols: _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` for the same key — the other direction of
    * pandas `merge_asof`. Same single-shuffle union plan as
    * [[asofBackward]], mirrored: left rows sort BEFORE right rows at
    * equal ts (so an equal-ts right row is inside the left row's
    * following frame — ties are visible, matching the backward
    * contract), and the match is a running `first(ignoreNulls)` over
    * the FOLLOWING frame. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[(String, String)],
      rightTie: Option[String] = None): DataFrame = {
    val leftRow = struct(left.columns.map(left(_)): _*)
    val rightVal = struct(valueCols.map { case (c, a) => right(c).as(a) }: _*)

    val lTagged = left.select(
      left(key).as("__k"), left(leftTs).as("__t"), lit(0).as("__side"),
      lit(null).cast("long").as("__rtie"), leftRow.as("__lrow"))
    val lrowType = lTagged.schema("__lrow").dataType
    val rTagged0 = right.select(
      right(key).as("__k"), right(rightTs).as("__t"), lit(1).as("__side"),
      rtieCol(right, rightTie).as("__rtie"), rightVal.as("__rval"))
    val rvalType = rTagged0.schema("__rval").dataType

    val l = lTagged.withColumn("__rval", lit(null).cast(rvalType))
    val r = rTagged0.withColumn("__lrow", lit(null).cast(lrowType))
      .select("__k", "__t", "__side", "__rtie", "__lrow", "__rval")
    val u = l.select("__k", "__t", "__side", "__rtie", "__lrow", "__rval")
      .union(r)

    // __rtie ASC: among equal-(ts) right rows the smallest tie sorts
    // FIRST, so the running first() picks it — same contract as backward
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__rtie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val outCols: Seq[Column] =
      left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq ++
        valueCols.map { case (_, a) => col(s"__asof.$a").as(a) }

    u.withColumn("__asof", first(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(outCols: _*)
  }

  /** Nearest as-of join: the CLOSER of the backward and forward
    * matches, equidistant ties resolving BACKWARD (the earlier right
    * row) — pandas `merge_asof(direction='nearest')`. Distances are
    * exact epoch-microsecond differences for timestamp columns (a
    * LONG cast would truncate to seconds and flip sub-second
    * decisions), plain long casts otherwise.
    *
    * Plan: the same single union shuffle; the two directional matches
    * are two window passes over the SAME key partitioning (the second
    * ordering — ts asc, side desc — re-sorts within partitions but
    * adds no exchange), then a row-local choose. */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[(String, String)],
      rightTie: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    def tsKey(c: Column, isTs: Boolean): Column =
      if (isTs) unix_micros(c) else c.cast("long")
    val rightIsTs = right.schema(rightTs).dataType == TimestampType
    val leftIsTs = left.schema(leftTs).dataType == TimestampType

    val leftRow = struct(left.columns.map(left(_)): _*)
    val rightVal = struct(
      (valueCols.map { case (c, a) => right(c).as(a) } :+
        tsKey(right(rightTs), rightIsTs).as("__rtk")): _*)

    // right = 0 so it sorts FIRST at equal ts for the backward pass
    val lTagged = left.select(
      left(key).as("__k"), left(leftTs).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__rtie"), leftRow.as("__lrow"))
    val lrowType = lTagged.schema("__lrow").dataType
    val rTagged0 = right.select(
      right(key).as("__k"), right(rightTs).as("__t"), lit(0).as("__side"),
      rtieCol(right, rightTie).as("__rtie"), rightVal.as("__rval"))
    val rvalType = rTagged0.schema("__rval").dataType

    val l = lTagged.withColumn("__rval", lit(null).cast(rvalType))
    val r = rTagged0.withColumn("__lrow", lit(null).cast(lrowType))
      .select("__k", "__t", "__side", "__rtie", "__lrow", "__rval")
    val u = l.select("__k", "__t", "__side", "__rtie", "__lrow", "__rval")
      .union(r)

    // both directional passes break equal-ts right rows to the SMALLEST
    // tie ([[rtieCol]]): desc before a running last(), asc before first()
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__rtie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side").desc, col("__rtie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val ltk = tsKey(col("__t"), leftIsTs)
    val chosen = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(ltk - col("__b.__rtk") <= col("__f.__rtk") - ltk, col("__b"))
      .otherwise(col("__f"))

    val outCols: Seq[Column] =
      left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq ++
        valueCols.map { case (_, a) => col(s"__asof.$a").as(a) }

    u.withColumn("__b", last(col("__rval"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__rval"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__asof", chosen)
      .select(outCols: _*)
  }
}
