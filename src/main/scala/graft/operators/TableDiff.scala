package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-evolution operators: snapshot diff, MERGE-style upsert, and CDC
  * change application — the maintenance verbs every warehouse table needs
  * between full rebuilds.
  *
  * Scale notes (100 TB):
  *  - All three are single-hash-shuffle-per-side plans keyed on the table
  *    key. On a bucketed layout ([[Bucketing]]) the exchanges vanish
  *    entirely — the verbs compose with the engine's co-located-join story.
  *  - `diff` compares rows with one null-safe struct equality, not a
  *    per-column join condition — the comparison stays inside whole-stage
  *    codegen and adds no extra exchange.
  *  - `applyChanges` collapses the change log to latest-per-key with a
  *    window over (key ORDER BY version DESC) BEFORE touching the target,
  *    so a hot key with millions of log entries costs one shuffle of the
  *    log only; the big target is read once and joined once.
  *  - None of these materialize the target twice: `merge`/`applyChanges`
  *    are anti-join ∪ projection, which AQE plans as two scans of the
  *    (usually cached or columnar) target but only ONE shuffle each.
  */
object TableDiff {

  /** Row-level diff of two snapshots of the same table, keyed by `keys`.
    *
    * Returns one row per key whose presence or payload changed:
    * `(keys..., change)` with `change ∈ {inserted, deleted, updated}`.
    * Unchanged rows are dropped (at 100 TB the interesting output is the
    * delta, which is usually orders of magnitude smaller than the table).
    *
    * Payload comparison is null-safe (`<=>` over a struct of the non-key
    * columns), so NULL → value and value → NULL both read as updates.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains).toSeq
    require(payload == newDf.columns.filterNot(keys.contains).toSeq,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val o = oldDf.select(
      struct(keys.map(col): _*).as("__k"),
      struct(payload.map(col): _*).as("__old"))
    val n = newDf.select(
      struct(keys.map(col): _*).as("__k"),
      struct(payload.map(col): _*).as("__new"))
    o.join(n, Seq("__k"), "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("inserted"))
          .when(col("__new").isNull, lit("deleted"))
          .when(!(col("__old") <=> col("__new")), lit("updated")))
      .where(col("change").isNotNull)
      .select(keys.map(k => col(s"__k.$k").as(k)) :+ col("change"): _*)
  }

  /** MERGE-style upsert: rows of `source` replace same-keyed rows of
    * `target`; unmatched source rows are inserted; unmatched target rows
    * survive. Schemas must match (column-for-column).
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.toSeq == source.columns.toSeq,
      s"merge schemas differ: ${target.columns.toSeq} vs ${source.columns.toSeq}")
    // anti join on a key STRUCT (nested nulls compare equal), so a
    // NULL-keyed source row REPLACES the NULL-keyed target row instead of
    // appending a duplicate
    val kept = target.join(
      source.select(struct(keys.map(col): _*).as("__k")).distinct(),
      struct(keys.map(col): _*) === col("__k"), "left_anti")
    kept.unionByName(source)
  }

  /** Apply a CDC change log to a table snapshot.
    *
    * `changes` carries the target's columns plus `opCol` (`'U'` upsert /
    * `'D'` delete) and a monotonically comparable `versionCol`. Multiple
    * entries per key collapse to the HIGHEST version (a same-version tie
    * breaks toward the delete — 'D' sorts before 'U' — so replays are
    * deterministic); the survivor is then applied: `U` upserts the row,
    * `D` removes the key.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    // struct-keyed anti join for the same null-key consistency as the
    // window above (partitionBy groups NULL keys; the removal must too)
    val kept = target.join(
      latest.select(struct(keys.map(col): _*).as("__k")).distinct(),
      struct(keys.map(col): _*) === col("__k"), "left_anti")
    kept.unionByName(
      latest.where(col(opCol) === "U").drop(opCol, versionCol))
  }
}
