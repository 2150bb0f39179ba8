package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for grouped-aggregate materialized
  * views under inserts AND deletes — refresh cost proportional to the
  * DELTA, never to the 100 TB base table.
  *
  * The maintained aggregates are the self-invertible ones: `count` and
  * `sum` form a group (deletes subtract), so a view keyed on `keys` can
  * absorb any insert/delete batch by merging a delta aggregate:
  *
  *   view'(k) = (count+Δcount, nonnull+Δnonnull, sum+Δsum), dropped at
  *   count 0 — the non-null counter keeps `total`'s NULL semantics exact
  *
  * `min`/`max` are NOT maintainable under deletes without an auxiliary
  * structure (deleting the current min forces a rescan of the group);
  * views that need them keep a per-group heavy-hitter sketch or accept
  * recompute-on-delete — that is a semantic boundary, not an
  * implementation gap, and [[refresh]] deliberately refuses to fake it.
  *
  * Scale notes: the delta aggregates shuffle only the batch (map-side
  * partial combine first); the merge with the view is one full-outer
  * equi-join on the group key — and the view side is itself
  * `n_groups`-sized, not base-sized. On a bucketed view layout the merge
  * is exchange-free. Average/derived measures stay derivable
  * (`sum/count`) from the maintained pair.
  */
object Ivm {

  /** Build the initial view: per-`keys` `(cnt, nn, total)` of `valCol`.
    * `nn` counts the group's NON-NULL values — it is what lets refresh
    * answer "is total now a sum, or NULL because no values remain?"
    * exactly (a `(cnt, total)` pair alone cannot distinguish `total = 0`
    * from `total = NULL` after deletes remove the last non-NULL value). */
  def build(base: DataFrame, keys: Seq[String], valCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), count(col(valCol)).as("nn"),
        sum(col(valCol)).as("total"))

  /** Absorb `inserts` and `deletes` (each carrying the base schema) into
    * a view built by [[build]]. Groups whose count reaches zero vanish;
    * brand-new groups appear. Deleting rows that were never inserted is
    * the caller's contract violation (counts would go negative — kept
    * visible rather than clamped, so reconciliation jobs can detect it).
    */
  def refresh(view: DataFrame, inserts: DataFrame, deletes: DataFrame,
      keys: Seq[String], valCol: String): DataFrame = {
    val delta = inserts.select(keys.map(col) :+ lit(1L).as("__sign") :+
        col(valCol).as("__v"): _*)
      .unionByName(deletes.select(keys.map(col) :+ lit(-1L).as("__sign") :+
        col(valCol).as("__v"): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sign")).as("d_cnt"),
        sum(col("__sign") * when(col("__v").isNotNull, lit(1L))
          .otherwise(lit(0L))).as("d_nn"),
        sum(col("__sign") * col("__v")).as("d_total"))
    // merge on a key STRUCT: groupBy treats NULL as a regular group, so
    // the join must too (a plain equi-join would leave NULL-keyed view
    // and delta rows unmatched and duplicate the group forever)
    val v = view.select(struct(keys.map(col): _*).as("__k"),
      col("cnt"), col("nn"), col("total"))
    val d = delta.select(struct(keys.map(col): _*).as("__k"),
      col("d_cnt"), col("d_nn"), col("d_total"))
    val mergedNn =
      coalesce(col("nn"), lit(0L)) + coalesce(col("d_nn"), lit(0L))
    v.join(d, Seq("__k"), "full_outer")
      .select(keys.map(k => col(s"__k.$k").as(k)) :+
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt") :+
        mergedNn.as("nn") :+
        // total is a sum only while non-NULL values remain; when nn hits
        // 0 the recompute's sum-over-NULLs is NULL, and refresh must say
        // the same (0 here would silently diverge from build())
        when(mergedNn === 0, lit(null))
          .otherwise(coalesce(col("total"), lit(0)) +
            coalesce(col("d_total"), lit(0)))
          .as("total"): _*)
      .where(col("cnt") =!= 0)
  }

  /** Incremental maintenance of a JOIN view `V = A ⋈_key B` under
    * INSERT deltas to both sides. With A₁ = A₀ ∪ ΔA and B₁ = B₀ ∪ ΔB:
    *
    *   V₁ = V₀ ∪ (ΔA ⋈ B₁) ∪ (A₀ ⋈ ΔB)
    *
    * — exact multiset algebra: the ΔA⋈ΔB cross term appears exactly
    * once (inside ΔA⋈B₁), so the decomposition equals the full rejoin
    * row for row. Refresh cost is two delta-against-one-side joins —
    * never a rescan of V₀'s base tables; on bucketed layouts both
    * joins are exchange-free on the delta's small side.
    *
    * Deletes are the aggregate path's job ([[refresh]] with
    * retractions); deleting from a join view needs per-row provenance
    * counts (multiset difference), deliberately out of scope here.
    * Sides must share only the join key column names. */
  def refreshJoin(view: DataFrame, dA: DataFrame, aOld: DataFrame,
      dB: DataFrame, bNew: DataFrame, key: Seq[String]): DataFrame =
    view
      .unionByName(dA.join(bNew, key))
      .unionByName(aOld.join(dB, key))
}
