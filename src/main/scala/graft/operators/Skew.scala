package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale shuffles (SURVEY.md §2.4,
  * §7.3). A single hot key (one NIF carrying most traffic, one boilerplate
  * document hash) funnels its whole group through one reducer; salting
  * splits the hot group into `salts` sub-groups aggregated in parallel,
  * then re-aggregates the partials — the classic two-phase pattern, here as
  * a reusable operator. AQE's skew-join handling covers JOIN skew at
  * runtime; aggregation skew still wants explicit salting because the
  * partial aggregate keyed by (key, salt) is what spreads the reducers.
  *
  * Results are EXACTLY the plain `groupBy(key).agg(...)` results for any
  * commutative+associative aggregate — which is what makes it
  * oracle-checkable against an unsalted DuckDB query.
  */
object Skew {

  /** Two-phase salted sum/count: groupBy(key) with a uniform deterministic
    * salt in phase 1, then final re-aggregation over the `salts` partials.
    *
    * The salt is derived from hash(valueCol) rather than rand(): same
    * result on every run/replan (streaming replays, speculative tasks).
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.groupBy(key.as("k"), (abs(hash(value)) % salts).as("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
    salted.groupBy(col("k"))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed probe side when the build side cannot
    * broadcast and runtime skew-splitting is unavailable (deterministic
    * pre-partitioned pipelines, or engines without AQE): each probe row
    * picks a deterministic salt from a hash of its full row, and the
    * build side REPLICATES each row once per salt — every (key, salt)
    * shuffle partition then holds the complete build group for its key,
    * so a hot probe key spreads over `salts` reducers. Build-side cost
    * is `salts ×` its size: use for big-probe ⋈ modest-build. The result
    * is EXACTLY the plain inner join (spec-pinned). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    // salt from a row POSITION, not row content: fully-duplicate hot rows
    // (repeated log lines) would all hash to one salt and re-funnel the
    // hot key. The salt never reaches the output, so position-dependence
    // cannot affect result content — only the spread, which is the point.
    val pSalted = probe.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val bSalted = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    pSalted.join(bSalted, Seq(key, "__salt")).drop("__salt")
  }
}
