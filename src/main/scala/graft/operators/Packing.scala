package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data prep (SURVEY.md §2.11 extension
  * surface): concatenate the corpus token stream in doc_id order and cut it
  * into fixed-size packs (context windows). Each document gets its global
  * token offset and the pack range [first_pack, last_pack] it lands in —
  * the exact bookkeeping an LLM data loader needs to assemble packed
  * examples with document-boundary masks.
  *
  * The interesting part at 100 TB is the GLOBAL RUNNING OFFSET: the naive
  * formulation is a window cumsum over one unpartitioned total order — a
  * single-reducer funnel. This implements the textbook two-phase
  * distributed prefix sum instead:
  *
  *   1. range-partition by doc_id (partition i holds smaller ids than
  *      i+1) and cumsum WITHIN each partition (parallel, ordered window
  *      per partition);
  *   2. collect the P per-partition token totals (P longs — driver-safe at
  *      any corpus size), prefix-sum them driver-side, and broadcast-join
  *      the partition base offsets back.
  *
  * Partition boundaries come from range-partitioner sampling, but the
  * result is boundary-invariant: a prefix sum is exact wherever you cut
  * it, so the output is deterministic even if sampling shifts.
  *
  * Documents with zero tokens are dropped (they occupy no positions in
  * the packed stream), mirrored in the oracle's WHERE.
  */
object Packing {

  /** Two-phase distributed INCLUSIVE prefix sum over `valueCol` in
    * `orderCol` order — the reusable core of [[packOffsets]], for any
    * cumulative-distribution computation (equi-depth histograms, CDF
    * lookups) that would otherwise plan `Window.orderBy(x)` with no
    * PARTITION BY and funnel the relation through one reducer.
    *
    * Returns `(cachedLocal, out, grandTotal)`: `out` is the input columns
    * plus `cumCol` (running total INCLUDING the current row); the grand
    * total is a driver-side Long (free: the phase-2 driver prefix sum
    * already materializes every partition total, so the caller never
    * re-aggregates the relation to learn it); `cachedLocal` is the
    * persisted range-partitioned relation the triangleStats-style release
    * contract hands back — `out`'s plan AND the already-collected
    * partition totals both reference it, so unpersisting before `out`
    * materializes would let a recompute re-sample different range
    * boundaries than the collected bases describe (a stale-base wrong
    * answer). Materialize `out` first, then `cachedLocal.unpersist()`
    * (registry wrappers use [[graft.queries.Drain]]).
    *
    * Contract: `valueCol` must be an INTEGRAL type (checked eagerly from
    * the schema — free). A double/decimal input would sum to a non-Long
    * and the exact-integer-arithmetic guarantee below is the whole point;
    * callers with fractional values scale to integers first (the way
    * q_equidepth_hist works in cents).
    *
    * Scale shape: phase 1 cumsums within range partitions in parallel;
    * phase 2 collects P longs (driver-safe at any size) and broadcasts
    * base offsets back. Exact integer arithmetic end to end; boundary-
    * invariant under range-partitioner sampling shifts, like packOffsets.
    */
  def prefixSumInclusive(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String = "cum", numParts: Int = 0): (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    val dt = df.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
      s"prefixSumInclusive: $valueCol must be integral, got ${dt.typeName} " +
        "(sum() over fractional types breaks the exact-integer contract; " +
        "scale to integers upstream, e.g. cents)")
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions

    val local = df
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = local.withColumn("__local_cum",
      sum(col(valueCol)).over(w))

    val totals = local.groupBy("__pid").agg(sum(col(valueCol)).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getAs[Number](1).longValue).sortBy(_._1)
    val grand = totals.map(_._2).sum
    val baseByPid = totals.map(_._1).zip(
      totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot }.init)
    val baseDf = broadcast(
      spark.createDataFrame(baseByPid.toSeq).toDF("__pid", "__base"))

    val out = cum.join(baseDf, "__pid")
      .withColumn(cumCol, col("__base") + col("__local_cum"))
      .drop("__pid", "__base", "__local_cum")
    (local, out, grand)
  }

  def packOffsets(docs: DataFrame, idCol: String, textCol: String,
      packSize: Int, numParts: Int = 0): DataFrame =
    packCounted(docs.select(
        col(idCol).cast("long").as("doc_id"),
        size(expr(Dedup.wordsExpr(textCol))).cast("long").as("n_tokens")),
      packSize, numParts)

  /** [[packOffsets]] for ALREADY-COUNTED documents `(doc_id,
    * n_tokens)` — the entry point when token counts come from a
    * trained tokenizer ([[UnigramLM.encodeWith]]) rather than the
    * whitespace rule, and the per-fold core of the streamed
    * clean→tokenize→pack composition
    * ([[graft.streaming.StreamingCleanPack]]). Same two-phase
    * distributed prefix sum; `baseOffset` shifts the whole stream
    * (the streamed fold passes its stored cursor). */
  def packCounted(counted: DataFrame, packSize: Int, numParts: Int = 0,
      baseOffset: Long = 0L): DataFrame = {
    val spark = counted.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions

    // Two longs per row, persisted BEFORE the range exchange: the range
    // partitioner's sampling job evaluates its whole child once, so an
    // expensive upstream lineage (e.g. the full corpus-clean pipeline in
    // q_clean_pack) would otherwise run twice — once to pick boundaries,
    // once to shuffle. Cutting the lineage at this narrow relation makes
    // the sample + exchange read cached (doc_id, n_tokens) pairs instead.
    val toks = counted.select(
      col("doc_id").cast("long").as("doc_id"),
      col("n_tokens").cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Phase 1: per-partition ordered cumsum. The window partitions by the
    // PHYSICAL partition id, so no task ever sees more than one
    // partition's rows — contrast with Window.orderBy(doc_id) alone,
    // which funnels the corpus through one reducer.
    // read twice (cumsum + partition totals); persist so the scan,
    // tokenization and range exchange run once
    val local = toks
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = local.withColumn("local_off",
      coalesce(sum("n_tokens").over(w), lit(0L)))

    // Phase 2: P partition totals → driver prefix sum → broadcast base
    // offsets. Range partitioning guarantees pid order == doc_id order.
    val totals = local.groupBy("pid").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val baseByPid = totals.map(_._1).zip(
      totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot }.init)
    val baseDf = broadcast(
      spark.createDataFrame(baseByPid.toSeq).toDF("pid", "base"))

    cum.join(baseDf, "pid")
      .select(
        col("doc_id"), col("n_tokens"),
        (lit(baseOffset) + col("base") + col("local_off")).as("offset"),
        expr(s"($baseOffset + base + local_off) DIV $packSize")
          .as("first_pack"),
        expr(s"($baseOffset + base + local_off + n_tokens - 1) DIV $packSize")
          .as("last_pack"))
  }

  /** Per-group global 1-based row rank WITHOUT per-group windows — the
    * grouped sibling of [[prefixSumInclusive]]. `Window.partitionBy(g)
    * .orderBy(k)` sorts every group in ONE task (a million-doc language
    * is one straggler at 100 TB); this range-partitions by `(group,
    * order)` instead, ranks within each physical partition (windows
    * bounded by partition size), and composes per-(partition, group)
    * counts — a relation of at most P + G rows, since range partitioning
    * makes each group span contiguous partitions — through a cumulative
    * window over that SMALL relation into per-partition base offsets.
    * Boundary-invariant like the prefix sum: a rank is exact wherever
    * the splitters cut.
    *
    * Bucketing + cache contract (r13 rewrite): NOTHING is persisted
    * and NOTHING depends on physical partition placement. The former
    * design captured `spark_partition_id()` above a
    * `repartitionByRange` and persisted the result MEMORY_AND_DISK so
    * its two plan branches (rank window, per-bucket totals) would see
    * consistent ids — a corpus-sized cache no library caller could
    * release (r12 verdict #1), and the only alternative (exchange
    * reuse) is an optimizer detail that demonstrably does NOT hold
    * across all references (AQE reuses within one reference chain,
    * not across), with boundary divergence invisible at test scale
    * where the range sampler sees every row. Instead, `__pid` is now a
    * PURE EXPRESSION of the row: a bounded hash-ordered key sample
    * (the `min-k` of `xxhash64(key)` — a deterministic uniform sample,
    * one narrow TakeOrdered pass, ≤ 256·P rows on the driver) is cut
    * into ≤ P−1 splitters that become plan CONSTANTS; every branch
    * assigns the same bucket to a row by construction, under any
    * recomputation, with zero caches and zero reliance on reuse. The
    * trade is one extra narrow pass over the input (sample + window +
    * totals = 3 evaluations of the upstream projection vs 2 under the
    * old sample-then-shuffle) — the dropReasons/CorpusClean r12
    * position: lazily re-derived narrow scans beat corpus-sized
    * retained caches.
    *
    * Key contract: `groupCol`/`orderCol` values must be NON-NULL, and
    * leaf types must be orderable scalars (integral, floating, string,
    * boolean, or structs thereof — what every in-repo caller passes).
    *
    * `orderCol` MUST be unique within each group (pack quality and a
    * unique id into one key, [[curriculumOrder]]-style) — with ties the
    * bucket-local tie order would be ill-defined. */
  def rankWithinGroups(df: DataFrame, groupCol: String, orderCol: String,
      rankCol: String = "rnk", numParts: Int = 0): DataFrame =
    cumSumWithinGroups(df.withColumn("__one", lit(1L)), groupCol,
      orderCol, "__one", rankCol, totalCol = None, numParts = numParts)
      .drop("__one")

  /** Per-group cumulative SUM of `valueCol` in `orderCol` order WITHOUT
    * per-group windows — the prefix-sum generalization of
    * [[rankWithinGroups]] (which is exactly the `valueCol = 1` case and
    * is expressed through this). The r14 home of every
    * histogram-cumulation read side (winsorize/conformal cuts, ECDF):
    * `Window.orderBy(v)` with no PARTITION BY — or `partitionBy(g)`
    * when one group can be corpus-sized — funnels the relation through
    * ONE task; a "value-range-sized" histogram over a CONTINUOUS
    * double/bigint column approximates the corpus, so that shape is a
    * scale-killer even on aggregated inputs (r13 verdict #2).
    *
    * Same splitter-constant bucketing and cache-free contract as
    * [[rankWithinGroups]] (see that scaladoc for the full argument):
    * `__pid` is a pure expression built from ≤ P−1 plan-constant
    * splitters (min-k hash sample, one narrow TakeOrdered pass), the
    * cumsum runs within `(bucket, group)` windows bounded by bucket
    * size, and per-(bucket, group) totals — ≤ P + G rows, groups being
    * contiguous under range bucketing — compose into per-bucket base
    * offsets through a window over that SMALL relation. Exact wherever
    * the splitters cut; NOTHING persisted, no exchange-reuse reliance.
    * Cost: 3 narrow evaluations of the upstream relation (sample +
    * window branch + totals branch) — for histogram callers that
    * upstream is one map-side-combinable groupBy.
    *
    * `totalCol = Some(c)` additionally publishes each group's grand
    * total as column `c` (derived inside the already-small totals
    * relation — callers needing `n` alongside the running count avoid
    * a fourth evaluation, the winsorize/conformal k-rule shape).
    *
    * Key contract as [[rankWithinGroups]]: orderable scalar leaves,
    * `orderCol` unique within each group (histogram inputs are — the
    * value IS the key). */
  def cumSumWithinGroups(df: DataFrame, groupCol: String,
      orderCol: String, valueCol: String, cumCol: String = "cum",
      totalCol: Option[String] = None, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val key = struct(col(groupCol), col(orderCol))
    val local = df.withColumn("__pid", splitterPid(df, key, parts))
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = local.withColumn("__lc", sum(col(valueCol)).over(w))
    val totals = local.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(valueCol)).as("__c"))
    val wb = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wg = Window.partitionBy(col(groupCol))
    val based = totals
      .withColumn("__base", coalesce(sum(col("__c")).over(wb), lit(0L)))
    val bases = totalCol match {
      case Some(t) => based
        .withColumn(t, sum(col("__c")).over(wg))
        .select(col("__pid"), col(groupCol), col("__base"), col(t))
      case None =>
        based.select(col("__pid"), col(groupCol), col("__base"))
    }
    cum.join(bases, Seq("__pid", groupCol)) // small side; AQE broadcasts
      .withColumn(cumCol, col("__base") + col("__lc"))
      .drop("__pid", "__lc", "__base")
  }

  /** The UNGROUPED [[cumSumWithinGroups]] — one global running total in
    * `orderCol` order. Same splitter-constant phase 1, but phase 2
    * composes the ≤ P bucket totals DRIVER-SIDE (P longs — driver-safe
    * at any corpus size, the [[packOffsets]] idiom) instead of through
    * a window over the totals relation: with no real group column, the
    * grouped form's composition windows partition only by a FOLDABLE
    * constant, which Catalyst prunes to an empty partition spec — a
    * one-task window that, while bounded by P + 1 rows, is exactly the
    * shape the PlanShapeSpec pins forbid and WindowExec warns on. Here
    * NO window in the plan lacks a partition spec (pinned on the r14
    * winsorize/conformal queries).
    *
    * `totalCol = Some(c)` publishes the grand total as a LITERAL
    * column `c` (phase 2 already materialized it on the driver — the
    * callers' k-rule arithmetic needs n without another corpus pass).
    *
    * Same key contract as [[cumSumWithinGroups]]; `orderCol` unique
    * (histogram inputs). Note phase 2 collects EAGERLY at
    * plan-construction time (2 narrow jobs: sample + totals). */
  def cumSumOrdered(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String = "cum", totalCol: Option[String] = None,
      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val key = struct(col(orderCol))
    val local = df.withColumn("__pid", splitterPid(df, key, parts))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = local.withColumn("__lc", sum(col(valueCol)).over(w))
    val totals = local.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__c"))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Number](1).longValue)
      .sortBy(_._1)
    val grand = totals.map(_._2).sum
    val baseByPid = totals.map(_._1).zip(
      totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot }.init)
    val baseDf = broadcast(
      spark.createDataFrame(baseByPid.toSeq).toDF("__pid", "__base"))
    val out = cum.join(baseDf, "__pid")
      .withColumn(cumCol, col("__base") + col("__lc"))
      .drop("__pid", "__lc", "__base")
    totalCol.fold(out)(t => out.withColumn(t, lit(grand)))
  }

  /** The splitter-constant bucket id shared by [[cumSumWithinGroups]]
    * and [[cumSumOrdered]]: a bounded min-k hash sample of the key
    * space (deterministic, uniformly spread, one narrow TakeOrdered
    * pass, ≤ 256·P driver rows) cut into ≤ P−1 splitters that become
    * plan CONSTANTS — `__pid` = number of splitters ≤ key, a monotone
    * codegen'd comparison chain. Every plan branch assigns the same
    * bucket to a row by construction, under any recomputation, with
    * zero caches and zero exchange-reuse reliance (the r13
    * rankWithinGroups argument). */
  private def splitterPid(df: DataFrame,
      key: org.apache.spark.sql.Column, parts: Int)
      : org.apache.spark.sql.Column = {
    val keyType = df.select(key.as("__key")).schema("__key").dataType
    // min-k by hash: a deterministic, uniformly-spread sample of the
    // key space (TakeOrdered — distributed, narrow, early-stopping)
    val sampled = df
      .select(xxhash64(key).as("__h"), key.as("__key"))
      .orderBy(col("__h"), col("__key"))
      .limit(parts * 256)
      .collect()
    val ord = rowValueOrdering(keyType)
    val keys = sampled.map(_.get(1)).sortWith((a, b) => ord.compare(a, b) < 0)
    val n = keys.length
    val splitters =
      if (n == 0) Seq.empty
      else (1 until parts)
        .map(i => keys((i.toLong * n / parts).toInt.min(n - 1)))
        .distinct
        .filter(_ != null)
    // __pid = number of splitters <= key: a monotone, codegen'd
    // constant-comparison chain (≤ P−1 lexicographic struct compares)
    if (splitters.isEmpty) lit(0)
    else splitters.map { s =>
      val (gt, eq) = cmpLit(key, s, keyType)
      when(gt || eq, 1).otherwise(0)
    }.reduce(_ + _)
  }

  /** `(key > v, key <=> v)` as literal-comparison columns for a
    * collected splitter value `v` of type `dt` — structs compare
    * lexicographically, exactly Spark's own ordering for the same
    * type. Scalar leaves go through `lit`. */
  private def cmpLit(c: org.apache.spark.sql.Column, v: Any,
      dt: org.apache.spark.sql.types.DataType)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    dt match {
      case st: org.apache.spark.sql.types.StructType =>
        val r = v.asInstanceOf[org.apache.spark.sql.Row]
        val parts = st.fields.zipWithIndex.map { case (f, i) =>
          cmpLit(c.getField(f.name), r.get(i), f.dataType)
        }
        val gt = parts.foldRight(lit(false)) { case ((g, e), acc) =>
          g || (e && acc)
        }
        (gt, parts.map(_._2).reduce(_ && _))
      case _ => (c > lit(v), c <=> lit(v))
    }

  /** Driver-side ordering matching Spark's ascending NULLS FIRST sort
    * for the supported key leaf types. */
  private def rowValueOrdering(
      dt: org.apache.spark.sql.types.DataType): Ordering[Any] =
    new Ordering[Any] {
      def compare(a: Any, b: Any): Int = cmp(a, b, dt)
      private def cmp(a: Any, b: Any,
          t: org.apache.spark.sql.types.DataType): Int = (a, b) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case _ => t match {
          case st: org.apache.spark.sql.types.StructType =>
            val ra = a.asInstanceOf[org.apache.spark.sql.Row]
            val rb = b.asInstanceOf[org.apache.spark.sql.Row]
            st.fields.zipWithIndex.iterator
              .map { case (f, i) => cmp(ra.get(i), rb.get(i), f.dataType) }
              .find(_ != 0).getOrElse(0)
          case _ => (a, b) match {
            case (x: java.lang.Number, y: java.lang.Number)
                if !a.isInstanceOf[java.lang.Double] &&
                  !a.isInstanceOf[java.lang.Float] &&
                  !a.isInstanceOf[java.math.BigDecimal] =>
              java.lang.Long.compare(x.longValue(), y.longValue())
            case (x: java.lang.Number, y: java.lang.Number) =>
              java.lang.Double.compare(x.doubleValue(), y.doubleValue())
            case (x: String, y: String) => x.compareTo(y)
            case (x: java.lang.Boolean, y: java.lang.Boolean) =>
              x.compareTo(y)
            case _ => throw new IllegalArgumentException(
              s"rankWithinGroups: unsupported key leaf type $t " +
                s"(${a.getClass}) — see the key contract in the scaladoc")
          }
        }
      }
    }

  /** Padding-aware length-bucketed batch assembly — the SFT/eval
    * batching trick: group sequences of SIMILAR length into fixed-size
    * batches so each batch pads only to ITS OWN max, not the corpus
    * max. Per batch of `batchSize` sequences the report publishes
    * `(batch_id, n_seqs, sum_tokens, max_tokens, padded_tokens,
    * pad_ppm)` with `padded_tokens = max·n` (what the accelerator
    * actually processes) and `pad_ppm` the wasted share — exact
    * integers.
    *
    * `byLength = true` (the operator's point) orders by
    * `(n_tokens, doc_id)`; `false` is the naive arrival-order batching
    * (by `doc_id`) — published so the padding SAVING is measurable as
    * data (see the registry's gain query). Ties carry the unique id,
    * so batch membership is deterministic in both modes. The last
    * partial batch is reported like any other (its `n_seqs` < B).
    *
    * Distribution shape: one corpus scan for counts, the two-phase
    * [[rankWithinGroups]] rank (range partition + offset composition —
    * the global sort never funnels one task), one map-side-combinable
    * groupBy on `batch_id`. Output is corpus/B-sized. */
  def lengthBucketBatches(docs: DataFrame, idCol: String,
      textCol: String, batchSize: Int,
      byLength: Boolean = true): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1 (got $batchSize)")
    val counted = docs.select(col(idCol).cast("long").as("doc_id"),
        size(expr(graft.operators.Dedup.wordsExpr(textCol)))
          .cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    val key =
      if (byLength) struct(col("n_tokens"), col("doc_id"))
      else struct(col("doc_id"))
    val ranked = rankWithinGroups(
      counted.withColumn("__g", lit(1)).withColumn("__k", key),
      "__g", "__k")
    ranked
      .withColumn("batch_id",
        expr(s"(rnk - 1) div ${batchSize.toLong}L").cast("long"))
      .groupBy("batch_id")
      .agg(count(lit(1)).cast("long").as("n_seqs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        max(col("n_tokens")).cast("long").as("max_tokens"))
      .select(col("batch_id"), col("n_seqs"), col("sum_tokens"),
        col("max_tokens"),
        (col("max_tokens") * col("n_seqs")).as("padded_tokens"),
        expr("""(max_tokens * n_seqs - sum_tokens) * 1000000L
               | div (max_tokens * n_seqs)""".stripMargin).as("pad_ppm"))
  }

  /** Composite-quality ceiling for [[curriculumOrder]]'s packed order
    * key: each quality ratio is ≤ 10000 and the weights sum to 10, so
    * quality < 100001. */
  private val QualityCeil = 100001L

  /** Curriculum ordering for training: within each language, docs rank
    * by quality DESCENDING (doc_id tiebreak); across languages, ranks
    * round-robin interleave — `curriculum_pos = (lang_rank - 1) *
    * nLangs + langIdx` — so a loader reading in curriculum_pos order
    * sees every language early and quality degrading monotonically
    * within each. The per-language rank is [[rankWithinGroups]] on the
    * single packed key `(QualityCeil - quality) * 2^40 + doc_id`
    * (doc_id < 2^40 — ~10^12 docs — keeps the key exact in a BIGINT);
    * the language index is a window over the DISTINCT-language relation
    * only (domain-count-sized: round-robin across millions of domains
    * would be meaningless, so that cardinality stays small by
    * construction). Returns `(doc_id, lang, quality, lang_rank,
    * curriculum_pos)`; empty docs drop like [[TextAnalysis
    * .qualityScore]] does. */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val scored = TextAnalysis
      .qualityScore(docs, idCol, textCol, keep = Seq(langCol))
      .select(col("doc_id").cast("long").as("doc_id"),
        col(langCol).as("lang"), col("quality"))
      .withColumn("key",
        (lit(QualityCeil) - col("quality")) * lit(1L << 40) + col("doc_id"))
    val ranked = rankWithinGroups(scored, "lang", "key", "lang_rank")
    val langs = scored.select(col("lang")).distinct()
    val li = langs
      .withColumn("li", row_number().over(
        Window.orderBy(col("lang"))).cast("long") - 1)
      .crossJoin(broadcast(langs.agg(count(lit(1)).as("nl"))))
    ranked.join(broadcast(li), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("quality"), col("lang_rank"),
        ((col("lang_rank") - 1) * col("nl") + col("li"))
          .as("curriculum_pos"))
  }

  /** Deterministic multi-epoch shuffle: for each epoch e, a REPRODUCIBLE
    * pseudo-random permutation of the corpus — `pos` = the doc's 1-based
    * rank within epoch e under the md5-derived key
    * `h60(doc_id:epoch) * 2^33 + doc_id` (the doc_id tiebreak makes the
    * key unique when two docs collide in h60; h60 < 2^30 keeps the
    * packing exact, doc_id < 2^33 — ~8×10^9 docs — documented rather
    * than silently wrapped). Training runs need exactly this: a
    * different data order every epoch, but one any worker — or a rerun
    * months later — derives from (doc_id, epoch) alone, no RNG state to
    * ship. Ranks come from [[rankWithinGroups]], whose whole point is
    * groups of corpus size: each epoch IS the corpus, precisely the
    * shape `Window.partitionBy(epoch)` would funnel through one task.
    * Returns `(doc_id, epoch, pos)`. */
  def epochShuffle(docs: DataFrame, idCol: String,
      epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1 (got $epochs)")
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(expr(s"sequence(0, ${epochs - 1})")).as("epoch"))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("k", expr(
        s"${Dedup.h60("concat(doc_id, ':', epoch)")} * ${1L << 33}"
          + " + doc_id"))
    rankWithinGroups(keyed, "epoch", "k", "pos")
      .select(col("doc_id"), col("epoch"), col("pos"))
  }
}
