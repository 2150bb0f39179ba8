package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge relations — the rank/centrality
  * complement of [[Dedup.dupClusters]]' connected components (both are
  * label-propagation loops over long-keyed shuffles; web-graph-style
  * centrality is a standard corpus-quality signal).
  */
object Graphs {

  /** Max |Δrank| between two materialized rank cuts — one scalar agg over
    * an inner join of two node-keyed relations that are both already
    * cached, so a convergence check costs a single node-sized job. */
  private def maxDelta(prev: DataFrame, cur: DataFrame): Double = {
    val p = prev.select(col("node"), col("rank").as("prev_rank"))
    val row = cur.join(p, "node")
      .agg(max(abs(col("rank") - col("prev_rank")))).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Materialize an iteration cut; returns the cut and a thunk releasing
    * its storage.
    *
    * Fixed-iteration runs (`truncate = false`) persist WITH lineage:
    * plan depth is bounded by the iteration budget, and an evicted block
    * recomputes instead of failing. Convergence (`tol`) runs are
    * open-ended, so BOTH lineages must be truncated each round — the
    * depth-1 DataFrame over the cut RDD bounds plan analysis, and the
    * RDD is locally CHECKPOINTED because a plain persist does not cut
    * serialization lineage: a ShuffleDependency serializes its parent
    * RDD transitively, so each round's task binary grows ~tens of KB
    * and a ~100-round run overflows the task-serialization stack
    * (observed as a StackOverflowError in invokeWriteReplace mid-run).
    * localCheckpoint trades recompute-on-eviction for that bound —
    * acceptable here since MEMORY_AND_DISK spills rather than evicts
    * and each cut lives exactly one round. */
  private def cut(df: DataFrame, truncate: Boolean): (DataFrame, () => Unit) =
    if (truncate) {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rdd.localCheckpoint()
      rdd.count()
      (df.sparkSession.createDataFrame(rdd, df.schema), () => { rdd.unpersist(); () })
    } else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      (p, () => { p.unpersist(); () })
    }

  /** Re-home a truncated (RDD-backed) final cut under the CacheManager so
    * the returned relation follows the same contract as fixed-iteration
    * runs: cached, and releasable by the caller via `unpersist()`. One
    * extra node-sized pass; the interim RDD cache is released here. */
  private def settle(df: DataFrame, release: () => Unit, truncated: Boolean): DataFrame =
    if (!truncated) df
    else {
      val out = df.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      release()
      out
    }

  /** PageRank over a prepared edge list.
    *
    * Contract: `edges(src, dst)` must give every node at least one
    * OUT-edge (symmetrize an undirected graph first — that also removes
    * the dangling-mass correction an arbitrary directed graph needs, so
    * the recurrence stays exactly `r' = (1-d)/N + d·Σ r(u)/deg(u)` and
    * is reproducible in plain SQL for the oracle).
    *
    * Scale shape: the edge relation is hash-partitioned on `src` ONCE
    * and persisted; each iteration shuffles only the rank relation
    * (N rows of (long, double)) to meet it, then reduces contributions
    * by `dst` — O(iters) shuffles of node-sized relations, edges never
    * move again. One driver-side `count()` for N up front.
    *
    * `tol > 0` adds convergence termination: every round the max |Δrank|
    * vs the previous cut is computed (one scalar agg over two already-
    * cached node-sized relations) and iteration stops once it drops
    * below `tol` — at 100× scale a fixed `iters` either wastes rounds
    * after convergence or stops short. `tol = 0` (default) keeps the
    * exact fixed-iteration recurrence the SQL oracles unroll. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      tol: Double = 0.0): DataFrame =
    // weight-1 delegation is BIT-exact, not just equivalent: rank·1.0
    // is the identity in IEEE arithmetic and Σ1.0 over a group equals
    // count-as-double, so the unweighted oracles keep hash-matching
    pageRankWeighted(edges.select(col("src"), col("dst"), lit(1.0).as("w")),
      iters, damping, tol)

  /** [[pageRank]] with per-edge weights: contributions split
    * proportionally — `r' = (1-d)/N + d·Σ r(u)·w(u,v)/wsum(u)` — the
    * importance-weighted centrality (co-occurrence counts, citation
    * multiplicity, trade volume) the unit-weight walk flattens. Same
    * contract (every node needs an out-edge; symmetrize first, carrying
    * the weight both ways) and the same scale shape: edges+weights are
    * partitioned once, each iteration shuffles only the node-sized rank
    * relation. Weights must be positive (a zero-weight-sum node would
    * divide by zero exactly like a dangling node). */
  def pageRankWeighted(edges: DataFrame, iters: Int, damping: Double = 0.85,
      tol: Double = 0.0): DataFrame =
    pageRankImpl(edges, iters, damping, tol, init = None)

  /** WARM-START PageRank — the "ranks as a maintained artifact" path:
    * instead of recomputing centrality from the uniform vector after
    * every crawl/graph delta, seed the iteration with the STORED ranks
    * of the previous graph. Nodes present in `init` start from their
    * old rank; genuinely new nodes start at 1/N of the NEW graph. The
    * recurrence, contract (`src`,`dst`, every node has an out-edge) and
    * scale shape are exactly [[pageRank]]'s — the warm start changes
    * only the initial vector, so with `tol` termination the iteration
    * count collapses when the delta is small (the stored vector is
    * already near the new fixpoint), and with fixed `iters` the result
    * is deterministic and SQL-oracle-reproducible.
    *
    * @param init prior rank artifact (node, rank) — typically the
    *             persisted output of a previous [[pageRank]] run
    */
  def pageRankWarmStart(edges: DataFrame, init: DataFrame, iters: Int,
      damping: Double = 0.85, tol: Double = 0.0): DataFrame =
    pageRankImpl(edges.select(col("src"), col("dst"), lit(1.0).as("w")),
      iters, damping, tol, init = Some(init))

  /** [[pageRankWarmStart]] for weighted edges (`src`, `dst`, `w`). */
  def pageRankWeightedWarmStart(edges: DataFrame, init: DataFrame,
      iters: Int, damping: Double = 0.85, tol: Double = 0.0): DataFrame =
    pageRankImpl(edges, iters, damping, tol, init = Some(init))

  private def pageRankImpl(edges: DataFrame, iters: Int, damping: Double,
      tol: Double, init: Option[DataFrame]): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("double"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(sum(col("w")).as("wsum"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val teleport = (1.0 - damping) / n

    // warm start: stored ranks where known, uniform 1/N(new) for nodes
    // the artifact has never seen — one node-sized left join, no edge
    // relation involved
    var ranks = init match {
      case None => nodes.withColumn("rank", lit(1.0 / n))
      case Some(r0) => nodes
        .join(r0.select(col("node"), col("rank").as("__init")), Seq("node"), "left")
        .select(col("node"), coalesce(col("__init"), lit(1.0 / n)).as("rank"))
    }
    var lastCut: Option[(DataFrame, () => Unit)] = None
    var converged = false
    var i = 1
    while (i <= iters && !converged) {
      val r = ranks
      ranks = e
        .join(r, e("src") === r("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("wsum")).as("c"))
        .groupBy("node")
        .agg((lit(teleport) + lit(damping) * sum(col("c"))).as("rank"))
      // each round references the previous rank relation ONCE, so the
      // plan grows linearly; every few rounds (and at the end) cut —
      // materialize so scheduling stays shallow, then release the
      // superseded cut. tol > 0 needs consecutive materialized cuts (and
      // plan truncation — see `cut`), so it cuts every round.
      if (tol > 0.0 || i % 5 == 0 || i == iters) {
        val (c, release) = cut(ranks, truncate = tol > 0.0)
        if (tol > 0.0)
          converged = lastCut.exists { case (prev, _) => maxDelta(prev, c) < tol }
        lastCut.foreach(_._2())
        lastCut = Some((c, release))
        ranks = c
      }
      i += 1
    }
    // edge/degree caches release safely: the materialized final cut only
    // needs them again if its blocks are evicted, in which case lineage
    // recomputes from source. The returned relation stays cached; callers
    // running many rankings in one session must unpersist it when done
    // (the registry wrappers drain it immediately).
    e.unpersist()
    deg.unpersist()
    lastCut match {
      case Some((c, release)) => settle(c, release, truncated = tol > 0.0)
      case None => ranks
    }
  }

  /** Triangle count + global clustering coefficient over an undirected
    * edge relation (`src`, `dst`; direction, duplicates and self-loops
    * are cleaned here).
    *
    * Scale shape — degree-ordered orientation, the standard trick that
    * makes distributed triangle counting tractable: every undirected
    * edge is oriented from its lower-(degree, id) endpoint to the
    * higher one, which bounds every oriented out-degree by O(√m) even
    * on power-law graphs, so the wedge join (out-neighbor pairs per
    * apex) materializes Σ C(outdeg,2) = O(m^1.5) rows instead of the
    * Σ C(deg,2) a naive neighbor self-join pays on hub nodes — on a
    * web-scale graph with a degree-10⁶ hub that is the difference
    * between 10⁹ and 10¹² intermediate rows. Each triangle is counted
    * exactly once, at its unique lowest-order apex; the closure probe
    * is one hash join back against the canonical edge set.
    *
    * Returns `(cachedEdges, stats)`: the canonical edge relation is
    * persisted (it feeds degrees, orientation and the closure probe —
    * three consumers), and the caller must unpersist it after
    * materializing `stats` (the registry wrapper drains it). `stats`
    * is a single row: n_nodes, n_edges, n_wedges, n_triangles,
    * global_cc = 3·triangles / wedges (NULL on a wedge-free graph).
    */
  def triangleStats(edges: DataFrame): (DataFrame, DataFrame) = {
    val und = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg(a), a) < (deg(b), b): a strict total order, so
    // exactly one direction per edge and out-degrees stay O(√m)
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    // wedges at each apex: the id-order filter emits each unordered pair
    // of out-neighbors exactly once, already canonical (a < b) for the
    // closure probe; a triangle closes at its unique lowest-order apex,
    // so the semi join (which preserves left-side multiplicity — same
    // (a,b) under different apexes are different triangles) counts each
    // exactly once
    val cand = o.as("e1").join(o.as("e2"), Seq("src"))
      .where(col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("a"), col("e2.dst").as("b"))
    val tri = cand.join(und, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodesWedges = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val stats = nodesWedges.join(nEdges).join(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        // guard the wedge-free case (isolated edges only): 0.0/0 is NaN,
        // not NULL, and NaN poisons downstream comparisons
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("global_cc"))
    (und, stats)
  }

  /** (k,k)-core of a BIPARTITE edge relation `(c, s)`: iteratively drop
    * left nodes with fewer than k distinct right neighbors and right
    * nodes with fewer than k left neighbors, until nothing changes —
    * the standard density filter ("customers with a real basket AND
    * suppliers with a real customer base", or in corpus terms: hosts
    * with enough documents and templates shared by enough hosts). The
    * peel fixpoint is unique regardless of drop order (the k-core is
    * the maximum subgraph with all degrees ≥ k), which is what lets a
    * fixed-round SQL unroll oracle the convergence loop.
    *
    * Scale shape: each round is two semi joins + two partial-aggregated
    * degree counts over a SHRINKING edge relation — edges hash-shuffle
    * on `c` then `s`, nothing node-sized ever collects to the driver;
    * convergence is one count() per round (the same materialize-and-
    * release rhythm as [[pageRank]], linear plan growth cut each round).
    * Input duplicates are removed (degrees count DISTINCT neighbors).
    *
    * Returns the surviving edges.
    */
  def kCoreBipartite(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"kCoreBipartite needs k >= 1, got $k")
    var e = edges.select(col("c").cast("long"), col("s").cast("long"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var n = e.count()
    var release: () => Unit = () => { e.unpersist(); () }
    var converged = n == 0
    while (!converged) {
      val keepC = e.groupBy("c").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select("c")
      val afterC = e.join(keepC, Seq("c"), "left_semi")
      val keepS = afterC.groupBy("s").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select("s")
      val next = afterC.join(keepS, Seq("s"), "left_semi")
        .select(col("c"), col("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = next.count()
      // the peel only ever removes edges: an unchanged count IS the
      // fixpoint (no oscillation to guard against)
      converged = m == n
      release()
      e = next
      n = m
      release = () => { next.unpersist(); () }
    }
    // stays persisted for the caller (registry wrappers drain it)
    e
  }

  /** Bounded-hop BFS distances from a seed set: `dist(v)` = length of
    * the shortest path from any seed, up to `maxHops` (nodes farther
    * than that are absent) — the "contamination reach" primitive
    * (which parts flow through suppliers of a known-bad part; which
    * documents sit within k citation hops of a benchmark).
    *
    * Fixed-round form ON PURPOSE: `maxHops` rounds of frontier
    * expansion is exactly reproducible as an unrolled SQL oracle, and
    * at 100× scale an unbounded BFS over a high-diameter graph is a
    * runaway job — the cap is the safety rail. Each round shuffles
    * only the node-sized distance relation against the once-partitioned
    * edge set and re-aggregates by min (same rhythm as [[pageRank]]);
    * rounds after the reachable set saturates are cheap no-ops.
    *
    * @param edges already-symmetrized `(src, dst)` for undirected reach
    * @param seeds single-column `node` relation
    */
  def seedDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"seedDistances needs maxHops >= 0, got $maxHops")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var d = seeds.select(col("node").cast("long")).distinct()
      .withColumn("dist", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var n = d.count()
    var release: () => Unit = () => { d.unpersist(); () }
    var i = 0
    var saturated = false
    while (i < maxHops && !saturated) {
      val cur = d
      val expanded = e.join(cur, e("src") === cur("node"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      val next = cur.select(col("node"), col("dist"))
        .union(expanded)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = next.count()
      // early exit at saturation, result-identical to running out the
      // cap: a round that reaches no NEW node changes nothing (a node's
      // dist is set at first reach and BFS rounds are monotone), so the
      // remaining rounds are no-ops the oracle's fixed unroll also
      // passes through
      saturated = m == n
      release()
      d = next
      n = m
      release = () => { next.unpersist(); () }
      i += 1
    }
    e.unpersist()
    // stays persisted for the caller (registry wrappers drain it)
    d
  }

  /** PageRank over an ARBITRARY directed edge list — the general form
    * [[pageRank]]'s symmetrized contract avoids. Dangling nodes (no
    * out-edges) redistribute their rank mass uniformly:
    * `r' = (1-d)/N + d·(Σ_in r(u)/deg(u) + D/N)`, D = Σ rank over
    * dangling nodes — the standard correction that keeps Σr = 1.
    *
    * Same scale shape as [[pageRank]] (edges partitioned once, rank-only
    * shuffles) plus one extra tiny action per iteration: D is a single
    * double collected to the driver (a broadcast-sized scalar, like the
    * prefix-sum totals in Packing). Sinkless nodes (no in-edges) still
    * receive teleport + dangling mass via the left join on the node set.
    *
    * `tol > 0` stops once max |Δrank| < tol (see [[pageRank]]); the
    * check is one extra scalar agg per round on relations that are
    * already materialized for the dangling-mass scalar. */
  def pageRankDirected(edges: DataFrame, iters: Int,
      damping: Double = 0.85, tol: Double = 0.0): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRankDirected needs a non-empty graph")
    val teleport = (1.0 - damping) / n

    val r0 = nodes.withColumn("rank", lit(1.0 / n))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks: DataFrame = r0
    var releaseRanks: () => Unit = () => { r0.unpersist(); () }
    var converged = false
    var i = 1
    while (i <= iters && !converged) {
      val r = ranks
      val dangling = {
        // sum over zero rows (no dangling nodes) is SQL NULL
        val row = r.join(deg, r("node") === deg("src"), "left_anti")
          .agg(sum(col("rank"))).head()
        if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      }
      val contribs = e
        .join(r, e("src") === r("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      val nextPlan = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + lit(dangling / n))).as("rank"))
      val (next, release) = cut(nextPlan, truncate = tol > 0.0)
      if (tol > 0.0) converged = maxDelta(r, next) < tol
      releaseRanks()
      ranks = next
      releaseRanks = release
      i += 1
    }
    val out = settle(ranks, releaseRanks, truncated = tol > 0.0 && i > 1)
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    out
  }

  /** Synchronous label propagation (community detection, Raghavan et al.
    * 2007): labels start as node ids; each round every node adopts the
    * most frequent label among its NEIGHBORS, ties broken by the
    * smallest label — both rules deterministic, so a fixed `rounds`
    * trajectory is exactly reproducible in unrolled SQL (the classic
    * randomized-order variant is not). Communities ≈ dense groups; on a
    * near-dup corpus graph this is the "soft clusters" complement of
    * [[Dedup.dupClusters]]' exact connected components.
    *
    * Contract: `edges(src, dst)` symmetrized, like [[pageRank]] (every
    * node has ≥ 1 out-edge; isolated nodes have no neighbors and no
    * community).
    *
    * Scale shape: edges are hash-partitioned on `src` once and
    * persisted; each round shuffles (a) the node-sized label relation to
    * meet the edges and (b) the (node, label, cnt) vote relation — both
    * long-keyed, no corpus-wide window anywhere: the per-node argmax is
    * a two-level aggregate, `max(struct(cnt, -label))`, which partial-
    * aggregates map-side exactly like any max. O(rounds) shuffles of
    * node-sized relations, edges never move again. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val l0 = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels: DataFrame = l0
    var release: () => Unit = () => { l0.unpersist(); () }
    for (_ <- 1 to rounds) {
      val cur = labels
      val nextPlan = e
        .join(cur, e("dst") === cur("node"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
        // argmax with min-label tie-break as ONE max over an ordered
        // struct: (cnt, -label) compares lexicographically, so the max
        // struct is the highest count and, within it, the smallest label
        .groupBy(col("src").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("label"))
      val (next, releaseNext) = cut(nextPlan, truncate = false)
      release()
      labels = next
      release = releaseNext
    }
    e.unpersist()
    // stays persisted for the caller (registry wrappers drain it)
    labels
  }

  /** Persist a rank artifact (node, rank) as a bucketed table — the
    * write-once/read-many layout for [[pageRank]]-family output, so rank
    * consumers (quality-weighted sampling, warm-start reseeds via
    * [[pageRankWarmStart]]) read a pre-bucketed node-keyed relation
    * instead of re-running the iteration. Same discipline as
    * [[Dedup.writeClusters]]. */
  def writeRanks(ranks: DataFrame, table: String, path: String,
      numBuckets: Int = 8): Unit =
    Bucketing.writeBucketed(ranks.select(col("node"), col("rank")),
      table, path, "node", numBuckets)
}
