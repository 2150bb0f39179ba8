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
    * move again. One driver-side `count()` for N up front. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val teleport = (1.0 - damping) / n

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var lastCut: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val r = ranks
      ranks = e
        .join(r, e("src") === r("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node")
        .agg((lit(teleport) + lit(damping) * sum(col("c"))).as("rank"))
      // each round references the previous rank relation ONCE, so the
      // plan grows linearly and needs no per-round materialization; every
      // few rounds (and at the end) persist + materialize so scheduling
      // stays shallow, then release the superseded cut. persist (not
      // localCheckpoint) keeps the lineage: lose an executor and the
      // blocks recompute instead of failing on a missing checkpoint.
      if (i % 5 == 0 || i == iters) {
        val cut = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        cut.count()
        lastCut.foreach(_.unpersist())
        lastCut = Some(cut)
        ranks = cut
      }
    }
    // edge/degree caches release safely: the materialized final cut only
    // needs them again if its blocks are evicted, in which case lineage
    // recomputes from source. The returned relation stays cached; callers
    // running many rankings in one session may unpersist it when done.
    e.unpersist()
    deg.unpersist()
    ranks
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
    * receive teleport + dangling mass via the left join on the node set. */
  def pageRankDirected(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
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

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
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
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      r.unpersist()
      ranks = next
    }
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    ranks
  }
}
