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
}
