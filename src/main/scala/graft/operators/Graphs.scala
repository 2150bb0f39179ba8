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
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val r = ranks
      val next = e
        .join(r, e("src") === r("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node")
        .agg((lit(teleport) + lit(damping) * sum(col("c"))).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before unpersisting the parent
      prev.foreach(_.unpersist())
      prev = Some(next)
      ranks = next
    }
    e.unpersist()
    deg.unpersist()
    ranks
  }
}
