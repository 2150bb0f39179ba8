package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank semantics (SURVEY.md §2.11 graph analytics). */
class GraphsSpec extends SparkSpec {

  test("pageRankDirected matches the hand-computed recurrence with dangling mass") {
    import spark.implicits._
    // 1→2, 1→3, 2→3; node 3 is dangling. N=3, d=0.85, one iteration:
    //   D0 = r0(3) = 1/3
    //   r1(1) = 0.05 + 0.85*(0   + (1/3)/3) = 0.14444...
    //   r1(2) = 0.05 + 0.85*(1/6 + (1/3)/3) = 0.28611...
    //   r1(3) = 0.05 + 0.85*(1/2 + (1/3)/3) = 0.56944...
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graphs.pageRankDirected(edges, iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - (0.05 + 0.85 * (1.0 / 9))) < 1e-12)
    assert(math.abs(got(2L) - (0.05 + 0.85 * (1.0 / 6 + 1.0 / 9))) < 1e-12)
    assert(math.abs(got(3L) - (0.05 + 0.85 * (0.5 + 1.0 / 9))) < 1e-12)
  }

  test("pageRankDirected conserves total rank mass across iterations") {
    import spark.implicits._
    // chain with two dangling sinks and a disconnected pair
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L), (5L, 6L)).toDF("src", "dst")
    val total = Graphs.pageRankDirected(edges, iters = 7)
      .agg(sum($"rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("pageRankDirected equals pageRank on a symmetrized graph (no dangling nodes)") {
    import spark.implicits._
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val sym = undirected.select($"a".as("src"), $"b".as("dst"))
      .union(undirected.select($"b".as("src"), $"a".as("dst")))
    val simple = Graphs.pageRank(sym, iters = 4)
      .as[(Long, Double)].collect().toMap
    val directed = Graphs.pageRankDirected(sym, iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(simple.keySet === directed.keySet)
    for ((k, v) <- simple) assert(math.abs(v - directed(k)) < 1e-12, s"node $k")
  }
}
