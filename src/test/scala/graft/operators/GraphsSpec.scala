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

  test("pageRank tol stops early: a loose tolerance returns the 2-iteration cut") {
    import spark.implicits._
    // star: hub 0 ↔ leaves 1..4, symmetrized. With tol set, the first
    // convergence check happens at i=2 (the first round with a previous
    // cut to diff against); ranks are ≤ 1 so Δ < 0.5 always holds there
    // and the loop must stop — bit-identical to a fixed 2-iteration run.
    val star = (1L to 4L).map(l => (0L, l)).toDF("a", "b")
    val sym = star.select($"a".as("src"), $"b".as("dst"))
      .union(star.select($"b".as("src"), $"a".as("dst")))
    val early = Graphs.pageRank(sym, iters = 100, tol = 0.5)
      .as[(Long, Double)].collect().toMap
    val twoIt = Graphs.pageRank(sym, iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(early === twoIt)
  }

  test("pageRank tol runs to the analytic fixed point on a star graph") {
    import spark.implicits._
    // k=4 leaves, d=0.5 (converges at ratio d² per round, ~15 rounds to
    // 1e-10), N=5, t=(1-d)/N: solving the 2-state recurrence gives
    // r_hub = t(1+dk)/(1-d²); leaves split the rest evenly. iters is a
    // generous ceiling — without the tol early-stop AND per-round plan
    // truncation this would blow the analysis budget long before 200.
    val star = (1L to 4L).map(l => (0L, l)).toDF("a", "b")
    val sym = star.select($"a".as("src"), $"b".as("dst"))
      .union(star.select($"b".as("src"), $"a".as("dst")))
    val got = Graphs.pageRank(sym, iters = 200, damping = 0.5, tol = 1e-10)
      .as[(Long, Double)].collect().toMap
    val t = 0.5 / 5
    val hub = t * (1 + 0.5 * 4) / (1 - 0.25)
    assert(math.abs(got(0L) - hub) < 1e-8)
    for (l <- 1L to 4L) assert(math.abs(got(l) - (1 - hub) / 4) < 1e-8, s"leaf $l")
  }

  test("pageRankDirected tol stops early and matches the 1-iteration run") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    // all ranks are ≤ 1, so Δ(r0, r1) < 0.9 — the first check must stop it
    val early = Graphs.pageRankDirected(edges, iters = 50, tol = 0.9)
      .as[(Long, Double)].collect().toMap
    val oneIt = Graphs.pageRankDirected(edges, iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(early === oneIt)
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

  private def triangleRow(edges: org.apache.spark.sql.DataFrame) = {
    val (cached, stats) = Graphs.triangleStats(edges)
    val row = stats.head()
    cached.unpersist(blocking = true)
    row
  }

  test("triangleStats counts K4 exactly: 4 triangles, 12 wedges, cc 1.0") {
    import spark.implicits._
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val r = triangleRow(k4)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 6L, 12L, 4L)))
    assert(r.getDouble(4) === 1.0)
  }

  test("triangleStats on a star: 0 triangles, hub wedges only, cc 0") {
    import spark.implicits._
    val star = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val r = triangleRow(star)
    assert((r.getLong(2), r.getLong(3)) === ((6L, 0L)))
    assert(r.getDouble(4) === 0.0)
  }

  test("triangleStats cleans direction, duplicates and self-loops") {
    import spark.implicits._
    // (1,2) twice in both directions, a self-loop, plus (2,3),(1,3):
    // canonical edges {12,13,23} = one triangle, 3 wedges, cc 1
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = triangleRow(messy)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 3L, 3L, 1L)))
    assert(r.getDouble(4) === 1.0)
  }

  test("kCoreBipartite peels the hand case: s3 starves c3 out of the 2-core") {
    import spark.implicits._
    // c1-{s1,s2}, c2-{s1,s2}, c3-{s1,s3}; k=2: s3 (deg 1) drops, which
    // starves c3 (deg 1), leaving the complete 2x2 core
    val e = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L))
      .toDF("c", "s")
    val got = Graphs.kCoreBipartite(e, k = 2)
    val rows = got.as[(Long, Long)].collect().toSet
    got.unpersist(blocking = true)
    assert(rows === Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
  }

  test("kCoreBipartite matches a brute-force peel through a designed cascade") {
    import spark.implicits._
    // dense 10x6 block (c-deg 6, s-deg 10: survives k=5) + three fringe
    // structures that peel in a CASCADE: s=50 (deg 2) drops first, which
    // drops c=30 (deg 5 → 4), and c=20 (deg 3) drops on its own
    val block = for (c <- 0L until 10L; s <- 0L until 6L) yield (c, s)
    val fringe = Seq((20L, 0L), (20L, 1L), (20L, 2L),
      (30L, 50L), (30L, 0L), (30L, 1L), (30L, 2L), (30L, 3L),
      (0L, 50L))
    val edges = block ++ fringe
    val got = Graphs.kCoreBipartite(edges.toDF("c", "s"), k = 5)
    val rows = got.as[(Long, Long)].collect().toSet
    got.unpersist(blocking = true)
    // reference peel, sequential
    var cur = edges.toSet
    var changed = true
    while (changed) {
      val cd = cur.groupBy(_._1).map { case (c, es) => c -> es.size }
      val afterC = cur.filter(e => cd(e._1) >= 5)
      val sd = afterC.groupBy(_._2).map { case (s, es) => s -> es.size }
      val next = afterC.filter(e => sd(e._2) >= 5)
      changed = next != cur
      cur = next
    }
    assert(rows === cur)
    assert(cur === block.toSet, "exactly the dense block must survive")
  }

  test("seedDistances: shortest hops on a path, capped at maxHops") {
    import spark.implicits._
    // path 1-2-3-4-5-6 (symmetrized) + disconnected 9; seed = {1}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (9L, 9L))
    val e = path.toDF("a", "b")
    val sym = e.select($"a".as("src"), $"b".as("dst"))
      .union(e.select($"b".as("src"), $"a".as("dst")))
    val d = Graphs.seedDistances(sym, Seq(1L).toDF("node"), maxHops = 3)
    val got = d.as[(Long, Long)].collect().toMap
    d.unpersist(blocking = true)
    // node 5 is 4 hops away and node 9 unreachable: both absent
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("seedDistances takes the minimum over multiple seeds") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val sym = e.select($"a".as("src"), $"b".as("dst"))
      .union(e.select($"b".as("src"), $"a".as("dst")))
    val d = Graphs.seedDistances(sym, Seq(1L, 4L).toDF("node"), maxHops = 4)
    val got = d.as[(Long, Long)].collect().toMap
    d.unpersist(blocking = true)
    assert(got === Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("pageRankWarmStart from the fixpoint stays at the fixpoint") {
    import spark.implicits._
    val star = (1L to 4L).map(l => (0L, l)).toDF("a", "b")
    val sym = star.select($"a".as("src"), $"b".as("dst"))
      .union(star.select($"b".as("src"), $"a".as("dst")))
    val fix = Graphs.pageRank(sym, iters = 200, damping = 0.5, tol = 1e-12)
    val after = Graphs.pageRankWarmStart(sym, fix, iters = 1, damping = 0.5)
    val fm = fix.as[(Long, Double)].collect().toMap
    val am = after.as[(Long, Double)].collect().toMap
    fix.unpersist(blocking = true)
    for ((n, r) <- fm)
      assert(math.abs(am(n) - r) < 1e-10, s"node $n moved: $r -> ${am(n)}")
  }

  test("pageRankWarmStart seeds unknown nodes at 1/N of the new graph") {
    import spark.implicits._
    // artifact knows only node 9 (rank 0.7); graph is 1↔2. One iteration
    // from init (r(1)=r(2)=1/2) equals the cold 1-iteration run — the
    // stale artifact entry for a node no longer in the graph is ignored.
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val init = Seq((9L, 0.7)).toDF("node", "rank")
    val warm = Graphs.pageRankWarmStart(e, init, iters = 1)
      .as[(Long, Double)].collect().toMap
    val cold = Graphs.pageRank(e, iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(warm === cold)
  }

  test("warm start is closer to the new fixpoint than a cold start after equal rounds") {
    import spark.implicits._
    // old graph: 6-node PATH (non-uniform ranks — a cycle would be
    // vertex-transitive and its uniform fixpoint coincides with the cold
    // init, making warm == cold vacuously); new graph: path plus one
    // chord — a small delta, so old ranks are near the new fixpoint
    val oldE = (0L to 4L).map(i => (i, i + 1)).toDF("a", "b")
    val newE = ((0L to 4L).map(i => (i, i + 1)) :+ ((0L, 3L))).toDF("a", "b")
    def sym(e: org.apache.spark.sql.DataFrame) =
      e.select($"a".as("src"), $"b".as("dst"))
        .union(e.select($"b".as("src"), $"a".as("dst")))
    val artifact = Graphs.pageRank(sym(oldE), iters = 15)
    val fix = Graphs.pageRank(sym(newE), iters = 100, tol = 1e-11)
    val warm = Graphs.pageRankWarmStart(sym(newE), artifact, iters = 2)
    val cold = Graphs.pageRank(sym(newE), iters = 2)
    val fm = fix.as[(Long, Double)].collect().toMap
    def dist(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Double)].collect().map { case (n, r) => math.abs(r - fm(n)) }.max
    val (dw, dc) = (dist(warm), dist(cold))
    Seq(artifact, fix, warm, cold).foreach(_.unpersist(blocking = true))
    assert(dw < dc, s"warm $dw should beat cold $dc")
  }

  test("labelPropagation finds the two cliques across a bridge") {
    import spark.implicits._
    // two triangles {0,1,2} and {10,11,12} joined by bridge 2-10: after
    // convergence each triangle carries its minimum member's label
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val e = und.toDF("a", "b")
      .select($"a".as("src"), $"b".as("dst"))
      .union(und.toDF("a", "b").select($"b".as("src"), $"a".as("dst")))
    val labs = Graphs.labelPropagation(e, rounds = 4)
    val m = labs.as[(Long, Long)].collect().toMap
    labs.unpersist(blocking = true)
    assert(m(0L) == m(1L) && m(1L) == m(2L), s"left triangle split: $m")
    assert(m(10L) == m(11L) && m(11L) == m(12L), s"right triangle split: $m")
    assert(m(0L) != m(10L), s"bridge merged the communities: $m")
  }

  test("labelPropagation round 1 is the exact min-tie-break neighbor vote") {
    import spark.implicits._
    // star 0-{1,2,3}: after 1 round the hub sees labels {1,2,3} (all
    // count 1 -> tie -> min = 1); each leaf sees only {0}
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val e = und.toDF("a", "b")
      .select($"a".as("src"), $"b".as("dst"))
      .union(und.toDF("a", "b").select($"b".as("src"), $"a".as("dst")))
    val labs = Graphs.labelPropagation(e, rounds = 1)
    val m = labs.as[(Long, Long)].collect().toMap
    labs.unpersist(blocking = true)
    assert(m == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L), s"got $m")
  }
}
