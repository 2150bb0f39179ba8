package graft.operators

import graft.SparkSpec

/** PassJoin losslessness: segment blocking + verify must return EXACTLY
  * the brute-force O(n²) Levenshtein result — on strings of varying
  * length, planted near-duplicates, and the sub-(k+1)-char short path. */
class FuzzyJoinSpec extends SparkSpec {

  /** Plain Levenshtein for the brute-force oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      d = lev(sa, sb)
      if d <= k
    } yield (ia, ib, d)).toSet

  /** Deterministic corpus: base words + seeded single/double mutations +
    * some very short strings for the residual path. */
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh"
    val bases = Seq("streaming", "partition", "shuffle", "catalyst",
      "tungsten", "exchange", "broadcast", "window")
    def mutate(s: String, times: Int): String =
      (1 to times).foldLeft(s) { (cur, _) =>
        val i = rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 => cur.updated(i, alphabet(rnd.nextInt(alphabet.length))) // sub
          case 1 => cur.take(i) + alphabet(rnd.nextInt(alphabet.length)) + cur.drop(i) // ins
          case _ if cur.length > 1 => cur.take(i) + cur.drop(i + 1) // del
          case _ => cur
        }
      }
    val mutated = for {
      (b, bi) <- bases.zipWithIndex
      m <- 0 until 12
    } yield mutate(b, m % 3)
    val shorts = Seq("a", "b", "ab", "xy", "x", "")
    (mutated ++ shorts).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  for (k <- Seq(1, 2)) test(s"selfJoin(k=$k) equals brute force") {
    import spark.implicits._
    val rows = corpus
    val got = FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute(rows, k))
  }

  for (k <- Seq(1, 2)) test(s"selfJoinDeletion(k=$k) equals brute force") {
    import spark.implicits._
    val rows = corpus
    val got = FuzzyJoin.selfJoinDeletion(rows.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute(rows, k))
  }

  test("both blockings agree on the shared-prefix corpus that breaks segments") {
    import spark.implicits._
    // the PassJoin worst case: every string shares a long verbatim prefix
    val rows = (0 until 300)
      .map(i => (i.toLong, f"Customer#${i * 7}%09d"))
    val seg = FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", 2)
      .as[(Long, Long, Int)].collect().toSet
    val del = FuzzyJoin.selfJoinDeletion(rows.toDF("id", "s"), "id", "s", 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(seg === del)
    assert(seg === brute(rows, 2))
  }

  test("selfJoin's short-string residual path never executes a nested loop") {
    import spark.implicits._
    val rows = corpus.toDF("id", "s")
    val df = FuzzyJoin.selfJoin(rows, "id", "s", 2)
    df.collect()
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: all(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: all(q.plan)
      case o => o +: (o.children ++ o.subqueries).flatMap(all)
    }
    val nlj = all(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(nlj.isEmpty,
      s"short path must equi-join on exploded lengths, got:\n${nlj.headOption}")
  }

  test("selfJoin finds nothing among pairwise-distant strings") {
    import spark.implicits._
    val rows = Seq((1L, "aaaaaaaa"), (2L, "bbbbbbbb"), (3L, "cccccccc"))
    assert(FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", 2).count() === 0L)
  }

  test("blockingMetrics: lossless recall, hand-computed universe and truth") {
    import spark.implicits._
    // 4 strings, universe = 6 pairs; true pairs at k=1:
    //   (1,2) dist 1; (3,4) dist 1; everything else distant
    val rows = Seq((1L, "kitten"), (2L, "mitten"),
      (3L, "flag"), (4L, "flags")).toDF("id", "s")
    val got = FuzzyJoin.blockingMetrics(rows, "id", "s", k = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    for (m <- Seq("passjoin", "fastss")) {
      val (nRows, universe, nTrue, nHit, recall) = got(m)
      assert(nRows === 4L && universe === 6L, m)
      assert(nTrue === 2L && nHit === 2L, m)
      assert(recall === 1000000L, s"$m must be lossless")
    }
  }

  test("sortedNeighborhood: brute window parity, each pair exactly " +
      "once across bucket boundaries") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, f"name${(i * 13) % 40}%02d"))
    val w = 5
    val got = FuzzyJoin.sortedNeighborhood(
        rows.toDF("id", "k"), "id", "k", w)
      .selectExpr("id_a", "id_b", "rank_gap")
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
    val ranked = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
    val brute = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb - ra <= w - 1
    } yield (a._1, b._1, (rb - ra).toLong)).sortBy(p => (p._1, p._2))
    assert(got.toSeq === brute)
    assert(got.distinct.length === got.length, "no duplicate pairs")
  }

  test("sortedNeighborhoodMulti: brute union parity across both " +
      "passes, exactly-once pairs, and the reversed-key pass catches " +
      "a transposed-prefix pair the single key misses") {
    import spark.implicits._
    // 'zz alpha' vs 'aa alpha': far apart sorted forward, adjacent
    // sorted on the reversed string; plus filler names
    val rows = Seq((1L, "aa alpha"), (2L, "zz alpha")) ++
      (3L to 26L).map(i => (i, f"name${(i * 7) % 24}%02d"))
    val w = 4
    val got = FuzzyJoin.sortedNeighborhoodMulti(
        rows.toDF("id", "k").withColumn("kr",
          org.apache.spark.sql.functions.reverse($"k")),
        "id", Seq("k", "kr"), w)
      .selectExpr("id_a", "id_b", "n_passes", "min_gap", "dist")
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(p => (p._1, p._2))
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    def passPairs(key: (Long, String) => String) = {
      val ranked = rows.sortBy { case (id, k) => (key(id, k), id) }
        .zipWithIndex
      for {
        (a, ra) <- ranked; (b, rb) <- ranked
        if rb > ra && rb - ra <= w - 1
      } yield ((math.min(a._1, b._1), math.max(a._1, b._1)),
        (rb - ra).toLong)
    }
    val byId = rows.toMap
    val brute = (passPairs((_, k) => k).map(p => (p._1, p._2, 0)) ++
        passPairs((_, k) => k.reverse).map(p => (p._1, p._2, 1)))
      .groupBy(_._1).toSeq
      .map { case ((ia, ib), ps) =>
        (ia, ib, ps.map(_._3).distinct.length.toLong,
          ps.map(_._2).min, lev(byId(ia), byId(ib)))
      }.sortBy(p => (p._1, p._2))
    assert(got.toSeq === brute)
    assert(got.distinct.length === got.length, "no duplicate pairs")
    // the motivating catch: (1, 2) found by pass 2 only
    val caught = got.find(p => p._1 == 1L && p._2 == 2L)
    assert(caught.isDefined && caught.get._3 == 1L,
      "reversed-key pass must contribute the transposed-prefix pair")
    val forwardOnly = passPairs((_, k) => k).map(_._1)
    assert(!forwardOnly.contains((1L, 2L)),
      "fixture broken: forward pass should miss (1, 2)")
  }
}
