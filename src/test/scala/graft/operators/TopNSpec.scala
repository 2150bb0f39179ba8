package graft.operators

import graft.SparkSpec

/** topNPerGroup: exact equivalence with the per-group row_number it
  * avoids, including boundary tie-classes and tiny groups. */
class TopNSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long, Long)], n: Int): Set[(String, Long, Long)] = {
    import spark.implicits._
    TopN.topNPerGroup(rows.toDF("g", "s", "id"), "g", "s", "id", n)
      .as[(String, Long, Long)].collect().toSet
  }

  private def brute(rows: Seq[(String, Long, Long)], n: Int): Set[(String, Long, Long)] =
    rows.groupBy(_._1).values.flatMap(
      _.sortBy { case (_, s, id) => (-s, id) }.take(n)).toSet

  test("boundary tie-class ranks by id; full tie-classes pass wholesale") {
    // group a: scores 9,9,5,5,5,1 with n=4 -> both 9s, then 2 of the
    // three 5s by smallest id; group b fits entirely
    val rows = Seq[(String, Long, Long)](
      ("a", 9, 1), ("a", 9, 2), ("a", 5, 3), ("a", 5, 4), ("a", 5, 5), ("a", 1, 6),
      ("b", 7, 10), ("b", 3, 11))
    assert(run(rows, 4) == Set[(String, Long, Long)](
      ("a", 9, 1), ("a", 9, 2), ("a", 5, 3), ("a", 5, 4),
      ("b", 7, 10), ("b", 3, 11)))
  }

  test("matches brute force on a seeded skewed fixture for several n") {
    var seed = 99L
    def next(m: Int): Long = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L) >>> 1; seed % m
    }
    // one hot group (~70% of rows) + many small ones, scores 0..9 so
    // boundary tie-classes are routinely wide
    val rows = Seq.fill(2000) {
      val g = if (next(10) < 7) "hot" else s"g${next(20)}"
      (g, next(10), next(100000))
    }.distinct
    for (n <- Seq(1, 3, 17))
      assert(run(rows, n) == brute(rows, n), s"mismatch at n=$n")
  }

  test("null score fails loudly instead of silently dropping the row") {
    import spark.implicits._
    val df = Seq(("a", java.lang.Long.valueOf(9L), 1L),
      ("a", null.asInstanceOf[java.lang.Long], 2L)).toDF("g", "s", "id")
    val e = intercept[Exception] {
      TopN.topNPerGroup(df, "g", "s", "id", 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be non-null")), s"got: $e")
  }
}
