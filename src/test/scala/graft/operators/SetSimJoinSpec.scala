package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SetSimJoinSpec extends SparkSpec {

  test("ppJoin is lossless vs the brute-force all-pairs join at sf0.001") {
    val docs = Tables.t(spark, sfDir, "documents")
    val got = SetSimJoin.ppJoin(docs, "doc_id", "text", tPpm = 500000L)
      .collect().map(_.toSeq).toSet
    // brute force: every pair through the raw (doc, shingle) join, no
    // prefix index anywhere
    val tk = docs
      .select(col("doc_id").cast("long").as("id"),
        expr(Dedup.wordsExpr("text")).as("w"))
      .where(size(col("w")) >= 3)
      .select(col("id"), explode(expr(Dedup.shinglesExpr("w"))).as("tok"))
    val n = tk.groupBy(col("id")).agg(count(lit(1)).cast("long").as("n"))
    val want = tk.select(col("id").as("a"), col("tok"))
      .join(tk.select(col("id").as("b"), col("tok")), Seq("tok"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).cast("long").as("overlap"))
      .join(n.select(col("id").as("a"), col("n").as("n_a")), Seq("a"))
      .join(n.select(col("id").as("b"), col("n").as("n_b")), Seq("b"))
      .where(col("overlap") * 1000000L >=
        (col("n_a") + col("n_b") - col("overlap")) * 500000L)
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("overlap"),
        expr("(overlap * 1000000) div (n_a + n_b - overlap)")
          .as("jacc_ppm"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty) // a vacuous match proves nothing
  }

  test("hand-traced pair: jaccard arithmetic and the a < b orientation") {
    import spark.implicits._
    // x: shingles {a b c, b c d, c d e} (5 words), y shares exactly
    // {b c d, c d e} of its own 3 → overlap 2, union 4, J = 0.5
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "b c d e f"),
      (3L, "z z2 z3 z4 z5 z6")).toDF("doc_id", "text")
    val rows = SetSimJoin.ppJoin(docs, "doc_id", "text", tPpm = 500000L)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L) // n_a, n_b
    assert(r.getLong(4) === 2L) // overlap {b c d, c d e}
    assert(r.getLong(5) === 500000L) // 2e6 div 4
    // one notch above: the pair no longer qualifies
    assert(SetSimJoin.ppJoin(docs, "doc_id", "text",
      tPpm = 500001L).count() === 0L)
  }

  test("length filter alone cannot fake a pair: disjoint same-size docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "p q r s t")).toDF("doc_id", "text")
    assert(SetSimJoin.ppJoin(docs, "doc_id", "text",
      tPpm = 100000L).count() === 0L)
  }

  test("stats: prefix index probes a strict sliver of the pair space") {
    val docs = Tables.t(spark, sfDir, "documents")
    val r = SetSimJoin.ppJoinStats(docs, "doc_id", "text",
      tPpm = 500000L).collect().head
    val (nDocs, nCand, nQual, brute, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(nDocs >= 2L)
    assert(brute === nDocs * (nDocs - 1) / 2)
    assert(nQual <= nCand)     // verify only ever discards
    assert(nCand < brute / 10, // the point of the prefix filter
      s"prefix filter barely pruned: $nCand of $brute")
    assert(ppm === nCand * 1000000L / brute)
    // and the qualifying count agrees with the join itself
    assert(nQual === SetSimJoin.ppJoin(docs, "doc_id", "text",
      tPpm = 500000L).count())
  }
}
