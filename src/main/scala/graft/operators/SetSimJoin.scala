package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity self-join (the AllPairs/PPJoin
  * family: Bayardo et al. WWW'07, Xiao et al. WWW'08): all document
  * pairs whose word k-shingle sets have Jaccard ≥ t, found WITHOUT an
  * all-pairs comparison and WITHOUT the recall loss of the df-capped
  * inverted index in [[Dedup.ngramJaccardPairs]] (which drops
  * hot shingles entirely and so can miss pairs that share only hot
  * shingles). Prefix filtering is the LOSSLESS blocking: order every
  * document's shingles by ascending global document frequency (rarest
  * first, ties on the shingle string), and index only each document's
  * first `|x| − ⌈t·|x|⌉ + 1` shingles. The prefix-filter lemma
  * (PPJoin Lemma 1) guarantees every pair with Jaccard ≥ t shares at
  * least one PREFIX shingle on both sides, so candidate generation
  * over the prefix index alone loses nothing; an exact
  * intersection-count pass then verifies every candidate. The oracle
  * is the brute-force all-pairs join, so the driver's hash-match IS
  * the losslessness proof at both SFs.
  *
  * Integer-exactness contract (the engine-wide oracle discipline):
  * the prefix length uses exact BIGINT ceil-division
  * `⌈t_ppm·n / 1e6⌉ = (t_ppm·n + 999999) div 1e6`, the length filter
  * and the final Jaccard test are cross-multiplications of BIGINTs,
  * and `jacc_ppm` is ONE floored integer division — no doubles
  * anywhere, so both engines agree cell-for-cell.
  *
  * Distribution shape (the 100 TB contract): one shingle explode, a
  * map-side-combinable df groupBy (shingle-vocabulary-sized), a
  * per-document rank window (partitioned BY doc — thousands of tiny
  * groups, never a global sort), a self-equi-join of the PREFIX index
  * on the shingle (the prefix holds each doc's RAREST shingles, so
  * bucket sizes are the df tail, not the head), and a verify join
  * keyed on (doc, shingle) — every exchange is keyed, nothing is
  * cartesian. The known PPJoin hazard — a corpus where even rare-end
  * shingles are shared by many docs — degrades candidate COUNT only,
  * never correctness (exact verify) and never a single-task stage
  * (candidates stay key-partitioned). Pairs with `a < b` once each.
  *
  * Reference scope: the reference joins only on exact equality
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:44-47);
  * similarity joins belong to the declared extension surface
  * (SURVEY.md §2.11).
  *
  * Output: `(a, b, n_a, n_b, overlap, jacc_ppm)` for every pair with
  * `jacc_ppm ≥ tPpm`, where `n_*` are distinct-shingle counts and
  * `jacc_ppm = (overlap·1e6) div (n_a + n_b − overlap)`.
  */
object SetSimJoin {

  /** Distinct word k-shingles: `(id, tok)`. Documents with fewer than
    * `k` words emit nothing (mirrored in the oracle). */
  private def shingleRel(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        expr(Dedup.wordsExpr(textCol)).as("__w"))
      .where(size(col("__w")) >= k)
      .select(col("id"),
        explode(expr(Dedup.shinglesExpr("__w", k))).as("tok"))

  def ppJoin(docs: DataFrame, idCol: String, textCol: String,
      tPpm: Long, shingleK: Int = Dedup.ShingleK): DataFrame = {
    require(tPpm >= 1L && tPpm <= 1000000L,
      s"need 1 <= tPpm <= 1e6, got $tPpm")
    val tk = shingleRel(docs, idCol, textCol, shingleK)
    val dfRel = tk.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = tk.groupBy(col("id")).agg(count(lit(1)).cast("long").as("n"))
    // rarest-first prefix: rank within each doc by (global df, shingle),
    // keep the first n − ⌈t·n⌉ + 1 — the lossless index
    val prefix = tk.join(dfRel, Seq("tok")).join(n, Seq("id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("tok")))
        .cast("long"))
      .where(col("rn") <=
        col("n") - expr(s"($tPpm * n + 999999) div 1000000") + 1L)
      .select(col("id"), col("tok"), col("n"))
    val x = prefix.select(col("id").as("a"), col("tok"),
      col("n").as("n_a"))
    val y = prefix.select(col("id").as("b"), col("tok"),
      col("n").as("n_b"))
    // candidates: a shared prefix shingle + the Jaccard length filter
    // t·n_a ≤ n_b ∧ t·n_b ≤ n_a (cross-multiplied, exact)
    val cand = x.join(y, Seq("tok"))
      .where(col("a") < col("b") &&
        col("n_b") * 1000000L >= col("n_a") * tPpm &&
        col("n_a") * 1000000L >= col("n_b") * tPpm)
      .select(col("a"), col("b"), col("n_a"), col("n_b"))
      .distinct()
    // exact verify: intersection count via the (doc, shingle) join
    val ov = cand
      .join(tk.select(col("id").as("a"), col("tok")), Seq("a"))
      .join(tk.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy(col("a"), col("b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).cast("long").as("overlap"))
    ov.where(col("overlap") * 1000000L >=
        (col("n_a") + col("n_b") - col("overlap")) * tPpm)
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("overlap"),
        expr("(overlap * 1000000) div (n_a + n_b - overlap)")
          .as("jacc_ppm"))
  }

  /** Blocking diagnostics for the prefix filter at threshold `tPpm`:
    * ONE row `(n_docs, n_candidates, n_qualifying, brute_pairs,
    * candidate_ppm)` — how small a sliver of the all-pairs space the
    * prefix index actually probes (`candidate_ppm` = candidates per
    * million brute pairs). The same exact-integer pieces as
    * [[ppJoin]]; `brute_pairs = d·(d−1)/2` over docs with ≥ k words. */
  def ppJoinStats(docs: DataFrame, idCol: String, textCol: String,
      tPpm: Long, shingleK: Int = Dedup.ShingleK): DataFrame = {
    val tk = shingleRel(docs, idCol, textCol, shingleK)
    val dfRel = tk.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = tk.groupBy(col("id")).agg(count(lit(1)).cast("long").as("n"))
    val prefix = tk.join(dfRel, Seq("tok")).join(n, Seq("id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("tok")))
        .cast("long"))
      .where(col("rn") <=
        col("n") - expr(s"($tPpm * n + 999999) div 1000000") + 1L)
      .select(col("id"), col("tok"), col("n"))
    val x = prefix.select(col("id").as("a"), col("tok"),
      col("n").as("n_a"))
    val y = prefix.select(col("id").as("b"), col("tok"),
      col("n").as("n_b"))
    val cand = x.join(y, Seq("tok"))
      .where(col("a") < col("b") &&
        col("n_b") * 1000000L >= col("n_a") * tPpm &&
        col("n_a") * 1000000L >= col("n_b") * tPpm)
      .select(col("a"), col("b"), col("n_a"), col("n_b"))
      .distinct()
    val ov = cand
      .join(tk.select(col("id").as("a"), col("tok")), Seq("a"))
      .join(tk.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy(col("a"), col("b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).cast("long").as("overlap"))
    val nQual = ov.where(col("overlap") * 1000000L >=
      (col("n_a") + col("n_b") - col("overlap")) * tPpm)
    cand.agg(count(lit(1)).cast("long").as("n_candidates"))
      .crossJoin(nQual.agg(count(lit(1)).cast("long")
        .as("n_qualifying")))
      .crossJoin(n.agg(count(lit(1)).cast("long").as("n_docs")))
      .select(col("n_docs"), col("n_candidates"), col("n_qualifying"),
        expr("n_docs * (n_docs - 1) div 2").as("brute_pairs"),
        expr("""if(n_docs < 2, CAST(0 AS BIGINT),
               |  (n_candidates * 1000000)
               |    div (n_docs * (n_docs - 1) div 2))""".stripMargin)
          .as("candidate_ppm"))
  }
}
