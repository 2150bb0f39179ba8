package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer trainer — the SentencePiece algorithm under a
  * HARD (Viterbi) E-step: seed a substring vocabulary with occurrence
  * counts, then iterate {score pieces as add-1-smoothed negative log
  * probs → Viterbi-segment every word type under those scores → count
  * piece usage → keep singles + the top-budget multi-char pieces}.
  * Where [[MaxMatch]] trains the WordPiece way (greedy longest-match,
  * pure integer counts), this is the unigram-LM objective proper:
  * each round's segmentation MINIMIZES the word's total -log p.
  *
  * Exactness: scores are integer micro-nats, `floor(1e6 · ln((total +
  * |V|)/(cnt + 1)))` — the one `ln()` is fed a single division of two
  * exact integers, the same discipline as
  * [[LanguageModel.perplexity]], so the whole trajectory hash-matches
  * DuckDB cell for cell.
  *
  * The Viterbi DP needs the argmin SEGMENTATION (the M-step counts
  * pieces), not just the score. Instead of a backtracking pass, each
  * DP state packs `(score, path)` into ONE comparable integer:
  * `key = score_sum · 2^26 + path`, where `path` is a sentinel-led
  * base-4 code of the piece LENGTHS (append: `path·4 + (len-1)`).
  * With words capped at [[WordCap]] code points, `path < 4·4^12 =
  * 2^26`, so the low bits never spill into the score and `min(key)`
  * is exactly lexicographic (min score, then min path — a total
  * order, engine-independent). Σscore ≤ 12·ln-range ≈ 5e8 ≪ 2^37
  * keeps the product inside a BIGINT at ANY corpus size — the log is
  * what makes the packing scale-safe. The winning segmentation then
  * DECODES from the key by popping base-4 digits (`len = path%4 + 1`
  * is the LAST piece, `path div 4` recurses) — pure expressions, no
  * joins against the DP frontiers.
  *
  * Distribution shape (the 100 TB contract): identical to
  * [[MaxMatch]] — every per-round relation is word-TYPE-sized; the
  * corpus is scanned once for frequencies and once (as a join) at
  * encode; DP steps are ≤[[MaxMatch.MaxPieceLen]] equi-joins per
  * cursor against the vocabulary; per-step results localCheckpoint
  * (each is read by up to MaxPieceLen later steps, and lineage must
  * not compound across rounds). Production shape: [[train]] once,
  * persist the (piece, cnt) vocabulary as an artifact, then
  * [[encodeWith]] serves every later corpus WITHOUT retraining.
  */
object UnigramLM {

  /** Longest piece considered (code points) — shared with MaxMatch. */
  val MaxPieceLen: Int = MaxMatch.MaxPieceLen

  /** Multi-character vocabulary budget kept per EM round. */
  val VocabBudget: Int = MaxMatch.VocabBudget

  /** Words longer than this are dropped (both engines, both outputs):
    * the base-4 path code of a 12-piece segmentation is what bounds
    * the packed key. Real-corpus words beyond 12 code points are
    * URLs/boilerplate — the same rationale as MaxMatch's 16. */
  val WordCap = 12

  /** Path field width: sentinel-led base-4 length code < 4^13 = 2^26. */
  val PathShift: Long = 1L << 26

  /** Trained vocabulary after `rounds` EM rounds:
    * `(piece, piece_len, cnt)`, cnt = last-round Viterbi usage. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 2): DataFrame =
    core(docs, idCol, textCol, rounds)._1

  /** Per-document counts under the trained model: one more Viterbi
    * pass with the final scores —
    * `(doc_id, n_words, n_tokens, nll_micro)` where nll_micro is the
    * document's total segmentation cost in micro-nats. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 2): DataFrame =
    core(docs, idCol, textCol, rounds)._2()

  /** Encode under an ALREADY-TRAINED vocabulary `(piece, cnt)` — the
    * artifact-served path: no seeding, no EM rounds, just the one
    * Viterbi pass + the per-document join. The vocabulary must cover
    * every single character of the corpus (a trained one covers its
    * own training corpus by construction; unseen characters drop the
    * word, inner-join semantics — same contract as
    * [[MaxMatch.viterbiTokens]]). */
  def encodeWith(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val (words, wf, maxSteps) = prep(docs, idCol, textCol)
    encodeFrom(words, wf, maxSteps,
      vocab.select(col("piece"), col("cnt")))
  }

  private def prep(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, Int) = {
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(expr(Dedup.wordsExpr(textCol))).as("word"))
    val wf = words.where(length(col("word")) <= WordCap)
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint(true)
    val maxRow = wf.agg(max(length(col("word")))).head
    (words, wf, if (maxRow.isNullAt(0)) 0 else maxRow.getInt(0))
  }

  /** Add-1-smoothed micro-nat scores for a (piece, cnt) vocabulary:
    * floor(1e6 · ln((total + |V|)/(cnt + 1))). */
  private def scores(v: DataFrame): DataFrame = {
    val tot = v.agg(sum(col("cnt")).cast("long").as("tot"),
      count(lit(1)).cast("long").as("vsz"))
    v.crossJoin(tot).select(col("piece"), expr(
      """cast(floor(1000000.0 * ln(
        |  cast(tot + vsz as double) / cast(cnt + 1 as double))) as long)"""
        .stripMargin).as("s"))
      .localCheckpoint(true) // read by every DP step
  }

  /** One Viterbi pass of every word type under scored pieces:
    * per word the best packed key (score·2^26 + sentinel-led path). */
  private def best(wf: DataFrame, maxSteps: Int, sc: DataFrame): DataFrame = {
    val b0 = wf.select(col("word"), lit(1L).as("key")) // score 0, path 1
    val bs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (p <- 1 to maxSteps) {
      val cands = (1 to math.min(MaxPieceLen, p)).map { l =>
        val prev = if (p - l == 0) b0 else bs(p - l - 1)
        prev.where(length(col("word")) >= p)
          .withColumn("piece", expr(s"substring(word, ${p - l + 1}, $l)"))
          .join(sc, Seq("piece"))
          // split the packed key, extend both fields, repack
          .select(col("word"), expr(
            s"""(key div $PathShift + s) * $PathShift +
               |((key % $PathShift) * 4 + ${l - 1})""".stripMargin)
            .as("key"))
      }.reduce(_ unionByName _)
      bs += cands.groupBy(col("word")).agg(min(col("key")).as("key"))
        .localCheckpoint(true)
    }
    if (bs.isEmpty) b0.where(lit(false))
    else bs.zipWithIndex.map { case (b, i) =>
      b.where(length(col("word")) === i + 1)
    }.reduce(_ unionByName _)
  }

  /** Decode winning segmentations: `(word, piece)` rows with
    * multiplicity, by popping base-4 length digits off the path —
    * WordCap tiny expression steps, no joins. */
  private def decode(bestKeys: DataFrame, maxSteps: Int): DataFrame = {
    var state = bestKeys.select(col("word"),
      length(col("word")).cast("long").as("pend"),
      (col("key") % PathShift).as("path"))
    var used: DataFrame = null
    for (_ <- 1 to maxSteps) {
      val step = state.where(col("path") > 1L)
        .withColumn("l", expr("path % 4 + 1"))
        .localCheckpoint(true) // read twice: emit + next state
      val u = step.select(col("word"),
        expr("substring(word, cast(pend - l + 1 as int), cast(l as int))")
          .as("piece"))
      used = if (used == null) u else used.unionByName(u)
      state = step.select(col("word"), (col("pend") - col("l")).as("pend"),
        expr("path div 4").as("path"))
    }
    if (used == null) bestKeys.select(col("word"),
      col("word").as("piece")).where(lit(false))
    else used
  }

  /** The apply side: one Viterbi pass under `vocab` (piece, cnt) +
    * the per-document rollup. */
  private def encodeFrom(words: DataFrame, wf: DataFrame, maxSteps: Int,
      vocab: DataFrame): DataFrame = {
    val keys = best(wf, maxSteps, scores(vocab))
      .localCheckpoint(true) // read twice: decode + nll join
    val perWord = keys
      .join(decode(keys, maxSteps).groupBy("word")
        .agg(count(lit(1)).cast("long").as("n")), Seq("word"))
      .select(col("word"), col("n"),
        expr(s"key div $PathShift").as("nll"))
    words.join(perWord, Seq("word"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).cast("long").as("n_words"),
        sum(col("n")).cast("long").as("n_tokens"),
        sum(col("nll")).cast("long").as("nll_micro"))
  }

  private def core(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): (DataFrame, () => DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val (words, wf, maxSteps) = prep(docs, idCol, textCol)

    // seed: every substring occurrence (with multiplicity) weighted by
    // word frequency — SentencePiece seeds probabilities from substring
    // counts, not the uniform vector
    var cnt = wf.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, $MaxPieceLen),
           |  l -> if(length(word) < l, array(),
           |    transform(sequence(1, length(word) - l + 1),
           |      p -> substring(word, p, l)))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).cast("long").as("cnt"))
      .localCheckpoint(true)

    var usage: DataFrame = null
    for (_ <- 1 to rounds) {
      usage = decode(best(wf, maxSteps, scores(cnt)), maxSteps)
        .join(wf, Seq("word"))
        .groupBy("piece").agg(sum(col("freq")).cast("long").as("cnt"))
        .localCheckpoint(true)
      // singles ∪ top-budget multi by (cnt DESC, piece): the same
      // engine-independent total order as MaxMatch's prune
      cnt = cnt.select(col("piece")).where(length(col("piece")) === 1)
        .unionByName(usage.where(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece")).limit(VocabBudget)
          .select("piece"))
        .join(usage, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .localCheckpoint(true)
    }

    val trainOut = cnt.select(col("piece"),
      length(col("piece")).cast("long").as("piece_len"), col("cnt"))

    val encodeOut = () => encodeFrom(words, wf, maxSteps, cnt)
    (trainOut, encodeOut)
  }
}
