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
  * encode; a Viterbi pass is ONE equi-join of all ≤MaxPieceLen·len
  * candidate occurrences per word type against the scored vocabulary,
  * one per-word collect (≤4·[[WordCap]] packed occurrences), and the
  * word-local [[graft.functions.UnigramViterbi]] DP replay (r14 — the
  * [[MaxMatch]] round-12 greedy-walk restructure applied to the DP;
  * formerly maxSteps sequential checkpointed join steps plus a decode
  * loop of the same depth). Production shape: [[train]] once,
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
    val (words, wf) = prep(docs, idCol, textCol)
    encodeFrom(words, wf, vocab.select(col("piece"), col("cnt")))
  }

  private def prep(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(expr(Dedup.wordsExpr(textCol))).as("word"))
    val wf = words.where(length(col("word")) <= WordCap)
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint(true)
    (words, wf)
  }

  /** All (start, length) piece occurrences of every word type (starts
    * 0-based, code points) — the lattice candidate relation,
    * word-TYPE-sized × ≤[[MaxPieceLen]]·[[WordCap]] rows. */
  private def occ(wf: DataFrame): DataFrame =
    wf.select(col("word"), explode(expr(
        s"""flatten(transform(sequence(1, $MaxPieceLen),
           |  l -> if(length(word) < l, array(),
           |    transform(sequence(0, length(word) - l),
           |      i -> named_struct('i', i, 'l', l)))))""".stripMargin))
        .as("x"))
      .select(col("word"), col("x.i").as("i"), col("x.l").as("l"))
      .withColumn("piece", expr(
        "substring(word, cast(i + 1 as int), cast(l as int))"))

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

  /** One Viterbi pass of every word type under scored pieces `sc`
    * (piece, s): `(word, key, pieces)` — best packed key
    * (score·2^26 + sentinel-led path) plus the winning segmentation's
    * piece multiset, already decoded.
    *
    * r14 optimization-round restructure (guide §1.2; the
    * [[MaxMatch]] round-12 greedy-walk precedent): the former
    * join-per-DP-position loop paid `maxSteps` (≤[[WordCap]])
    * sequential jobs — each a vocab join + per-word min + eager
    * localCheckpoint — plus another `maxSteps` for the path decode,
    * even though each word's lattice is word-local once its vocabulary
    * hits are known. Now ALL (start, length) candidates join the
    * scored vocabulary ONCE, collect per word (≤4·[[WordCap]]
    * packed occurrences), and [[graft.functions.UnigramViterbi]]
    * replays the exact packed-key recurrence and the exact base-4 path
    * pop per row. Identical keys and piece multisets (min() and the
    * decode are order-independent, so `collect_list`'s
    * nondeterministic order is immaterial); a word with no
    * full-coverage segmentation returns NULL and is filtered — the old
    * final frontier's inner-join drop semantics, unchanged. */
  private def viterbiAll(wf: DataFrame, sc: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    occ(wf).join(sc, Seq("piece"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("l"), col("s"))).as("occs"))
      .select(col("word"), ColumnBridge.column(
        graft.functions.UnigramViterbi(
          ColumnBridge.expression(col("word")),
          ColumnBridge.expression(col("occs")))).as("r"))
      .where(col("r").isNotNull)
      .select(col("word"), col("r.key").as("key"),
        col("r.pieces").as("pieces"))
  }

  /** The apply side: one Viterbi pass under `vocab` (piece, cnt) +
    * the per-document rollup. */
  private def encodeFrom(words: DataFrame, wf: DataFrame,
      vocab: DataFrame): DataFrame = {
    val perWord = viterbiAll(wf, scores(vocab))
      .select(col("word"), size(col("pieces")).cast("long").as("n"),
        expr(s"key div $PathShift").as("nll"))
    words.join(perWord, Seq("word"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).cast("long").as("n_words"),
        sum(col("n")).cast("long").as("n_tokens"),
        sum(col("nll")).cast("long").as("nll_micro"))
  }

  // ------------------------------------------------------------------
  // Soft-EM (SentencePiece proper): expected counts by forward–backward
  // ------------------------------------------------------------------

  /** Fixed-point scale for lattice probabilities: 1e9 (nano units). */
  val Scale: Long = 1000000000L

  /** Soft-EM unigram-LM trainer — the published SentencePiece E-step:
    * EXPECTED piece counts from the full segmentation lattice
    * (forward–backward), not just the Viterbi path. Where [[train]]
    * counts only each word's single best segmentation, this weights
    * every occurrence `(i, l)` of a piece by its posterior
    * `α(i)·p(piece)·β(i+l) / Z` — ambiguity mass is SHARED between
    * competing pieces instead of winner-take-all, which is what lets
    * a genuinely frequent piece survive rounds where Viterbi
    * tie-breaking starves it.
    *
    * Exact-integer schedule — NO transcendentals anywhere (the hard
    * trainer needs one `ln` per score; this one doesn't):
    *  - counts live in ppm of their own total, renormalized by
    *    DIVISION only (`cnt div greatest(tot div 1e6, 1)` — the
    *    Bradley–Terry discipline), so every magnitude below is
    *    corpus-size-independent;
    *  - piece probabilities are nano-unit fixed point:
    *    `p = (cnt+1) · 1e9 div (tot + |V|)` (add-1-per-piece
    *    smoothing on the ppm scale; `(cnt+1)·1e9 ≤ ~1e15`);
    *  - lattice: `α̃(0) = 1e9`, `α̃(j) = Σ_l (α̃(j−l)·p) div 1e9`
    *    (flooring per TERM, documented and mirrored by the oracle);
    *    `β̃` symmetric from the word's end; every product ≤ 1e18;
    *  - posterior in nano units:
    *    `((α̃(i)·p div 1e9)·β̃ div 1e9)·1e9 div max(α̃(L),1)`;
    *  - M-step mass: `Σ freq_ppm · post` with `freq_ppm` the word
    *    type's ppm share of the corpus (div-only) — the full sum is
    *    ≤ 1e6·48·1e9 ≈ 5e16 at ANY corpus size.
    * All divisions are floored divisions of non-negative integers,
    * identical in Spark (`div`) and DuckDB (`//`), so the trajectory
    * hash-matches cell for cell.
    *
    * Words below 1 ppm of the corpus floor to `freq_ppm = 0` and stop
    * contributing expected mass — the documented at-scale behavior
    * (identical to Bradley–Terry's sub-ppm pair floor); at test SFs
    * `tot div 1e6 = 0` and the guard keeps every word.
    *
    * Distribution shape: identical to [[train]] — every per-step
    * relation is word-TYPE-sized; forward/backward are ≤[[WordCap]]
    * rounds of ≤[[MaxPieceLen]] equi-joins against the nano-prob
    * vocabulary with per-step localCheckpoint (the measured winner
    * for these relation sizes).
    *
    * Output after `rounds` rounds: `(piece, piece_len, cnt_ppm)`. */
  def trainSoft(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val (_, wf) = prep(docs, idCol, textCol)

    val tf = wf.agg(sum(col("freq")).cast("long").as("tf"))
    val wfp = wf.crossJoin(tf)
      .select(col("word"),
        expr("freq div greatest(tf div 1000000L, 1L)").as("freq_ppm"))
      .localCheckpoint(true)

    // seed: substring-occurrence counts (the hard trainer's seed),
    // renormalized to ppm by division only
    val seed = wf.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, $MaxPieceLen),
           |  l -> if(length(word) < l, array(),
           |    transform(sequence(1, length(word) - l + 1),
           |      p -> substring(word, p, l)))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).cast("long").as("cnt"))
    val seedTot = seed.agg(sum(col("cnt")).cast("long").as("tr"))
    var cnt = seed.crossJoin(seedTot)
      .select(col("piece"),
        expr("cnt div greatest(tr div 1000000L, 1L)").as("cnt"))
      .localCheckpoint(true)

    for (_ <- 1 to rounds) {
      val pfx = pFixed(cnt)
      val raw = expectedCounts(wf, wfp, pfx)
        .localCheckpoint(true) // read by prune (top-k) + the left join
      val totRaw = raw.agg(sum(col("cnt")).cast("long").as("tr"))
      cnt = cnt.select(col("piece")).where(length(col("piece")) === 1)
        .unionByName(raw.where(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece")).limit(VocabBudget)
          .select("piece"))
        .join(raw, Seq("piece"), "left")
        .crossJoin(totRaw)
        .select(col("piece"), expr(
          "coalesce(cnt, 0L) div greatest(tr div 1000000L, 1L)").as("cnt"))
        .localCheckpoint(true)
    }
    cnt.select(col("piece"),
      length(col("piece")).cast("long").as("piece_len"),
      col("cnt").as("cnt_ppm"))
  }

  /** Nano-unit fixed-point piece probabilities for a (piece, cnt)
    * vocabulary: `(cnt+1) · 1e9 div (tot + |V|)`. */
  private def pFixed(v: DataFrame): DataFrame = {
    val tot = v.agg(sum(col("cnt")).cast("long").as("tot"),
      count(lit(1)).cast("long").as("vsz"))
    v.crossJoin(tot).select(col("piece"), expr(
        s"(cnt + 1L) * ${Scale}L div greatest(tot + vsz, 1L)").as("p"))
      .localCheckpoint(true) // read by every lattice step
  }

  /** Forward lattice per word type: `buf(j) = (word, a)` with
    * `a = α̃(j)` in nano units; `buf(0)` is the 1e9 base. */
  private[operators] def forwardFixed(wf: DataFrame, maxSteps: Int,
      pfx: DataFrame): IndexedSeq[DataFrame] = {
    val b0 = wf.select(col("word"), lit(Scale).as("a"))
    val buf = scala.collection.mutable.ArrayBuffer(b0)
    for (j <- 1 to maxSteps) {
      val terms = (1 to math.min(MaxPieceLen, j)).map { l =>
        buf(j - l).where(length(col("word")) >= j)
          .withColumn("piece", expr(s"substring(word, ${j - l + 1}, $l)"))
          .join(broadcast(pfx), Seq("piece"))
          .select(col("word"), expr(s"a * p div ${Scale}L").as("t"))
      }.reduce(_ unionByName _)
      buf += terms.groupBy("word").agg(sum(col("t")).cast("long").as("a"))
        .localCheckpoint(true)
    }
    buf.toIndexedSeq
  }

  /** Backward lattice, indexed by REMAINING characters `m` (so words
    * of different lengths share steps): `buf(m) = (word, b)`. */
  private[operators] def backwardFixed(wf: DataFrame, maxSteps: Int,
      pfx: DataFrame): IndexedSeq[DataFrame] = {
    val b0 = wf.select(col("word"), lit(Scale).as("b"))
    val buf = scala.collection.mutable.ArrayBuffer(b0)
    for (m <- 1 to maxSteps) {
      val terms = (1 to math.min(MaxPieceLen, m)).map { l =>
        buf(m - l).where(length(col("word")) >= m)
          .withColumn("piece",
            expr(s"substring(word, length(word) - $m + 1, $l)"))
          .join(broadcast(pfx), Seq("piece"))
          .select(col("word"), expr(s"p * b div ${Scale}L").as("t"))
      }.reduce(_ unionByName _)
      buf += terms.groupBy("word").agg(sum(col("t")).cast("long").as("b"))
        .localCheckpoint(true)
    }
    buf.toIndexedSeq
  }

  /** Marginal word likelihood under a (piece, cnt) vocabulary:
    * `(word, z)` with `z = α̃(length)` in nano units — `z/1e9` is the
    * word's total probability mass over ALL segmentations (what the
    * soft objective maximizes; the spec compares trainers on it). */
  private[operators] def marginalFixed(wf: DataFrame, maxSteps: Int,
      vocab: DataFrame): DataFrame = {
    val fw = forwardFixed(wf, maxSteps, pFixed(vocab))
    (1 to maxSteps).map { j =>
      fw(j).where(length(col("word")) === j)
        .select(col("word"), col("a").as("z"))
    }.reduceOption(_ unionByName _)
      .getOrElse(wf.select(col("word"), lit(0L).as("z")).where(lit(false)))
  }

  /** E-step: expected piece counts `(piece, cnt)` in
    * freq_ppm·nano-posterior units.
    *
    * r14 optimization-round restructure (guide §1.2, the [[viterbiAll]]
    * rationale): the forward AND backward lattices used to run as
    * 2·maxSteps sequential checkpointed join+agg jobs, then four more
    * joins reattached α/β/z to the occurrence rows. Now the occurrence
    * relation joins the nano-prob vocabulary ONCE, collects per word,
    * and [[graft.functions.UnigramPosteriors]] replays the exact
    * per-TERM-floored fixed-point recurrences word-locally, emitting
    * (piece, post) pairs with the identical inner-join drop semantics
    * (unreachable α/β frontier ⇒ no row; no z ⇒ word gone). */
  private def expectedCounts(wf: DataFrame, wfp: DataFrame,
      pfx: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    occ(wf).join(broadcast(pfx), Seq("piece"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("l"), col("p").as("s")))
        .as("occs"))
      .select(col("word"), ColumnBridge.column(
        graft.functions.UnigramPosteriors(
          ColumnBridge.expression(col("word")),
          ColumnBridge.expression(col("occs")))).as("r"))
      .where(col("r").isNotNull)
      .select(col("word"), explode(col("r.posts")).as("pp"))
      .select(col("word"), col("pp.piece").as("piece"),
        col("pp.post").as("post"))
      .join(wfp, Seq("word"))
      .groupBy("piece")
      .agg(sum(expr("freq_ppm * post")).cast("long").as("cnt"))
  }

  private def core(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): (DataFrame, () => DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val (words, wf) = prep(docs, idCol, textCol)

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
      usage = viterbiAll(wf, scores(cnt))
        .select(col("word"), explode(col("pieces")).as("piece"))
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

    val encodeOut = () => encodeFrom(words, wf, cnt)
    (trainOut, encodeOut)
  }
}
