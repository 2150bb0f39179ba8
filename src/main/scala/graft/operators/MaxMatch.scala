package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MaxMatch (WordPiece-style) tokenizer: greedy longest-match
  * segmentation — the WordPiece INFERENCE rule (pick the longest vocab
  * piece at the cursor, advance, repeat) — trained by a
  * vocabulary-budget prune loop, the shape of SentencePiece's shrink
  * step under hard segmentation:
  *
  *  - seed vocabulary: every substring of every word TYPE up to
  *    [[MaxPieceLen]] code points;
  *  - round r: segment each word type by greedy longest-match under the
  *    current vocabulary, count piece usage weighted by word frequency,
  *    then keep all single-character pieces (coverage: segmentation can
  *    never strand) plus the top-[[VocabBudget]] multi-character pieces
  *    by (usage DESC, piece) — a deterministic total order, so the kept
  *    SET is engine-independent;
  *  - after `rounds` prune rounds, encode = one more segmentation under
  *    the final vocabulary, surfaced as a word → piece-count table
  *    (encode is a JOIN against word types, never per-document work —
  *    same discipline as [[TextAnalysis.bpeEncode]]).
  *
  * This is deliberately NOT likelihood training (real WordPiece ranks
  * merges by LM likelihood gain, SentencePiece runs EM): hard-count
  * budget pruning keeps every quantity an exact integer, which is what
  * lets the whole trajectory hash-match a DuckDB oracle cell-for-cell.
  * All string indexing is CODE POINTS in both engines (verified for the
  * multibyte corpus variant), so the tokenizer is UTF-8-clean including
  * surrogate-pair emoji.
  *
  * Distribution shape (the 100 TB contract): every per-round relation is
  * word-TYPE-sized, not corpus-sized — the corpus is scanned once for
  * word frequencies and once (as a join) at encode. A segmentation pass
  * is ONE shuffled equi-join of all ≤[[MaxPieceLen]]·len candidate
  * substrings per word type against the vocabulary (never broadcast by
  * assumption — web-scale vocabularies are large; AQE may choose to),
  * one (word) collect of the packed hit keys, and one codegen'd fold
  * replaying the greedy walk word-locally (round 12 — the former
  * join-per-cursor-step loop paid up to [[MaxWordChars]] scheduler
  * rounds per pass, the top cost on long-run CJK corpora). Words longer
  * than [[MaxWordChars]] are boilerplate/URLs, dropped identically in
  * both engines; the vocabulary is localCheckpoint'ed per round since
  * the next round's join re-reads it.
  */
object MaxMatch {

  /** Longest piece considered (code points). */
  val MaxPieceLen = 4

  /** Multi-character vocabulary budget kept per prune round. */
  val VocabBudget = 24

  /** Words longer than this are dropped (both engines, both outputs). */
  val MaxWordChars = 16

  /** Per-token weight in the packed Viterbi objective: minimizing
    * `tokens * TokWeight - sum(cnt)` is lexicographic (fewest tokens,
    * then highest piece-usage sum) as long as every segmentation's
    * cnt sum stays below 2^40 — cnt is bounded by corpus word
    * occurrences (< 2^40 up to ~10^12 words) and a word has at most
    * [[MaxWordChars]] pieces, so the packing never saturates. */
  val TokWeight: Long = 1L << 40

  /** Final vocabulary after `rounds` prune rounds:
    * `(piece, piece_len, cnt)` where cnt is the piece's last-round
    * usage (0 for never-chosen single-char pieces). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 2): DataFrame =
    core(docs, idCol, textCol, rounds)._1

  /** Per-document token counts under the trained vocabulary:
    * `(doc_id, n_words, n_tokens)` — the train→apply round trip. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 2): DataFrame =
    core(docs, idCol, textCol, rounds)._2()

  /** OPTIMAL (Viterbi) per-document token counts under the same trained
    * vocabulary: `(doc_id, n_words, n_tokens, piece_cnt_sum)`. Where
    * [[encode]] is WordPiece's greedy longest-match inference, this is
    * the unigram-LM decode (SentencePiece's inference rule) with the
    * trained usage counts as integer scores: per word, the segmentation
    * with the FEWEST pieces, ties broken by the highest total piece
    * usage — both packed into one integer key (see [[TokWeight]]), so
    * the whole decode is exact and engine-independent. Greedy can beat
    * itself into a corner (take a long piece whose remainder only
    * segments as singles); the DP never does, so per word
    * `n_tokens(viterbi) <= n_tokens(greedy)` — asserted in the spec. */
  def viterbiEncode(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 2): DataFrame =
    core(docs, idCol, textCol, rounds)._3()

  /** The apply-side outputs are THUNKS so `train` never pays for them
    * (the same pay-only-when-applied discipline as
    * [[TextAnalysis.bpeMerges]] vs `bpeEncode` — `segment` and the DP
    * materialize themselves eagerly, so building either apply plan
    * inline would run a whole discarded pass inside `train`). */
  private def core(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): (DataFrame, () => DataFrame, () => DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds): round 1's " +
      "usage counts are what the trained vocabulary and encode join read")
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(expr(Dedup.wordsExpr(textCol))).as("word"))
    val wf = words.where(length(col("word")) <= MaxWordChars)
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint(true)

    // seed: every substring of every word type, 1..MaxPieceLen cps
    // (sequence(1, n) runs DESCENDING when n < 1 — hence the if guard)
    var vocab = wf.select(explode(expr(
        s"""flatten(transform(sequence(1, $MaxPieceLen),
           |  l -> if(length(word) < l, array(),
           |    transform(sequence(1, length(word) - l + 1),
           |      p -> substring(word, p, l)))))""".stripMargin)).as("piece"))
      .distinct().localCheckpoint(true)

    /** One greedy longest-match pass of every word type under `v`:
      * rows (word, piece, freq), one per consumed piece (with
      * multiplicity — "abab" under {ab} emits TWO `ab` rows).
      *
      * Round 12 restructure: the greedy walk is WORD-LOCAL once the
      * word's vocabulary hits are known — so instead of one
      * join-and-advance Spark job per cursor step (up to
      * [[MaxWordChars]] scheduler rounds per pass, the round-11 bench's
      * top cost on the long-run CJK corpus), ALL (position, length)
      * candidates join the vocabulary ONCE, collect per word as a
      * packed hit array (≤ MaxPieceLen·len ints), and one codegen'd
      * `aggregate` fold replays the exact greedy rule (longest hit at
      * the cursor, advance, repeat; a cursor with no hit stops the
      * walk — the old inner join's drop semantics). Identical output,
      * maxSteps-fold fewer jobs; the candidates join carries ~2× the
      * rows of the old path's greedy-visited positions, a trade that
      * wins because every relation here is word-TYPE-sized. */
    def segment(v: DataFrame): DataFrame = {
      val cands = wf.select(col("word"), col("freq"),
          explode(expr(
            s"""flatten(transform(sequence(1, length(word)),
               |  p -> transform(filter(sequence(1, $MaxPieceLen),
               |         l -> p + l - 1 <= length(word)),
               |    l -> named_struct('k', (p - 1) * 8 + l,
               |      'piece', substring(word, p, l)))))""".stripMargin))
            .as("c"))
        .select(col("word"), col("freq"),
          col("c.k").as("k"), col("c.piece").as("piece"))
      val hits = cands.join(v, Seq("piece"))
        .groupBy(col("word"), col("freq"))
        .agg(collect_list(col("k")).as("h"))
      // nested longest-first probe at the cursor, generated from
      // MaxPieceLen so the constant stays in one place
      val noHit =
        "named_struct('pos', length(word), 'pieces', acc.pieces)"
      val probe = (MaxPieceLen to 1 by -1).foldRight(noHit) { (l, els) =>
        s"""if(array_contains(h, acc.pos * 8 + $l),
           |  named_struct('pos', acc.pos + $l,
           |    'pieces', array_append(acc.pieces,
           |      substring(word, acc.pos + 1, $l))),
           |  $els)""".stripMargin
      }
      hits.select(col("word"), col("freq"),
          explode(expr(
            s"""aggregate(sequence(1, length(word)),
               |  named_struct('pos', 0,
               |    'pieces', cast(array() as array<string>)),
               |  (acc, i) -> if(acc.pos >= length(word), acc, $probe),
               |  acc -> acc.pieces)""".stripMargin)).as("piece"))
        .select(col("word"), col("piece"), col("freq"))
    }

    var usage: DataFrame = null
    for (_ <- 1 to rounds) {
      usage = segment(vocab)
        .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("cnt"))
        .localCheckpoint(true)
      // coverage singles + the usage-ranked budget; (cnt DESC, piece)
      // is a total order, so limit() selects an engine-independent set
      vocab = vocab.where(length(col("piece")) === 1)
        .unionByName(usage.where(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece")).limit(VocabBudget)
          .select("piece"))
        .localCheckpoint(true)
    }

    val trainOut = vocab
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))

    val encodeOut = () => {
      val enc = segment(vocab)
        .groupBy(col("word")).agg(count(lit(1)).cast("long").as("n"))
      words.join(enc, Seq("word"))
        .groupBy(col("doc_id")).agg(
          count(lit(1)).cast("long").as("n_words"),
          sum(col("n")).cast("long").as("n_tokens"))
    }
    val viterbiOut = () => {
      val scored = trainOut.select(col("piece"), col("cnt"))
        .localCheckpoint(true) // accurate size stats for the cands join
      val pw = viterbiTokens(wf, scored, maxSteps = 0 /* unused, r14 */)
      words.join(pw, Seq("word"))
        .groupBy(col("doc_id")).agg(
          count(lit(1)).cast("long").as("n_words"),
          sum(col("n")).cast("long").as("n_tokens"),
          sum(col("s")).cast("long").as("piece_cnt_sum"))
    }
    (trainOut, encodeOut, viterbiOut)
  }

  /** Viterbi DP over word types: per word, `(word, n, s)` — the token
    * count and total piece usage of the optimal segmentation under
    * `scored` `(piece, cnt)`. `scored` MUST cover every single
    * character of every `wf` word (the trained vocabulary does by
    * construction; a hand-built one that doesn't silently drops the
    * word, inner-join semantics).
    *
    * Shape (r14 optimization-round restructure — the round-12 greedy
    * precedent applied to the DP): ALL ≤[[MaxPieceLen]]·len
    * (position, length) candidates per word type join the vocabulary
    * ONCE, collect per word as a packed occurrence array, and the
    * word-local [[graft.functions.AdditiveViterbi]] kernel replays the
    * exact min-sum recurrence (`prev + TokWeight − cnt`, seeded at 0)
    * per row — formerly `maxSteps` SEQUENTIAL checkpointed join+min
    * jobs. Identical keys (min over integer sums is order-independent,
    * so the collect order is immaterial); a word the vocabulary cannot
    * cover returns NULL and is filtered, the old final frontier's drop
    * semantics. `maxSteps` is retained for signature stability; the
    * kernel is bounded by each word's own length (wf is pre-filtered
    * to [[MaxWordChars]], and callers pass maxSteps = the longest wf
    * word, so the covered word set is unchanged). */
  private[operators] def viterbiTokens(wf: DataFrame, scored: DataFrame,
      maxSteps: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cands = wf.select(col("word"), explode(expr(
        s"""flatten(transform(sequence(1, $MaxPieceLen),
           |  l -> if(length(word) < l, array(),
           |    transform(sequence(0, length(word) - l),
           |      i -> named_struct('i', i, 'l', l)))))""".stripMargin))
        .as("x"))
      .select(col("word"), col("x.i").as("i"), col("x.l").as("l"))
      .withColumn("piece", expr(
        "substring(word, cast(i + 1 as int), cast(l as int))"))
    cands.join(scored, Seq("piece"))
      .select(col("word"), col("i"), col("l"),
        (lit(TokWeight) - col("cnt")).as("s"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("l"), col("s"))).as("occs"))
      .select(col("word"), ColumnBridge.column(
        graft.functions.AdditiveViterbi(
          ColumnBridge.expression(length(col("word"))),
          ColumnBridge.expression(col("occs")))).as("key"))
      .where(col("key").isNotNull)
      .withColumn("n", expr(s"(key + ${TokWeight - 1}) div $TokWeight"))
      .select(col("word"), col("n"),
        (col("n") * lit(TokWeight) - col("key")).as("s"))
  }
}
