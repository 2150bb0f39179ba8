package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (SURVEY.md §2.11): language ID, quality scoring, token counting,
  * document fingerprinting.
  *
  * All four are stateless per-row column programs — no shuffle, perfectly
  * parallel, exactly what a 100 TB corpus scan wants. Each has a DuckDB
  * oracle (registered in [[graft.queries.Extensions]]) because every
  * computation here is integer/rational arithmetic over tokens with a
  * strict left-fold order.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram-free language-ID
    * heuristic: score(lang) = number of tokens in that language's list
    * (with multiplicity); prediction = alphabetically-first argmax. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "不", "我", "有"))

  private def arrayLit(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("array(", ", ", ")")

  /** doc → per-language stopword-hit scores + predicted language.
    * Tie-break: first language in alphabetical order with the max score
    * (expressed as a strict CASE chain so the oracle matches exactly).
    * `keep` carries extra input columns through (lets a pipeline filter
    * on pred_lang WITHOUT a rejoin on doc_id — see CorpusClean). */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val withScores = stopwords.foldLeft(
      docs.select(col(idCol).as("doc_id") +: keep.map(col) :+
        expr(Dedup.wordsExpr(textCol)).as("words"): _*)) {
      case (df, (lang, sw)) =>
        df.withColumn(s"score_$lang",
          expr(s"size(filter(words, w -> array_contains(${arrayLit(sw)}, w)))")
            .cast("long"))
    }
    val langs = stopwords.map(_._1)
    val pred = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      val gtPrior = langs.filter(_ < l).map(o => s"score_$l > score_$o")
      val cond = (Seq(geAll) ++ gtPrior).mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("CASE ", " ", " END")
    withScores.withColumn("pred_lang", expr(pred))
      .select(col("doc_id") +: (keep.map(col) ++
        langs.map(l => col(s"score_$l"))) :+ col("pred_lang"): _*)
  }

  /** Tiny per-language character-trigram profiles (top function-word
    * trigrams incl. boundary spaces) for the n-gram language-ID variant.
    * Real systems learn these from corpora; the mechanics are identical. */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ie ", "ein", "ich", "nd ", "che", "sch", "und"),
    "en" -> Seq("the", "he ", "ing", " th", "and", "ion", " of", "ed "),
    "es" -> Seq(" de", "os ", "ión", "ent", "la ", "ue ", "as ", "que"),
    "fr" -> Seq("es ", " de", "le ", "ent", "ion", "la ", " le", "une"))

  /** N-gram language ID: slide a 3-char window over the lowercased text,
    * score each language by profile-trigram hits (with multiplicity),
    * predict the alphabetically-first argmax. Same shape as [[languageId]]
    * but character-level — robust to languages without word separators. */
  def languageIdNgram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // native kernel: lowercases once and slides in one loop; the SQL
    // formulation re-evaluates lower(text) per gram and per language
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val withScores = trigramProfiles.foldLeft(
      docs.select(col(idCol).as("doc_id"), col(textCol))
        .where(expr(s"length($textCol) >= 3"))) {
      case (df, (lang, tg)) =>
        df.withColumn(s"tg_$lang",
          expr(s"trigram_hits($textCol, ${arrayLit(tg)})"))
    }
    val langs = trigramProfiles.map(_._1)
    val pred = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"tg_$l >= tg_$o")
      val gtPrior = langs.filter(_ < l).map(o => s"tg_$l > tg_$o")
      s"WHEN ${(geAll ++ gtPrior).mkString(" AND ")} THEN '$l'"
    }.mkString("CASE ", " ", " END")
    withScores.withColumn("pred_lang", expr(pred)).drop(textCol)
  }

  /** Heuristic quality features + a composite score:
    * n_tokens, type/token ratio, mean token length, stopword ratio,
    * alpha-char ratio. Score weights are arbitrary but fixed; every term
    * is a ratio of exact integers so the double arithmetic is
    * cross-engine identical. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame =
    docs
      .select(col(idCol).as("doc_id") +: keep.map(col) :+
        col(textCol).as("text") :+
        expr(Dedup.wordsExpr(textCol)).as("words"): _*)
      .where(expr("size(words) >= 1"))
      .select((col("doc_id") +: keep.map(col)) ++ Seq(
        expr("size(words)").cast("long").as("n_tokens"),
        expr("round(size(array_distinct(words)) / CAST(size(words) AS DOUBLE), 4)")
          .as("ttr"),
        expr("""round(aggregate(words, 0, (acc, w) -> acc + length(w))
               |      / CAST(size(words) AS DOUBLE), 4)""".stripMargin)
          .as("mean_tok_len"),
        expr(s"""round(size(filter(words, w -> array_contains(
                |  ${arrayLit(stopwords.toMap.apply("en"))}, w)))
                |  / CAST(size(words) AS DOUBLE), 4)""".stripMargin)
          .as("stop_ratio"),
        expr("""round(length(regexp_replace(text, '[^a-zA-Z]', ''))
               |      / CAST(length(text) AS DOUBLE), 4)""".stripMargin)
          .as("alpha_ratio")): _*)
      // Integer-exact composite: each ratio is already rounded to 4 dp, so
      // round(r*1e4) recovers its exact integer numerator; 3/3/4-weighting
      // in integers avoids the half-ulp double boundary that a
      // `round(0.3*a + 0.3*b + 0.4*c, 4)` formulation hits (observed
      // cross-engine flip at sf0.1: 0.48415 rounding both ways).
      .withColumn("quality",
        expr("""CAST(round(ttr * 10000) * 3 + round(stop_ratio * 10000) * 3
               |     + round(alpha_ratio * 10000) * 4 AS BIGINT)""".stripMargin))

  /** Adaptive quality gate: drop (approximately) the bottom `dropFrac`
    * of documents PER GROUP (e.g. per language) by composite quality —
    * a fixed global threshold over- or under-filters low-resource
    * languages; a per-group percentile adapts.
    *
    * Scale shape: NOT a `percent_rank` window partitioned by group —
    * that sorts every group in one task (a million-doc language = one
    * straggler). The quality score is a bounded integer, so the exact
    * per-group threshold comes from a (group, quality) COUNT histogram
    * (map-side combined, tiny result), a cumulative window over that
    * tiny relation, and a broadcast join back. Two corpus scans' worth
    * of work, no big sort, exact semantics: threshold = smallest q with
    * cum_count ≥ dropFrac·total; keep quality ≥ threshold (so at MOST
    * dropFrac is dropped — ties keep). */
  def adaptiveQualityFilter(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, dropFrac: Double = 0.25): DataFrame = {
    val scored = qualityScore(docs, idCol, textCol, keep = Seq(groupCol))
      .select(col("doc_id"), col(groupCol), col("quality"))
    val hist = scored.groupBy(col(groupCol), col("quality"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("quality"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val thresholds = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("tot", sum(col("c")).over(wAll))
      .where(col("cum") >= col("tot") * dropFrac)
      .groupBy(col(groupCol)).agg(min(col("quality")).as("q_thr"))
    scored
      .join(broadcast(thresholds), Seq(groupCol))
      .where(col("quality") >= col("q_thr"))
      .select(col("doc_id"), col(groupCol), col("quality"), col("q_thr"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex pieces
    * (letter runs / digit runs / single other non-space chars). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      expr(s"size(${Dedup.wordsExpr(textCol)})").cast("long").as("n_ws_tokens"),
      // group idx 0 = whole match (Spark defaults to 1, DuckDB to 0)
      expr(s"size(regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))")
        .cast("long").as("n_bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Order-sensitive rolling-hash fingerprint over token hashes:
    * fp = foldLeft(h(w_i)) of (acc*31 + h) % P — distinguishes documents
    * with equal token multisets but different order (unlike MinHash). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), expr(Dedup.wordsExpr(textCol)).as("words"))
      .where(expr("size(words) >= 1"))
      .select(col("doc_id"),
        expr(Dedup.foldDigest(s"transform(words, w -> ${Dedup.h60("w")})"))
          .as("fingerprint"))
}
