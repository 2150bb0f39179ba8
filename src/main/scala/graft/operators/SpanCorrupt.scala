package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span-corruption pair assembly (Raffel et al., "Exploring
  * the Limits of Transfer Learning with a Unified Text-to-Text
  * Transformer", JMLR 2020 §3.1.4): the denoising objective's data
  * prep — mask token spans out of each document, replace each span
  * with a numbered sentinel in the INPUT, and emit the masked spans
  * behind their sentinels as the TARGET:
  *
  *   tokens:  the quick brown fox jumps over the dog
  *   input:   the <extra_id_0> fox jumps <extra_id_1> dog
  *   target:  <extra_id_0> quick brown <extra_id_1> over the <extra_id_2>
  *
  * The noise schedule here is the iid-Bernoulli special case of the
  * family (each token masked independently with probability
  * `noisePpm/1e6`; runs of masked tokens merge into one span, exactly
  * T5's span merging), drawn DETERMINISTICALLY from the engine-wide
  * md5-derived hash of `(doc_id, position, salt)` — the
  * [[Dsir.dsirResample]] reproducible-sampling idiom: the same salt
  * regenerates the same corruption forever, a different salt redraws
  * it, and the oracle replays the draw bit-for-bit. A trailing
  * `<extra_id_{n_spans}>` closes the target (T5's final sentinel);
  * a document with no masked token keeps its full text as input and
  * gets the bare `<extra_id_0>` target. Documents with no words emit
  * nothing.
  *
  * Distribution shape (the 100 TB contract): one token explode, ONE
  * per-document window pass (lag + running span count — partitioned
  * by doc, thousands of tiny groups, never global), one groupBy(doc)
  * whose per-doc state is the document's own token list — linear in
  * corpus size, no joins, no corpus-sized windows.
  *
  * Reference scope: the reference has no text surface at all
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:44-47);
  * training-data assembly belongs to the declared extension surface
  * (SURVEY.md §2.11).
  *
  * Output: `(doc_id, n_tokens, n_masked, n_spans, input_text,
  * target_text)`.
  */
object SpanCorrupt {

  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      noisePpm: Long, salt: Long = 0L): DataFrame = {
    require(noisePpm >= 0L && noisePpm <= 1000000L,
      s"need 0 <= noisePpm <= 1e6, got $noisePpm")
    val tok = docs
      .select(col(idCol).cast("long").as("doc_id"),
        expr(Dedup.wordsExpr(textCol)).as("__w"))
      .where(size(col("__w")) >= 1)
      .select(col("doc_id"), posexplode(col("__w")).as(Seq("pos", "tok")))
      .withColumn("m", expr(
        s"""${Dedup.h60raw(s"concat(CAST(doc_id AS STRING), ':', " +
          s"CAST(pos AS STRING), ':', '$salt')")} % 1000000""")
        < noisePpm)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = tok
      .withColumn("span_start",
        col("m") && !lag(col("m"), 1, false).over(w))
      .withColumn("span_id",
        sum(when(col("span_start"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - 1L)
      .withColumn("piece_in",
        when(!col("m"), col("tok"))
          .when(col("span_start"),
            concat(lit("<extra_id_"), col("span_id").cast("string"),
              lit(">"))))
      .withColumn("piece_tgt",
        when(col("m") && col("span_start"),
          concat(lit("<extra_id_"), col("span_id").cast("string"),
            lit("> "), col("tok")))
          .when(col("m"), col("tok")))
    spans.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).cast("long").as("n_masked"),
        sum(when(col("span_start"), 1L).otherwise(0L)).cast("long")
          .as("n_spans"),
        concat_ws(" ", expr(
          """transform(sort_array(collect_list(
            |  if(piece_in IS NOT NULL, struct(pos, piece_in), NULL))),
            |  s -> s.piece_in)""".stripMargin)).as("__in"),
        concat_ws(" ", expr(
          """transform(sort_array(collect_list(
            |  if(piece_tgt IS NOT NULL, struct(pos, piece_tgt), NULL))),
            |  s -> s.piece_tgt)""".stripMargin)).as("__tgt"))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        col("n_spans"),
        col("__in").as("input_text"),
        when(col("n_spans") === 0L, lit("<extra_id_0>"))
          .otherwise(concat(col("__tgt"), lit(" <extra_id_"),
            col("n_spans").cast("string"), lit(">")))
          .as("target_text"))
  }
}
