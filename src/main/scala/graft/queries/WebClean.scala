package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-extraction surface: HTML boilerplate stripping and CCNet/
  * RefinedWeb-style line-level dedup ([[graft.operators.Boilerplate]]).
  *
  * The fixture corpus is plain text, so both queries run over a
  * DERIVED HTML wrapping built by the same expression in Spark and in
  * the oracle (title from doc_id, per-source nav/footer boilerplate,
  * the text re-chunked into 12-word `<p>` paragraphs) — the same
  * derived-corpus discipline as the UTF-8 variant queries. What is
  * under test is the extraction itself: tag stripping, line order,
  * and the document-frequency boilerplate rule (nav/footer lines
  * repeat across every doc of a source; content lines don't).
  */
object WebClean extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Spark-side derived HTML, mirrored construct for construct by
    * [[htmlCte]]. The greatest() guard keeps sequence() ascending on a
    * hypothetical zero-word doc (Spark's sequence runs DESCENDING when
    * end < start — the MaxMatch seed's documented trap). */
  private val htmlSparkExpr: String =
    """concat('<html><head><title>Doc ', cast(doc_id as string),
      |  '</title></head><body><nav>Home | About | ', source, '</nav><p>',
      |  array_join(transform(
      |    sequence(0, greatest(size(words) - 1, 0) div 12),
      |    g -> array_join(slice(words, g * 12 + 1, 12), ' ')), '</p><p>'),
      |  '</p><footer>(c) ', source, ' crawl</footer></body></html>')"""
      .stripMargin

  private def htmlDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("words", expr(graft.operators.Dedup.wordsExpr("text")))
      .select(col("doc_id"), expr(htmlSparkExpr).as("html"))

  /** Oracle CTEs: the identical derived HTML, then tag-stripped
    * trimmed lines with their raw positions (`l(doc_id, pos, line)`).
    * DuckDB regexp_replace needs the explicit 'g' flag (first-match
    * default); list slices are 1-based inclusive like Spark's. */
  private val htmlCte: String =
    """w0 AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS words
      |  FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || doc_id ||
      |    '</title></head><body><nav>Home | About | ' || source ||
      |    '</nav><p>' ||
      |    array_to_string(list_transform(
      |      range(0, greatest(len(words) - 1, 0) // 12 + 1),
      |      g -> array_to_string(words[g * 12 + 1 : g * 12 + 12], ' ')),
      |      '</p><p>') ||
      |    '</p><footer>(c) ' || source || ' crawl</footer></body></html>'
      |      AS html
      |  FROM w0),
      |l0 AS (
      |  SELECT doc_id, unnest(list_transform(range(len(raw)),
      |    i -> struct_pack(pos := i, line := trim(raw[i + 1])))) AS s
      |  FROM (SELECT doc_id,
      |          string_split(regexp_replace(html, '<[^>]*>', chr(10), 'g'),
      |            chr(10)) AS raw
      |        FROM h) r),
      |l AS (SELECT doc_id, s.pos AS pos, s.line AS line
      |      FROM l0 WHERE s.line <> '')""".stripMargin

  override val queries: Seq[GraftQuery] = Seq(

    // ---- main-text extraction: tag-strip to ordered lines, title =
    //      first line, body = lines space-joined in document order ----
    GraftQuery("q_html_extract",
      (s, dir) => graft.operators.Boilerplate.htmlExtract(
        htmlDocs(s, dir), "doc_id", "html"),
      Some(s"""WITH $htmlCte
             |SELECT doc_id, min_by(line, pos) AS title,
             |  count(*)::BIGINT AS n_lines,
             |  string_agg(line, ' ' ORDER BY pos) AS body
             |FROM l GROUP BY doc_id""".stripMargin)),

    // ---- line-level boilerplate dedup: a line appearing in more than
    //      2 distinct docs is boilerplate (nav/footer repeat per
    //      source); survivors keep document order ----
    GraftQuery("q_line_dedup",
      (s, dir) => graft.operators.Boilerplate.lineDedup(
        htmlDocs(s, dir), "doc_id", "html", dfCap = 2L),
      Some(s"""WITH $htmlCte,
             |f AS (SELECT line, count(DISTINCT doc_id)::BIGINT AS df
             |      FROM l GROUP BY 1)
             |SELECT l.doc_id, count(*)::BIGINT AS n_lines,
             |  sum((f.df <= 2)::BIGINT)::BIGINT AS n_kept,
             |  coalesce(string_agg(CASE WHEN f.df <= 2 THEN l.line END,
             |    ' ' ORDER BY l.pos), '') AS clean_text
             |FROM l JOIN f USING (line) GROUP BY 1""".stripMargin)))
}
