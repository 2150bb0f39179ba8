package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction + corpus line-dedup — the first two
  * steps every web-crawl training pipeline runs before any quality
  * gate (trafilatura/jusText extract; CCNet/RefinedWeb line-level
  * dedup): strip markup to text LINES, then drop the lines that
  * repeat across many documents (navigation, footers, cookie
  * banners) — boilerplate is precisely the text whose document
  * frequency is corpus-shaped rather than content-shaped.
  *
  * Line model: every tag boundary is a line break (`<[^>]*>` →
  * newline), lines are trimmed, empties dropped, and each keeps its
  * ORIGINAL position so the cleaned document preserves reading
  * order. Tag stripping is regex-based by design — the curation gate
  * doesn't need a DOM, and a single codegen'd `regexp_replace` is
  * what survives a 100 TB scan (a parser would be a per-row UDF).
  *
  * Distribution shape (the 100 TB contract): one corpus scan to
  * explode lines, one aggregation for per-line document frequency
  * (map-side combinable — the hot boilerplate lines are exactly the
  * well-combined ones), one shuffled equi-join back (AQE's skew
  * handling owns the hot keys), one per-document regroup. No
  * windows, no driver state, no collect.
  *
  * Reference scope: the reference ingests raw unstructured bytes per
  * packet (/root/reference/src/main/java/org/test/pcap4j/
  * CaptureNetworkReceiver.java:99-101 stores `packet.getRawData()`)
  * and only ever derives one structured field from them — the length
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:42);
  * markup-to-lines is the richer unstructured-to-structured step the
  * same pipeline shape needs when the payload is crawled HTML rather
  * than packets.
  */
object Boilerplate {

  /** Tag-stripped text lines with their original order:
    * `(doc_id, pos, line)` — pos indexes the RAW line list (gaps
    * where empties were dropped), so downstream reassembly never
    * needs a second window. */
  def htmlLines(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(regexp_replace(col(htmlCol), "<[^>]*>", "\n"), "\n")
          .as("raw"))
      .select(col("doc_id"), posexplode(col("raw")).as(Seq("pos", "line")))
      .withColumn("pos", col("pos").cast("long"))
      .withColumn("line", trim(col("line")))
      .where(col("line") =!= "")

  /** Main-text extraction: `(doc_id, title, n_lines, body)` — the
    * first line is the title (document order, not DOM knowledge),
    * the body is every line space-joined in order. */
  def htmlExtract(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    htmlLines(docs, idCol, htmlCol)
      .groupBy("doc_id")
      .agg(
        min_by(col("line"), col("pos")).as("title"),
        count(lit(1)).cast("long").as("n_lines"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), " ").as("body"))

  /** CCNet/RefinedWeb-style line-level dedup: a line is boilerplate
    * iff it appears in MORE than `dfCap` distinct documents; cleaned
    * text keeps the surviving lines in original order.
    * `(doc_id, n_lines, n_kept, clean_text)`. */
  def lineDedup(docs: DataFrame, idCol: String, htmlCol: String,
      dfCap: Long = 2L): DataFrame = {
    val lines = htmlLines(docs, idCol, htmlCol)
    val lineDf = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("df"))
    lines.join(lineDf, Seq("line"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum((col("df") <= dfCap).cast("long")).cast("long").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("df") <= dfCap,
            struct(col("pos"), col("line"))))),
          x => x("line")), " ").as("clean_text"))
  }
}
