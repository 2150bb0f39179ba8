package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic MULTIBYTE variant of the documents corpus — the
  * fixture generator ships pure ASCII, so without this every oracle
  * equivalence that touches characters vs bytes (tokenize, chunk,
  * redact, BPE, archive round trips, `length` vs `octet_length`) is
  * only proven on the easy half of UTF-8. A real crawl is mostly
  * non-ASCII; these decorations cover every UTF-8 width class:
  *
  *  - 2-byte sequences (Latin-1 supplement: é ñ),
  *  - 3-byte (CJK: 中文, and € from the currency block),
  *  - 4-byte (U+1F600 😀 — a surrogate PAIR on the JVM, the case that
  *    breaks naive char-indexed code),
  *  - a combining mark (e + U+0301 — two code points, one grapheme).
  *
  * Both engines count CODE POINTS for `length`/`substr` (DuckDB's
  * grapheme functions are separate; Spark's UTF8String counts lead
  * bytes), so decorated oracles stay cell-exact — which is itself one of
  * the facts this module pins.
  *
  * The decoration is `deco || ' ' || text || ' ' || deco` with the deco
  * chosen by `doc_id % 5`, reproduced verbatim in SQL by [[oracleCte]].
  * Strings are built from code points so this source file stays ASCII
  * (see the fixture-hygiene note in graft's round notes: raw multibyte
  * or control literals in source have shipped corruption before).
  */
object Utf8Corpus {

  /** One decoration per `doc_id % 5`, in UTF-8 width order. */
  val Decos: Seq[String] = Seq(
    new String(Array(0xe9, 0xf1).flatMap(Character.toChars)), // é ñ (2-byte)
    new String(Array(0x4e2d, 0x6587).flatMap(Character.toChars)), // 中文 (3-byte)
    new String(Character.toChars(0x1f600)), // 😀 (4-byte, surrogate pair)
    "e" + new String(Character.toChars(0x301)), // combining acute
    new String(Character.toChars(0x20ac))) // € (3-byte)

  /** Decorate `textCol` in place; all other columns pass through. */
  def decorate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val deco = element_at(array(Decos.map(lit): _*),
      (col(idCol) % Decos.size).cast("int") + 1)
    docs.withColumn(textCol,
      concat(deco, lit(" "), col(textCol), lit(" "), deco))
  }

  /** The DuckDB twin: a CTE body yielding the decorated corpus with the
    * documents schema (doc_id, text, lang, source). Decos spelled as
    * chr() code points — byte-identical to [[Decos]]. */
  val oracleCte: String =
    """SELECT doc_id, d || ' ' || text || ' ' || d AS text, lang, source
      |  FROM (SELECT doc_id, text, lang, source,
      |    [chr(233) || chr(241), chr(20013) || chr(25991), chr(128512),
      |     'e' || chr(769), chr(8364)][1 + CAST(doc_id % 5 AS INTEGER)] AS d
      |  FROM documents)""".stripMargin
}
