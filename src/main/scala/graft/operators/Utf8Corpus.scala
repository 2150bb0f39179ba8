package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic MULTIBYTE variant of the documents corpus — the
  * fixture generator ships pure ASCII, so without this every oracle
  * equivalence that touches characters vs bytes (tokenize, chunk,
  * redact, BPE, archive round trips, `length` vs `octet_length`) is
  * only proven on the easy half of UTF-8. A real crawl is mostly
  * non-ASCII; these decorations cover every UTF-8 width class AND the
  * real-script shapes that stress the engine's word model:
  *
  *  - 2-byte sequences (Latin-1 supplement: é ñ),
  *  - 3-byte (CJK: 中文, and € from the currency block),
  *  - 4-byte (U+1F600 😀 — a surrogate PAIR on the JVM, the case that
  *    breaks naive char-indexed code),
  *  - a combining mark (e + U+0301 — two code points, one grapheme),
  *  - an UNSPACED 8-char CJK run (日本語形態素解析) — under the
  *    engine-wide ASCII-space word model this is ONE word, which the
  *    tokenizer trainers then segment into ≤[[MaxMatch.MaxPieceLen]]
  *    subword pieces: the SentencePiece treatment of CJK, and the
  *    DOCUMENTED answer to "the trainers split on whitespace" — for
  *    space-free scripts the word boundary is the run, the learned
  *    pieces are the tokens,
  *  - RTL text (Hebrew שלום + Arabic مرحبا, space-separated — two
  *    words whose code-point order is storage order; the engine never
  *    reorders for display),
  *  - a MIXED-SCRIPT word (foo中文bar — 1- and 3-byte chars in one
  *    token),
  *  - a CJK pair joined by IDEOGRAPHIC SPACE U+3000 (漢字　仮名):
  *    U+3000 is NOT the ASCII space the word model splits on, so this
  *    stays one 5-code-point word — the documented contract (callers
  *    wanting Unicode-space splitting normalize upstream, e.g. with
  *    `norm_ws`-style preprocessing),
  *  - an OVER-CAP 13-char CJK run — longer than [[UnigramLM.WordCap]],
  *    so the tokenizer trainers DROP it by contract (the cap is
  *    documented for URL/boilerplate shards; an unsegmented CJK
  *    sentence hits the same gate, which this entry pins in every
  *    `q_utf8_*` trainer oracle).
  *
  * Both engines count CODE POINTS for `length`/`substr` (DuckDB's
  * grapheme functions are separate; Spark's UTF8String counts lead
  * bytes), so decorated oracles stay cell-exact — which is itself one of
  * the facts this module pins.
  *
  * The decoration is `deco || ' ' || text || ' ' || deco` with the deco
  * chosen by `doc_id % 10`, reproduced verbatim in SQL by [[oracleCte]].
  * Strings are built from code points so this source file stays ASCII
  * (see the fixture-hygiene note in graft's round notes: raw multibyte
  * or control literals in source have shipped corruption before).
  */
object Utf8Corpus {

  private def cp(points: Int*): String =
    new String(points.toArray.flatMap(Character.toChars))

  /** One decoration per `doc_id % 10`: UTF-8 width classes first, then
    * the real-script shapes (see object doc). */
  val Decos: Seq[String] = Seq(
    cp(0xe9, 0xf1), // é ñ (2-byte)
    cp(0x4e2d, 0x6587), // 中文 (3-byte)
    cp(0x1f600), // 😀 (4-byte, surrogate pair)
    "e" + cp(0x301), // combining acute
    cp(0x20ac), // € (3-byte)
    cp(0x65e5, 0x672c, 0x8a9e, 0x5f62, 0x614b, 0x7d20, 0x89e3, 0x6790),
    // 日本語形態素解析: unspaced 8-char CJK run (one word, subword-segmented)
    cp(0x5e9, 0x5dc, 0x5d5, 0x5dd) + " " + cp(0x645, 0x631, 0x62d, 0x628, 0x627),
    // שלום مرحبا: RTL Hebrew + Arabic, two space-separated words
    "foo" + cp(0x4e2d, 0x6587) + "bar", // mixed-script single word
    cp(0x6f22, 0x5b57, 0x3000, 0x4eee, 0x540d),
    // 漢字　仮名: U+3000 ideographic space stays INSIDE the word
    cp(0x6a5f, 0x68b0, 0x5b66, 0x7fd2, 0x6a5f, 0x68b0, 0x5b66, 0x7fd2,
      0x6a5f, 0x68b0, 0x5b66, 0x7fd2, 0x6a5f))
    // 13-char CJK run: over WordCap, dropped by the trainers by contract

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
  val oracleCte: String = {
    def sql(s: String): String = {
      // each Deco is a concatenation of chr() calls and ASCII literals
      val parts = new scala.collection.mutable.ArrayBuffer[String]
      var i = 0
      while (i < s.length) {
        val c = s.codePointAt(i)
        if (c < 128) parts += s"'${new String(Character.toChars(c))}'"
        else parts += s"chr($c)"
        i += Character.charCount(c)
      }
      parts.mkString(" || ")
    }
    val list = Decos.map(sql).mkString("[", ",\n     ", "]")
    s"""SELECT doc_id, d || ' ' || text || ' ' || d AS text, lang, source
       |  FROM (SELECT doc_id, text, lang, source,
       |    $list[1 + CAST(doc_id % ${Decos.size} AS INTEGER)] AS d
       |  FROM documents)""".stripMargin
  }
}
