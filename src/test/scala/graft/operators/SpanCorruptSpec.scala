package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SpanCorruptSpec extends SparkSpec {

  private val Sentinel = """<extra_id_(\d+)>""".r

  /** Invert the corruption: splice the target's spans back into the
    * input's sentinels. Must reproduce the whitespace-normalized doc. */
  private def reconstruct(input: String, target: String): String = {
    val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
    var cur = -1
    target.split(" ").foreach {
      case Sentinel(k) => cur = k.toInt; spans(cur) = Vector.empty
      case tok => spans(cur) = spans(cur) :+ tok
    }
    input.split(" ").flatMap {
      case Sentinel(k) => spans(k.toInt)
      case tok => Vector(tok)
    }.mkString(" ")
  }

  test("round trip: input + target splice back to the original text") {
    val docs = Tables.t(spark, sfDir, "documents")
    val got = SpanCorrupt.corrupt(docs, "doc_id", "text",
      noisePpm = 150000L, salt = 7L).collect()
    assert(got.nonEmpty)
    val orig = docs.select(col("doc_id").cast("long"),
        concat_ws(" ", expr(Dedup.wordsExpr("text"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var masked = 0L
    got.foreach { r =>
      val (id, nTok, nMask, nSpan) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (in, tgt) = (r.getString(4), r.getString(5))
      assert(reconstruct(in, tgt) === orig(id), s"doc $id")
      // structural arithmetic: sentinel counts vs token counts
      assert(nSpan <= nMask && nMask <= nTok)
      assert(in.split(" ").length === nTok - nMask + nSpan)
      assert(tgt.split(" ").length === nMask + nSpan + 1)
      masked += nMask
    }
    assert(masked > 0L) // 15% of the corpus is actually masked
  }

  test("determinism under salt; a new salt redraws") {
    val docs = Tables.t(spark, sfDir, "documents")
    def run(salt: Long) = SpanCorrupt.corrupt(docs, "doc_id", "text",
      noisePpm = 150000L, salt = salt).collect().map(_.toSeq).toSet
    assert(run(7L) === run(7L))
    assert(run(7L) !== run(8L))
  }

  test("degenerate rates: 0 masks nothing, 1e6 masks everything") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val none = SpanCorrupt.corrupt(docs, "doc_id", "text", 0L).collect().head
    assert(none.getLong(2) === 0L && none.getLong(3) === 0L)
    assert(none.getString(4) === "a b c")
    assert(none.getString(5) === "<extra_id_0>")
    val all = SpanCorrupt.corrupt(docs, "doc_id", "text", 1000000L)
      .collect().head
    assert(all.getLong(2) === 3L && all.getLong(3) === 1L)
    assert(all.getString(4) === "<extra_id_0>")
    assert(all.getString(5) === "<extra_id_0> a b c <extra_id_1>")
  }
}
