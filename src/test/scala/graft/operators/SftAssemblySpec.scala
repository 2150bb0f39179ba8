package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** SFT assembly (SURVEY.md §2.11) — chat templating + loss-mask spans. */
class SftAssemblySpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** user 1: two turns (user then assistant); user 2: one user turn. */
  private def events = {
    import spark.implicits._
    Seq(
      (1L, ts(10), 1L, "click", 1.5, """{"k": 60}"""),
      (2L, ts(20), 1L, "view", 2.25, """{"k": 7}"""),
      (3L, ts(10), 2L, "error", 0.019, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("renderConversations assembles the documented template") {
    import spark.implicits._
    val got = SftAssembly.renderConversations(events)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // floor(1.5*100)=150, floor(2.25*100)=225, floor(0.019*100)=1
    assert(got(0) === ((1L, 2L, "view k=7 v=225".length.toLong,
      "<|system|>conversation 1\n" +
        "<|user|>click k=60 v=150\n" +
        "<|assistant|>view k=7 v=225\n")))
    assert(got(1) === ((2L, 1L, 0L,
      "<|system|>conversation 2\n" +
        "<|user|>error k=5 v=1\n")))
  }

  test("renderTurns offsets slice exactly the content out of the text") {
    import spark.implicits._
    val texts = SftAssembly.renderConversations(events)
      .select("conv_id", "text").as[(Long, String)].collect().toMap
    val spans = SftAssembly.renderTurns(events)
      .as[(Long, Long, String, String, Long, Long)].collect()
    assert(spans.length === 3)
    spans.foreach { case (conv, _, role, content, start, end) =>
      val sliced = texts(conv).substring(start.toInt, end.toInt)
      assert(sliced === content,
        s"span [$start,$end) of conv $conv must be '$content'")
      assert(Set("user", "assistant").contains(role))
    }
    // total masked chars equals the render's n_mask_chars
    val maskTotal = spans.filter(_._3 == "assistant")
      .map(s => s._6 - s._5).sum
    val rendered = SftAssembly.renderConversations(events)
      .select("n_mask_chars").as[Long].collect().sum
    assert(maskTotal === rendered)
  }
}
