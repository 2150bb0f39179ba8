package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Preference family (SURVEY.md §2.11 — RLHF-side curation verbs). */
class PreferenceSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** user 1 timeline: a(10) b(20) a(5) c(5)  → pairs: b>a, a<b, c tie-drop
    * user 2 timeline: b(1) c(2)              → pairs: c>b */
  private def events = {
    import spark.implicits._
    Seq(
      (1L, ts(10), 1L, "a", 10.0, """{"k": 60}"""),
      (2L, ts(20), 1L, "b", 20.0, """{"k": 10}"""),
      (3L, ts(30), 1L, "a", 5.0, """{"k": 70}"""),
      (4L, ts(40), 1L, "c", 5.0, """{"k": 40}"""),
      (5L, ts(10), 2L, "b", 1.0, """{"k": 80}"""),
      (6L, ts(20), 2L, "c", 2.0, """{"k": 90}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("winRate mines consecutive same-user pairs, drops ties and same-type") {
    import spark.implicits._
    val got = Preference.winRate(events)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // trials: (b beats a) ts10→20, (b beats a) ts20→30, (c tie a) DROPPED,
    // (c beats b) user 2.
    assert(got === Set(
      ("a", "b", 0L, 2L, 2L, 0L),       // a never beats b
      ("b", "c", 0L, 1L, 1L, 0L)))      // c beats b once
  }

  test("bradleyTerry trajectory is deterministic and ranks by dominance") {
    import spark.implicits._
    val traj = Preference.bradleyTerry(events, rounds = 3)
      .as[(Long, String, Long)].collect()
    assert(traj.length === 9) // 3 rounds x 3 types
    val last = traj.filter(_._1 == 3L).map(t => t._2 -> t._3).toMap
    // dominance: c beat b, b beat a twice, a never won
    assert(last("a") === 0L) // zero wins → zero strength (BT degenerate case)
    assert(last("c") > last("b"), s"c must outrank b: $last")
    assert(last("b") > last("a"), s"b must outrank a: $last")
    // strengths renormalize to ~ |types| * 1e6 each round
    assert(last.values.sum <= 3200000L && last.values.sum >= 2800000L)
    // rerun is bit-identical (pure integer arithmetic, no seeds)
    val again = Preference.bradleyTerry(events, rounds = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(again === traj.toSet)
  }

  test("bradleyTerry MM converges toward the analytic 2-type win share") {
    import spark.implicits._
    // 3 wins for x over y, 1 win for y over x — one trial per USER so
    // pairs never chain. BT closed form for two types: p_x/(p_x+p_y) = 3/4.
    val rows = (0 until 4).flatMap { i =>
      val (w, l) = if (i < 3) ("x", "y") else ("y", "x")
      Seq((i * 2 + 1L, ts(100), 100L + i, l, 1.0, "{}"),
        (i * 2 + 2L, ts(110), 100L + i, w, 2.0, "{}"))
    }
    val df = spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val last = Preference.bradleyTerry(df, rounds = 8)
      .where("round = 8").as[(Long, String, Long)].collect()
      .map(t => t._2 -> t._3).toMap
    val share = last("x").toDouble / (last("x") + last("y"))
    assert(math.abs(share - 0.75) < 0.1,
      s"x's fitted share $share should approach 3/4: $last")
  }

  test("judgeAgreement publishes the exact agreement table and kappa parts") {
    import spark.implicits._
    val got = Preference.judgeAgreement(events, athr = 35.0, bthr = 50L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // ja (value>=35): none (max 20) → a1=0. jb (k>=50): 60,70,80,90 → b1=4.
    // agree (ja=jb): rows where jb=0 → k=10,40 → 2.
    val (n, a1, b1, agree, num, den) = got
    assert((n, a1, b1, agree) === (6L, 0L, 4L, 2L))
    assert(num === agree * n - a1 * b1 - (n - a1) * (n - b1))
    assert(den === n * n - a1 * b1 - (n - a1) * (n - b1))
    // kappa here: po=1/3, pe=(0*4 + 6*2)/36=1/3 → kappa = 0 exactly
    assert(num === 0L)
  }

  test("bestOfN picks the min-id top candidate with exact-cents margin") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(10), 1L, "a", 10.0, "{}"),
      (2L, ts(20), 1L, "b", 10.0, "{}"),   // tie → id 1 wins
      (3L, ts(30), 1L, "c", 5.0, "{}"),
      (4L, ts(10), 2L, "a", 2.345, "{}"))  // single candidate
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Preference.bestOfN(ev)
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, 1000L, Some(1000L), Some(0L), 3L),
      (2L, 4L, 234L, None, None, 1L)))
  }

  test("dpoPairs renders chosen/rejected with exact loss spans; " +
      "single-candidate contexts drop") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(10), 1L, "click", 10.0, """{"k":7}"""),
      (2L, ts(20), 1L, "view", 10.0, """{"k":8}"""),  // tie → id 1 chosen
      (3L, ts(30), 1L, "buy", 5.0, """{"k":9}"""),
      (4L, ts(10), 2L, "a", 2.345, "{}"))             // no pair → drops
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Preference.dpoPairs(ev).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("conv_id") === 1L)
    assert(r.getAs[Long]("chosen_event_id") === 1L)   // min-id tiebreak
    assert(r.getAs[Long]("rejected_event_id") === 2L)
    assert(r.getAs[Long]("chosen_cents") === 1000L)
    assert(r.getAs[Long]("rejected_cents") === 1000L)
    assert(r.getAs[Long]("margin_cents") === 0L)
    assert(r.getAs[Long]("n_candidates") === 3L)
    val prompt = "<|system|>conversation 1\n<|user|>best_of n=3\n"
    assert(r.getAs[String]("text_chosen") ===
      prompt + "<|assistant|>click k=7 v=1000\n")
    assert(r.getAs[String]("text_rejected") ===
      prompt + "<|assistant|>view k=8 v=1000\n")
    // the span slices exactly the supervised characters in BOTH texts
    val s = r.getAs[Long]("loss_start").toInt
    assert(r.getAs[String]("text_chosen")
      .substring(s, r.getAs[Long]("chosen_loss_end").toInt) ===
      "click k=7 v=1000")
    assert(r.getAs[String]("text_rejected")
      .substring(s, r.getAs[Long]("rejected_loss_end").toInt) ===
      "view k=8 v=1000")
  }

  /** (event_id, event_type, value, props) — id and type drive the
    * abstention rules (jb skips 'view', jc skips id % 7 == 0). */
  private def kaEvents(rows: (Long, String, Double, String)*) = {
    import spark.implicits._
    rows.map { case (id, tpe, v, p) =>
      (id, new java.sql.Timestamp(id * 1000L), 1L, tpe, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("krippendorffAlpha drops unpairable units and matches the hand trace") {
    import spark.implicits._
    // u1 id=1 click 100 {"k": 99}(len9): m=3 p=3      d=0
    // u2 id=7 click   1 {"k": 1}(len8): jc abstains → m=2 p=0  d=0
    // u3 id=2 view  100 {"k": 99}:      jb abstains → m=2 p=2  d=0
    // u4 id=14 view 100 {"k": 9}(len8): both abstain → m=1 DROPPED
    // u5 id=3 click 100 {"k": 1}(len8): m=3 p=1      d=4 (factor 1)
    val got = Preference.krippendorffAlpha(kaEvents(
        (1L, "click", 100.0, """{"k": 99}"""),
        (7L, "click", 1.0, """{"k": 1}"""),
        (2L, "view", 100.0, """{"k": 99}"""),
        (14L, "view", 100.0, """{"k": 9}"""),
        (3L, "click", 100.0, """{"k": 1}""")))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (nUnits, n, nPos, s2, num, den) = got
    assert((nUnits, n, nPos, s2) === (4L, 10L, 6L, 4L))
    // de = 100 - 36 - 16 = 48; alpha = 1 - (9*4)/(2*48) = 0.625
    assert((num, den) === (60L, 96L))
    // textbook double cross-check: Do = (1/10)(4/2); De = 48/90
    val alpha = 1.0 - (0.2 / (48.0 / 90.0))
    assert(math.abs(num.toDouble / den - alpha) < 1e-12)
  }

  test("krippendorffAlpha: unanimous panels give alpha exactly 1") {
    import spark.implicits._
    val got = Preference.krippendorffAlpha(kaEvents(
        (1L, "click", 100.0, """{"k": 99}"""),
        (2L, "view", 1.0, """{"k": 1}""")))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (_, _, _, s2, num, den) = got
    assert(s2 === 0L)
    assert(num === den && den > 0L)
  }

  private def fkEvents(rows: (Double, String)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((v, p), i) =>
      (i.toLong, new java.sql.Timestamp(i * 1000L), 1L, "t", v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("fleissKappa: perfect agreement gives kappa exactly 1 (num == den)") {
    import spark.implicits._
    // item 1: all three judges positive (value>=35, k>=50, len>=9);
    // item 2: all three negative
    val got = Preference.fleissKappa(fkEvents(
        (100.0, """{"k": 99}"""), (1.0, """{"k": 1}""")))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (n, m, q, sumSq, num, den) = got
    assert((n, m, q, sumSq) === (2L, 3L, 3L, 18L))
    assert(num === den && den > 0L, s"perfect agreement must be kappa=1: $got")
  }

  test("fleissKappa matches the hand-cleared Fleiss formula on a mixed panel") {
    import spark.implicits._
    // n_pos per item: 3, 0, 1 (only value>=35 fires), 2 (k>=50 + len 9)
    val got = Preference.fleissKappa(fkEvents(
        (100.0, """{"k": 99}"""), (1.0, """{"k": 1}"""),
        (100.0, """{"k": 1}"""), (1.0, """{"k": 99}""")))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (n, m, q, sumSq, num, den) = got
    assert((n, m) === (4L, 3L))
    val nPos = Seq(3L, 0L, 1L, 2L)
    assert(q === nPos.sum)
    assert(sumSq === nPos.map(p => p * p + (3 - p) * (3 - p)).sum)
    val bigN = n * m
    assert(num === bigN * (sumSq - bigN) -
      (m - 1) * (q * q + (bigN - q) * (bigN - q)))
    assert(den === bigN * bigN * (m - 1) -
      (m - 1) * (q * q + (bigN - q) * (bigN - q)))
    // and the value is the textbook kappa: pbar/pe cross-check in doubles
    val pbar = nPos.map(p => (p * p + (3 - p) * (3 - p) - 3).toDouble / 6)
      .sum / n
    val pe = {
      val p1 = q.toDouble / bigN; p1 * p1 + (1 - p1) * (1 - p1)
    }
    assert(math.abs(num.toDouble / den - (pbar - pe) / (1 - pe)) < 1e-12)
  }
}
