package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** TWAP resampling: duration-weighted bucket averages. */
class ResampleSpec extends SparkSpec {

  private def ms(m: Long) = new Timestamp(m)

  test("buckets weight held values by milliseconds, hand trace") {
    import spark.implicits._
    // key 1: v=1.00 held [0,250), v=2.00 held [250,400); terminal
    // observation at 400 excluded. Buckets of 100ms:
    //   b0 [0,100): 100ms of 100c → 100
    //   b1 [100,200): 100ms of 100c → 100
    //   b2 [200,300): 50ms of 100c + 50ms of 200c → 150
    //   b3 [300,400): 100ms of 200c → 200
    val ev = Seq(
      (1L, ms(0L), 1L, 1.0), (2L, ms(250L), 1L, 2.0),
      (3L, ms(400L), 1L, 9.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Resample.twap(ev, "user_id", "ts", "event_id", "value",
        bucketMillis = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq === Seq(
      (1L, 0L, 100L, 10000L, 100L),
      (1L, 1L, 100L, 10000L, 100L),
      (1L, 2L, 100L, 15000L, 150L),
      (1L, 3L, 100L, 20000L, 200L)))
  }

  test("same-timestamp observations tiebreak deterministically and " +
      "zero-width intervals vanish") {
    import spark.implicits._
    // two observations at t=100: the smaller event_id's interval is
    // [100,100) = zero width (dropped); the larger id holds to 200
    val ev = Seq(
      (1L, ms(0L), 1L, 1.0), (2L, ms(100L), 1L, 5.0),
      (3L, ms(100L), 1L, 3.0), (4L, ms(200L), 1L, 9.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Resample.twap(ev, "user_id", "ts", "event_id", "value",
        bucketMillis = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    // b0: 100ms of 100c; b1: 100ms of 300c (event 3 holds, id tiebreak)
    assert(got.toSeq === Seq(
      (1L, 0L, 100L, 10000L, 100L),
      (1L, 1L, 100L, 30000L, 300L)))
  }

  test("pre-1970 timestamps land on the floored bucket grid") {
    import spark.implicits._
    // v=1.00 held [-150,-50): floored buckets b=-2 [-200,-100) gets
    // 50ms, b=-1 [-100,0) gets 50ms — truncating division would have
    // produced buckets -1 and 0 with a NEGATIVE 50ms weight on b=0.
    // v=-3.00 held [-50, 100): b=-1 gets 50ms of -300c, b=0 gets 100ms
    // of -300c; twap_cents floors (-15000/50 = -300 exactly, and the
    // mixed b=-1 bucket: (50·100 + 50·-300)/100 = -100).
    val ev = Seq(
      (1L, ms(-150L), 1L, 1.0), (2L, ms(-50L), 1L, -3.0),
      (3L, ms(100L), 1L, 9.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Resample.twap(ev, "user_id", "ts", "event_id", "value",
        bucketMillis = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq === Seq(
      (1L, -2L, 50L, 5000L, 100L),
      (1L, -1L, 100L, -10000L, -100L),
      (1L, 0L, 100L, -30000L, -300L)))
  }
}
