package graft

import java.sql.Timestamp

import graft.streaming.TrafficMonitor
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2): aggregation results are
  * partitioning-independent, and the edge-trigger emits exactly the state
  * flips of any generated alert sequence. Cases are drawn from scalacheck
  * generators with fixed seeds (no scalatestplus bridge in the offline
  * cache, so sampling is explicit — and deterministic, which a CI run
  * prefers anyway).
  */
class PropertySpecs extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: salted aggregation equals plain aggregation for any data") {
    import spark.implicits._
    val rows = Gen.listOfN(60,
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(-1000, 1000).map(_ / 10.0)))
    for (data <- samples(rows, 8) if data.nonEmpty) {
      val df = data.toDF("k", "v")
      val salted = operators.Skew.saltedSumCount(df, $"k", $"v", salts = 7)
        .select($"k", round($"sum_value", 6).as("s"), $"n")
        .as[(Long, Double, Long)].collect().toSet
      val plain = df.groupBy($"k")
        .agg(round(sum($"v"), 6).as("s"), count(lit(1)).as("n"))
        .as[(Long, Double, Long)].collect().toSet
      assert(salted === plain, s"for data $data")
    }
  }

  test("property: batch edge-trigger emits exactly the flips of the alert sequence") {
    import spark.implicits._
    val seqGen = Gen.listOfN(12, Gen.oneOf(true, false))
    for (flags <- samples(seqGen, 8) if flags.nonEmpty) {
      val events = flags.zipWithIndex.map { case (over, i) =>
        (1L, new Timestamp(1704067200000L + i * 300000L),
          if (over) 200.0 else 1.0)
      }.toDF("user_id", "ts", "value")
      val got = TrafficMonitor.batchEdgeTrigger(events, 150.0)
        .orderBy("window_start").select("alert").as[Boolean].collect().toSeq
      // expected: first flag, then each value that differs from its predecessor
      val expected = flags.head +:
        flags.zip(flags.tail).collect { case (a, b) if a != b => b }
      assert(got === expected, s"for flags $flags")
    }
  }

  test("property: as-of join matches a brute-force reference on random data") {
    import spark.implicits._
    val rowsGen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L))),
      Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L),
        Gen.choose(0, 999))))
    for (((lRows, rRows), it) <- samples(rowsGen, 6).zipWithIndex) {
      // unique right (key, ts) so the reference pick is well-defined
      val rDedup = rRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "lts")
      val right = rDedup.toDF("k", "rts", "v")
      val got = operators.AsOfJoin.asofBackward(
        left, right, key = "k", leftTs = "lts", rightTs = "rts",
        valueCols = Seq(("v", "v")))
        .select("lid", "v").as[(Long, Option[Int])].collect().toMap
      val want = lRows.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rDedup.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got === want, s"case $it: left=$lRows right=$rDedup")
    }
  }

  test("property: sum is invariant under repartitioning") {
    import spark.implicits._
    val rows = Gen.listOfN(50, Gen.choose(-10000, 10000))
    for (data <- samples(rows, 5) if data.nonEmpty) {
      val df = data.map(_.toLong).toDF("v")
      val a = df.agg(sum($"v")).as[Long].head()
      val b = df.repartition(13).agg(sum($"v")).as[Long].head()
      assert(a === b)
    }
  }

  test("property: salted join equals the plain join for any data incl. hot keys") {
    import spark.implicits._
    val probe = Gen.listOfN(80,
      Gen.zip(Gen.frequency(6 -> Gen.const(1L), 4 -> Gen.choose(1L, 9L)),
        Gen.choose(0, 999)))
    val build = Gen.listOfN(12, Gen.zip(Gen.choose(1L, 9L), Gen.alphaStr.map(_.take(4))))
    for (i <- 0 until 5) {
      val p = samples(probe, 1).head.toDF("k", "v")
      val b = samples(build, 1).head.distinct.toDF("k", "name")
      val plain = p.join(b, Seq("k"))
        .select($"k", $"v", $"name").as[(Long, Int, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val salted = operators.Skew.saltedJoin(p, b, "k", salts = 4)
        .select($"k", $"v", $"name").as[(Long, Int, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(salted === plain) // multiset equality, duplicates included
    }
  }

  test("property: two-phase packOffsets equals a serial prefix sum for any corpus") {
    import spark.implicits._
    val docs = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 500L), Gen.choose(0, 12)))
    for (data0 <- samples(docs, 6)) {
      // distinct ids; text with `w` whitespace tokens
      val data = data0.toMap.toSeq.map { case (id, w) =>
        (id, Seq.fill(w)("tok").mkString(" "))
      }
      if (data.nonEmpty) {
        val df = data.toDF("doc_id", "text")
        val got = operators.Packing.packOffsets(df, "doc_id", "text",
          packSize = 7, numParts = 5)
          .select($"doc_id", $"offset").as[(Long, Long)].collect().toMap
        // serial reference: cumsum in doc_id order over non-empty docs
        val serial = data.filter(_._2.nonEmpty).sortBy(_._1)
        val offsets = serial.scanLeft(0L)(_ + _._2.split(" ").length).init
        val want = serial.map(_._1).zip(offsets).toMap
        assert(got === want, s"for corpus ${data.take(5)}...")
      }
    }
  }

  test("property: rankWithinGroups equals a serial per-group sort rank") {
    import spark.implicits._
    val rows = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 10000L)))
    for (data0 <- samples(rows, 6)) {
      // unique order key per group (the operator's documented contract)
      val data = data0.map { case (g, k) => (s"g$g", k) }
        .groupBy(identity).keys.toSeq
      if (data.nonEmpty) {
        val df = data.toDF("grp", "k")
        val got = operators.Packing
          .rankWithinGroups(df, "grp", "k", "rnk", numParts = 5)
          .as[(String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        val want = data.groupBy(_._1).flatMap { case (g, rs) =>
          rs.map(_._2).sorted.zipWithIndex
            .map { case (k, i) => (g, k) -> (i + 1L) }
        }
        assert(got === want, s"for ${data.take(5)}...")
      }
    }
  }

  test("lengthBucketBatches: hand-computed batches, padding report, " +
      "and the bucketed padding never exceeds the naive ordering's") {
    import spark.implicits._
    // 7 docs with word counts 1,1,2,3,5,8,13; batchSize 3 on the
    // length-sorted order → batches [1,1,2], [3,5,8], [13]
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c d"), (4L, "e f g"),
      (5L, "h i j k l"), (6L, "m n o p q r s t"),
      (7L, "u v w x y z a2 b2 c2 d2 e2 f2 g2"))
      .toDF("doc_id", "text")
    val got = operators.Packing
      .lengthBucketBatches(docs, "doc_id", "text", batchSize = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 3L, 4L, 2L, 6L, (6L - 4L) * 1000000L / 6L),
      (1L, 3L, 16L, 8L, 24L, (24L - 16L) * 1000000L / 24L),
      (2L, 1L, 13L, 13L, 13L, 0L)))
    // property: summed padded tokens under length bucketing never
    // exceed the naive doc_id-order batching's (sorting minimizes
    // within-batch spread)
    val srt = operators.Packing
      .lengthBucketBatches(docs, "doc_id", "text", 3)
      .agg(org.apache.spark.sql.functions.sum($"padded_tokens"))
      .head.getLong(0)
    val naive = operators.Packing
      .lengthBucketBatches(docs, "doc_id", "text", 3, byLength = false)
      .agg(org.apache.spark.sql.functions.sum($"padded_tokens"))
      .head.getLong(0)
    assert(srt <= naive)
  }

  test("curriculumOrder round-robin interleaves languages by quality rank") {
    import spark.implicits._
    // quality is driven by distinct-token ratio: more repetition =
    // lower quality; two languages, three docs each
    val docs = Seq(
      (1L, "aa bb cc dd", "en"),  // high ttr
      (2L, "aa aa bb bb", "en"),
      (3L, "aa aa aa aa", "en"),  // lowest
      (4L, "x y z w", "de"),
      (5L, "x x y y", "de"),
      (6L, "x x x x", "de")).toDF("doc_id", "text", "lang")
    val got = operators.Packing
      .curriculumOrder(docs, "doc_id", "text", "lang")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    // de is lang index 0, en is 1; ranks follow quality descending
    assert(got(4L) === ((1L, 0L)) && got(1L) === ((1L, 1L)))
    assert(got(5L) === ((2L, 2L)) && got(2L) === ((2L, 3L)))
    assert(got(6L) === ((3L, 4L)) && got(3L) === ((3L, 5L)))
  }

  test("epochShuffle: each epoch a full permutation, epochs disagree") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = operators.Packing.epochShuffle(docs, "doc_id", epochs = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 120)
    val byEpoch = got.groupBy(_._2).view
      .mapValues(_.sortBy(_._3).map(_._1).toSeq).toMap
    // every epoch is a permutation of all 40 docs (pos = 1..40)
    for ((_, order) <- byEpoch) assert(order.sorted === (1L to 40L))
    // the permutations differ across epochs (md5 keys decorrelate them)
    assert(byEpoch(0L) !== byEpoch(1L))
    assert(byEpoch(1L) !== byEpoch(2L))
  }

  test("property: binned range join equals the theta join for any intervals") {
    import spark.implicits._
    val points = Gen.listOfN(60, Gen.choose(-100.0, 100.0))
    val ivs = Gen.listOfN(8, Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0.0, 60.0)))
    for (i <- 0 until 5) {
      val ps = samples(points, 1).head.zipWithIndex
        .map { case (v, j) => (j.toLong, v) }
      val vs = samples(ivs, 1)(0).zipWithIndex
        .map { case ((lo, w), j) => (j.toLong, lo, lo + w) }
      val pDf = ps.toDF("pid", "v")
      val iDf = vs.toDF("iid", "lo", "hi")
      val got = operators.RangeJoin.binned(pDf, "v", iDf, "lo", "hi",
        binWidth = Seq(3.7, 11.0, 250.0)(i % 3))
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val want = pDf.join(iDf, $"v" >= $"lo" && $"v" < $"hi")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got === want)
    }
  }

  test("property: packed-key Viterbi equals brute-force segmentation enumeration") {
    import spark.implicits._
    val L = operators.UnigramLM.MaxPieceLen
    val Shift = operators.UnigramLM.PathShift
    val wordGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (trial <- 0 until 6) {
      val words = samples(Gen.listOfN(5, wordGen), 1).head.distinct
      val rng = new scala.util.Random(1234 + trial)
      // vocab: every substring ≤ L of every word, random counts —
      // guarantees single-char coverage, like a trained vocabulary
      val vocab = words.flatMap(w =>
        for (i <- w.indices; l <- 1 to math.min(L, w.length - i))
          yield w.substring(i, i + l)).distinct
        .map(p => (p, rng.nextInt(100).toLong))
      val tot = vocab.map(_._2).sum
      val score = vocab.map { case (p, c) =>
        p -> math.floor(1e6 * math.log(
          (tot + vocab.size).toDouble / (c + 1).toDouble)).toLong
      }.toMap
      // brute force: enumerate every segmentation, min packed key
      def brute(w: String): (Long, Long) = { // (nTokens, nll)
        def go(pos: Int, key: Long): Seq[(Long, Int)] =
          if (pos == w.length) Seq((key, 0))
          else (1 to math.min(L, w.length - pos)).flatMap { l =>
            val s = score(w.substring(pos, pos + l))
            go(pos + l, (key / Shift + s) * Shift +
              ((key % Shift) * 4 + (l - 1))).map { case (k, n) => (k, n + 1) }
          }
        val (k, n) = go(0, 1L).minBy(_._1)
        (n.toLong, k / Shift)
      }
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val got = operators.UnigramLM.encodeWith(docs, "doc_id", "text",
          vocab.toDF("piece", "cnt"))
        .select($"doc_id", $"n_tokens", $"nll_micro")
        .as[(Long, Long, Long)].collect()
        .map(r => words(r._1.toInt) -> ((r._2, r._3))).toMap
      for (w <- words)
        assert(got(w) === brute(w), s"trial $trial word '$w'")
    }
  }
}
