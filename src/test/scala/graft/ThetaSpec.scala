package graft

import graft.functions.ThetaExprs
import org.apache.spark.sql.functions._

/** KMV/theta sketch semantics (q_kmv_distinct / q_kmv_overlap). */
class ThetaSpec extends SparkSpec {

  private def withKmv[T](f: => T): T = { ThetaExprs.register(spark); f }

  test("kmv_agg keeps exactly the k smallest distinct values") {
    withKmv {
      import spark.implicits._
      // values with duplicates, shuffled across partitions
      val vals = (1L to 100L).flatMap(v => Seq(v * 7, v * 7)) // dups
      val got = vals.toDF("h").repartition(8)
        .agg(call_function("kmv_agg", col("h"), lit(10)))
        .as[Seq[Long]].head()
      assert(got === (1L to 10L).map(_ * 7))
    }
  }

  test("kmv_agg with fewer than k distinct inputs returns them all (exact mode)") {
    withKmv {
      import spark.implicits._
      val got = Seq(5L, 3L, 5L, 9L).toDF("h")
        .agg(call_function("kmv_agg", col("h"), lit(256)))
        .as[Seq[Long]].head()
      assert(got === Seq(3L, 5L, 9L))
    }
  }

  test("kmv merge is an exact semilattice: sketch of whole == merge of parts") {
    withKmv {
      import spark.implicits._
      // k-smallest-distinct is closed under union: merging per-group
      // sketches must give BIT-IDENTICAL state to sketching everything.
      val df = (1L to 5000L).map(v => (v % 17, v * 2654435761L % (1L << 60)))
        .toDF("g", "h").repartition(8)
      val whole = df.agg(call_function("kmv_agg", col("h"), lit(64)))
        .as[Seq[Long]].head()
      // simulate a matview merge: per-group sketches, re-aggregated by
      // feeding their elements back through kmv_agg
      val merged = df.groupBy(col("g"))
        .agg(call_function("kmv_agg", col("h"), lit(64)).as("sk"))
        .select(explode(col("sk")).as("h"))
        .agg(call_function("kmv_agg", col("h"), lit(64)))
        .as[Seq[Long]].head()
      assert(merged === whole)
    }
  }

  test("kmv estimate is within 25% of the exact distinct count on the fixture") {
    withKmv {
      import spark.implicits._
      graft.functions.VectorFunctions.register(spark)
      val sh = Tables.t(spark, sfDir, "documents")
        .select(explode(call_function("shingle_hashes", col("text"))).as("h"))
      val exact = sh.distinct().count().toDouble
      val sk = sh.agg(call_function("kmv_agg", col("h"), lit(256)))
        .as[Seq[Long]].head()
      val est =
        if (sk.length < 256) sk.length.toDouble
        else 255.0 * math.pow(2, 60) / sk(255).toDouble
      assert(math.abs(est - exact) / exact < 0.25,
        s"est $est vs exact $exact")
    }
  }
}
