package graft.operators

import graft.SparkSpec

/** Table-evolution verbs: snapshot diff classification (incl. null↔value
  * updates), MERGE upsert, and CDC apply with latest-version-wins and
  * delete-beats-upsert tie-breaking. */
class TableDiffSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("diff classifies inserted/deleted/updated and is null-safe") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, Some("a"), 10.0), // unchanged
      (2L, Some("b"), 20.0), // payload update
      (3L, None: Option[String], 30.0), // null -> value update
      (4L, Some("d"), 40.0)  // deleted
    ).toDF("k", "s", "v")
    val newDf = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("B"), 20.0),
      (3L, Some("c"), 30.0),
      (5L, Some("e"), 50.0)  // inserted
    ).toDF("k", "s", "v")
    val got = TableDiff.diff(oldDf, newDf, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((2L, "updated"), (3L, "updated"),
      (4L, "deleted"), (5L, "inserted")))
  }

  test("merge replaces matched keys, inserts new, keeps the rest") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val source = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val got = TableDiff.merge(target, source, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
  }

  test("applyChanges: latest version wins, same-version tie breaks to delete") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", "U", 1L), (1L, "a2", "U", 2L), // latest upsert wins
      (2L, "b1", "U", 1L), (2L, "b1", "D", 2L), // later delete wins
      (3L, "c1", "U", 5L), (3L, "c2", "D", 5L), // tie -> delete wins
      (9L, "z", "U", 1L)                        // insert via U on absent key
    ).toDF("k", "v", "op", "version")
    val got = TableDiff.applyChanges(target, changes, Seq("k"), "op", "version")
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a2"), (4L, "d"), (9L, "z")))
  }

  test("merge and applyChanges treat a NULL key as a regular key") {
    import spark.implicits._
    val target = Seq((Some(1L), "a"), (None: Option[Long], "n")).toDF("k", "v")
    val source = Seq((None: Option[Long], "N")).toDF("k", "v")
    val merged = TableDiff.merge(target, source, Seq("k"))
      .as[(Option[Long], String)].collect().toSet
    assert(merged === Set((Some(1L), "a"), (None, "N")),
      "NULL-keyed source row must REPLACE, not append")

    val changes = Seq((None: Option[Long], "x", "D", 1L))
      .toDF("k", "v", "op", "version")
    val applied = TableDiff.applyChanges(target, changes,
        Seq("k"), "op", "version")
      .as[(Option[Long], String)].collect().toSet
    assert(applied === Set((Some(1L), "a")),
      "a delete must remove the NULL-keyed row it targets")
  }

  test("diff finds nothing on identical snapshots") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(TableDiff.diff(orders, orders, Seq("o_orderkey")).count() === 0L)
  }
}
