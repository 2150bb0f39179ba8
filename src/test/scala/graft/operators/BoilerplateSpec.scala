package graft.operators

import graft.SparkSpec

/** HTML boilerplate extraction + line-level dedup (SURVEY.md §2.11). */
class BoilerplateSpec extends SparkSpec {

  private def pages = {
    import spark.implicits._
    Seq(
      (1L, "<html><head><title>One</title></head><body>" +
        "<nav>Home | About</nav><p>unique alpha text</p>" +
        "<footer>(c) corp</footer></body></html>"),
      (2L, "<html><head><title>Two</title></head><body>" +
        "<nav>Home | About</nav><p>unique beta text</p>" +
        "<footer>(c) corp</footer></body></html>"),
      (3L, "<html><head><title>Three</title></head><body>" +
        "<nav>Home | About</nav><p>unique gamma text</p>" +
        "<p>unique alpha text</p><footer>(c) corp</footer></body></html>"))
      .toDF("doc_id", "html")
  }

  test("htmlLines strips tags, trims, drops empties, keeps document order") {
    import spark.implicits._
    val got = Boilerplate.htmlLines(pages, "doc_id", "html")
      .where($"doc_id" === 1L).orderBy($"pos")
      .select($"line").as[String].collect().toSeq
    assert(got === Seq("One", "Home | About", "unique alpha text", "(c) corp"))
  }

  test("htmlExtract: first line is the title, body joins lines in order") {
    import spark.implicits._
    val got = Boilerplate.htmlExtract(pages, "doc_id", "html")
      .as[(Long, String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === (("One", 4L,
      "One Home | About unique alpha text (c) corp")))
    assert(got(3L)._2 === 5L)
    assert(got(3L)._3.startsWith("Three Home | About unique gamma"))
  }

  test("lineDedup drops high-df boilerplate, keeps content in order") {
    import spark.implicits._
    val got = Boilerplate.lineDedup(pages, "doc_id", "html", dfCap = 2L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // nav + footer appear in 3 docs (df=3 > 2) → dropped everywhere;
    // 'unique alpha text' appears in docs 1 and 3 (df=2 ≤ 2) → kept.
    assert(got(1L) === ((4L, 2L, "One unique alpha text")))
    assert(got(2L) === ((4L, 2L, "Two unique beta text")))
    assert(got(3L) === ((5L, 3L, "Three unique gamma text unique alpha text")))
  }

  test("a doc whose every line is boilerplate cleans to the empty string") {
    import spark.implicits._
    val clones = (1L to 4L).map(i =>
      (i, "<body><p>same everywhere</p></body>")).toDF("doc_id", "html")
    val got = Boilerplate.lineDedup(clones, "doc_id", "html", dfCap = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === (1L to 4L).map(i => (i, 1L, 0L, "")).toSet)
  }
}
