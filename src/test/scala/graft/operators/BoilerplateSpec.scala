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

  test("script/style/comment/CDATA bodies are dropped, not leaked as text") {
    import spark.implicits._
    val hostile = Seq((7L,
      "<html><head><title>T</title>" +
        "<style media=\"all\">h1 { font: 12px } /* <p>fake</p> */</style>" +
        "<script>\nvar s = \"</p>\"; if (a<b && c>d) alert(\"x<y\");\n" +
        "//<!--\n</script></head><body>" +
        "<!-- a comment with <tags> and text -->" +
        "<![CDATA[ raw < cdata > payload ]]>" +
        "<p>real content</p></body></html>")).toDF("doc_id", "html")
    val got = Boilerplate.htmlLines(hostile, "doc_id", "html")
      .orderBy($"pos").select($"line").as[String].collect().toSeq
    assert(got === Seq("T", "real content"))
  }

  test("a > inside a quoted attribute value does not end the tag") {
    import spark.implicits._
    val page = Seq((8L,
      "<body><a href=\"/p?x=1\" title=\"a>b\">link text</a>" +
        "<img alt='w > h' src='i.png'><p>after</p></body>"))
      .toDF("doc_id", "html")
    val got = Boilerplate.htmlLines(page, "doc_id", "html")
      .orderBy($"pos").select($"line").as[String].collect().toSeq
    assert(got === Seq("link text", "after"))
  }

  test("common entities decode, &amp; last so &amp;lt; stays literal &lt;") {
    import spark.implicits._
    val page = Seq((9L,
      "<body><p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s &#x27;t</p>" +
        "<p>literal &amp;lt; stays</p><p>&nbsp;</p><p>pad&nbsp;ding</p>" +
        "</body>")).toDF("doc_id", "html")
    val got = Boilerplate.htmlLines(page, "doc_id", "html")
      .orderBy($"pos").select($"line").as[String].collect().toSeq
    // the &nbsp;-only paragraph decodes to a space and trims away
    assert(got === Seq("Tom & Jerry <3 \"q\" 's 't",
      "literal &lt; stays", "pad ding"))
  }

  test("general numeric character references decode; malformed and " +
      "invalid code points stay literal; &amp;#65; yields literal &#65;") {
    import spark.implicits._
    val page = Seq((9L,
      "<body><p>caf&#233; Caf&#xE9; q&#8217;s &#x2014; &#x1F600;</p>" +
        "<p>bad &#xD800; &#999999999; &#0; &#12a; &#x; &#; &#65</p>" +
        "<p>esc &amp;#65; and &amp;#x41;</p></body>"))
      .toDF("doc_id", "html")
    val got = Boilerplate.htmlLines(page, "doc_id", "html")
      .orderBy($"pos").select($"line").as[String].collect().toSeq
    assert(got === Seq(
      // decimal, hex, curly quote, em dash, astral (emoji) all decode
      "café Café q’s — " +
        new String(Character.toChars(0x1F600)),
      // surrogate, 9 digits, NUL, trailing junk, empty, unterminated
      "bad &#xD800; &#999999999; &#0; &#12a; &#x; &#; &#65",
      // double-escape: numeric decode never rescans, &amp; is last
      "esc &#65; and &#x41;"))
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
