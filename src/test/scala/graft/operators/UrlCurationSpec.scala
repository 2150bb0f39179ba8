package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** URL canonicalization + registrable-domain rules, hand-computed. */
class UrlCurationSpec extends SparkSpec {

  private def canon(urls: (Long, String)*): Map[Long, String] = {
    import spark.implicits._
    UrlCuration.canonicalize(urls.toDF("doc_id", "url"), "url")
      .select($"doc_id", $"canon_url").as[(Long, String)]
      .collect().toMap
  }

  test("canonicalize: case, userinfo, ports, fragment, tracking, sort") {
    val got = canon(
      (1L, "HTTPS://User:Pw@WWW.Example.COM:443/A/B/?z=1&utm_source=x&a=2#f"),
      (2L, "http://h.org:8080/p"),
      (3L, "http://h.org:80/p/"),
      (4L, "https://h.org"),
      (5L, "http://h.org/p?utm_campaign=c&gclid=g&fbclid=f&ref=r"))
    assert(got(1L) === "https://www.example.com/A/B?a=2&z=1")
    assert(got(2L) === "http://h.org:8080/p") // non-default port kept
    assert(got(3L) === "http://h.org/p") // default port + trailing slash
    assert(got(4L) === "https://h.org/") // empty path becomes /
    assert(got(5L) === "http://h.org/p") // all tracking params dropped
  }

  test("canonicalize: '?' inside the fragment is NOT a query") {
    // RFC 3986: the fragment starts at the FIRST '#'; a '?' after it is
    // fragment text, not a query delimiter. The query regex anchors on
    // the pre-fragment prefix, so 'b' must not survive into canon_url.
    val got = canon(
      (1L, "http://h.org/p#a?b"),
      (2L, "http://h.org/p?x=1#a?b"),
      (3L, "http://h.org/p?x=1&y=2?z#f"))
    assert(got(1L) === "http://h.org/p") // fragment-only: no query
    assert(got(2L) === "http://h.org/p?x=1") // real query kept, frag dropped
    assert(got(3L) === "http://h.org/p?x=1&y=2?z") // later '?' is data
  }

  test("registrable domain: multi-part suffix, fallback, single label") {
    import spark.implicits._
    val got = UrlCuration.registrableDomain(
        Seq("www.example.co.uk", "a.b.example.com", "example.github.io",
          "github.io", "localhost").toDF("host"),
        "host")
      .select($"host", $"registrable").as[(String, String)]
      .collect().toMap
    assert(got("www.example.co.uk") === "example.co.uk")
    assert(got("a.b.example.com") === "example.com")
    assert(got("example.github.io") === "example.github.io")
    assert(got("github.io") === "github.io") // the suffix itself
    assert(got("localhost") === "localhost")
  }

  test("PSL resolution: longest match, wildcard, exception, fallback") {
    import spark.implicits._
    val rules = Seq("uk", "co.uk", "blogspot.co.uk",
      "ck", "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp")
      .map(Tuple1(_)).toDF("rule")
    val got = UrlCuration.registrableDomain(
        Seq("kid.blogspot.co.uk",   // 3-label rule beats co.uk
          "www.example.co.uk",      // co.uk beats uk
          "shop.foo.ck",            // wildcard *.ck → suffix foo.ck
          "foo.ck",                 // host == wildcard suffix → itself
          "www.ck",                 // exception cancels the wildcard
          "a.b.city.kawasaki.jp",   // exception → suffix kawasaki.jp
          "x.y.kawasaki.jp",        // wildcard → suffix y.kawasaki.jp
          "plain.example.com",      // no rule → implicit '*' fallback
          "localhost").toDF("host"),
        "host", rules)
      .select($"host", $"registrable").as[(String, String)]
      .collect().toMap
    assert(got("kid.blogspot.co.uk") === "kid.blogspot.co.uk")
    assert(got("www.example.co.uk") === "example.co.uk")
    assert(got("shop.foo.ck") === "shop.foo.ck")
    assert(got("foo.ck") === "foo.ck")
    assert(got("www.ck") === "www.ck")
    assert(got("a.b.city.kawasaki.jp") === "city.kawasaki.jp")
    assert(got("x.y.kawasaki.jp") === "x.y.kawasaki.jp")
    assert(got("plain.example.com") === "example.com")
    assert(got("localhost") === "localhost")
  }

  test("domainCap keeps exactly maxPerDomain docs per registrable domain") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"https://${if (i % 2 == 0) "a" else "b"}.example.org/p/$i"))
      .toDF("doc_id", "url")
    val got = UrlCuration.domainCap(docs, "url", "doc_id", maxPerDomain = 5L)
    // a.example.org and b.example.org share registrable example.org:
    // ONE domain of 30 docs, 5 kept (the smallest doc_ids)
    assert(got.where($"kept" === 1L).select($"doc_id").as[Long]
      .collect().sorted.toSeq === (0L until 5L).toSeq)
  }

  test("blocklistFilter drops the blocked registrable domain entirely") {
    import spark.implicits._
    val docs = Seq((1L, "https://www.bad.co.uk/x"),
      (2L, "https://good.org/y")).toDF("doc_id", "url")
    val blocked = Seq(Tuple1("bad.co.uk")).toDF("domain")
    val kept = UrlCuration.blocklistFilter(docs, "url", blocked)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  private def robots(urls: Seq[(Long, String)],
      rules: Seq[(String, String, Boolean, String)],
      agent: String): Map[Long, (String, Boolean)] = {
    import spark.implicits._
    UrlCuration.robotsGate(urls.toDF("doc_id", "url"), "doc_id", "url",
        rules.toDF("host", "agent", "allow", "pattern"), agent)
      .select($"id", $"rule_pattern", $"allowed")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("robotsGate: longest octet match wins, allow beats disallow " +
      "on ties, $ anchors, default allow") {
    val rules = Seq(
      ("h.com", "*", false, "/a"),
      ("h.com", "*", true, "/a/b"),
      ("h.com", "*", false, "/a/b$"),
      ("h.com", "*", false, "/t"),
      ("h.com", "*", true, "/t")) // same length: allow wins
    val got = robots(Seq(
      (1L, "https://h.com/a/x"), // /a only -> blocked
      (2L, "https://h.com/a/b/c"), // /a/b (len 4) beats /a; $ no match
      (3L, "https://h.com/a/b"), // /a/b$ (len 5) beats /a/b -> blocked
      (4L, "https://h.com/t/z"), // tie -> allow
      (5L, "https://h.com/zzz")), // no match -> default allow
      rules, "anybot")
    assert(got(1L) === (("/a", false)))
    assert(got(2L) === (("/a/b", true)))
    assert(got(3L) === (("/a/b$", false)))
    assert(got(4L) === (("/t", true)))
    assert(got(5L) === (("", true)))
  }

  test("robotsGate: precedence counts OCTETS, not characters — a " +
      "2-char CJK pattern (6 UTF-8 octets) beats a 5-char ASCII one") {
    // RFC 9309 §2.2.2 (r12 ADVICE fix): '*日本' is 3 characters but 7
    // UTF-8 octets, '/abc*' is 5 characters but only 5 octets; both
    // match '/abc日本'. Character-length precedence would pick the
    // ASCII disallow (5 > 3); octet precedence must pick the CJK
    // allow (7 > 5).
    val rules = Seq(
      ("h.com", "*", true, "*日本"), // 3 chars, 7 octets
      ("h.com", "*", false, "/abc*")) // 5 chars, 5 octets
    val got = robots(Seq((1L, "https://h.com/abc日本")),
      rules, "anybot")
    assert(got(1L) === (("*日本", true)))
  }

  test("robotsPolicy: group-scoped crawl-delay (min-wins, no * leak, " +
      "invalid/negative ignored), file-scoped sitemaps, none-group") {
    import spark.implicits._
    val rules = Seq(
      ("a.com", "*", "crawl-delay", "2"),
      ("a.com", "MyBot", "crawl-delay", "5"),
      ("a.com", "mybot", "crawl-delay", "3"), // min of the group wins
      ("a.com", "mybot", "disallow", "/tmp"),
      ("a.com", "*", "sitemap", "https://a.com/b.xml"),
      ("a.com", "mybot", "sitemap", "https://a.com/a.xml"),
      ("b.org", "*", "crawl-delay", "oops"), // invalid -> ignored
      ("b.org", "*", "crawl-delay", "-4"), // negative -> ignored
      ("b.org", "*", "disallow", ""), // empty no-op
      ("b.org", "*", "allow", "/ok"),
      ("c.net", "mybot", "allow", "/"), // specific group, no delay
      ("c.net", "*", "crawl-delay", "7"), // must NOT leak into it
      ("d.io", "*", "sitemap", "https://d.io/s.xml"),
      ("d.io", "*", "sitemap", "https://d.io/s.xml")) // dup -> once
    val got = UrlCuration.robotsPolicy(
        rules.toDF("host", "agent", "directive", "value"), "MyBot")
      .selectExpr("host", "agent_group", "crawl_delay_ms", "n_allow",
        "n_disallow", "n_sitemaps", "sitemaps")
      .as[(String, String, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a.com") === (("a.com", "specific", 3000L, 0L, 1L, 2L,
      "https://a.com/a.xml,https://a.com/b.xml")))
    assert(got("b.org") === (("b.org", "wildcard", 0L, 1L, 0L, 0L, "")))
    assert(got("c.net") === (("c.net", "specific", 0L, 1L, 0L, 0L, "")))
    assert(got("d.io") === (("d.io", "none", 0L, 0L, 0L, 1L,
      "https://d.io/s.xml")))
  }

  test("crawlSchedule: per-host fetch sequence × group-scoped delay; " +
      "rule-less and invalid-delay hosts schedule at offset 0") {
    import spark.implicits._
    val rules = Seq(
      ("a.com", "mybot", "crawl-delay", "2"),
      ("a.com", "*", "crawl-delay", "9"), // must not leak
      ("b.org", "*", "crawl-delay", "oops")) // invalid -> 0
    val urls = Seq(
      (1L, "https://a.com/x"), (2L, "https://a.com/y"),
      (3L, "https://a.com/z"), (4L, "https://b.org/1"),
      (5L, "https://b.org/2"), (6L, "https://c.net/only"))
    val got = UrlCuration.crawlSchedule(urls.toDF("id", "url"),
        "id", "url",
        rules.toDF("host", "agent", "directive", "value"), "MyBot")
      .selectExpr("id", "host", "fetch_seq", "crawl_delay_ms",
        "scheduled_offset_ms")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "a.com", 1L, 2000L, 0L)))
    assert(got(2L) === ((2L, "a.com", 2L, 2000L, 2000L)))
    assert(got(3L) === ((3L, "a.com", 3L, 2000L, 4000L)))
    assert(got(4L) === ((4L, "b.org", 1L, 0L, 0L)))
    assert(got(5L) === ((5L, "b.org", 2L, 0L, 0L)))
    assert(got(6L) === ((6L, "c.net", 1L, 0L, 0L)))
  }

  test("robotsPolicy: oversized delays cap at 86400 s") {
    import spark.implicits._
    val got = UrlCuration.robotsPolicy(
        Seq(("h.com", "*", "crawl-delay", "99999999"))
          .toDF("host", "agent", "directive", "value"), "anybot")
      .selectExpr("crawl_delay_ms").as[Long].collect()
    assert(got.toSeq === Seq(86400000L))
  }

  test("robotsGate: a specific-agent group overrides * entirely " +
      "(groups are not merged), case-insensitively") {
    val rules = Seq(
      ("h.com", "*", false, "/"),
      ("h.com", "mybot", false, "/priv"))
    val got = robots(Seq(
      (1L, "https://h.com/pub"), // * group ignored for MyBot
      (2L, "https://h.com/priv/x")),
      rules, "MyBot")
    assert(got(1L) === (("", true)))
    assert(got(2L) === (("/priv", false)))
  }

  test("robotsGate: empty-value rules are no-ops, and a " +
      "present-but-empty specific group allows everything") {
    val rules = Seq(
      ("h.com", "*", false, "/"),
      ("h.com", "mybot", true, ""))
    val got = robots(Seq((1L, "https://h.com/x")), rules, "mybot")
    assert(got(1L) === (("", true)))
  }

  test("robotsGate: * wildcard spans path segments; LIKE " +
      "metacharacters in patterns stay literal") {
    val rules = Seq(
      ("h.com", "*", false, "/a*c"),
      ("h.com", "*", false, "/x_z"),
      ("h.com", "*", false, "/p%q"))
    val got = robots(Seq(
      (1L, "https://h.com/a/b/c"), // * crosses segments -> blocked
      (2L, "https://h.com/xYz"), // _ is literal -> no match
      (3L, "https://h.com/x_z"), // literal _ matches
      (4L, "https://h.com/pXq"), // % is literal -> no match
      (5L, "https://h.com/p%qr")), // literal % matches as prefix
      rules, "anybot")
    assert(got(1L)._2 === false)
    assert(got(2L) === (("", true)))
    assert(got(3L) === (("/x_z", false)))
    assert(got(4L) === (("", true)))
    assert(got(5L) === (("/p%q", false)))
  }
}
