package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the stage-ZERO verbs of a web-crawl training
  * pipeline, run before any text ever loads (CCNet/RefinedWeb order:
  * URL filtering first, it is orders of magnitude cheaper than
  * content work): parse + canonicalize URLs, resolve the registrable
  * domain (eTLD+1), cap documents per domain, and drop blocklisted
  * domains.
  *
  * URL model — deliberately its OWN small grammar (four anchored
  * regexes over RFC 3986's generic syntax), not `java.net.URI`: the
  * rules must be reproducible cell-for-cell in any engine (the oracle
  * mirrors the same four regexes), must never throw on crawl garbage
  * (regex extraction fails OPEN to empty strings), and must stay
  * inside whole-stage codegen (each field is one `regexp_extract`).
  *
  * Canonicalization rules (documented contract, applied in order):
  *  1. scheme and host lowercase; userinfo dropped;
  *  2. default ports dropped (80 for http, 443 for https), other
  *     ports kept;
  *  3. fragment dropped;
  *  4. tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`),
  *     remaining query params SORTED lexicographically (param order
  *     is not semantic; sorting makes canonical equality catch
  *     reordered duplicates);
  *  5. empty path becomes `/`; a trailing slash on a non-root path is
  *     stripped.
  *
  * Registrable domain: label before the public suffix, plus the
  * suffix, resolved by the published PSL algorithm (longest matching
  * rule, exceptions beat wildcards, implicit `*` fallback) over a
  * broadcast rule dimension — the bounded built-in
  * ([[MultiPartSuffixes]]) by default, or any full-scale list
  * (round 12: [[SyntheticPslRules]], ~5k rules in the real list's
  * shape with wildcard and exception cases, is what the registry's
  * cap/quality-gate queries resolve against). The resolution is a
  * CONSTANT number of broadcast equi-joins on last-k-label keys —
  * zero exchanges at any list size.
  *
  * Distribution shape: parse/canonicalize are pure per-row codegen'd
  * expressions (one corpus scan, zero shuffles); the suffix join
  * broadcasts the dimension; the domain cap uses
  * [[Packing.rankWithinGroups]] (range-partition + offset
  * composition — NO per-group window, so one hot domain with a
  * billion docs never funnels through a single task); the blocklist
  * is a broadcast anti-join.
  */
object UrlCuration {

  /** Bounded built-in multi-part public suffixes (see object doc:
    * production swaps in the full PSL as the same broadcast dim). */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "web.app")

  private val TrackingParam = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)(=|$)"

  /** Parsed fields as columns over `urlCol`: `scheme`, `host` (lower,
    * no userinfo/port), `port` (string, '' if none), `path`, `query`
    * (no '?'), all failing open to ''. */
  private def parsedCols(url: Column): Seq[Column] = Seq(
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
      .as("scheme"),
    lower(regexp_extract(
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        "^(?:[^@]*@)?([^:]*)", 1))
      .as("host"),
    regexp_extract(
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        ":([0-9]+)$", 1)
      .as("port"),
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
      .as("path"),
    regexp_extract(url, "^[^#?]*\\?([^#]*)", 1).as("query"))

  /** Parse + canonicalize: input columns plus `(scheme, host, port,
    * path, query, canon_url)`. */
  def canonicalize(docs: DataFrame, urlCol: String): DataFrame = {
    val parsed = docs.select(col("*") +: parsedCols(col(urlCol)): _*)
    val keptPort = when(
      (col("scheme") === "http" && col("port") === "80") ||
        (col("scheme") === "https" && col("port") === "443") ||
        col("port") === "", lit(""))
      .otherwise(concat(lit(":"), col("port")))
    val canonQuery = array_join(array_sort(filter(
      split(col("query"), "&"),
      p => p =!= "" && !p.rlike(TrackingParam))), "&")
    val canonPath = when(col("path") === "", lit("/"))
      .otherwise(regexp_replace(col("path"), "(.)/$", "$1"))
    parsed.withColumn("canon_url", concat(
      col("scheme"), lit("://"), col("host"), keptPort, canonPath,
      when(canonQuery === "", lit(""))
        .otherwise(concat(lit("?"), canonQuery))))
  }

  /** Max rule label count the resolver handles (the real PSL's rules
    * are almost all <= 4 labels; longer rules would need one more
    * broadcast join per extra label). */
  val MaxRuleLabels = 4

  /** A deterministic PSL-SCALE rule dimension (~5k rules, the real
    * list's shape): the bounded built-ins plus real multi-label,
    * wildcard and exception cases (`blogspot.co.uk`, `*.ck`/`!www.ck`,
    * `*.kawasaki.jp`/`!city.kawasaki.jp`) plus generated exact/
    * wildcard/exception rules. Exercises the resolver at the size the
    * real public-suffix list has, where longest-match changes eTLD+1
    * answers (`kid.blogspot.co.uk` under `blogspot.co.uk` vs
    * `blogspot.co.uk` under `co.uk`). Shared verbatim by the Spark dim
    * and the oracle's VALUES list. */
  val SyntheticPslRules: Seq[String] = {
    val real = MultiPartSuffixes ++ Seq(
      "blogspot.co.uk", "blogspot.com",
      "uk", "com", "org", "io", "app", "ck", "jp",
      "*.ck", "*.kawasaki.jp", "*.kitakyushu.jp",
      "!www.ck", "!city.kawasaki.jp", "!city.kitakyushu.jp")
    val genTlds = (0 until 200).map(i => s"tld$i")
    val gen2 = (0 until 4000).map(i => s"co$i.tld${i % 200}")
    val gen3 = (0 until 600).map(i => s"reg$i.co${i % 100}.tld${i % 200}")
    val genWild = (0 until 100).map(i => s"*.w$i.tld${i % 200}")
    val genExc = (0 until 100).map(i => s"!ok$i.w$i.tld${i % 200}")
    (real ++ genTlds ++ gen2 ++ gen3 ++ genWild ++ genExc).distinct
  }

  /** The PSL-scale dim as a one-column (`rule`) DataFrame. */
  def syntheticPsl(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(SyntheticPslRules.map(Tuple1(_))).toDF("rule")

  /** Registrable domain (eTLD+1) with the bounded built-in dimension
    * ([[MultiPartSuffixes]] as exact rules — same answers as the
    * historical two-label lookup, now through the full resolver). */
  def registrableDomain(df: DataFrame, hostCol: String): DataFrame =
    registrableDomain(df, hostCol,
      df.sparkSession.createDataFrame(MultiPartSuffixes.map(Tuple1(_)))
        .toDF("rule"))

  /** Registrable domain (eTLD+1) under a full public-suffix-list rule
    * dimension (`rule` column in PSL text form: exact `co.uk`,
    * wildcard `*.ck`, exception `!www.ck`), resolving with the
    * published PSL algorithm: among matching rules the exception wins,
    * else the one with most labels; an exception's public suffix drops
    * its leftmost label; no match falls back to the implicit `*` (the
    * last label); registrable = suffix + one label, and a host equal
    * to (or shorter than) its suffix is its own domain (fail-open).
    *
    * Distribution shape (the 100 TB contract): the dim is broadcast
    * and pre-split by (label count, kind) into at most
    * 2·[[MaxRuleLabels]] tiny sides — the resolution is a CONSTANT
    * number of broadcast left joins on the host's last-k-label keys
    * plus one CASE, zero exchanges, zero per-group work (plan-pinned).
    * Adds `registrable`. */
  def registrableDomain(df: DataFrame, hostCol: String,
      rules: DataFrame): DataFrame = {
    val parsed = rules
      .select(when(col("rule").startsWith("!"),
          expr("substring(rule, 2)")).otherwise(col("rule")).as("body"),
        col("rule").startsWith("!").as("is_exc"))
      .withColumn("is_wild", col("body").startsWith("*."))
      .select(
        when(col("is_wild"), expr("substring(body, 3)"))
          .otherwise(col("body")).as("key"),
        col("is_exc"), col("is_wild"),
        size(split(col("body"), "\\.")).as("nlab"))
    // contract: `rules` is a well-formed PSL — each rule listed once,
    // never both plain and as an exception (the real list's own
    // invariant). A duplicate (key, kind) row would fan out host rows;
    // deduping here would cost a dim-side exchange that breaks the
    // zero-shuffle plan pin for no real-list scenario.

    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    val lastK = (k: Int) =>
      array_join(slice(labels, greatest(n - (k - 1), lit(1)), lit(k)), ".")

    var out = df
    // exact + exception rules: join on the host's last-nlab labels
    for (l <- 1 to MaxRuleLabels) {
      val eL = broadcast(parsed.where(!col("is_wild") && col("nlab") === l)
        .select(col("key").as(s"__k$l"), col("is_exc").as(s"__x$l")))
      out = out.join(eL, col(s"__k$l") === lastK(l) && n >= l, "left")
    }
    // wildcard rules (nlab >= 2): '*' consumes one REAL label, so a
    // rule with nlab labels matches hosts with >= nlab labels whose
    // last nlab-1 labels equal the rule's concrete tail
    for (l <- 2 to MaxRuleLabels) {
      val wL = broadcast(parsed.where(col("is_wild") && col("nlab") === l)
        .select(col("key").as(s"__wk$l")))
      out = out.join(wL, col(s"__wk$l") === lastK(l - 1) && n >= l, "left")
    }

    val exc = (l: Int) => col(s"__x$l") === true
    val hit = (l: Int) => col(s"__x$l") === false || col(s"__wk$l").isNotNull
    // exception first (its suffix = rule minus leftmost label), then
    // the longest exact-or-wildcard match, then the implicit '*'
    val snlab =
      when(exc(4), 3).when(exc(3), 2).when(exc(2), 1)
        .when(hit(4), 4).when(hit(3), 3).when(hit(2), 2)
        .when(col("__x1") === false, 1)
        .otherwise(1)
    val dropCols =
      (1 to MaxRuleLabels).flatMap(l => Seq(s"__k$l", s"__x$l")) ++
        (2 to MaxRuleLabels).map(l => s"__wk$l")
    out
      .withColumn("__sn", snlab)
      .withColumn("registrable", array_join(
        slice(labels, greatest(n - col("__sn"), lit(1)),
          col("__sn") + 1), "."))
      .drop(dropCols :+ "__sn": _*)
  }

  /** Per-domain document cap: every doc ranked within its registrable
    * domain by `orderCol` (must be unique — doc_id), `kept = rnk <=
    * maxPerDomain`. No per-group windows (one hot domain never
    * funnels one task): [[Packing.rankWithinGroups]]. */
  def domainCap(docs: DataFrame, urlCol: String, orderCol: String,
      maxPerDomain: Long, rules: Option[DataFrame] = None): DataFrame = {
    val canon = canonicalize(docs, urlCol)
    val withDomain = rules match {
      case Some(r) => registrableDomain(canon, "host", r)
      case None => registrableDomain(canon, "host")
    }
    Packing.rankWithinGroups(withDomain, "registrable", orderCol)
      .withColumn("kept", (col("rnk") <= maxPerDomain).cast("long"))
  }

  /** Domain-level quality gate — the RefinedWeb/FineWeb-style curation
    * step ABOVE the document level: aggregate a per-document quality
    * proxy (word count here; any integer score slots in) to the
    * registrable domain and keep domains with enough coverage AND
    * average quality — low-quality DOMAINS are dropped wholesale
    * before their documents ever reach per-doc filters. Output one row
    * per domain: `(registrable, n_docs, sum_words, mean_words_milli,
    * kept)` with the floored-milli mean (exact integers).
    *
    * Distribution shape: URL parse + eTLD+1 map-side (broadcast suffix
    * dim), ONE groupBy on the domain — map-side combinable; output is
    * domain-count-sized. */
  def domainQualityGate(docs: DataFrame, urlCol: String,
      textCol: String, minDocs: Long = 3L,
      minMeanWordsMilli: Long = 40000L,
      rules: Option[DataFrame] = None): DataFrame = {
    val canon = canonicalize(docs, urlCol)
    val withDomain = rules match {
      case Some(r) => registrableDomain(canon, "host", r)
      case None => registrableDomain(canon, "host")
    }
    withDomain
      .select(col("registrable"),
        size(expr(Dedup.wordsExpr(textCol))).cast("long").as("n_words"))
      .groupBy("registrable")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_words")).cast("long").as("sum_words"))
      .withColumn("mean_words_milli",
        expr("sum_words * 1000L div n_docs"))
      .withColumn("kept",
        col("n_docs") >= minDocs &&
          col("mean_words_milli") >= minMeanWordsMilli)
  }

  /** Blocklist gate: drop documents whose registrable domain appears
    * in `blocked` (one `domain` column; broadcast anti-join). */
  def blocklistFilter(docs: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val withDomain = registrableDomain(canonicalize(docs, urlCol), "host")
    withDomain.join(
      broadcast(blocked.select(col("domain").as("registrable"))),
      Seq("registrable"), "left_anti")
  }

  /** robots.txt gate (RFC 9309) — the stage-ZERO fetch-permission
    * decision a crawl-derived corpus must honor per URL: given the
    * already-parsed rule dimension `(host, agent, allow, pattern)`
    * (one row per Allow/Disallow line of each host's robots.txt), keep
    * a URL iff the most specific matching rule of the applicable group
    * allows it.
    *
    * RFC semantics implemented:
    *   - group selection: if a host has any rule for `agent`, ONLY
    *     that group applies; otherwise the `*` group (RFC 9309 §2.2.1
    *     — groups are not merged);
    *   - pattern match: literal path prefix, `*` matches any octet
    *     run, trailing `$` anchors the end (§2.2.3);
    *   - precedence: the matching rule with the MOST OCTETS in its
    *     pattern wins; on a tie, allow beats disallow (§2.2.2);
    *   - no matching rule, or no rules for the host at all → allowed
    *     (robots is opt-out);
    *   - empty-value rules (`Disallow:` with no path = allow all) are
    *     no-ops and dropped up front.
    *
    * Patterns compile to SQL LIKE (`*`→`%`, `%`/`_`/`\` escaped, the
    * `$` anchor drops the trailing `%`) — the same compilation the
    * DuckDB oracle performs, so both engines evaluate the identical
    * predicate; no regex dialect is involved.
    *
    * Distribution shape (the 100 TB contract): the rule dim is
    * robots-file-sized and BROADCAST; URLs take one map-side parse +
    * one broadcast join on host; the winner-per-URL is one
    * map-side-combinable max of a `(len, allow, pattern)` struct —
    * no window, no shuffle beyond the final groupBy on the URL id.
    *
    * Output: `(id, host, path, rule_pattern, allowed)` —
    * `rule_pattern` is `''` for the default-allow case. */
  def robotsGate(urls: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, agent: String): DataFrame = {
    val parsed = canonicalize(
      urls.select(col(idCol).cast("long").as("id"),
        col(urlCol).as("url")), "url")
      .select(col("id"), col("host"), col("path"))
    val rl = rules.select(lower(col("host")).as("host"),
      lower(col("agent")).as("agent"),
      col("allow").cast("boolean").as("allow"),
      col("pattern"))
    val a = agent.toLowerCase
    val specific = rl.where(col("agent") === a)
      .select(col("host")).distinct().withColumn("__has", lit(1))
    val grp = rl.join(specific, Seq("host"), "left")
      .where((col("agent") === lit(a) && col("__has") === 1) ||
        (col("agent") === "*" && col("__has").isNull))
      .drop("__has", "agent")
    val compiled = grp
      .withColumn("anchored", col("pattern").endsWith("$"))
      .withColumn("body", when(col("anchored"),
          expr("substring(pattern, 1, length(pattern) - 1)"))
        .otherwise(col("pattern")))
      .where(col("body") =!= "")
      .withColumn("lk", concat(
        expr("""replace(replace(replace(replace(body,
               |  '\\', '\\\\'), '%', '\\%'), '_', '\\_'),
               |  '*', '%')""".stripMargin),
        when(col("anchored"), lit("")).otherwise(lit("%"))))
    val winners = parsed
      .join(broadcast(compiled), Seq("host"))
      .where(expr("path LIKE lk ESCAPE '\\\\'"))
      .groupBy(col("id"))
      // RFC 9309 §2.2.2 counts OCTETS, not characters — octet_length
      // (UTF-8 bytes) so a 2-char CJK pattern (6 octets) outranks a
      // 5-char ASCII one, exactly as conformant crawlers break the tie
      .agg(max(struct(octet_length(col("pattern")).as("l"), col("allow"),
        col("pattern"))).as("w"))
      .select(col("id"), col("w.allow").as("__allow"),
        col("w.pattern").as("__pattern"))
    parsed.join(winners, Seq("id"), "left")
      .select(col("id"), col("host"), col("path"),
        coalesce(col("__pattern"), lit("")).as("rule_pattern"),
        coalesce(col("__allow"), lit(true)).as("allowed"))
  }

  /** Per-host fetch POLICY from the full robots.txt surface — the
    * companion to [[robotsGate]]'s per-URL decision: what a polite
    * crawler reads from the same file beyond Allow/Disallow. Input is
    * the directive relation `(host, agent, directive, value)` with
    * `directive` ∈ `allow | disallow | crawl-delay | sitemap` (one row
    * per line of each host's robots.txt).
    *
    * Semantics:
    *   - group scope: `allow`/`disallow`/`crawl-delay` belong to an
    *     agent group; the applicable group is selected exactly like
    *     [[robotsGate]] (a host with ANY rule for `agent` uses ONLY
    *     that group, else the `*` group — RFC 9309 §2.2.1, groups not
    *     merged). A `*`-group crawl-delay therefore never leaks into
    *     a host whose specific group omits one.
    *   - `crawl_delay_ms`: the MINIMUM valid delay of the applicable
    *     group (conservative under contradicting lines), integer
    *     seconds parsed with `try_cast` — non-numeric or negative
    *     values are ignored (fail-open), values cap at 86400 s; no
    *     valid delay ⇒ 0 (crawl-delay is non-standard: RFC 9309
    *     leaves it undefined, this is the common crawler reading).
    *   - `n_allow`/`n_disallow`: the group's non-empty-pattern rule
    *     counts (empty values are no-ops, as in [[robotsGate]]).
    *   - sitemaps are FILE-scoped, not group-scoped (the sitemaps.org
    *     cross-reference convention): every host's distinct sitemap
    *     values count, sorted into one deterministic comma-join.
    *
    * Distribution shape: the directive relation is robots-file-sized
    * per host; everything is host-keyed map-side-combinable groupBys
    * plus hosts-sized joins — no windows, no corpus passes.
    *
    * Output: `(host, agent_group, crawl_delay_ms, n_allow,
    * n_disallow, n_sitemaps, sitemaps)` with `agent_group` ∈
    * `specific | wildcard | none` (none = only sitemap lines). */
  def robotsPolicy(rules: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    val rl = rules.select(lower(col("host")).as("host"),
      lower(col("agent")).as("agent"),
      lower(col("directive")).as("directive"),
      col("value").cast("string").as("value"))
    val grouped = rl.where(
      col("directive").isin("allow", "disallow", "crawl-delay"))
    val hostAgent = grouped.groupBy(col("host")).agg(
      max((col("agent") === a).cast("int")).as("__has_spec"),
      max((col("agent") === "*").cast("int")).as("__has_wild"))
    val grp = grouped.join(hostAgent, Seq("host"))
      .where((col("agent") === a && col("__has_spec") === 1) ||
        (col("agent") === "*" && col("__has_spec") === 0))
    val pathAgg = grp.groupBy(col("host")).agg(
      sum(when(col("directive") === "allow" && col("value") =!= "", 1L)
        .otherwise(0L)).as("n_allow"),
      sum(when(col("directive") === "disallow" && col("value") =!= "",
        1L).otherwise(0L)).as("n_disallow"),
      min(when(col("directive") === "crawl-delay",
        expr("""CASE WHEN try_cast(value AS BIGINT) >= 0
               | THEN least(try_cast(value AS BIGINT), 86400L)
               | END""".stripMargin))).as("__cd"))
    val maps = rl
      .where(col("directive") === "sitemap" && col("value") =!= "")
      .groupBy(col("host"))
      .agg(countDistinct(col("value")).cast("long").as("n_sitemaps"),
        array_join(array_sort(collect_set(col("value"))), ",")
          .as("sitemaps"))
    rl.select(col("host")).distinct()
      .join(hostAgent, Seq("host"), "left")
      .join(pathAgg, Seq("host"), "left")
      .join(maps, Seq("host"), "left")
      .select(col("host"),
        when(col("__has_spec") === 1, "specific")
          .when(col("__has_wild") === 1, "wildcard")
          .otherwise("none").as("agent_group"),
        coalesce(col("__cd") * 1000L, lit(0L)).as("crawl_delay_ms"),
        coalesce(col("n_allow"), lit(0L)).as("n_allow"),
        coalesce(col("n_disallow"), lit(0L)).as("n_disallow"),
        coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"),
        coalesce(col("sitemaps"), lit("")).as("sitemaps"))
  }

  /** Politeness scheduler — [[robotsPolicy]] composed with the
    * frontier: every URL gets its per-host fetch sequence number and
    * the earliest offset (ms from the host's first fetch) at which a
    * polite crawler may issue it under the host's crawl-delay. Hosts
    * without a policy row (or without a valid delay) schedule at
    * offset 0 — robots is opt-out, the [[robotsGate]] fail-open rule.
    *
    * Distribution shape: URL parse map-side; the policy relation is
    * hosts-sized and joined on the host key; the per-host sequence is
    * [[Packing.rankWithinGroups]] (range-split + offset composition —
    * one hot host with a billion frontier URLs never funnels one
    * task); the offset is one per-row multiply.
    *
    * Output: `(id, host, fetch_seq, crawl_delay_ms,
    * scheduled_offset_ms)` with `fetch_seq` ordered by `idCol`
    * (frontier discovery order — ids are the crawl's arrival
    * sequence, the same contract as [[domainCap]]'s `orderCol`). */
  def crawlSchedule(urls: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, agent: String): DataFrame = {
    val parsed = canonicalize(
      urls.select(col(idCol).cast("long").as("id"),
        col(urlCol).as("url")), "url")
      .select(col("id"), col("host"))
    val delays = robotsPolicy(rules, agent)
      .select(col("host"), col("crawl_delay_ms"))
    val ranked = Packing.rankWithinGroups(
      parsed.join(delays, Seq("host"), "left"), "host", "id",
      rankCol = "fetch_seq")
    ranked.select(col("id"), col("host"),
      col("fetch_seq").cast("long").as("fetch_seq"),
      coalesce(col("crawl_delay_ms"), lit(0L)).as("crawl_delay_ms"),
      ((col("fetch_seq") - 1L) *
        coalesce(col("crawl_delay_ms"), lit(0L)))
        .as("scheduled_offset_ms"))
  }
}
