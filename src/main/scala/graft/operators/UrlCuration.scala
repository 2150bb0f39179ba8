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
  * suffix. The suffix table here is a bounded built-in of common
  * multi-part suffixes ([[MultiPartSuffixes]]) with last-two-labels
  * fallback — production swaps in the full public-suffix list as the
  * same BROADCAST dimension (the list is ~10k rows; the join shape,
  * a broadcast equi-join on the host's last-two-label key, is the
  * 100 TB design and does not change with the list).
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

  /** Registrable domain (eTLD+1) for a host column, via the broadcast
    * suffix dimension: if the host's last TWO labels are a known
    * multi-part suffix, the registrable domain is the last THREE
    * labels; otherwise the last two (single-label hosts are their own
    * domain). Adds `registrable`. */
  def registrableDomain(df: DataFrame, hostCol: String): DataFrame = {
    val spark = df.sparkSession
    val suffixDf = broadcast(
      spark.createDataFrame(MultiPartSuffixes.map(Tuple1(_)))
        .toDF("__suffix"))
    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    val lastK = (k: Int) =>
      array_join(slice(labels, greatest(n - (k - 1), lit(1)), lit(k)), ".")
    df.withColumn("__last2", when(n >= 2, lastK(2)).otherwise(col(hostCol)))
      .withColumn("__last3", when(n >= 3, lastK(3))
        .otherwise(col(hostCol)))
      .join(suffixDf, col("__last2") === col("__suffix"), "left")
      .withColumn("registrable",
        when(col("__suffix").isNotNull, col("__last3"))
          .otherwise(col("__last2")))
      .drop("__last2", "__last3", "__suffix")
  }

  /** Per-domain document cap: every doc ranked within its registrable
    * domain by `orderCol` (must be unique — doc_id), `kept = rnk <=
    * maxPerDomain`. No per-group windows (one hot domain never
    * funnels one task): [[Packing.rankWithinGroups]]. */
  def domainCap(docs: DataFrame, urlCol: String, orderCol: String,
      maxPerDomain: Long): DataFrame = {
    val withDomain = registrableDomain(
      canonicalize(docs, urlCol), "host")
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
      minMeanWordsMilli: Long = 40000L): DataFrame = {
    val withDomain = registrableDomain(canonicalize(docs, urlCol), "host")
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
}
