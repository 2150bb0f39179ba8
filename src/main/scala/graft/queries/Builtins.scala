package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Built-in SQL surface beyond RefParity's core (SURVEY.md §2.4-§2.8):
  * subqueries, grouping sets, higher-order array functions, maps, math,
  * ordered collect, arg-min/max, explode — plus the SQL entry point itself
  * (queries here that go through `spark.sql` register the parquet tables as
  * temp views first, exercising catalog resolution the way the reference's
  * one SQL query did, /root/reference/src/main/java/org/test/pcap4j/
  * MainApp.java:44-47).
  */
object Builtins extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Register needed tables as temp views and run a SQL text — the
    * engine's `spark.sql` entry (SURVEY.md §3.1). */
  private def sql(s: SparkSession, dir: String, tables: Seq[String],
      q: String): DataFrame = {
    tables.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(q)
  }

  override val queries: Seq[GraftQuery] = Seq(

    // ---- correlated scalar subquery (SQL entry point) ----
    GraftQuery("q_scalar_subquery",
      (s, dir) => sql(s, dir, Seq("customer", "orders"),
        """SELECT c_custkey,
          |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
          |  (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders
          |   WHERE o_custkey = c_custkey) AS spend
          |FROM customer""".stripMargin),
      Some("""SELECT c_custkey,
             |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
             |  (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders
             |   WHERE o_custkey = c_custkey) AS spend
             |FROM customer""".stripMargin)),

    // ---- IN subquery ----
    GraftQuery("q_in_subquery",
      (s, dir) => sql(s, dir, Seq("customer", "orders"),
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer
          |                    WHERE c_mktsegment = 'MACHINERY')""".stripMargin),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'MACHINERY')""".stripMargin)),

    // ---- GROUPING SETS (beyond rollup/cube) ----
    GraftQuery("q_grouping_sets",
      (s, dir) => sql(s, dir, Seq("lineitem"),
        """SELECT coalesce(l_returnflag, '<rf>') AS rf,
          |       coalesce(l_linestatus, '<ls>') AS ls,
          |       round(sum(l_extendedprice), 2) AS price, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
      Some("""SELECT coalesce(l_returnflag, '<rf>') AS rf,
             |       coalesce(l_linestatus, '<ls>') AS ls,
             |       round(sum(l_extendedprice), 2) AS price, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)),

    // ---- higher-order array functions ----
    GraftQuery("q_array_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            expr("filter(split(text, ' '), w -> w <> '')").as("words"))
          .select(
            $"doc_id",
            expr("size(words)").cast("long").as("n"),
            expr("array_max(transform(words, w -> length(w)))").cast("long")
              .as("max_len"),
            expr("size(filter(words, w -> length(w) > 5))").cast("long")
              .as("n_long"),
            expr("aggregate(words, 0L, (acc, w) -> acc + length(w))").as("total_len"),
            expr("array_join(slice(array_sort(array_distinct(words)), 1, 3), '|')")
              .as("first3"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |  list_filter(string_split(text, ' '), w -> w <> '') AS words
             |  FROM documents)
             |SELECT doc_id, len(words)::BIGINT AS n,
             |  list_max(list_transform(words, w -> length(w)))::BIGINT AS max_len,
             |  len(list_filter(words, w -> length(w) > 5))::BIGINT AS n_long,
             |  list_sum(list_transform(words, w -> length(w)))::BIGINT AS total_len,
             |  array_to_string(list_sort(list_distinct(words))[1:3], '|') AS first3
             |FROM d""".stripMargin)),

    // ---- map functions ----
    GraftQuery("q_map_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events").select(
          $"event_id",
          map(lit("type"), $"event_type", lit("uid"), $"user_id".cast("string"))
            .as("m"))
          .select($"event_id",
            expr("element_at(m, 'type')").as("etype"),
            expr("element_at(m, 'uid')").cast("long").as("uid"),
            expr("size(map_keys(m))").cast("long").as("n_keys"))
      },
      Some("""SELECT event_id, event_type AS etype, user_id AS uid,
             |2::BIGINT AS n_keys FROM events""".stripMargin)),

    // ---- math functions ----
    GraftQuery("q_math_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").select(
          $"p_partkey",
          round(sqrt($"p_retailprice"), 4).as("sq"),
          round(pow($"p_retailprice", lit(2)), 2).as("p2"),
          round(log($"p_retailprice"), 4).as("ln_p"),
          floor($"p_retailprice").cast("long").as("fl"),
          ceil($"p_retailprice").cast("long").as("ce"),
          abs($"p_retailprice" - 950.0).as("dist"),
          pmod($"p_partkey", lit(7)).cast("long").as("m7"))
      },
      Some("""SELECT p_partkey, round(sqrt(p_retailprice), 4) AS sq,
             |round(pow(p_retailprice, 2), 2) AS p2,
             |round(ln(p_retailprice), 4) AS ln_p,
             |floor(p_retailprice)::BIGINT AS fl,
             |ceil(p_retailprice)::BIGINT AS ce,
             |abs(p_retailprice - 950.0) AS dist,
             |p_partkey % 7 AS m7 FROM part""".stripMargin)),

    // ---- explode / unnest with position ----
    GraftQuery("q_explode",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").where($"doc_id" < 50)
          .select($"doc_id",
            posexplode(expr("filter(split(text, ' '), w -> w <> '')")))
          .toDF("doc_id", "pos", "word")
          .withColumn("pos", $"pos".cast("long"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |  list_filter(string_split(text, ' '), w -> w <> '') AS words
             |  FROM documents WHERE doc_id < 50),
             |u AS (SELECT doc_id, unnest(list_transform(range(len(words)),
             |  i -> {'pos': i, 'word': words[i+1]})) AS e FROM d)
             |SELECT doc_id, e.pos AS pos, e.word AS word FROM u""".stripMargin)),

    // ---- ordered collect (array_agg) ----
    GraftQuery("q_collect",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").groupBy($"o_custkey")
          .agg(concat_ws(",",
            sort_array(collect_list($"o_orderkey"))).as("order_keys"))
      },
      Some("""SELECT o_custkey,
             |array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ---- arg-min / arg-max ----
    GraftQuery("q_minmax_by",
      (s, dir) => {
        import s.implicits._
        // orderkey tiebreak via struct max: (price, orderkey) orders
        // lexicographically, so ties resolve to the largest orderkey in
        // BOTH engines (arg_max in DuckDB breaks ties arbitrarily)
        t(s, dir, "orders").groupBy($"o_custkey").agg(
          max(struct($"o_totalprice", $"o_orderkey")).getField("o_orderkey")
            .as("best_order"),
          min(struct($"o_totalprice", $"o_orderkey")).getField("o_orderkey")
            .as("worst_order"))
      },
      Some("""SELECT o_custkey,
             |max({'p': o_totalprice, 'k': o_orderkey}).k AS best_order,
             |min({'p': o_totalprice, 'k': o_orderkey}).k AS worst_order
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ---- bitwise aggregate family ----
    // ---- EXACT mergeable distinct counts via bitmaps: group by
    //      (key, bitmap bucket), build one bitmap per bucket
    //      (map-side partial agg of fixed 4 KB buffers), sum the
    //      bucket counts — at scale this replaces count(DISTINCT)'s
    //      Expand+reshuffle with mergeable state, the EXACT sibling
    //      of the HLL estimate for bounded-int domains ----
    GraftQuery("q_bitmap_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag", expr("bitmap_bucket_number(l_suppkey)").as("bucket"))
          .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_suppkey)))")
            .as("cnt"))
          .groupBy($"l_returnflag")
          .agg(sum($"cnt").cast("long").as("n_supp"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey)::BIGINT AS n_supp
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    GraftQuery("q_bit_aggs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").groupBy($"o_orderstatus").agg(
          bit_and($"o_orderkey").as("band"),
          bit_or($"o_orderkey").as("bor"),
          bit_xor($"o_orderkey").as("bxor"))
      },
      Some("""SELECT o_orderstatus,
             |  CAST(bit_and(o_orderkey) AS BIGINT) AS band,
             |  CAST(bit_or(o_orderkey) AS BIGINT) AS bor,
             |  CAST(bit_xor(o_orderkey) AS BIGINT) AS bxor
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- ordered string aggregation (listagg/string_agg): Spark has no
    //      ordered string_agg, so the deterministic spelling is
    //      concat_ws over a sorted collect_list ----
    GraftQuery("q_listagg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation").groupBy($"n_regionkey").agg(
          concat_ws(",", sort_array(collect_list($"n_name"))).as("names"))
      },
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
             |FROM nation GROUP BY n_regionkey""".stripMargin)),

    // ---- n-gram (shingle) Jaccard near-dup: EXACT Jaccard over the whole
    //      corpus via a shingle inverted index (Dedup.ngramJaccard). Hot
    //      shingles (document frequency > 1024) are dropped before the
    //      self-join — on both engines, so the cap is part of the checked
    //      semantics — bounding the one formerly-quadratic path. ----
    GraftQuery("q_ngram_jaccard",
      (s, dir) => graft.operators.Dedup.ngramJaccard(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.2)._2,
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(len(words)-2),
             |    i -> ('0x' || substr(md5(words[i+1]||' '||words[i+2]||' '||words[i+3]), 1, 15))::BIGINT)) AS sh
             |  FROM d WHERE len(words) >= 3),
             |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
             |hot AS (SELECT s FROM e0 GROUP BY s HAVING count(*) > 1024),
             |e AS (SELECT * FROM e0 WHERE s NOT IN (SELECT s FROM hot)),
             |c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS cnt
             |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id)
             |SELECT doc_a, doc_b,
             |  round(cnt / CAST(sa.n + sb.n - cnt AS DOUBLE), 4) AS jaccard
             |FROM c JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
             |WHERE round(cnt / CAST(sa.n + sb.n - cnt AS DOUBLE), 4) >= 0.2""".stripMargin)),

    // ---- multimodal frame sampling over REAL MP4 sample tables: every
    // 5th sample of each clip's video track, timestamp from the two-run
    // stts (prefix-sum of run deltas → exact integer ms at the mdhd
    // media timescale), byte size from stsz (per-sample table, uniform
    // for doc%4==0), codec from stsd. The oracle rebuilds the sample
    // arithmetic from the fixture formulas — a run-boundary or
    // timescale slip lands in t_ms. ----
    GraftQuery("q_frame_sample",
      (s, dir) => graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.mp4SampleFixtures(
          t(s, dir, "documents"), "doc_id"),
        stride = 5),
      Some("""WITH d AS (SELECT doc_id, doc_id % 50 + 10 AS n,
             |    (doc_id % 5 + 1) * 100 AS d1, 1000 * (doc_id % 4 + 1) AS mts
             |  FROM documents),
             |s AS (SELECT doc_id, n, d1, d1 + 40 AS d2, n // 2 AS n1, mts,
             |    unnest(range(0, n, 5)) AS i FROM d)
             |SELECT doc_id, i::BIGINT AS sample_idx,
             |  ((CASE WHEN i < n1 THEN i * d1
             |         ELSE n1 * d1 + (i - n1) * d2 END) * 1000 // mts)::BIGINT
             |    AS t_ms,
             |  (CASE WHEN doc_id % 4 = 0 THEN doc_id % 200 + 100
             |        ELSE (doc_id * 13 + i * 7) % 991 + 1 END)::BIGINT
             |    AS n_bytes,
             |  'avc1' AS codec
             |FROM s""".stripMargin)),

    // ---- exact percentiles (interpolated continuous quantiles) ----
    GraftQuery("q_percentile",
      (s, dir) => {
        import s.implicits._
        // Scalar columns only: an ArrayType output column is unhashable in
        // the driver's pandas-based compare (numpy.ndarray cells).
        t(s, dir, "lineitem").groupBy($"l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.25D)"), 4).as("qty_q25"),
            round(expr("percentile(l_quantity, 0.5D)"), 4).as("qty_q50"),
            round(expr("percentile(l_quantity, 0.75D)"), 4).as("qty_q75"),
            round(expr("percentile(l_extendedprice, 0.5D)"), 4).as("median_price"))
      },
      Some("""SELECT l_returnflag,
             |round(quantile_cont(l_quantity, 0.25), 4) AS qty_q25,
             |round(quantile_cont(l_quantity, 0.5), 4) AS qty_q50,
             |round(quantile_cont(l_quantity, 0.75), 4) AS qty_q75,
             |round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- year-over-year growth: monthly order counts vs the LATEST
    //      PRECEDING year with data for that month (lag over
    //      PARTITION BY m ORDER BY y — if a month has a gap year the
    //      comparison silently spans it rather than being strictly y-1;
    //      the oracle lags identically, so this IS the checked
    //      semantics). Growth as exact integer ppm (counts avoid the
    //      float-sum ordering trap a revenue ratio has). The lag window
    //      runs over the months-sized aggregate, partitioned by
    //      month-of-year — never the fact table ----
    GraftQuery("q_yoy",
      (s, dir) => {
        import s.implicits._
        val m = t(s, dir, "orders")
          .groupBy(year($"o_orderdate").cast("long").as("y"),
            month($"o_orderdate").cast("long").as("m"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"m").orderBy($"y")
        m.withColumn("prev_n", lag($"n", 1).over(w))
          .withColumn("growth_ppm",
            when($"prev_n".isNotNull, expr("n * 1000000L DIV prev_n")))
          .select($"y", $"m", $"n", $"prev_n", $"growth_ppm")
      },
      Some("""WITH m AS (
             |  SELECT date_part('year', o_orderdate)::BIGINT AS y,
             |    date_part('month', o_orderdate)::BIGINT AS m,
             |    count(*)::BIGINT AS n
             |  FROM orders GROUP BY 1, 2),
             |g AS (SELECT y, m, n,
             |    lag(n) OVER (PARTITION BY m ORDER BY y) AS prev_n
             |  FROM m)
             |SELECT y, m, n, prev_n,
             |  CASE WHEN prev_n IS NOT NULL
             |       THEN (n * 1000000) // prev_n END AS growth_ppm
             |FROM g""".stripMargin)),

    // ---- grouped mode (most frequent value, smallest-value tie-break)
    //      as two aggregations — the count argmax is a single
    //      max(struct(cnt, -value)) that partial-aggregates map-side,
    //      the same no-window argmax shape as label propagation ----
    GraftQuery("q_mode",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_quantity")
          .agg(count(lit(1)).as("cnt"))
          .groupBy($"l_returnflag")
          .agg(max(struct($"cnt", (-$"l_quantity").as("negq"))).as("m"))
          .select($"l_returnflag", $"m.cnt".as("n_occurrences"),
            (-$"m.negq").as("mode_qty"))
      },
      Some("""WITH c AS (
             |  SELECT l_returnflag, l_quantity, count(*)::BIGINT AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT l_returnflag, l_quantity, cnt,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY cnt DESC, l_quantity) AS rk
             |  FROM c)
             |SELECT l_returnflag, cnt AS n_occurrences,
             |  l_quantity AS mode_qty
             |FROM r WHERE rk = 1""".stripMargin)),

    // ---- median absolute deviation: the robust spread statistic
    //      (q_outliers' stddev is hostage to the very outliers it
    //      hunts). Two grouped percentile passes: per-group median,
    //      rejoined, then the median of absolute deviations ----
    GraftQuery("q_mad",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").select($"l_returnflag", $"l_quantity")
        val med = li.groupBy($"l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5D)").as("med"))
        li.join(med, "l_returnflag")
          .groupBy($"l_returnflag")
          .agg(round(min($"med"), 4).as("median_qty"),
            round(expr("percentile(abs(l_quantity - med), 0.5D)"), 4).as("mad"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
             |  FROM lineitem GROUP BY 1)
             |SELECT l.l_returnflag,
             |  round(min(m.med), 4) AS median_qty,
             |  round(quantile_cont(abs(l.l_quantity - m.med), 0.5), 4) AS mad
             |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
             |GROUP BY l.l_returnflag""".stripMargin)),

    // ---- deterministic hash sampling (reproducible ~10% sample across
    //      engines AND cluster sizes — never rand()-based at scale) ----
    GraftQuery("q_sample",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where(expr(graft.operators.Dedup.h60(
            "concat(l_orderkey, '_', l_linenumber)")) % 100 < 10)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE ('0x'||substr(md5(l_orderkey || '_' || l_linenumber),1,15))::BIGINT
             |      % 1000000007 % 100 < 10""".stripMargin)),

    // ---- variance family ----
    GraftQuery("q_stats_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").groupBy($"l_returnflag").agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(min($"l_quantity"), 2).as("min_qty"),
          round(max($"l_quantity"), 2).as("max_qty"))
      },
      Some("""SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty,
             |round(var_samp(l_quantity), 4) AS var_qty,
             |round(min(l_quantity), 2) AS min_qty,
             |round(max(l_quantity), 2) AS max_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- multiset set-ops (ALL variants) ----
    GraftQuery("q_intersect_all",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select($"o_custkey".as("k"))
          .intersectAll(t(s, dir, "customer").select($"c_custkey".as("k")))
      },
      Some("""SELECT o_custkey AS k FROM orders
             |INTERSECT ALL
             |SELECT c_custkey AS k FROM customer""".stripMargin)),

    // ---- salted two-phase aggregation (skew mitigation; result provably
    //      identical to the plain groupBy, which is the oracle) ----
    GraftQuery("q_salted_agg",
      (s, dir) => {
        import s.implicits._
        graft.operators.Skew.saltedSumCount(
          t(s, dir, "lineitem"), $"l_returnflag", $"l_quantity")
          .select($"k", round($"sum_value", 2).as("sum_value"), $"n")
      },
      Some("""SELECT l_returnflag AS k, round(sum(l_quantity), 2) AS sum_value,
             |count(*) AS n FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- remaining analytic window functions ----
    GraftQuery("q_window_lead_ntile",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders").select(
          $"o_custkey", $"o_orderkey",
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |lead(o_totalprice) OVER w AS next_price,
             |ntile(4) OVER w AS quartile,
             |round(percent_rank() OVER w, 6) AS pr
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // ---- regex: capture groups + pattern predicate ----
    GraftQuery("q_regex",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .where($"c_name".rlike("[0-9]{3}$"))
          .select(
            $"c_custkey",
            regexp_extract($"c_name", "([0-9]+)$", 1).as("name_num"),
            regexp_extract($"c_name", "^([A-Za-z]+)", 1).as("name_head"))
      },
      Some("""SELECT c_custkey,
             |regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
             |regexp_extract(c_name, '^([A-Za-z]+)', 1) AS name_head
             |FROM customer WHERE regexp_matches(c_name, '[0-9]{3}$')""".stripMargin)),

    // ---- from_json with explicit schema (beyond get_json_object) ----
    GraftQuery("q_from_json",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events").select(
          $"event_id",
          from_json($"props", lit("k INT, s STRING")).as("p"))
          .select($"event_id", $"p.k".cast("long").as("k"), $"p.s".as("s"))
      },
      Some("""SELECT event_id,
             |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |json_extract_string(props, '$.s') AS s
             |FROM events""".stripMargin)),

    // ---- VARIANT (Spark 4 semi-structured type): props parsed ONCE
    //      into the binary variant encoding, fields then extracted with
    //      typed variant_get — the open-schema path that skips
    //      per-extraction JSON re-parsing (q_from_json's shape) ----
    GraftQuery("q_variant",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", parse_json($"props").as("v"))
          .select($"event_id",
            variant_get($"v", "$.k", "long").as("k"),
            variant_get($"v", "$.s", "string").as("s"))
      },
      Some("""SELECT event_id,
             |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |json_extract_string(props, '$.s') AS s
             |FROM events""".stripMargin)),

    // ---- date arithmetic ----
    GraftQuery("q_date_arith",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select(
          $"o_orderkey",
          date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
          date_add($"o_orderdate".cast("date"), 30).as("due"),
          datediff(lit("1998-12-31").cast("date"), $"o_orderdate".cast("date"))
            .cast("long").as("days_to_eoy"),
          dayofweek($"o_orderdate").cast("long").as("dow"))
      },
      Some("""SELECT o_orderkey,
             |CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |CAST(o_orderdate AS DATE) + 30 AS due,
             |date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
             |dayofweek(o_orderdate) + 1 AS dow
             |FROM orders""".stripMargin)),

    // ---- unpivot / melt (inverse of q_pivot) ----
    GraftQuery("q_unpivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            $"l_extendedprice", $"l_discount")
          .unpivot(
            ids = Array($"l_orderkey", $"l_linenumber"),
            values = Array($"l_quantity", $"l_extendedprice", $"l_discount"),
            variableColumnName = "measure",
            valueColumnName = "val")
      },
      Some("""SELECT l_orderkey, l_linenumber, measure, val
             |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
             |      l_extendedprice, l_discount FROM lineitem)
             |UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount))
             |""".stripMargin)),

    // ---- full outer join (completes the join-type surface) ----
    GraftQuery("q_full_outer_join",
      (s, dir) => {
        import s.implicits._
        val big = t(s, dir, "orders").where($"o_totalprice" > 400000.0)
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_big"))
        val seg = t(s, dir, "customer").where($"c_mktsegment" === "AUTOMOBILE")
          .select($"c_custkey", $"c_acctbal")
        seg.join(big, $"c_custkey" === $"o_custkey", "full_outer")
          .select(
            coalesce($"c_custkey", $"o_custkey").as("custkey"),
            $"c_acctbal", $"n_big")
      },
      Some("""SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_big
             |FROM (SELECT c_custkey, c_acctbal FROM customer
             |      WHERE c_mktsegment = 'AUTOMOBILE') c
             |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
             |      WHERE o_totalprice > 400000.0 GROUP BY o_custkey) o
             |ON c_custkey = o_custkey""".stripMargin))
  )
}
