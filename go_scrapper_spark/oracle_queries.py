"""Driver-contract query registry (SURVEY.md §5.2-3).

Every SQL-expressible operator from SURVEY.md §2 plus the
training-data pipeline tier gets a (Spark callable, DuckDB oracle SQL)
pair. Conventions that make the driver's order-insensitive value-hash
compare exact across engines:

- no float arithmetic in outputs: money in integer cents, ratios in
  exact permille, embeddings quantized to integer milli-units;
- every computed integer column is explicitly BIGINT on both sides;
- identical aliases on both sides;
- md5/base64/levenshtein produce identical strings in both engines.

Non-SQL-expressible entries (the crawl engine itself, the multimodal
mapInPandas stage) are registered in NO_ORACLE — the driver records a
rows-only check for those, and tests/test_crawl_equivalence.py holds
them to the stronger model-equivalence standard instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_scrapper_spark.functions import textstats
from go_scrapper_spark.functions.urltools import canonicalize_udf
from go_scrapper_spark.operators import dedupe, multimodal, similarity
from go_scrapper_spark.streaming.sessionize import sql_sessionize


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# =============================================================================
# Group A — crawl-operator analogs over the TPC-H-ish tables
# =============================================================================

def q_a1_pricing_summary(spark, sf):
    """A-series aggregation flagship (TPC-H Q1 shape, integer-cent math)."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
        F.sum(
            _cents("l_extendedprice")
            * F.round((1 - F.col("l_discount")) * 100).cast("long")
        ).alias("sum_disc_c4"),
        F.count("*").alias("count_order"),
    )


SQL_A1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c4,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_w3_topk_per_group(spark, sf):
    """W3 wave selection shape: per-key top-3 by (date desc, key)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


SQL_W3 = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_w4_argmax(spark, sf):
    """W4/J2 winner-selection: per nation, the max-acctbal supplier."""
    s = _t(spark, sf, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_nationkey", F.col("s_suppkey").alias("winner_suppkey"))
    )


SQL_W4 = """
SELECT s_nationkey, s_suppkey AS winner_suppkey FROM (
  SELECT s_nationkey, s_suppkey,
         row_number() OVER (PARTITION BY s_nationkey
              ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier) WHERE rn = 1
"""


def q_j3_seen_antijoin(spark, sf):
    """J3 seen-filter shape: left anti join (customers with no orders)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


SQL_J3 = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_j4_fetch_join(spark, sf):
    """J4 fetch-join shape: big-big equi join + agg."""
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


SQL_J4 = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_j5_broadcast_dims(spark, sf):
    """J5 robots-join shape: broadcast dimension chain."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_J5 = """
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_j1_similarity_match(spark, sf):
    """J1 match-service shape: cross join + edit-distance argmin."""
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    scored = n.crossJoin(F.broadcast(r)).select(
        "n_name", "r_name",
        F.levenshtein("n_name", "r_name").cast("long").alias("dist"),
    )
    w = Window.partitionBy("n_name").orderBy(F.col("dist").asc(), F.col("r_name").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", F.col("r_name").alias("best_region"), "dist")
    )


SQL_J1 = """
SELECT n_name, r_name AS best_region, dist FROM (
  SELECT n_name, r_name, CAST(levenshtein(n_name, r_name) AS BIGINT) AS dist,
         row_number() OVER (PARTITION BY n_name
              ORDER BY levenshtein(n_name, r_name), r_name) AS rn
  FROM nation CROSS JOIN region) WHERE rn = 1
"""


def q_f6_status_routing(spark, sf):
    """F6 status-code routing: when/otherwise → scrape status."""
    e = _t(spark, sf, "events")
    status = (
        F.when(F.col("event_type") == "error", "SCRAPE_FAILED")
        .when(F.col("event_type") == "purchase", "SUCCESS_SCRAPED")
        .when(F.col("event_type") == "signup", "NO_REVIEWS")
        .otherwise("RETRY")
    )
    return e.groupBy(status.alias("scrape_status")).agg(F.count("*").alias("n"))


def q_f_suite(spark, sf):
    """F5 (retry bound) + F6 (status routing) as one union-typed
    entry — consolidated round 5 (mm_suite pattern) to make window
    room for host_template_strip; both checks stay value-exact."""
    f5 = q_f5_retry_filter(spark, sf).select(
        F.lit("f5").alias("kind"),
        F.col("l_linenumber").cast("string").alias("key"), "n",
    )
    f6 = q_f6_status_routing(spark, sf).select(
        F.lit("f6").alias("kind"), F.col("scrape_status").alias("key"), "n",
    )
    return f5.unionByName(f6)


SQL_F_SUITE = """
SELECT 'f5' AS kind, CAST(l_linenumber AS VARCHAR) AS key, count(*) AS n
FROM lineitem WHERE l_linenumber < 5 GROUP BY 2
UNION ALL
SELECT 'f6' AS kind,
       CASE event_type WHEN 'error' THEN 'SCRAPE_FAILED'
                       WHEN 'purchase' THEN 'SUCCESS_SCRAPED'
                       WHEN 'signup' THEN 'NO_REVIEWS'
                       ELSE 'RETRY' END AS key,
       count(*) AS n
FROM events GROUP BY 2
"""


def q_f4_prefix_truncate(spark, sf):
    """F4/W2 seen-hash cut: keep rows before the first 'R' flag per order."""
    l = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey")
    cut = F.min(
        F.when(F.col("l_returnflag") == "R", F.col("l_linenumber"))
    ).over(w)
    return (
        l.withColumn("cut", cut)
        .filter(F.col("l_linenumber") < F.coalesce(F.col("cut"), F.lit(999)))
        .select("l_orderkey", "l_linenumber")
    )


SQL_F4 = """
SELECT l_orderkey, l_linenumber FROM (
  SELECT l_orderkey, l_linenumber,
         min(CASE WHEN l_returnflag = 'R' THEN l_linenumber END)
             OVER (PARTITION BY l_orderkey) AS cut
  FROM lineitem) WHERE l_linenumber < coalesce(cut, 999)
"""


def q_f5_retry_filter(spark, sf):
    """F5 retry bound: attempt < 5 filter shape."""
    l = _t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_linenumber") < 5)
        .groupBy("l_linenumber")
        .agg(F.count("*").alias("n"))
    )


def q_g1_pagination_fanout(spark, sf):
    """G1/G2 pagination fan-out: explode(sequence(0, n-1, step))."""
    l = _t(spark, sf, "lineitem")
    counts = l.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    return counts.filter(F.col("n") >= 1).select(
        "l_orderkey",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n") - 1, F.lit(2).cast("long"))).alias("page_start"),
    )


SQL_G1 = """
SELECT l_orderkey, unnest(range(0, n, 2)) AS page_start
FROM (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)
WHERE n >= 1
"""


def q_u1_union_streams(spark, sf):
    """U1 stream union: normal + non-recommended merge shape."""
    c = _t(spark, sf, "customer").select(
        F.col("c_name").alias("entity_name"), F.lit("customer").alias("src")
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_name").alias("entity_name"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


SQL_U1 = """
SELECT c_name AS entity_name, 'customer' AS src FROM customer
UNION ALL
SELECT s_name AS entity_name, 'supplier' AS src FROM supplier
"""


def q_a5_rate_accounting(spark, sf):
    """A5 window-based rate accounting: per-key count + first/last ms."""
    e = _t(spark, sf, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))  # parquet NTZ → UTC instant
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min(ms).alias("first_ms"),
        F.max(ms).alias("last_ms"),
    )


SQL_A5 = """
SELECT user_id, count(*) AS n_events,
       min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms
FROM events GROUP BY user_id
"""


def q_p_scalar_suite(spark, sf):
    """P-series scalar projection suite: md5 (P17), base64 (P12),
    regexp_extract (P3/P4), concat (P16), date→unix (P10)."""
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.concat_ws(", ", "c_name", "c_mktsegment").alias("display"),
        F.length("c_name").cast("long").alias("name_len"),
    )


SQL_P = """
SELECT c_custkey, md5(c_name) AS name_md5, to_base64(encode(c_name)) AS name_b64,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       concat_ws(', ', c_name, c_mktsegment) AS display,
       CAST(length(c_name) AS BIGINT) AS name_len
FROM customer
"""


def q_p10_date_parse(spark, sf):
    """P10 Go date layout 1/2/2006 → unix seconds, via format+parse
    round trip (main.go:676)."""
    o = _t(spark, sf, "orders")
    disp = F.date_format("o_orderdate", "M/d/yyyy")
    return o.select(
        "o_orderkey",
        disp.alias("source_date"),
        F.unix_timestamp(F.to_timestamp(disp, "M/d/yyyy")).alias("posted_at"),
    )


def q_p_datetime_url(spark, sf):
    """P10 (Go date layout → unix) and P13 (RFC-3986 canonicalization)
    as one union-typed entry — consolidated round 5 (the mm_suite
    pattern) to hold the registry inside the driver's 50-entry window
    while adding dedup_paragraph; both remain value-exact."""
    d = q_p10_date_parse(spark, sf).select(
        F.lit("date").alias("kind"), F.col("o_orderkey").alias("key"),
        F.col("source_date").alias("a"),
        F.col("posted_at").cast("string").alias("b"),
    )
    c = q_canon_urls(spark, sf).select(
        F.lit("canon").alias("kind"), F.col("c_custkey").alias("key"),
        F.col("canon_url").alias("a"), F.lit("").alias("b"),
    )
    return d.unionByName(c)


SQL_P_DATETIME_URL = """
SELECT 'date' AS kind, o_orderkey AS key,
       strftime(o_orderdate, '%-m/%-d/%Y') AS a,
       CAST(CAST(epoch(strptime(strftime(o_orderdate, '%-m/%-d/%Y'),
            '%-m/%-d/%Y')) AS BIGINT) AS VARCHAR) AS b
FROM orders
UNION ALL
SELECT 'canon' AS kind, c_custkey AS key,
       'https://host' || c_custkey || '.example/A/Path?a=1&b=2' AS a,
       '' AS b
FROM customer
"""


def q_p18_review_hash(spark, sf):
    """P18 review-hash (text+author branch) in pure SQL — valid because
    these names contain no JSON-escaped characters; the general case is
    the gojson pandas path tested in test_gojson.py."""
    c = _t(spark, sf, "customer")
    marshalled = F.concat(F.lit('["'), F.col("c_name"), F.lit('","'),
                          F.col("c_mktsegment"), F.lit('"]'))
    return c.select("c_custkey", F.md5(marshalled.cast("binary")).alias("review_hash"))


SQL_P18 = """
SELECT c_custkey, md5('["' || c_name || '","' || c_mktsegment || '"]') AS review_hash
FROM customer
"""


def q_canon_urls(spark, sf):
    """P13 RFC-3986 canonicalization — the UDF versus a SQL-computed
    expected form (scheme/host lowercase, default port stripped, dot
    segments removed, query sorted, fragment dropped)."""
    c = _t(spark, sf, "customer")
    raw = F.concat(
        F.lit("HTTPS://Host"), F.col("c_custkey"), F.lit(".Example:443/A/./b/../Path?b=2&a=1#f")
    )
    return c.select("c_custkey", canonicalize_udf(raw).alias("canon_url"))


def q_robots_policy(spark, sf):
    """S9 robots enforcement, parse stage: synthesize a deterministic
    robots.txt body per customer (a googlebot-only group that must NOT
    leak, a star group with allow/disallow/optional crawl-delay), run
    the REAL JVM-side parser (functions/robotstxt.py — posexplode,
    group window, star-group agg), and compare to the directly-computed
    expected policy (the q_canon_urls oracle pattern)."""
    from go_scrapper_spark.functions.robotstxt import parse_robots_txt

    c = _t(spark, sf, "customer")
    k = F.col("c_custkey")
    body = F.concat(
        F.lit(
            "# synthetic robots\nUser-agent: googlebot\nDisallow: /google-only/\n\n"
            "User-agent: *\nAllow: /public/\nDisallow: /private"
        ),
        (k % 7).cast("string"),
        F.lit("/\n"),
        F.when(
            k % 3 == 0,
            F.concat(F.lit("Crawl-delay: "), (k % 5 + 1).cast("string")),
        ).otherwise(F.lit("")),
    )
    raw = c.select(
        F.concat(F.lit("host"), k.cast("string"), F.lit(".example")).alias("host"),
        body.alias("body"),
    )
    p = parse_robots_txt(raw)
    return p.select(
        "host",
        F.explode("disallow_prefixes").alias("disallow_prefix"),
        F.size("allow_prefixes").cast("long").alias("n_allow"),
        "crawl_delay_ms",
        "max_parallel",
    )


SQL_ROBOTS_POLICY = """
SELECT 'host' || c_custkey || '.example' AS host,
       '/private' || (c_custkey % 7) || '/' AS disallow_prefix,
       CAST(1 AS BIGINT) AS n_allow,
       CAST(CASE WHEN c_custkey % 3 = 0 THEN (1 + c_custkey % 5) * 1000
                 ELSE 3000 END AS BIGINT) AS crawl_delay_ms,
       10 AS max_parallel
FROM customer
"""


def q_sitemap_seeds(spark, sf):
    """Sitemap frontier seeding: synthesize a two-entry multi-line
    <urlset> per customer (one entry with lastmod, one with an
    un-canonical UPPERCASE host + explicit :443 and no lastmod), run
    the REAL parser (functions/sitemap.py: block-wise extraction +
    the engine's canonicalizer), compare to the directly-computed
    expected rows."""
    from go_scrapper_spark.functions.sitemap import parse_sitemaps

    c = _t(spark, sf, "customer")
    k = F.col("c_custkey").cast("string")
    body = F.concat(
        F.lit("<urlset>\n<url>\n  <loc>https://host"), k,
        F.lit(".example/a/"), k, F.lit("</loc>\n  <lastmod>2024-01-0"),
        (F.col("c_custkey") % 9 + 1).cast("string"),
        F.lit("</lastmod>\n</url>\n<url><loc>HTTPS://Host"), k,
        F.lit(".Example:443/b/"), k, F.lit("</loc></url>\n</urlset>"),
    )
    raw = c.select(
        F.concat(F.lit("host"), k, F.lit(".example")).alias("host"),
        body.alias("body"),
    )
    return parse_sitemaps(raw)


SQL_SITEMAP_SEEDS = """
SELECT 'host' || c_custkey || '.example' AS host, 'page' AS kind,
       'https://host' || c_custkey || '.example/a/' || c_custkey AS url,
       '2024-01-0' || (c_custkey % 9 + 1) AS lastmod
FROM customer
UNION ALL
SELECT 'host' || c_custkey || '.example' AS host, 'page' AS kind,
       'https://host' || c_custkey || '.example/b/' || c_custkey AS url,
       '' AS lastmod
FROM customer
"""


def q_link_rank(spark, sf):
    """Frontier prioritization by link structure: integer-exact
    PageRank-lite over a deterministic directed graph derived from
    orders (src = customer, dst = orderkey mod 997 — varied in/out
    degrees, cycles included). The oracle unrolls the same three
    iterations in SQL, so agreement verifies the iterative plan's
    fixpoint arithmetic, not one round."""
    from go_scrapper_spark.operators.linkrank import pagerank_lite

    o = _t(spark, sf, "orders").filter(F.col("o_custkey") < 300)
    edges = o.select(
        F.col("o_custkey").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(997)).alias("dst"),
    ).distinct()
    verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    return pagerank_lite(verts, edges, iters=3).select(
        "v", F.col("rank").alias("rank_micro")
    )


def _sql_linkrank(iters: int = 3, damping: int = 850) -> str:
    base = 1_000_000 - damping * 1000
    prev = "r0"
    its = []
    for i in range(1, iters + 1):
        its.append(
            f"""c{i} AS (
  SELECT e.dst AS v, SUM({prev}.r // deg.d) AS s
  FROM edges e JOIN {prev} ON {prev}.v = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst),
r{i} AS (
  SELECT verts.v, CAST({base} + ({damping} * COALESCE(c{i}.s, 0)) // 1000 AS BIGINT) AS r
  FROM verts LEFT JOIN c{i} ON c{i}.v = verts.v)"""
        )
        prev = f"r{i}"
    joined = ",\n".join(its)
    return f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % 997 AS dst
  FROM orders WHERE o_custkey < 300),
verts AS (SELECT DISTINCT src AS v FROM edges UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM verts),
{joined}
SELECT v, r AS rank_micro FROM {prev}
"""


def q_w1_global_topk(spark, sf):
    """W1 global date-desc sort with deterministic tiebreak, as top-100
    (the reference's sorted result list, main.go:984-1007)."""
    e = _t(spark, sf, "events")
    w = Window.orderBy(F.col("ts").desc(), F.col("event_id").asc())
    return (
        e.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 100)
        .select("event_id", "rank")
    )


SQL_W1 = """
SELECT event_id, rank FROM (
  SELECT event_id,
         CAST(row_number() OVER (ORDER BY ts DESC, event_id) AS BIGINT) AS rank
  FROM events) WHERE rank <= 100
"""


def q_u2_distinct(spark, sf):
    """U2 dedup as DISTINCT over a projection."""
    l = _t(spark, sf, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()


def q_u_suite(spark, sf):
    """U1 (stream union) + U2 (DISTINCT dedup) as one union-typed
    entry — consolidated round 5 (mm_suite pattern) to make window
    room for the decontaminate entry; both checks stay value-exact."""
    u1 = q_u1_union_streams(spark, sf).select(
        F.lit("u1").alias("kind"), F.col("entity_name").alias("a"),
        F.col("src").alias("b"),
    )
    u2 = q_u2_distinct(spark, sf).select(
        F.lit("u2").alias("kind"), F.col("l_returnflag").alias("a"),
        F.col("l_linestatus").alias("b"),
    )
    return u1.unionByName(u2)


SQL_U_SUITE = """
SELECT 'u1' AS kind, c_name AS a, 'customer' AS b FROM customer
UNION ALL
SELECT 'u1' AS kind, s_name AS a, 'supplier' AS b FROM supplier
UNION ALL
SELECT DISTINCT 'u2' AS kind, l_returnflag AS a, l_linestatus AS b FROM lineitem
"""


def q_a3_greatest(spark, sf):
    """A3 max-of fixup (histogram.Total_reviews = max(total, len),
    main.go:317-319) as greatest() over integer cents."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.greatest(_cents("o_totalprice"), F.lit(10_000_000).cast("long")).alias(
            "adj_cents"
        ),
    )


SQL_A3 = """
SELECT o_orderkey,
       greatest(CAST(round(o_totalprice*100) AS BIGINT), CAST(10000000 AS BIGINT)) AS adj_cents
FROM orders
"""


def q_a4_histogram(spark, sf):
    """A4 aggregate-rating histogram shape: per-segment count + exact
    integer sum (score passthrough analog)."""
    c = _t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("total_reviews"),
        F.sum(_cents("c_acctbal")).alias("sum_bal_cents"),
    )


SQL_A4 = """
SELECT c_mktsegment, count(*) AS total_reviews,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
FROM customer GROUP BY c_mktsegment
"""


def q_a_meta_suite(spark, sf):
    """A3 (max-of fixup) + A4 (histogram shape) as one union-typed
    entry — consolidated round 5 (mm_suite pattern) to make window
    room for extract_main_content; both checks stay value-exact."""
    a3 = q_a3_greatest(spark, sf).select(
        F.lit("a3").alias("kind"),
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("adj_cents").alias("v1"),
        F.lit(-1).cast("long").alias("v2"),
    )
    a4 = q_a4_histogram(spark, sf).select(
        F.lit("a4").alias("kind"), F.col("c_mktsegment").alias("key"),
        F.col("total_reviews").alias("v1"), F.col("sum_bal_cents").alias("v2"),
    )
    return a3.unionByName(a4)


SQL_A_META_SUITE = """
SELECT 'a3' AS kind, CAST(o_orderkey AS VARCHAR) AS key,
       greatest(CAST(round(o_totalprice*100) AS BIGINT),
                CAST(10000000 AS BIGINT)) AS v1,
       CAST(-1 AS BIGINT) AS v2
FROM orders
UNION ALL
SELECT 'a4' AS kind, c_mktsegment AS key,
       CAST(count(*) AS BIGINT) AS v1,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS v2
FROM customer GROUP BY c_mktsegment
"""


# =============================================================================
# Group B — training-data pipeline operators (documents / embeddings)
# =============================================================================

def q_dedup_exact(spark, sf):
    return dedupe.exact_dedup_groups(_t(spark, sf, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_extract_main_content(spark, sf):
    """Boilerplate removal (functions/boilerplate.py — block split +
    integer link-density filter, all JVM expressions): each document
    is dressed as a page with a link-dense nav, an h1, the article
    body, an all-anchor promo div, a short footer, plus script/style/
    comment noise; the operator must keep exactly the h1 + body and
    drop the rest. The oracle recomputes the whole pipeline
    relationally in DuckDB with the same RE2-safe regexes (no
    backreferences), so the match is value-exact per page including
    the yield metrics."""
    from go_scrapper_spark.functions.boilerplate import extract_main_content

    docs = _t(spark, sf, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    html = F.concat(
        F.lit('<html><head><style>p {}</style>'
              '<script>var x = 1;</script></head><body>'
              '<nav><a href="/">home</a> <a href="/s">'),
        F.substring(t, 1, 30),
        F.lit('</a></nav><h1>'), F.substring(t, 1, 40),
        F.lit('</h1><p>'), t,
        F.lit('</p><div class="promo"><a href="/buy">'),
        F.substring(t, 1, 60),
        F.lit('</a></div><footer>(c) corp</footer></body></html>'),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return extract_main_content(pages, id_col="doc_id")


SQL_EXTRACT_MAIN_CONTENT = r"""
WITH pages AS (
  SELECT doc_id,
         '<html><head><style>p {}</style><script>var x = 1;</script></head><body>'
         || '<nav><a href="/">home</a> <a href="/s">'
         || substr(coalesce(text,''), 1, 30) || '</a></nav>'
         || '<h1>' || substr(coalesce(text,''), 1, 40) || '</h1>'
         || '<p>' || coalesce(text,'') || '</p>'
         || '<div class="promo"><a href="/buy">'
         || substr(coalesce(text,''), 1, 60) || '</a></div>'
         || '<footer>(c) corp</footer></body></html>' AS html
  FROM documents),
cleaned AS (
  SELECT doc_id,
         regexp_replace(html,
           '(?is)<script\b[^>]*>.*?</script>|(?is)<style\b[^>]*>.*?</style>|(?is)<noscript\b[^>]*>.*?</noscript>|(?s)<!--.*?-->',
           ' ', 'g') AS h
  FROM pages),
parts AS (
  SELECT doc_id, string_split_regex(h,
    '(?i)</?(?:p|div|section|article|main|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|header|footer|nav|aside|blockquote|form|fieldset|figure|figcaption|pre|hr)\b[^>]*>|(?i)<br\s*/?>'
  ) AS bs FROM cleaned),
blocks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS idx,
         trim(regexp_replace(regexp_replace(bs[u.i + 1],
              '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS text,
         coalesce(list_sum(list_transform(
             regexp_extract_all(bs[u.i + 1], '(?is)<a\b[^>]*>(.*?)</a>', 1),
             x -> length(trim(regexp_replace(regexp_replace(x,
                  '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))))), 0)
           AS link_chars
  FROM parts CROSS JOIN unnest(range(0, length(bs))) AS u(i)),
scored AS (
  SELECT doc_id, idx, text, CAST(length(text) AS BIGINT) AS tl,
         (length(text) >= 25 AND link_chars * 100 <= 33 * length(text))
           AS good
  FROM blocks WHERE text <> '')
SELECT doc_id,
       coalesce(string_agg(CASE WHEN good THEN text END,
                           chr(10) ORDER BY idx), '') AS main_text,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(count(CASE WHEN good THEN 1 END) AS BIGINT) AS n_good,
       CAST(sum(tl) AS BIGINT) AS total_chars,
       CAST(coalesce(sum(CASE WHEN good THEN tl ELSE 0 END), 0) AS BIGINT)
         AS kept_chars
FROM scored GROUP BY doc_id
"""


def q_dedup_paragraph(spark, sf):
    """Paragraph-level exact dedup (operators/dedupe.py
    paragraph_dedup — the CCNet/RefinedWeb line-dedup stage): the
    single-line documents corpus is dressed with a paragraph break
    every 4 words (deterministic regex, both engines), then repeated
    paragraphs are dropped corpus-wide keeping the globally first
    occurrence by (doc_id, position); the cleaned documents are
    reassembled in order. The oracle recomputes the whole pipeline
    relationally in DuckDB — split, first-occurrence window over the
    paragraph hash, ordered string_agg — so the match is value-exact
    per document (at sf0.01: 6974 paragraphs → 6544 kept)."""
    docs = _t(spark, sf, "documents")
    dressed = docs.select(
        "doc_id",
        F.regexp_replace(
            F.coalesce("text", F.lit("")), r"((?:\S+ ){4})", "$1\n"
        ).alias("text"),
    )
    return dedupe.paragraph_dedup(dressed)


SQL_DEDUP_PARAGRAPH = r"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(coalesce(text,''), '((\S+ ){4})',
                        '\1' || chr(10), 'g') AS t
  FROM documents
), parts AS (
  SELECT doc_id, string_split(t, chr(10)) AS ps FROM d
), p AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS idx, trim(ps[u.i + 1]) AS para
  FROM parts CROSS JOIN unnest(range(0, length(ps))) AS u(i)
  WHERE trim(ps[u.i + 1]) <> ''
), m AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY md5(para)
                            ORDER BY doc_id, idx) AS rn
  FROM p
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                           chr(10) ORDER BY idx), '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept
FROM m GROUP BY doc_id
"""


def q_dedup_substring(spark, sf):
    """Substring-level exact dedup (operators/dedupe.py
    substring_dedup — the Lee et al. 2022 ExactSubstr stage at word
    granularity, one layer below CCNet line dedup): every 3rd
    document gets a fixed 12-word disclaimer spliced onto its tail
    and every 7th a 10-word notice on its head (same dressing both
    engines — the parquet corpus's own 6-grams are md5-unique by
    construction, so the planted spans are what give the operator
    real work). Any 6-token window occurring more than once
    corpus-wide is a duplicated span; tokens covered only by
    non-canonical occurrences (canonical = globally first by
    (doc_id, position)) are dropped and the documents reassembled.
    The oracle recomputes the whole pipeline relationally in DuckDB
    (window explode, per-gram count + first-occurrence row_number,
    position-coverage explode, anti-join, ordered string_agg)."""
    docs = _t(spark, sf, "documents")
    dressed = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 7 == 0, F.lit(_SUBSTR_NOTICE + " "))
            .otherwise(F.lit("")),
            F.coalesce("text", F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" " + _SUBSTR_DISCLAIMER))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedupe.substring_dedup(dressed, k=6)


_SUBSTR_DISCLAIMER = ("this website uses cookies to improve your "
                      "experience and analyze our traffic patterns")
_SUBSTR_NOTICE = ("all rights reserved unauthorized reproduction is "
                  "strictly prohibited by law")

SQL_DEDUP_SUBSTRING = r"""
WITH d AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 7 = 0
               THEN '__NOTICE__ ' ELSE '' END)
         || coalesce(text, '')
         || (CASE WHEN doc_id % 3 = 0
                  THEN ' __DISCLAIMER__' ELSE '' END) AS t
  FROM documents
), ws AS (
  SELECT doc_id, string_split(t, ' ') AS toks, t FROM d
), wins AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS wpos,
         array_to_string(toks[u.i + 1 : u.i + 6], ' ') AS gram
  FROM ws CROSS JOIN unnest(range(0, greatest(len(toks) - 5, 0))) AS u(i)
), m AS (
  SELECT doc_id, wpos,
         count(*) OVER (PARTITION BY gram) AS n,
         row_number() OVER (PARTITION BY gram
                            ORDER BY doc_id, wpos) AS rn
  FROM wins
), cov AS (
  SELECT DISTINCT doc_id, wpos + u.j AS pos
  FROM m CROSS JOIN unnest(range(0, 6)) AS u(j)
  WHERE n > 1 AND rn > 1
), tk AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i + 1] AS tok
  FROM ws CROSS JOIN unnest(range(0, len(toks))) AS u(i)
), kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tk ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(len(string_split(d.t, ' ')) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""
SQL_DEDUP_SUBSTRING = (
    SQL_DEDUP_SUBSTRING
    .replace("__NOTICE__", _SUBSTR_NOTICE)
    .replace("__DISCLAIMER__", _SUBSTR_DISCLAIMER)
)


def q_decontaminate(spark, sf):
    """Eval-set decontamination (operators/decontam.py): every 25th
    document plays the benchmark/eval set; the report lists each
    training document sharing at least one normalized 5-gram with any
    eval document, with the distinct-shared-ngram and distinct-eval-
    doc tallies. Self-overlap (the eval docs are drawn from the same
    corpus) guarantees hits; the oracle recomputes the shingle join
    relationally in DuckDB."""
    from go_scrapper_spark.operators.decontam import contamination_report

    docs = _t(spark, sf, "documents")
    evals = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    return contamination_report(docs, evals, n=5)


SQL_DECONTAMINATE = r"""
WITH normed AS (
  SELECT doc_id, trim(regexp_replace(lower(coalesce(text, '')),
                                     '\s+', ' ', 'g')) AS t
  FROM documents
), grams AS (
  SELECT doc_id, u.i AS i,
         array_to_string(ws[u.i + 1 : u.i + 5], ' ') AS ngram
  FROM (SELECT doc_id, string_split(t, ' ') AS ws FROM normed)
  CROSS JOIN unnest(range(0, greatest(length(ws) - 4, 0))) AS u(i)
  WHERE length(ws) >= 5
), eg AS (
  SELECT DISTINCT doc_id AS eval_id, ngram FROM grams
  WHERE doc_id % 25 = 0 AND ngram <> ''
), dg AS (
  SELECT doc_id, ngram FROM grams WHERE ngram <> ''
)
SELECT dg.doc_id,
       CAST(count(DISTINCT dg.ngram) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT eg.eval_id) AS BIGINT) AS n_eval_docs
FROM dg JOIN eg USING (ngram)
GROUP BY dg.doc_id
"""


def q_host_template_strip(spark, sf):
    """Per-host template removal (dedupe.host_template_strip): docs are
    dressed with a host (doc_id % 7) and paragraph breaks every 4
    words; any paragraph repeating across >= 2 documents of the same
    host (threshold 1/50 of host docs, i.e. any within-host repeat at
    this corpus size) is site template and every occurrence drops.
    Oracle recomputes the document-frequency rule relationally in
    DuckDB (exact-string keys; the engine's xxhash64 key is 64-bit
    identity)."""
    from go_scrapper_spark.operators.dedupe import host_template_strip

    docs = _t(spark, sf, "documents")
    dressed = docs.select(
        "doc_id",
        F.concat(F.lit("h"), F.pmod("doc_id", F.lit(7)).cast("string"))
        .alias("host"),
        F.regexp_replace(
            F.coalesce("text", F.lit("")), r"((?:\S+ ){4})", "$1\n"
        ).alias("text"),
    )
    return host_template_strip(dressed, min_docs=2, num=1, den=50)


SQL_HOST_TEMPLATE_STRIP = r"""
WITH d AS (
  SELECT doc_id, 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
         regexp_replace(coalesce(text,''), '((\S+ ){4})',
                        '\1' || chr(10), 'g') AS t
  FROM documents
), parts AS (
  SELECT doc_id, host, string_split(t, chr(10)) AS ps FROM d
), p AS (
  SELECT doc_id, host, CAST(u.i AS BIGINT) AS idx, trim(ps[u.i + 1]) AS para
  FROM parts CROSS JOIN unnest(range(0, length(ps))) AS u(i)
  WHERE trim(ps[u.i + 1]) <> ''
), hd AS (
  SELECT host, count(*) AS host_docs FROM d GROUP BY host
), tmpl AS (
  SELECT p.host, p.para
  FROM p JOIN hd USING (host)
  GROUP BY p.host, p.para, hd.host_docs
  HAVING count(DISTINCT p.doc_id) >= 2
     AND count(DISTINCT p.doc_id) * 50 >= 1 * hd.host_docs
), tagged AS (
  SELECT p.doc_id, p.idx, p.para,
         (tmpl.para IS NULL) AS keep
  FROM p LEFT JOIN tmpl ON p.host = tmpl.host AND p.para = tmpl.para
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN keep THEN para END,
                           chr(10) ORDER BY idx), '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept
FROM tagged GROUP BY doc_id
"""


def q_dedup_ngram_jaccard(spark, sf):
    return dedupe.ngram_jaccard_pairs(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 400), n=3, num=1, den=5
    )


SQL_DEDUP_JACCARD = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
sh AS (
  SELECT DISTINCT doc_id AS doc, unnest(list_transform(
      range(1, len(string_split(text, ' ')) - 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
           || ' ' || string_split(text, ' ')[i+2])) AS sh
  FROM docs WHERE len(string_split(text, ' ')) >= 3),
sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
  GROUP BY 1, 2)
SELECT doc_a, doc_b, inter, (na.n_sh + nb.n_sh - inter) AS uni
FROM inter JOIN sizes na ON na.doc = doc_a JOIN sizes nb ON nb.doc = doc_b
WHERE inter * 5 >= (na.n_sh + nb.n_sh - inter) * 1
"""


def q_dedup_minhash_lsh(spark, sf):
    return dedupe.minhash_lsh_pairs(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 400), k=6, n=3, bands=3
    )


def _minhash_ctes() -> tuple[str, str]:
    """(CTE text building docs/sh/sig, band-match predicate) — shared
    by the LSH-pairs twin and the connected-components twin."""
    sigs = ",\n       ".join(
        f"min(md5('{i}:' || sh)) AS s{i}" for i in range(6)
    )
    bands = " OR ".join(
        f"(a.s{2*b} = c.s{2*b} AND a.s{2*b+1} = c.s{2*b+1})" for b in range(3)
    )
    ctes = f"""docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
sh AS (
  SELECT DISTINCT doc_id AS doc, unnest(list_transform(
      range(1, len(string_split(text, ' ')) - 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
           || ' ' || string_split(text, ' ')[i+2])) AS sh
  FROM docs WHERE len(string_split(text, ' ')) >= 3),
sig AS (SELECT doc, {sigs} FROM sh GROUP BY doc)"""
    return ctes, bands


def _sql_minhash() -> str:
    ctes, bands = _minhash_ctes()
    matches = " + ".join(
        f"CASE WHEN a.s{i} = c.s{i} THEN 1 ELSE 0 END" for i in range(6)
    )
    return f"""
WITH {ctes}
SELECT a.doc AS doc_a, c.doc AS doc_b, CAST({matches} AS BIGINT) AS sig_matches
FROM sig a JOIN sig c ON a.doc < c.doc AND ({bands})
"""


def q_dedup_simhash(spark, sf):
    return dedupe.simhash(_t(spark, sf, "documents"), bits=16)


def _sql_simhash(bits: int = 16) -> str:
    bit_sums = ",\n         ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS b{b}" for b in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {2**b} ELSE 0 END" for b in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id AS doc,
         CAST(concat('0x', substr(md5(t), 1, {bits//4})) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
agg AS (SELECT doc, {bit_sums} FROM tok GROUP BY doc)
SELECT doc, CAST({fp} AS BIGINT) AS simhash FROM agg
"""


def q_dedup_clusters(spark, sf):
    """Connected components over the MinHash-LSH candidate pairs: the
    pair → cluster stage a dedup pipeline needs before pruning (keep
    min(cluster), drop the rest). The Spark side converges by iterated
    min-label propagation; the DuckDB twin computes true reachability
    with a recursive CTE — agreement proves the iteration reached the
    fixpoint, not just a plausible labeling."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    pairs = dedupe.minhash_lsh_pairs(docs, k=6, n=3, bands=3)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    verts = docs.select(F.col("doc_id").alias("doc"))
    return dedupe.connected_components(verts, edges)


def _sql_dedup_clusters() -> str:
    ctes, bands = _minhash_ctes()
    return f"""
WITH RECURSIVE {ctes},
pairs AS (
  SELECT a.doc AS doc_a, c.doc AS doc_b
  FROM sig a JOIN sig c ON a.doc < c.doc AND ({bands})),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs),
verts AS (SELECT doc_id AS doc FROM docs),
reach(doc, r) AS (
  SELECT doc, doc FROM verts
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.doc)
SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc
"""


def q_sim_topk_dot(spark, sf):
    return similarity.topk_dot(_t(spark, sf, "embeddings"), k=3, n_queries=5)


SQL_SIM_TOPK = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
           FROM embeddings),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.qv[i])) AS BIGINT) AS dot
  FROM v q JOIN v c ON q.vec_id < 5 AND c.vec_id >= 5)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank FROM s)
WHERE rank <= 3
"""


def q_sim_lsh_neighbors(spark, sf):
    # the shipped defaults ARE the gate config (n_tables=8 +
    # Hamming-1 multiprobe, bench-asserted recall@3 >= 0.85) — spelled
    # out so the oracle visibly runs what users get
    return similarity.lsh_bucketed_neighbors(
        _t(spark, sf, "embeddings"), k=3, n_queries=5, n_planes=4, dim=64,
        n_tables=8, multiprobe=True,
    )


def _sql_lsh_neighbors(n_planes: int = 4, n_tables: int = 8) -> str:
    """DuckDB twin of the multi-table (OR-amplified) LSH with query-
    side Hamming-1 multiprobe: one bucket per (vector, table) with
    table-seeded plane weights; the query side probes its exact bucket
    plus every 1-bit flip (xor with each plane mask); candidates =
    union of per-table bucket joins, deduped by the same
    max-aggregate."""
    per_table = []
    for t in range(n_tables):
        projs = " + ".join(
            f"CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> qv[i] * ((({t}*7919 + {p}*104729 + (i-1)*97) * 2654435761) "
            f"% 999983 % 7 - 3))) > 0 "
            f"THEN {2**p} ELSE 0 END"
            for p in range(n_planes)
        )
        per_table.append(f"SELECT vec_id, qv, {t} AS tbl, ({projs}) AS bucket FROM v0")
    v_union = "\n      UNION ALL\n      ".join(per_table)
    masks = ", ".join(["(0)"] + [f"({1 << p})" for p in range(n_planes)])
    return f"""
WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
            FROM embeddings),
v AS ({v_union}),
masks AS (SELECT * FROM (VALUES {masks}) m(mask)),
qprobe AS (
  SELECT vec_id, qv, tbl, xor(bucket, mask) AS bucket
  FROM v, masks WHERE vec_id < 5),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(max(list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.qv[i]))) AS BIGINT) AS dot
  FROM qprobe q JOIN v c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id >= 5
  GROUP BY q.vec_id, c.vec_id)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank FROM s)
WHERE rank <= 3
"""


def q_emb_near_dup(spark, sf):
    # block_size=256 forces a multi-tile plan even at small sf, so the
    # distributed blocked-matmul path (not a degenerate single tile) is
    # what the oracle verifies
    return similarity.cosine_near_dup_pairs(
        _t(spark, sf, "embeddings"), num=3, den=10, block_size=256
    )


SQL_EMB_NEAR_DUP = """
WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
           FROM embeddings),
p AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(list_sum(list_transform(range(1,65), i -> a.v[i]*b.v[i])) AS BIGINT) AS dot,
         CAST(list_sum(list_transform(range(1,65), i -> a.v[i]*a.v[i])) AS BIGINT) AS na,
         CAST(list_sum(list_transform(range(1,65), i -> b.v[i]*b.v[i])) AS BIGINT) AS nb
  FROM v a JOIN v b ON a.id < b.id)
SELECT id_a, id_b, dot FROM p
WHERE dot > 0 AND dot*dot*100 >= na*nb*9
"""


def q_emb_quantize(spark, sf):
    """int8 embedding quantization (vec_id < 200 bounds the exploded
    row count). Sign-decomposed integer division on both engines —
    Spark `div` truncates, DuckDB `//` floors, so |x| first."""
    return similarity.quantize_int8(
        _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    )


SQL_EMB_QUANTIZE = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS mv
  FROM embeddings WHERE vec_id < 200),
m AS (SELECT vec_id, mv, list_max(list_transform(mv, x -> abs(x))) AS maxabs FROM v)
SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim_idx,
       CAST(CASE WHEN maxabs = 0 THEN 0
                 WHEN mv[CAST(u.i AS INT)] < 0 THEN -((abs(mv[CAST(u.i AS INT)]) * 127) // maxabs)
                 ELSE (mv[CAST(u.i AS INT)] * 127) // maxabs END AS BIGINT) AS q,
       CAST(maxabs AS BIGINT) AS maxabs_milli
FROM m CROSS JOIN unnest(range(1, 65)) AS u(i)
"""


def q_text_quality(spark, sf):
    return textstats.text_quality(_t(spark, sf, "documents"))


SQL_TEXT_QUALITY = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{textstats.BPE_ISH_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS n_func_words,
       CAST(floor(length(text) * 1000 / len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS milli_chars_per_token,
       CASE WHEN len(regexp_split_to_array(text, '\\s+')) >= 20
                 AND len(list_filter(string_split(text, ' '), w -> w IN ('the','a'))) * 100
                     >= len(regexp_split_to_array(text, '\\s+')) * 2
            THEN 'keep' ELSE 'drop' END AS quality_band
FROM documents
"""


def q_text_lang_id(spark, sf):
    return textstats.lang_id(_t(spark, sf, "documents"))


def _sql_lang_id_body(source_cte: str) -> str:
    """Shared DuckDB twin of the profile-table lang-ID over any
    (doc_id, text) source CTE named ``docs``: same punctuation strip,
    same tokenization, same (lang, word) profile VALUES, same
    argmax-with-lang-asc tiebreak, 'und' on zero hits."""
    prof_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, ws in textstats.LANG_PROFILES.items()
        for w in ws
    )
    return f"""
WITH {source_cte},
toks AS (
  SELECT doc_id, t.word
  FROM docs, unnest(string_split_regex(
         regexp_replace(lower(text), '[.,!?;:()"'']', ' ', 'g'), '\\s+')) AS t(word)
  WHERE t.word <> ''),
hits AS (
  SELECT doc_id, prof.lang, count(*) AS score
  FROM toks JOIN (VALUES {prof_rows}) AS prof(lang, word)
    ON toks.word = prof.word
  GROUP BY doc_id, prof.lang),
best AS (
  SELECT doc_id, lang, score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, lang) AS rn FROM hits)
  WHERE rn = 1)
SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_guess,
       CAST(coalesce(b.score, 0) AS BIGINT) AS lang_score
FROM docs d LEFT JOIN best b ON d.doc_id = b.doc_id
"""


def _sql_text_lang() -> str:
    return _sql_lang_id_body("docs AS (SELECT doc_id, text FROM documents)")


# Inline multilingual corpus for the detection-quality oracle entry:
# the parquet documents table is English-ish by construction, so the
# ≥3-language claim is proven on this fixed literal corpus (same rows
# built in Spark and as a VALUES clause for DuckDB). The planted label
# is carried as expected_lang so the green row itself certifies
# detection, not just cross-engine agreement.
MULTILINGUAL_CORPUS = [
    (0, "en", "the cat sat on the mat and it was happy with this house"),
    (1, "en", "we have all that you can do when your work is done for now"),
    (2, "de", "der hund ist nicht mit der katze und sie war auf dem tisch"),
    (3, "de", "ich habe ein buch und eine zeitung aus der stadt für dich"),
    (4, "fr", "le chien est dans la maison avec une petite chatte et il est là pour nous"),
    (5, "fr", "je ne sais pas ce que vous avez mais elle est sur le pont"),
    (6, "es", "el perro es muy grande y la casa es para los gatos que no se van"),
    (7, "es", "no hay nada mejor que un buen libro para leer cuando hace mucho calor"),
    (8, "it", "il cane è nella casa e non sono con il gatto che ha più fame"),
    (9, "it", "questo è il momento di andare perché loro hanno già mangiato tutto"),
    (10, "und", "zzz qqq xyzzy plugh grault"),
]


def q_lang_id_multilingual(spark, sf):
    docs = spark.createDataFrame(
        [(i, t) for i, _lang, t in MULTILINGUAL_CORPUS],
        "doc_id long, text string",
    )
    expected = spark.createDataFrame(
        [(i, lang) for i, lang, _t in MULTILINGUAL_CORPUS],
        "doc_id long, expected_lang string",
    )
    return textstats.lang_id(docs).join(expected, "doc_id").select(
        "doc_id", "expected_lang", "lang_guess", "lang_score"
    )


def _sql_lang_id_multilingual() -> str:
    doc_rows = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''") + "')"
        for i, _lang, t in MULTILINGUAL_CORPUS
    )
    exp_rows = ", ".join(
        f"({i}, '{lang}')" for i, lang, _t in MULTILINGUAL_CORPUS
    )
    body = _sql_lang_id_body(
        f"docs AS (SELECT * FROM (VALUES {doc_rows}) AS d(doc_id, text))"
    )
    return f"""
SELECT CAST(g.doc_id AS BIGINT) AS doc_id, e.expected_lang, g.lang_guess, g.lang_score
FROM ({body}) g
JOIN (VALUES {exp_rows}) AS e(doc_id, expected_lang) ON g.doc_id = e.doc_id
"""


def q_lang_suite(spark, sf):
    """text_lang_id + lang_id_multilingual consolidated (round 6, the
    round-5 suite pattern: kind column + common scalar columns) to
    hold the registry inside the driver's 50-query window while
    adding dedup_substring; both member checks remain value-exact —
    the documents-corpus rows and the planted-label multilingual
    rows are recomputed in full."""
    a = textstats.lang_id(_t(spark, sf, "documents")).select(
        F.lit("docs").alias("kind"), "doc_id",
        F.lit("").alias("expected_lang"), "lang_guess", "lang_score",
    )
    b = q_lang_id_multilingual(spark, sf).select(
        F.lit("planted").alias("kind"), "doc_id",
        "expected_lang", "lang_guess", "lang_score",
    )
    return a.unionByName(b)


def _sql_lang_suite() -> str:
    return f"""
SELECT 'docs' AS kind, doc_id, '' AS expected_lang, lang_guess, lang_score
FROM ({_sql_text_lang()})
UNION ALL
SELECT 'planted' AS kind, doc_id, expected_lang, lang_guess, lang_score
FROM ({_sql_lang_id_multilingual()})
"""


def q_text_repetition(spark, sf):
    return textstats.repetition_signals(_t(spark, sf, "documents"))


SQL_TEXT_REPETITION = """
WITH base AS (
  SELECT doc_id,
         CAST(floor((len(string_split(text, ' ')) - len(list_distinct(string_split(text, ' ')))) * 1000
              / len(string_split(text, ' '))) AS BIGINT) AS dup_token_permille
  FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
  FROM documents WHERE len(string_split(text, ' ')) >= 2),
cnts AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
top AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS total_bg FROM cnts GROUP BY doc_id)
SELECT b.doc_id, b.dup_token_permille,
       CAST(coalesce(floor(t.top_cnt * 1000 / t.total_bg), 0) AS BIGINT) AS top_bigram_permille,
       CASE WHEN b.dup_token_permille < 600
                 AND coalesce(floor(t.top_cnt * 1000 / t.total_bg), 0) < 180
            THEN 'keep' ELSE 'drop' END AS repetition_band
FROM base b LEFT JOIN top t USING (doc_id)
"""


def q_text_tfidf_topk(spark, sf):
    return textstats.tfidf_topk(_t(spark, sf, "documents"), k=3)


SQL_TEXT_TFIDF = """
WITH tok AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc) AS df FROM tok GROUP BY term),
scored AS (
  SELECT doc, term, tf, df, CAST(tf * (1000000 // df) AS BIGINT) AS score
  FROM tf JOIN dft USING (term))
SELECT doc, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc
           ORDER BY score DESC, term) AS BIGINT) AS rank FROM scored)
WHERE rank <= 3
"""


def q_text_pii_scrub(spark, sf):
    return textstats.pii_scrub(_t(spark, sf, "documents"))


SQL_TEXT_PII = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{textstats.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{textstats.PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{textstats.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{textstats.PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM documents
"""


def q_sample_stratified(spark, sf):
    """Reproducible per-stratum hash sampling over (lang): keep 250‰ of
    'en', 500‰ of 'de', 0 otherwise — the data-mix resampling shape."""
    from go_scrapper_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        _t(spark, sf, "documents"), rates={"en": 250, "de": 500},
        stratum_col="lang",
    )
    return out.select("doc_id", "lang", F.col("sample_bucket").cast("long").alias("sample_bucket"))


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang,
       CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS BIGINT) AS sample_bucket
FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
      < CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500 ELSE 0 END
"""


def q_pack_shards(spark, sf):
    """Token-budget shard packing per lang stratum (the sequence-
    packing stage before training): running token sum, shard =
    floor(start_offset / budget)."""
    from go_scrapper_spark.operators.sampling import pack_shards

    docs = _t(spark, sf, "documents")
    with_tokens = docs.select(
        "doc_id", "lang",
        textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return pack_shards(with_tokens, budget_tokens=500, stratum_col="lang",
                       tokens_col="n_tokens")


SQL_PACK_SHARDS = """
WITH t AS (
  SELECT doc_id, lang AS stratum,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, stratum, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens) / 500) AS BIGINT) AS shard_id
FROM t
"""


def q_text_fingerprint(spark, sf):
    return textstats.fingerprint(_t(spark, sf, "documents"))


SQL_TEXT_FINGERPRINT = """
WITH n AS (SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm FROM documents)
SELECT doc_id, md5(norm) AS doc_md5,
       list_min(list_transform(range(1, greatest(length(norm) - 15, 1) + 1),
                i -> md5(substr(norm, i, 16)))) AS min_gram_md5
FROM n
"""


def q_mm_image_meta(spark, sf):
    return multimodal.image_meta(multimodal.attach_payload(_t(spark, sf, "documents")))


def q_g3_probe_admission(spark, sf):
    """G3 probe-window scheduling predicate shape (main.go:563-654;
    engine: plans/crawl.py _probe_window_col + the gated pending
    filter): tasks (o_custkey) paginate their pages (orders, in date
    order) in 5-page probe windows; a per-task unlock level admits
    windows <= unlocked, and the boundary aggregate is the min still-
    locked window — exactly the admission + bookkeeping expressions
    the crawl engine runs per superstep."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    pages = o.select("o_custkey", "o_orderkey", "o_orderdate").withColumn(
        "probe_window", F.floor((F.row_number().over(w) - 1) / 5).cast("long")
    ).withColumn("unlocked", F.pmod(F.col("o_custkey"), F.lit(4)).cast("long"))
    return pages.groupBy("o_custkey").agg(
        F.count(
            F.when(F.col("probe_window") <= F.col("unlocked"), 1)
        ).alias("n_admitted"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("probe_window") > F.col("unlocked"), F.col("probe_window")
                )
            ),
            F.lit(-1).cast("long"),
        ).alias("next_window"),  # -1 = no locked window left (boundary exhausted)
    )


SQL_G3 = """
WITH pages AS (
  SELECT o_custkey,
         CAST(floor((row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) - 1) / 5) AS BIGINT) AS probe_window,
         CAST(o_custkey % 4 AS BIGINT) AS unlocked
  FROM orders)
SELECT o_custkey,
       CAST(count(CASE WHEN probe_window <= unlocked THEN 1 END) AS BIGINT) AS n_admitted,
       CAST(COALESCE(min(CASE WHEN probe_window > unlocked THEN probe_window END), -1) AS BIGINT) AS next_window
FROM pages GROUP BY o_custkey
"""


def q_mm_audio_features(spark, sf):
    docs = _t(spark, sf, "documents")
    return multimodal.audio_features(multimodal.attach_payload(docs))


def q_mm_video_frames(spark, sf):
    docs = _t(spark, sf, "documents")
    return multimodal.video_frame_sample(multimodal.attach_payload(docs))


def q_mm_suite(spark, sf):
    """The three multimodal stub pipelines (image meta / audio
    features / video frame sampling, operators/multimodal.py) as one
    union-typed result — consolidated from three registry entries to
    keep the driver's query window free for the round-5 WARC
    writer/CDX entries while preserving value-exact coverage of all
    three mapInPandas kernels (kind column tags the source)."""
    docs = multimodal.attach_payload(_t(spark, sf, "documents"))
    img = multimodal.image_meta(docs).select(
        F.lit("image").alias("kind"), "doc_id",
        F.col("n_bytes").cast("long").alias("k1"),
        F.col("fake_width").cast("long").alias("k2"),
        F.col("fake_height").cast("long").alias("k3"),
        F.lit(-1).cast("long").alias("k4"),
        F.col("mode").alias("sig"),
    )
    aud = multimodal.audio_features(docs).select(
        F.lit("audio").alias("kind"), "doc_id",
        F.col("n_units").cast("long").alias("k1"),
        F.col("fake_sample_rate").cast("long").alias("k2"),
        F.col("window_idx").cast("long").alias("k3"),
        F.col("energy").cast("long").alias("k4"),
        F.lit("").alias("sig"),
    )
    vid = multimodal.video_frame_sample(docs).select(
        F.lit("video").alias("kind"), "doc_id",
        F.col("frame_idx").cast("long").alias("k1"),
        F.lit(-1).cast("long").alias("k2"),
        F.lit(-1).cast("long").alias("k3"),
        F.lit(-1).cast("long").alias("k4"),
        F.col("frame_sig").alias("sig"),
    )
    return img.unionByName(aud).unionByName(vid)


SQL_MM_SUITE = f"""
SELECT 'image' AS kind, doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS k1,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS k2,
       CAST(octet_length(encode(text)) % 480 AS BIGINT) AS k3,
       CAST(-1 AS BIGINT) AS k4, 'stub' AS sig
FROM documents
UNION ALL
SELECT 'audio' AS kind, doc_id,
       CAST(length(coalesce(text, '')) AS BIGINT) AS k1,
       CAST(8000 + (length(coalesce(text, '')) % 8) * 1000 AS BIGINT) AS k2,
       CAST(u.w AS BIGINT) AS k3,
       CAST(concat('0x', substr(md5(substr(coalesce(text, ''),
            CAST(u.w*32 + 1 AS INT), 32)), 1, 12)) AS BIGINT) AS k4,
       '' AS sig
FROM documents CROSS JOIN unnest(range(0, 4)) AS u(w)
UNION ALL
SELECT 'video' AS kind, doc_id, CAST(u.i AS BIGINT) AS k1,
       CAST(-1 AS BIGINT) AS k2, CAST(-1 AS BIGINT) AS k3,
       CAST(-1 AS BIGINT) AS k4,
       md5(substr(coalesce(text, ''), CAST(u.i*10 + 1 AS INT), 10)) AS sig
FROM documents CROSS JOIN unnest(range(0, length(coalesce(text, ''))//10, 7)) AS u(i)
"""


def q_sim_ivf_topk(spark, sf):
    # nprobe=4 is the measured-good default (recall@3 = 0.933 at the
    # gate config vs 0.333 at nprobe=2 — BENCH recall curve)
    return similarity.ivf_topk(
        _t(spark, sf, "embeddings"), k=3, n_queries=5, n_centroids=8, nprobe=4
    )


def _sql_ivf_topk(k: int = 3, nq: int = 5, c: int = 8, nprobe: int = 4) -> str:
    dot = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
           FROM embeddings),
cand AS (SELECT vec_id, qv FROM v WHERE vec_id >= {nq}),
cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
         FROM (SELECT * FROM cand ORDER BY vec_id LIMIT {c})),
assign AS (
  SELECT vec_id, qv, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY {dot.format(a='qv', b='cv')} DESC, cid) AS rn
  FROM cand CROSS JOIN cent),
cells AS (SELECT vec_id, qv AS candv, cid FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, qv FROM v WHERE vec_id < {nq}),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.query_id, q.qv, cent.cid, row_number() OVER (
        PARTITION BY q.query_id ORDER BY {dot.format(a='q.qv', b='cent.cv')} DESC, cent.cid) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= {nprobe}),
s AS (SELECT p.query_id, cells.vec_id AS neighbor_id,
             CAST({dot.format(a='p.qv', b='cells.candv')} AS BIGINT) AS dot
      FROM probes p JOIN cells ON cells.cid = p.cid)
SELECT query_id, neighbor_id, dot, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY dot DESC, neighbor_id) AS rank FROM s)
WHERE rank <= {k}
"""


# Inline robots corpus for the sitemap-discovery oracle: multiple
# Sitemap lines, duplicates, comments, case variants, a relative value
# (must drop — the spec requires absolute), and a host with none.
ROBOTS_SITEMAP_CORPUS = [
    ("h1", ["User-agent: *", "Disallow: /x/",
            "Sitemap: https://h1/sitemap.xml",
            "sitemap: https://h1/sitemap2.xml  # comment",
            "Sitemap: https://h1/sitemap.xml"]),
    ("h2", ["SITEMAP: http://h2/s.xml", "Sitemap: /relative/s.xml"]),
    ("h3", ["User-agent: *", "Disallow:"]),
]


def q_robots_sitemap_discovery(spark, sf):
    from go_scrapper_spark.functions.robotstxt import robots_sitemaps

    df = spark.createDataFrame(
        [(h, "\n".join(lines)) for h, lines in ROBOTS_SITEMAP_CORPUS],
        "host string, body string",
    )
    return robots_sitemaps(df)


def _sql_robots_sitemaps() -> str:
    rows = ", ".join(
        "('" + h + "', " + " || chr(10) || ".join(
            "'" + ln.replace("'", "''") + "'" for ln in lines
        ) + ")"
        for h, lines in ROBOTS_SITEMAP_CORPUS
    )
    return f"""
WITH b AS (SELECT * FROM (VALUES {rows}) AS v(host, body)),
l AS (
  SELECT host, trim(regexp_replace(t.line, '#.*', '')) AS line
  FROM b, unnest(string_split(body, chr(10))) AS t(line)),
s AS (
  SELECT host,
         lower(trim(split_part(line, ':', 1))) AS key,
         trim(substring(line, instr(line, ':') + 1)) AS sitemap_url
  FROM l WHERE instr(line, ':') > 0)
SELECT DISTINCT host, sitemap_url FROM s
WHERE key = 'sitemap'
  AND (sitemap_url LIKE 'http://%' OR sitemap_url LIKE 'https://%')
"""


def _hex(s: bytes) -> str:
    return s.hex().upper()


# Inline binary corpus for the content-sniff oracle: one row per magic
# signature plus the heuristic/fallback/empty cases. Payloads are hex
# literals so both engines build identical bytes.
CONTENT_SNIFF_CORPUS = [
    (0, _hex(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)),
    (1, _hex(b"\xff\xd8\xff\xe0" + b"\x00" * 8)),
    (2, _hex(b"GIF87a" + b"\x00" * 6)),
    (3, _hex(b"GIF89a" + b"\x00" * 6)),
    (4, _hex(b"%PDF-1.7\n%\xe2\xe3")),
    (5, _hex(b"PK\x03\x04" + b"\x00" * 8)),
    (6, _hex(b"\x1f\x8b\x08\x00" + b"\x00" * 8)),
    (7, _hex(b"RIFF\x24\x00\x00\x00WAVE")),
    (8, _hex(b"OggS" + b"\x00" * 8)),
    (9, _hex(b"fLaC" + b"\x00" * 8)),
    (10, _hex(b"\x00\x00\x00\x18ftypmp42")),
    (11, _hex(b"WARC/1.0\r\nWARC")),
    (12, _hex(b"<!DOCTYPE html>")),
    (13, _hex(b"<html><head></he")),
    (14, _hex(b"hello world, pla")),
    (15, _hex(b"\xfe\xed\xfa\xce\x00\x01\x02\x03")),
    (16, ""),
]


def q_mm_content_sniff(spark, sf):
    from go_scrapper_spark.functions.contentsniff import sniff_content_types

    df = spark.createDataFrame(
        CONTENT_SNIFF_CORPUS, "doc_id long, hx string"
    ).select("doc_id", F.unhex("hx").alias("payload"))
    return sniff_content_types(df)


def _sql_content_sniff() -> str:
    """DuckDB twin sniffs the HEX STRING directly — an independent
    re-derivation of the same magic table (first 12 bytes = first 24
    hex chars), which is exactly what an oracle should be."""
    rows = ", ".join(f"({i}, '{hx}')" for i, hx in CONTENT_SNIFF_CORPUS)
    return f"""
WITH v AS (SELECT doc_id, upper(hx) AS hx FROM (VALUES {rows}) AS t(doc_id, hx)),
p AS (SELECT doc_id, hx, substring(hx, 1, 24) AS h24 FROM v)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE
    WHEN hx = '' THEN 'empty'
    WHEN h24 LIKE '89504E47%' THEN 'image/png'
    WHEN h24 LIKE 'FFD8FF%' THEN 'image/jpeg'
    WHEN h24 LIKE '474946383761%' OR h24 LIKE '474946383961%' THEN 'image/gif'
    WHEN h24 LIKE '25504446%' THEN 'application/pdf'
    WHEN h24 LIKE '504B0304%' THEN 'application/zip'
    WHEN h24 LIKE '1F8B%' THEN 'application/gzip'
    WHEN h24 LIKE '52494646%' THEN 'audio/riff'
    WHEN h24 LIKE '4F676753%' THEN 'audio/ogg'
    WHEN h24 LIKE '664C6143%' THEN 'audio/flac'
    WHEN substring(hx, 9, 8) = '66747970' THEN 'video/mp4'
    WHEN h24 LIKE '574152432F%' THEN 'application/warc'
    WHEN h24 LIKE '3C21444F43545950%' OR h24 LIKE '3C21646F63747970%'
      OR h24 LIKE '3C68746D6C%' OR h24 LIKE '3C48544D4C%' THEN 'text/html'
    WHEN regexp_matches(h24, '^(0[9AD]|[2-6][0-9A-F]|7[0-9A-E])+$')
      THEN 'text/plain'
    ELSE 'application/octet-stream'
  END AS content_type,
  CAST(length(hx) / 2 AS BIGINT) AS n_bytes
FROM p
"""


# WARC parsing oracle: ground truth BY CONSTRUCTION — the expected
# rows are the record specs handed to the (parser-independent) WARC
# writer, so the distributed parse must recover exactly what went in.
# Edge cases: an HTML body containing \r\n\r\n (Content-Length must
# govern, not delimiter search), a 404 with an empty body, a request
# record, a metadata record, and a zero-length payload.
_WARC_SPECS = [
    # (file_id, rec_id, warc_type, uri, date, status, ctype, body)
    (0, "<urn:a:1>", "response", "https://h1/page1",
     "2024-01-02T03:04:05Z", 200, "text/html",
     b"<html>head\r\n\r\nbody with a blank line</html>"),
    (0, "<urn:a:2>", "response", "https://h1/missing",
     "2024-01-02T03:04:06Z", 404, "text/plain", b""),
    (0, "<urn:a:3>", "request", "https://h1/page1",
     "2024-01-02T03:04:05Z", None, None, None),
    (1, "<urn:b:1>", "response", "https://h2/p",
     "2024-02-02T00:00:00Z", 200, "text/html", b"<html>two</html>"),
    (1, "<urn:b:2>", "metadata", "https://h2/p",
     "2024-02-02T00:00:01Z", None, None, None),
    (1, "<urn:b:3>", "response", "https://h2/empty",
     "2024-02-02T00:00:02Z", 200, "text/html", b""),
]

_WARC_FIXTURE = "/tmp/gss_expected_warc_parse_v2.parquet"


def _warc_blobs():
    from go_scrapper_spark.sources import warc as w

    files: dict[int, list[dict]] = {}
    for fid, rid, wtype, uri, date, status, ctype, body in _WARC_SPECS:
        if wtype == "response":
            payload = w.http_response(body, status=status, content_type=ctype)
        elif wtype == "request":
            payload = b"GET /page1 HTTP/1.1\r\nHost: h1\r\n\r\n"
        else:
            payload = b"via: synthetic"
        files.setdefault(fid, []).append({
            "headers": {
                "WARC-Type": wtype,
                "WARC-Target-URI": uri,
                "WARC-Date": date,
                "WARC-Record-ID": rid,
            },
            "payload": payload,
        })
    from go_scrapper_spark.sources.warc import build_warc

    return [(fid, build_warc(recs)) for fid, recs in sorted(files.items())]


def _ensure_warc_fixture() -> str:
    import hashlib
    import os

    if os.path.exists(_WARC_FIXTURE):
        return _WARC_FIXTURE
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_scrapper_spark.sources import warc as w

    rows = {k: [] for k in (
        "file_id", "record_id", "warc_type", "target_uri", "warc_date",
        "content_length", "http_status", "http_content_type", "body_md5",
        "body_len",
    )}
    for fid, rid, wtype, uri, date, status, ctype, body in _WARC_SPECS:
        if wtype == "response":
            payload_len = len(w.http_response(body, status=status,
                                              content_type=ctype))
        elif wtype == "request":
            payload_len = len(b"GET /page1 HTTP/1.1\r\nHost: h1\r\n\r\n")
        else:
            payload_len = len(b"via: synthetic")
        rows["file_id"].append(fid)
        rows["record_id"].append(rid)
        rows["warc_type"].append(wtype)
        rows["target_uri"].append(uri)
        rows["warc_date"].append(date)
        rows["content_length"].append(payload_len)
        # sentinels, not NULLs, for the nullable columns: a nullable
        # BIGINT degrades to float64 through pandas and breaks the
        # dtype-class compare (the HUGEINT gotcha's cousin)
        rows["http_status"].append(status if status is not None else -1)
        rows["http_content_type"].append(ctype if ctype is not None else "")
        # response: body = HTTP payload body; other types carry no
        # HTTP envelope, so the raw payload IS the body (WET reader
        # contract) — mirror split_warc_records exactly
        if wtype == "response":
            eff = body
        elif wtype == "request":
            eff = b"GET /page1 HTTP/1.1\r\nHost: h1\r\n\r\n"
        else:
            eff = b"via: synthetic"
        rows["body_md5"].append(
            hashlib.md5(eff).hexdigest() if eff is not None else ""
        )
        rows["body_len"].append(len(eff) if eff is not None else -1)
    table = pa.table({
        "file_id": pa.array(rows["file_id"], pa.int64()),
        "record_id": pa.array(rows["record_id"], pa.string()),
        "warc_type": pa.array(rows["warc_type"], pa.string()),
        "target_uri": pa.array(rows["target_uri"], pa.string()),
        "warc_date": pa.array(rows["warc_date"], pa.string()),
        "content_length": pa.array(rows["content_length"], pa.int64()),
        "http_status": pa.array(rows["http_status"], pa.int32()),
        "http_content_type": pa.array(rows["http_content_type"], pa.string()),
        "body_md5": pa.array(rows["body_md5"], pa.string()),
        "body_len": pa.array(rows["body_len"], pa.int64()),
    })
    tmp = _WARC_FIXTURE + ".tmp"
    pq.write_table(table, tmp)
    import os as _os

    _os.replace(tmp, _WARC_FIXTURE)
    return _WARC_FIXTURE


def q_warc_parse(spark, sf):
    from go_scrapper_spark.sources.warc import parse_warc

    df = spark.createDataFrame(
        [(fid, bytearray(blob)) for fid, blob in _warc_blobs()],
        "file_id long, warc binary",
    )
    return parse_warc(df).select(
        "file_id", "record_id", "warc_type", "target_uri", "warc_date",
        "content_length",
        F.coalesce("http_status", F.lit(-1)).cast("int").alias("http_status"),
        F.coalesce("http_content_type", F.lit("")).alias("http_content_type"),
        F.coalesce(F.md5("body"), F.lit("")).alias("body_md5"),
        F.coalesce(F.length("body"), F.lit(-1)).cast("long").alias("body_len"),
    )


def _sql_warc_parse() -> str:
    _ensure_warc_fixture()
    return f"""
SELECT CAST(file_id AS BIGINT) AS file_id, record_id, warc_type, target_uri,
       warc_date, CAST(content_length AS BIGINT) AS content_length,
       CAST(http_status AS INT) AS http_status, http_content_type,
       body_md5, CAST(body_len AS BIGINT) AS body_len
FROM '{_WARC_FIXTURE}'
"""


def q_warc_roundtrip(spark, sf):
    """WARC writer round-trip (sources/warc.py pages_to_warc →
    warc_to_pages): the documents table is dressed as a pages table
    (deterministic url/warc_ts per doc_id, html = utf-8 text), shipped
    through the distributed WARC sink (64 content-addressed files),
    parsed back, and projected to comparable scalars. The oracle
    recomputes the same projection straight from documents — so a
    value-exact match proves the WARC encode/decode cycle is lossless
    for every url, timestamp, and body byte."""
    from go_scrapper_spark.sources.warc import pages_to_warc, warc_to_pages

    docs = _t(spark, sf, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(7)).cast("string"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000).cast("long") + F.col("doc_id")
        ).alias("warc_ts"),
        F.encode(F.coalesce("text", F.lit("")), "UTF-8").alias("html"),
    )
    back = warc_to_pages(pages_to_warc(pages, n_files=64))
    return back.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_date"),
        F.md5("html").alias("html_md5"),
        F.length("html").cast("long").alias("html_len"),
    )


SQL_WARC_ROUNDTRIP = """
SELECT concat('https://h', CAST(doc_id % 7 AS VARCHAR),
              '.example.com/doc/', CAST(doc_id AS VARCHAR)) AS url,
       strftime(make_timestamp(CAST(1700000000 + doc_id AS BIGINT) * 1000000),
                '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
       md5(coalesce(text, '')) AS html_md5,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS html_len
FROM documents
"""


def q_cdx_index(spark, sf):
    """CDX capture-index generation (sources/warc.py cdx_index) over
    the parsed WARC fixture: SURT key, 14-digit timestamp, mime,
    status, payload digest per response record — the web-archive
    lookup sidecar (cc-index shape). Oracle recomputes SURT/ts14/mime
    in DuckDB from the expected-records parquet."""
    from go_scrapper_spark.sources.warc import cdx_index, parse_warc

    df = spark.createDataFrame(
        [(fid, bytearray(blob)) for fid, blob in _warc_blobs()],
        "file_id long, warc binary",
    )
    return cdx_index(parse_warc(df))


def _sql_cdx_index() -> str:
    _ensure_warc_fixture()
    return f"""
WITH resp AS (
  SELECT *, regexp_replace(lower(target_uri), '^https?://(www\\.)?', '') AS bare
  FROM '{_WARC_FIXTURE}' WHERE warc_type = 'response')
SELECT array_to_string(list_reverse(string_split(
           regexp_extract(bare, '^([^/]+)', 1), '.')), ',')
       || ')' ||
       CASE WHEN regexp_replace(bare, '^[^/]*', '') = ''
            THEN '/' ELSE regexp_replace(bare, '^[^/]*', '') END AS surt_key,
       substr(regexp_replace(warc_date, '[^0-9]', '', 'g'), 1, 14) AS ts14,
       target_uri AS url,
       coalesce(regexp_extract(http_content_type, '^([^;]+)', 1), '') AS mime,
       CAST(coalesce(http_status, -1) AS INT) AS status,
       coalesce(body_md5, '') AS digest,
       CAST(content_length AS BIGINT) AS rec_len
FROM resp
"""


def q_sessionize_events(spark, sf):
    """Sessionization (gaps-and-islands, 30-min inactivity gap) over
    the events table — the batch twin of the applyInPandasWithState
    streaming operator (streaming/sessionize.py)."""
    from go_scrapper_spark.streaming.sessionize import sessionize_batch

    return sessionize_batch(_t(spark, sf, "events"), gap_minutes=30)


# =============================================================================
# Group C — engine-native entries. crawl_bulk_extract is gated against
# a generator-truth fixture: the pure-Python extract_page (the same
# function the reference model uses) over the same synthetic web,
# written to parquet; the DuckDB twin reads that parquet. This makes
# the byte-identical-extraction invariant a hash check, not a count.
# =============================================================================

_BULK_EXTRACT_N_BIZ = 40
_BULK_EXTRACT_FIXTURE = (
    f"/tmp/gss_expected_bulk_extract_nbiz{_BULK_EXTRACT_N_BIZ}_v1.parquet"
)


def _ensure_bulk_extract_fixture() -> str:
    """Write the expected bulk-extraction rows once (idempotent,
    deterministic): pure Python — no Spark — so the fixture is an
    independent twin of the distributed mapInPandas path, not a copy of
    its output."""
    import os

    if os.path.exists(_BULK_EXTRACT_FIXTURE):
        return _BULK_EXTRACT_FIXTURE
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_scrapper_spark.functions.extract import extract_page
    from go_scrapper_spark.sources import synthetic_web as sw

    cfg = sw.WebConfig(n_biz=_BULK_EXTRACT_N_BIZ)
    cols = {k: [] for k in (
        "url", "review_id", "author_id", "author_name", "text", "rating",
        "source_date", "review_hash",
    )}
    for biz in range(cfg.n_biz):
        for url, _ts, body, _text, _lang in sw.pages_for_biz(cfg, biz):
            for r in extract_page(url, body, 0, 0, 0):
                if r["kind"] != "review":
                    continue
                cols["url"].append(url)
                cols["review_id"].append(r["review_id"] or "")
                cols["author_id"].append(r["author_id"])
                cols["author_name"].append(r["author_name"])
                cols["text"].append(r["text"])
                cols["rating"].append(r["rating"])
                cols["source_date"].append(r["source_date"])
                cols["review_hash"].append(r["review_hash"])
    table = pa.table(
        {
            **{k: pa.array(cols[k], pa.string()) for k in cols if k != "rating"},
            "rating": pa.array(cols["rating"], pa.int32()),
        }
    ).select(list(cols))
    tmp = _BULK_EXTRACT_FIXTURE + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, _BULK_EXTRACT_FIXTURE)  # atomic vs concurrent callers
    return _BULK_EXTRACT_FIXTURE


def q_crawl_bulk_extract(spark, sf):
    """The extraction stage over a generated synthetic web: one
    mapInPandas pass, html read once per page (no scheduler loop).
    review_id is coalesced to '' (non-recommended reviews carry none)
    so every output cell is a scalar non-surprising hash input."""
    from go_scrapper_spark.functions.extract import extract_pages
    from go_scrapper_spark.sources.synthetic_web import WebConfig, generate_pages_df

    _ensure_bulk_extract_fixture()
    pages = generate_pages_df(
        spark, WebConfig(n_biz=_BULK_EXTRACT_N_BIZ), n_partitions=8
    )
    fetched = pages.select(
        "url", "html", F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("seq"), F.lit(0).alias("fpo"),
    )
    u = extract_pages(fetched)
    return u.filter(F.col("kind") == "review").select(
        "url",
        F.coalesce("review_id", F.lit("")).alias("review_id"),
        "author_id", "author_name", "text", "rating",
        "source_date", "review_hash",
    )


SQL_BULK_EXTRACT = f"""
SELECT url, review_id, author_id, author_name, text, rating,
       source_date, review_hash
FROM '{_BULK_EXTRACT_FIXTURE}'
"""


# =============================================================================
# registry
# =============================================================================

# Registry ORDER matters: the correctness driver checks entries in
# registry order and may cap the run (round 4 ran exactly the first 50
# of 52, silently dropping the tail). The flagship end-to-end gates
# (crawl_bulk_extract = extraction fidelity, sessionize_events = the
# streaming twin) therefore go FIRST; the cheap scalar suites that are
# also covered by golden/unit tests go last, so a cap can only ever
# drop redundantly-tested entries.
QUERIES = {
    "crawl_bulk_extract": (q_crawl_bulk_extract, SQL_BULK_EXTRACT),
    "sessionize_events": (q_sessionize_events, sql_sessionize(30)),
    "a1_pricing_summary": (q_a1_pricing_summary, SQL_A1),
    "w3_topk_per_group": (q_w3_topk_per_group, SQL_W3),
    "w4_argmax": (q_w4_argmax, SQL_W4),
    "j3_seen_antijoin": (q_j3_seen_antijoin, SQL_J3),
    "j4_fetch_join": (q_j4_fetch_join, SQL_J4),
    "j5_broadcast_dims": (q_j5_broadcast_dims, SQL_J5),
    "j1_similarity_match": (q_j1_similarity_match, SQL_J1),
    # round 5: f5 + f6 consolidated (both checks intact, value-exact)
    # to make window room for host_template_strip
    "f_suite": (q_f_suite, SQL_F_SUITE),
    "f4_prefix_truncate": (q_f4_prefix_truncate, SQL_F4),
    "g1_pagination_fanout": (q_g1_pagination_fanout, SQL_G1),
    "g3_probe_admission": (q_g3_probe_admission, SQL_G3),
    # round 5: u1 + u2 consolidated (both checks intact, value-exact)
    # to make window room for the decontaminate entry
    "u_suite": (q_u_suite, SQL_U_SUITE),
    "w1_global_topk": (q_w1_global_topk, SQL_W1),
    # round 5: a3_greatest + a4_histogram consolidated (both checks
    # intact, value-exact) to make window room for extract_main_content
    "a_meta_suite": (q_a_meta_suite, SQL_A_META_SUITE),
    "a5_rate_accounting": (q_a5_rate_accounting, SQL_A5),
    # round 5: p10_date_parse + p13_canonicalize consolidated (same
    # two checks, value-exact) to make window room for dedup_paragraph
    "p_datetime_url": (q_p_datetime_url, SQL_P_DATETIME_URL),
    "s9_robots_policy": (q_robots_policy, SQL_ROBOTS_POLICY),
    "sitemap_seeds": (q_sitemap_seeds, SQL_SITEMAP_SEEDS),
    "robots_sitemap_discovery": (q_robots_sitemap_discovery, _sql_robots_sitemaps()),
    "mm_content_sniff": (q_mm_content_sniff, _sql_content_sniff()),
    "warc_parse": (q_warc_parse, _sql_warc_parse()),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "cdx_index": (q_cdx_index, _sql_cdx_index()),
    "link_rank": (q_link_rank, _sql_linkrank()),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_paragraph": (q_dedup_paragraph, SQL_DEDUP_PARAGRAPH),
    "dedup_substring": (q_dedup_substring, SQL_DEDUP_SUBSTRING),
    "host_template_strip": (q_host_template_strip, SQL_HOST_TEMPLATE_STRIP),
    "extract_main_content": (q_extract_main_content, SQL_EXTRACT_MAIN_CONTENT),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_JACCARD),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, _sql_minhash()),
    "dedup_clusters": (q_dedup_clusters, _sql_dedup_clusters()),
    "dedup_simhash": (q_dedup_simhash, _sql_simhash()),
    "sim_topk_dot": (q_sim_topk_dot, SQL_SIM_TOPK),
    "sim_lsh_neighbors": (q_sim_lsh_neighbors, _sql_lsh_neighbors()),
    "sim_ivf_topk": (q_sim_ivf_topk, _sql_ivf_topk()),
    "emb_near_dup": (q_emb_near_dup, SQL_EMB_NEAR_DUP),
    "emb_quantize_int8": (q_emb_quantize, SQL_EMB_QUANTIZE),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    # round 6: text_lang_id + lang_id_multilingual consolidated (both
    # checks intact, value-exact) to make window room for dedup_substring
    "lang_suite": (q_lang_suite, _sql_lang_suite()),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "text_tfidf_topk": (q_text_tfidf_topk, SQL_TEXT_TFIDF),
    "text_pii_scrub": (q_text_pii_scrub, SQL_TEXT_PII),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "pack_shards": (q_pack_shards, SQL_PACK_SHARDS),
    "text_fingerprint": (q_text_fingerprint, SQL_TEXT_FINGERPRINT),
    # round 5: the three mm_* entries consolidated into one union-typed
    # entry (same three kernels, value-exact) to hold the registry at
    # 52 with the two WARC-ecosystem entries added above
    "mm_suite": (q_mm_suite, SQL_MM_SUITE),
    # tail (a 50-entry driver cap drops these): both are byte-identical
    # golden-tested elsewhere (tests/test_extract.py), so a cap never
    # leaves them unverified in a round
    "p_scalar_suite": (q_p_scalar_suite, SQL_P),
    "p18_review_hash": (q_p18_review_hash, SQL_P18),
}

# engine internals with no SQL twin (the crawl scheduler itself is
# model-equivalence-tested in tests/test_crawl_equivalence.py); empty
# since round 3 — every registry entry now carries a hard oracle
NO_ORACLE: dict = {}


def queries():
    out = {name: fn for name, (fn, _sql) in QUERIES.items()}
    out.update(NO_ORACLE)
    return out


def oracle_sql():
    # the bulk-extract twin reads a generator-truth parquet fixture —
    # materialize it before the driver hands the SQL to DuckDB
    _ensure_bulk_extract_fixture()
    return {name: sql for name, (_fn, sql) in QUERIES.items()}
