"""robots.txt → politeness-policy table, JVM-side (crawl tier).

The reference DISABLES robots handling (colly `IgnoreRobotsTxt`,
reference collyfunc.go:68); the north rule makes enforcement a
first-class requirement, and the engine consumes an explicit policy
table (ROBOTS_SCHEMA → operators/politeness.py). This module closes
the gap between the two: it parses RAW robots.txt bodies into that
table with pure Spark SQL expressions — posexplode over lines, one
host-partitioned window to assign user-agent GROUPS, then a
conditional aggregate per host. No Python in the parse path, so a
10^7-host robots corpus parses as one codegen'd plan with a single
shuffle (the per-host window/agg).

Semantics implemented (the subset crawlers actually obey, per
RFC 9309):
- groups: one or more consecutive ``User-agent:`` lines start a group;
  the rules that follow (until the next group) apply to those agents.
- only the ``*`` group is extracted (the engine crawls with one UA
  family); Allow/Disallow values become the policy's prefix arrays.
- ``Crawl-delay: <seconds>`` (fractional ok) → crawl_delay_ms.
- comments (#...) stripped; blank/unknown lines ignored; keys are
  case-insensitive; an empty ``Disallow:`` value (= allow all) is
  dropped rather than kept as a '' prefix that would match everything.
- hosts with no ``*`` group get the permissive default (no allow
  rules, no disallow rules) — per RFC 9309 §2.2.1, no applicable
  group means no restrictions. Allow rules are never synthesized:
  a fabricated ``Allow: /`` would tie (and beat, via allow-wins-on-
  tie) a real ``Disallow: /``, turning a block-all robots.txt into
  an allow-all one.

``max_parallel`` is not a robots.txt concept: the engine default (the
reference's colly Parallelism 10, collyfunc.go:179) is attached here
so the output is directly joinable by operators/politeness.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY_MS = 3000  # colly LimitRule Delay 3s (collyfunc.go:115-119)
DEFAULT_MAX_PARALLEL = 10      # colly Parallelism (collyfunc.go:179)


def robots_sitemaps(
    robots_bodies: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) → (host, sitemap_url): the ``Sitemap:`` directives
    of each robots.txt. Per RFC 9309 §2.3 / sitemaps.org these lines
    live OUTSIDE user-agent groups and apply globally, so this is a
    plain line filter — no group window needed. Values must be
    absolute URLs; relative values are dropped (the spec requires
    absolute). Feeds functions/sitemap.py's urlset/sitemapindex
    ingestion: robots → sitemap URLs → fetch → seed frontier, the
    standard crawl bootstrapping chain the reference lacks entirely
    (it ignores robots.txt, collyfunc.go:68).

    Scale shape: one codegen'd projection + a distinct (single
    shuffle); 10^7 hosts parse as one plan."""
    lines = robots_bodies.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\n")).alias("raw"),
    ).select(
        "host",
        F.trim(F.regexp_replace("raw", "#.*", "")).alias("line"),
    )
    key = F.lower(F.trim(F.substring_index("line", ":", 1)))
    val = F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
    return (
        lines.filter(F.col("line").contains(":"))
        .select("host", key.alias("key"), val.alias("sitemap_url"))
        .filter(
            (F.col("key") == "sitemap")
            & (
                F.col("sitemap_url").startswith("http://")
                | F.col("sitemap_url").startswith("https://")
            )
        )
        .select("host", "sitemap_url")
        .distinct()
    )


def parse_robots_txt(
    robots_bodies: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    default_delay_ms: int = DEFAULT_CRAWL_DELAY_MS,
    default_max_parallel: int = DEFAULT_MAX_PARALLEL,
) -> DataFrame:
    """(host, body) → ROBOTS_SCHEMA-shaped policy rows."""
    # one row per line, order preserved (pos drives the group window)
    lines = robots_bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    ).select(
        "host", "pos",
        F.trim(F.regexp_replace("raw", "#.*", "")).alias("line"),
    ).filter(F.col("line") != "")
    key = F.lower(F.trim(F.substring_index("line", ":", 1)))
    val = F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
    parsed = lines.filter(F.col("line").contains(":")).select(
        "host", "pos",
        key.alias("key"),
        val.alias("val"),
    )

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("key") == "user-agent").cast("int")
    # a user-agent line starts a NEW group unless the previous parsed
    # line was also a user-agent line (consecutive UA lines share one
    # group, RFC 9309 §2.2.1)
    starts_group = (
        (is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    grouped = parsed.withColumn("group_id", F.sum(starts_group).over(w))

    # groups whose agent set contains '*'
    star_groups = (
        grouped.filter((F.col("key") == "user-agent") & (F.col("val") == "*"))
        .select("host", "group_id")
        .distinct()
    )
    star_rules = grouped.join(star_groups, ["host", "group_id"], "left_semi")

    policies = star_rules.groupBy("host").agg(
        F.sort_array(
            F.collect_set(
                F.when((F.col("key") == "allow") & (F.col("val") != ""), F.col("val"))
            )
        ).alias("allow_prefixes"),
        F.sort_array(
            F.collect_set(
                F.when(
                    (F.col("key") == "disallow") & (F.col("val") != ""), F.col("val")
                )
            )
        ).alias("disallow_prefixes"),
        F.coalesce(
            F.round(
                F.max(
                    F.when(
                        F.col("key") == "crawl-delay",
                        # try_cast, not cast: under ANSI mode (Spark 4
                        # default) a malformed value like "10s" in ONE
                        # untrusted robots.txt would otherwise throw
                        # CAST_INVALID_INPUT and abort the whole parse
                        # job; NULL falls through to default_delay_ms.
                        F.col("val").try_cast("double") * 1000,
                    )
                )
            ).cast("long"),
            F.lit(default_delay_ms).cast("long"),
        ).alias("crawl_delay_ms"),
    )
    # hosts with no '*' group (or an unparseable body): permissive
    # default — no applicable group means no restrictions (RFC 9309)
    all_hosts = robots_bodies.select(F.col(host_col).alias("host")).distinct()
    return (
        all_hosts.join(policies, "host", "left")
        .select(
            "host",
            # NO synthetic Allow rules: when a star group has no Allow
            # lines (or the host has no star group at all) the array
            # stays EMPTY. RFC 9309's allow-wins-on-tie applies to
            # actual rules only — synthesizing ["/"] here would tie a
            # real ``Disallow: /`` at length 1 and admit the whole host
            # (a block-all robots.txt would be fully crawled). The
            # permissive default is already implied downstream:
            # apply_robots admits when no disallow prefix matches
            # (allow_len 0 >= disallow_len 0).
            F.coalesce(
                "allow_prefixes", F.array().cast("array<string>")
            ).alias("allow_prefixes"),
            F.coalesce(
                "disallow_prefixes", F.array().cast("array<string>")
            ).alias("disallow_prefixes"),
            F.coalesce(
                "crawl_delay_ms", F.lit(default_delay_ms).cast("long")
            ).alias("crawl_delay_ms"),
            F.lit(default_max_parallel).alias("max_parallel"),
        )
    )
