"""Robots + host-allow-list enforcement (SURVEY.md S8/S9, J5).

The reference explicitly disables robots (colly.IgnoreRobotsTxt,
collyfunc.go:68,128) and hard-codes a domain allow-list
(collyfunc.go:67,127). The north rule makes both enforced configs:
candidate outlinks are kept only for hosts present in the robots table
(allow-list semantics) and dropped when their path matches a disallow
prefix. The robots table is tiny relative to the frontier → broadcast
join; the prefix test is a native higher-order function (stays in
whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _longest_match_len(prefixes, path):
    """Length of the longest prefix in ``prefixes`` matching ``path``
    (0 when none match) — native higher-order functions, codegen'd."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.filter(
                    F.coalesce(prefixes, F.array()),
                    lambda p: path.startswith(p),
                ),
                F.length,
            )
        ),
        F.lit(0),
    )


def apply_robots(candidates: DataFrame, robots_df: DataFrame) -> DataFrame:
    """candidates must carry ``url`` and ``host``. Inner join = the
    allow-list (unknown hosts are excluded, as colly's AllowedDomains
    silently drops them); RFC 9309 §2.2.2 longest-match precedence
    between allow_prefixes and disallow_prefixes decides the rest —
    the most specific (longest) matching rule wins, and on a tie the
    allow SHOULD win. ``Allow: /public/`` under ``Disallow: /`` admits
    /public/* and blocks everything else."""
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    return (
        candidates.join(
            F.broadcast(
                robots_df.select("host", "allow_prefixes", "disallow_prefixes")
            ),
            "host",
            "inner",
        )
        .withColumn("_path", path)
        .filter(
            _longest_match_len(F.col("allow_prefixes"), F.col("_path"))
            >= _longest_match_len(F.col("disallow_prefixes"), F.col("_path"))
        )
        .drop("_path", "allow_prefixes", "disallow_prefixes")
    )
