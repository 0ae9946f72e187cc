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


def apply_robots(candidates: DataFrame, robots_df: DataFrame) -> DataFrame:
    """candidates must carry ``url`` and ``host``. Inner join = the
    allow-list (unknown hosts are excluded, as colly's AllowedDomains
    silently drops them); exists() over disallow_prefixes = the robots
    prefix rule."""
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    return (
        candidates.join(
            F.broadcast(robots_df.select("host", "disallow_prefixes")), "host", "inner"
        )
        .withColumn("_path", path)
        .filter(
            ~F.exists(
                F.coalesce(F.col("disallow_prefixes"), F.array()),
                lambda p: F.col("_path").startswith(p),
            )
        )
        .drop("_path", "disallow_prefixes")
    )
