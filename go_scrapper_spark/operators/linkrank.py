"""Link-structure frontier prioritization (crawl tier): PageRank-lite.

A web-scale crawler orders its frontier by more than discovery depth —
link-structure rank is the classic signal (crawl important hosts
first). This operator computes a fixed-iteration, INTEGER-exact
PageRank variant so the DuckDB oracle reproduces it bit-for-bit:

    rank_0(v)   = 1_000_000                      (micro-units)
    rank_i+1(v) = base + (damping * Σ_{u→v} rank_i(u) div deg(u)) div 1000
    base        = 1_000_000 - damping_permille * 1000 div 1000  (=150_000
                  at the default 850‰ damping)

``div`` is integral division on both engines, so there is no float
drift anywhere. Deliberate simplifications, documented: fixed
iteration count (rank consumers want a stable signal, not ε-
convergence), and dangling mass is dropped rather than redistributed
(the standard sparse-crawl simplification — it rescales ranks,
preserving order within connected regions).

Scale shape: per iteration ONE shuffle (edge⋈rank join keyed by src,
then the dst-keyed contribution sum); the degree table joins on the
same src key, so co-partitioning makes it shuffle-free on a cluster
(bucketed by src). Ranks localCheckpoint per round — flat lineage,
same pattern as dedupe.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_scrapper_spark.operators.dedupe import (free_local_checkpoint,
                                                local_checkpoint_no_stats)


def pagerank_lite(vertices: DataFrame, edges: DataFrame, iters: int = 3,
                  damping_permille: int = 850) -> DataFrame:
    """vertices: (v); edges: (src, dst) directed. Returns (v, rank)
    in micro-units after ``iters`` rounds."""
    base = 1_000_000 - damping_permille * 1000
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = local_checkpoint_no_stats(vertices.select(
        "v", F.lit(1_000_000).cast("long").alias("rank")
    ))
    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.v)
            .select("dst", F.expr("rank div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        prev = ranks
        ranks = (
            vertices.join(contrib, vertices.v == contrib.dst, "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_permille} * coalesce(s, 0)) div 1000"
                    )
                ).cast("long").alias("rank"),
            )
        )
        ranks = local_checkpoint_no_stats(ranks)
        free_local_checkpoint(prev)  # superseded round's blocks
    free_local_checkpoint(edges_deg)
    return ranks
