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
                  damping_permille: int = 850,
                  checkpoint_every: int = 8) -> DataFrame:
    """vertices: (v); edges: (src, dst) directed. Returns (v, rank)
    in micro-units after ``iters`` rounds.

    Driver economics (round 7): the round-6 shape ran an EAGER
    localCheckpoint per iteration plus one for the degree-joined edge
    table — iters+1 blocking driver jobs before the caller's action,
    ~1 s each of fixed job cost at sandbox payloads (measured: 3.1 s
    wall for 3 iterations whose actual compute was ~0.3 s). A 3-deep
    join lineage is trivial for Catalyst, so intermediate rounds now
    stay LAZY: edges_deg is a (lazy) persist filled by the caller's
    first action, and ranks only checkpoint every ``checkpoint_every``
    rounds — the lineage-growth guard long runs still need (the plan
    doubles per round through the shared edges_deg subtree, so
    unbounded laziness would hit analysis-time blowup, the round-6
    localCheckpoint lesson). iters <= checkpoint_every ⇒ ZERO driver
    jobs inside this function."""
    base = 1_000_000 - damping_permille * 1000
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # lazy persists: every iteration references both subtrees (the
    # lazy chain would otherwise recompute the caller's vertex/edge
    # derivations once per reference — 2 per round for vertices); the
    # first action materializes each once into the cache
    edges_deg = edges.join(deg, "src").persist()
    vertices = vertices.persist()
    ranks = vertices.select(
        "v", F.lit(1_000_000).cast("long").alias("rank")
    )
    ckpts: list[DataFrame] = []
    for i in range(iters):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.v)
            .select("dst", F.expr("rank div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
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
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = local_checkpoint_no_stats(ranks)
            for prev in ckpts:
                free_local_checkpoint(prev)
            ckpts = [ranks]
    return ranks
