"""Embedding similarity search (training-data pipeline tier).

Brute-force inner-product top-k as the correctness baseline, an
LSH-bucketed variant as the scale path, and an integer-exact cosine
threshold for near-dup detection.

Determinism design: embeddings are quantized to integer milli-units
(round(x*1000)) before any arithmetic, so every score is exact 64-bit
integer math — bit-identical between Spark and the DuckDB oracle, with
no float-summation-order hazards. The cosine threshold test
``cos(a,b) ≥ t`` is evaluated as ``dot>0 ∧ dot²·den² ≥ num²·|a|²·|b|²``
with t = num/den — still pure integers.

Scale notes: brute-force is a crossJoin — only the small query side is
broadcast; candidates stream. The LSH variant buckets by sign bits of
fixed integer-weight hyperplanes, turning the crossJoin into an
equi-join on bucket (the 100 TB path; IVF with learned centroids slots
into the same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize(col) -> F.Column:
    """float array → exact integer milli-units. The float32 element is
    promoted to double BEFORE the multiply on both engines — a float32
    product can land exactly on a .5 boundary that the double product
    doesn't (observed: 0.3195f*1000 = 319.5f but 319.49999... as
    double), flipping the rounded milli-unit and a threshold pair."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * 1000).cast("long")
    )


def dot_int(a, b) -> F.Column:
    """Integer dot product via zip_with + ordered fold (exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_int(a) -> F.Column:
    return dot_int(a, a)


def quantize_int8(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization — the ANN memory-
    compression stage (4x smaller vectors, dot products in int32):
    q_i = round-toward-zero(x_i * 127 / maxabs(x)) over milli-unit
    integers, one scalar row per dimension (array outputs are banned
    from oracle-gated results).

    Integer-division portability trap, handled explicitly: Spark `div`
    truncates toward zero while DuckDB `//` floors, so negative
    components would quantize one step apart. Both sides therefore
    compute on |x| and reapply the sign — identical on any engine.
    Output: (vec_id, dim_idx, q, maxabs_milli); maxabs_milli is the
    per-vector dequantization scale a reader needs."""
    milli = emb.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("mv")
    )
    with_scale = milli.select(
        "vec_id", "mv",
        F.array_max(F.transform("mv", lambda x: F.abs(x))).alias("maxabs"),
    )
    rows = with_scale.select(
        "vec_id", "maxabs", F.posexplode("mv").alias("dim_idx", "m")
    )
    absq = F.expr("(abs(m) * 127) div maxabs")
    return rows.select(
        "vec_id",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.when(F.col("maxabs") == 0, F.lit(0))
        .otherwise(F.when(F.col("m") < 0, -absq).otherwise(absq))
        .cast("long")
        .alias("q"),
        F.col("maxabs").cast("long").alias("maxabs_milli"),
    )


def topk_dot(emb: DataFrame, k: int = 3, n_queries: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k by quantized inner product. Queries = the
    first ``n_queries`` ids (broadcast side); ties broken by id."""
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    c = emb.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id", dot_int(F.col("qv"), F.col("cv")).alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def cosine_near_dup_pairs(emb: DataFrame, num: int = 3, den: int = 10,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          block_size: int = 2048,
                          max_blocks: int | None = 32) -> DataFrame:
    """All pairs with cosine ≥ num/den — integer-exact threshold,
    executed as fully distributed blocked matmul (no driver collect,
    no closure-captured matrix — the round-1 scale-killer is gone).

    Plan shape: rows are range-blocked by id (``floor(id/block_size)``),
    each block folded into one chunk row (ids + matrix); the upper
    triangle of block pairs (bi ≤ bj, B(B+1)/2 tasks) is joined and
    each task computes its (block × block) integer dot-product tile as
    one numpy int64 matmul. Shuffle volume is B·n·dim (each chunk
    replicated B ways) and task memory is 2 chunks — both tuned by
    ``block_size``; at 10⁹ vectors this is the standard distributed
    GEMM tiling, and every tile task scales out across executors. For
    sub-quadratic candidate generation use ``lsh_bucketed_neighbors``;
    this operator is the exact verifier.

    ``max_blocks`` (round 7) makes the tiling scale-adaptive: shuffle
    volume is B·n·dim (each chunk replicated B ways), so a block size
    tuned for a small table quadratically over-replicates a larger one
    — measured at the 10x sf: B=79 blocks shuffled ~800 MB of chunk
    copies where B=32 moves ~330 MB for identical output. When
    n/block_size would exceed ``max_blocks``, block_size grows to
    ceil(n/max_blocks) (one count-only scan to learn n; block
    assignment cannot change the result set — every id pair still
    meets in exactly one bi ≤ bj tile). Pass None to pin block_size
    exactly. At production scale max_blocks is sized so a chunk pair
    (~2·block·dim·8 bytes) stays comfortably in task memory."""
    import math

    import numpy as np
    import pandas as pd

    if max_blocks:
        n = emb.count()
        if n > block_size * max_blocks:
            block_size = math.ceil(n / max_blocks)
    v = emb.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("v")
    ).withColumn("blk", F.floor(F.col("id") / block_size).cast("long"))
    chunks = v.groupBy("blk").agg(
        F.collect_list(F.struct("id", "v")).alias("rows")
    )
    a = chunks.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = chunks.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    # B is small (n/block_size) → the block-pair join is a trivial
    # nested-loop over chunk handles, then one heavy task per tile
    tiles = a.join(b, F.col("blk_a") <= F.col("blk_b")).repartition(
        F.col("blk_a"), F.col("blk_b")
    )

    def tile_kernel(it):
        for pdf in it:
            for rows_a, rows_b in zip(pdf["rows_a"], pdf["rows_b"]):
                ids_a = np.array([r["id"] for r in rows_a], dtype=np.int64)
                mat_a = np.array([r["v"] for r in rows_a], dtype=np.int64)
                ids_b = np.array([r["id"] for r in rows_b], dtype=np.int64)
                mat_b = np.array([r["v"] for r in rows_b], dtype=np.int64)
                dots = mat_a @ mat_b.T  # exact int64 matmul
                na = (mat_a * mat_a).sum(axis=1)
                nb = (mat_b * mat_b).sum(axis=1)
                # int64 is exact here: |q| ≤ ~1000·|x|, so dot ≤ dim·10^6
                # and dot²·den² ≤ ~4e17 < 2^63 for unit-scale embeddings
                lhs = dots * dots * (den * den)
                rhs = np.outer(na, nb) * (num * num)
                hit = (dots > 0) & (lhs >= rhs) & (ids_a[:, None] < ids_b[None, :])
                ai, bj = np.nonzero(hit)
                yield pd.DataFrame(
                    {"id_a": ids_a[ai], "id_b": ids_b[bj], "dot": dots[ai, bj]}
                )

    return tiles.mapInPandas(tile_kernel, schema="id_a long, id_b long, dot long")


def lsh_plane_weight(table: int, plane: int, j) -> F.Column | int:
    """Deterministic pseudo-random hyperplane weight in [-3, 3]:
    w = ((s·K) mod M) mod 7 − 3 with s = t·7919 + p·104729 + j·97,
    K = 2654435761 (Knuth multiplier), M = 999983 (prime).

    The double modulus is load-bearing: any single small modulus makes
    the map LINEAR in (t, p, j) mod that modulus, collapsing every
    (table, plane) pair onto a handful of distinct hyperplanes — the
    round-3 weights ((t·11+p·7+j·13) mod 5 − 2) had only FIVE planes
    total, which is why adding hash tables couldn't raise recall. With
    M prime and coprime to 7, distinct (t, p) give genuinely
    independent plane families (verified: recall now rises with
    n_tables instead of saturating). All int64-safe: s ≤ ~2·10⁷, so
    s·K ≤ ~5·10¹⁶ < 2⁶³, and identical arithmetic runs in DuckDB."""
    if isinstance(j, int):
        s = table * 7919 + plane * 104729 + j * 97
        return ((s * 2654435761) % 999983) % 7 - 3
    s = F.lit(table * 7919 + plane * 104729) + j * 97
    return (s * F.lit(2654435761)) % 999983 % 7 - 3


def _bucket_array_sql(qv_sql: str, n_planes: int, dim: int,
                      tables: list[int]) -> str:
    """SQL text computing ``array<int>`` of bucket ids over an
    ALREADY-quantized vector expression, one element per entry of
    ``tables``. The plane weights are compile-time constants (every
    ``lsh_plane_weight`` argument is a Python int here), baked in as
    one nested array literal INSIDE A SINGLE ``F.expr`` STRING.

    Why a string (round 7): the round-6.5 spelling built the literal
    weight arrays with per-element ``F.lit`` Column calls — n_tables ×
    n_planes × dim ≈ 2,048 py4j round-trips per *plan build*, measured
    at 4.3-4.9 s of driver-side Python per ``sim_lsh_neighbors`` call
    (vs 1.3 s of actual execution; bench.py rebuilds the plan every
    sample, so the build cost was ~75% of the reported number). One
    expr string is one py4j call; the JVM parses it in milliseconds
    and constant-folds the weight matrix to a single Literal. Weight
    VALUES are identical by construction (same weight function,
    evaluated at string-build time).

    Executed shape per row: for each table, fold the plane index range,
    each plane one zip_with dot against its literal weight row —
    exactly the arithmetic the round-6 per-Column spelling ran."""
    wrows = []
    for t in tables:
        for p in range(n_planes):
            ws = ",".join(
                f"{lsh_plane_weight(t, p, j)}L" for j in range(dim)
            )
            wrows.append(f"array({ws})")
    wmat = "array(" + ",".join(wrows) + ")"
    proj = (
        f"aggregate(zip_with({qv_sql}, "
        f"element_at({wmat}, t*{n_planes} + p + 1), (x, w) -> x * w), "
        f"0L, (a, x) -> a + x)"
    )
    bucket = (
        f"aggregate(sequence(0, {n_planes - 1}), 0, "
        f"(b, p) -> b + IF({proj} > 0, shiftleft(1, p), 0))"
    )
    return (
        f"transform(sequence(0, {len(tables) - 1}), "
        f"t -> cast({bucket} as int))"
    )


def _bucket_from_quantized(qv_col, n_planes: int = 4, dim: int = 64,
                           table: int = 0) -> F.Column:
    """Bucket id from sign bits over an ALREADY-quantized vector
    column (one table; see ``_bucket_array_sql`` for the plan-build
    economics). ``qv_col`` is a column name or a Column whose JVM
    expression renders to SQL (plain column references do)."""
    qv_sql = qv_col if isinstance(qv_col, str) else qv_col._jc.expr().sql()
    return F.expr(
        f"element_at({_bucket_array_sql(qv_sql, n_planes, dim, [table])}, 1)"
    )


def lsh_projection_bucket(vec_col, n_planes: int = 4, dim: int = 64,
                          table: int = 0) -> F.Column:
    """Bucket id from sign bits of ``n_planes`` fixed integer-weight
    hyperplanes over the quantized vector (``table`` seeds an
    independent plane family per hash table). Deterministic,
    integer-exact, oracle-reproducible.

    General-purpose wrapper: quantizes inline (the quantize expression
    is bound once via a one-element transform, not once per plane)."""
    vec_sql = (vec_col if isinstance(vec_col, str)
               else vec_col._jc.expr().sql())
    qv_sql = (f"transform({vec_sql},"
              " x -> cast(round(cast(x as double) * 1000) as long))")
    inner = _bucket_array_sql("qv", n_planes, dim, [table])
    return F.expr(
        f"element_at(transform(array({qv_sql}), qv -> "
        f"element_at({inner}, 1)), 1)"
    )


def ivf_topk(emb: DataFrame, k: int = 3, n_queries: int = 5,
             n_centroids: int = 8, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: candidates are assigned to the cell of their
    nearest centroid (argmax inner product, ties to the lower centroid
    id); a query probes its ``nprobe`` best cells and searches only
    those inverted lists. Centroids here are the first ``n_centroids``
    candidate vectors — deterministic and oracle-reproducible; a real
    deployment drops in k-means centroids without changing the plan.

    Plan shape (round 7): the tiny centroid table folds to ONE row
    holding a cid-ordered array of (cid, vector) structs; assignment
    and probing are broadcast crossJoins against that single row with
    the argmax / top-nprobe computed IN-ROW over the 8-element array —
    no per-(row × C) expansion, and no ``Window.partitionBy(id)``,
    which re-shuffled the whole (corpus × C) expansion just to pick
    each row's best centroid (the round-6 shape's one full exchange).
    The search itself stays an equi-join on cell id — the crossJoin
    over the full corpus never happens. At 10⁹ vectors this is the
    standard IVF layout: cells become the partition key of the
    candidate table. All arithmetic is exact int64 (quantized
    milli-units); tie-breaks ((dot desc, cid asc)) are reproduced by
    folding cid-ascending with a strict >, and by sorting
    (-dot, cid) structs ascending for the probe list."""
    v = emb.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("v"))
    cand = v.filter(F.col("id") >= n_queries)
    # centroids = the n_centroids lowest-id candidates (TakeOrdered —
    # no global sort); cid = rank within that tiny set; folded to one
    # cid-ordered array row (struct sort = lexicographic, cid first)
    cent1 = (
        cand.orderBy(F.col("id").asc())
        .limit(n_centroids)
        .withColumn(
            "cid",
            F.row_number().over(Window.orderBy(F.col("id").asc())) - 1,
        )
        .agg(F.sort_array(
            F.collect_list(F.struct(F.col("cid"), F.col("v").alias("cv")))
        ).alias("_cents"))
    )

    def cent_dots(vec_name: str) -> F.Column:
        # (dot, cid) per centroid, centroid order = cid ascending
        return F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                dot_int(F.col(vec_name), c["cv"]).alias("d"),
                c["cid"].alias("cid"),
            ),
        )

    best_cid = F.aggregate(
        F.col("_dots"),
        F.struct(
            F.lit(-(1 << 63)).cast("long").alias("d"),
            F.lit(-1).cast("int").alias("cid"),
        ),
        lambda acc, x: F.when(x["d"] > acc["d"], x).otherwise(acc),
    )["cid"]
    cells = (
        cand.crossJoin(F.broadcast(cent1))
        .withColumn("_dots", cent_dots("v"))
        .select("id", "v", best_cid.alias("cid"))
    )

    q = v.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    probe_cids = F.slice(
        F.sort_array(
            F.transform(
                F.col("_dots"),
                lambda s: F.struct((-s["d"]).alias("nd"), s["cid"].alias("cid")),
            )
        ),
        1, nprobe,
    )
    probes = (
        q.crossJoin(F.broadcast(cent1))
        .withColumn("_dots", cent_dots("qv"))
        .select(
            "query_id", "qv",
            F.explode(F.transform(probe_cids, lambda s: s["cid"]))
            .alias("cid"),
        )
    )

    scored = F.broadcast(probes).join(cells, "cid").select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        dot_int(F.col("qv"), F.col("v")).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def lsh_bucketed_neighbors(emb: DataFrame, k: int = 3, n_queries: int = 5,
                           n_planes: int = 4, dim: int = 64, n_tables: int = 8,
                           multiprobe: bool = True,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: top-k by inner product within the query's LSH bucket of ANY
    of ``n_tables`` independent hash tables — the equi-join scale path
    with standard OR-amplification (one table misses true neighbors
    that land one sign-bit apart; a union over T independent plane
    families recovers them, P[miss] decaying geometrically in T).
    ``multiprobe`` additionally probes every Hamming-distance-1 bucket
    on the QUERY side only (n_planes extra probe rows per query, zero
    extra corpus rows) — the standard recall boost when tables are
    expensive.

    Plan shape: each vector materializes T (table, bucket) rows
    (posexplode of a T-element bucket array, no Python); candidates are
    joined on the compound (table, bucket) key — shuffle volume is
    T × corpus, never corpus², and (T, multiprobe) are the recall/cost
    knobs. Candidate pairs found by several tables are deduped by a
    max-aggregate (one group-by, which also carries the per-pair score)
    before the top-k window.

    Defaults (round 5) are the GATE config, hard-asserted recall@3
    ≥ 0.85 in bench.py next to the IVF gate: T=8 + multiprobe →
    measured 0.87 recall on the synthetic embeddings table at 0.76
    candidate fraction. That high candidate fraction is a property of
    the DATA, not the plan: the synthetic table's top-3 neighbors sit
    at cosine ≈ 0.4 over isotropic noise (max pair cosine 0.601 in the
    whole table), so per-plane collision contrast is only 0.63 vs 0.5
    for a random pair. On a structured near-dup corpus (cos ≥ 0.8
    pairs, contrast 0.9+ vs 0.5) the same plan reaches ≥ 0.9 recall at
    a few percent candidate fraction — bench.py measures BOTH corpora
    (lsh_recall_structured). IVF (ivf_topk) is the top-k search path
    and carries its own ≥ 0.9 recall gate."""
    # quantize ONCE per row into a concrete column, then derive every
    # table's bucket from it — the previous spelling embedded the
    # quantize transform inside each of the n_tables × n_planes
    # projection expressions (32 redundant per-row transforms at the
    # defaults; guide §2.3 "project before the exchange" applied to
    # expression trees)
    qemb = emb.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("v")
    )
    buckets = F.expr(
        _bucket_array_sql("v", n_planes, dim, list(range(n_tables)))
    )
    v = qemb.select(
        "id", "v", F.posexplode(buckets).alias("table", "bucket"),
    )
    q = v.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "table", "bucket"
    )
    if multiprobe:
        # probe the exact bucket plus each 1-bit flip of it
        probe_buckets = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b)).cast("int")
                for b in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "qv", "table",
            F.explode(probe_buckets).alias("bucket"),
        )
    c = v.filter(F.col("id") >= n_queries).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "table", "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .groupBy("query_id", "neighbor_id")
        # a pair co-bucketed in several tables is ONE candidate; max is
        # a no-op on the (deterministic) dot but folds the dedup and
        # the score into a single aggregate; flat codegen'd dot — both
        # sides are bound columns of known dimension
        .agg(F.max(dot_int(F.col("qv"), F.col("cv"))).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )
