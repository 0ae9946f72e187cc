"""Partitioned bloom URL-seen filter (SURVEY.md §4.2-2, north rule).

The seen-set at 10^10 URLs cannot be anti-joined wholesale every wave.
This module keeps one bloom filter per url_hash bucket, built and
merged distributively (applyInPandas over buckets, numpy bit ops), and
prefilters candidate URLs: bloom-negative candidates are *provably
unseen* (no false negatives — property-tested) and skip the exact
check entirely; only bloom-positives (~fpp of the unseen plus all the
true dups) reach the exact anti-join.

Deployment shapes:
- sandbox / moderate buckets: blooms collected once per wave and
  sc.broadcast to the check UDF (64 buckets × ~0.1-3 MB);
- 10^10 scale: thousands of buckets — the same check runs as a
  bucket-equi-join against the ``seen_bloom`` table instead of a
  broadcast (the code path is the same pandas kernel; only the
  distribution of the bloom bytes changes).

Keys are Spark-native ``xxhash64(canonical_url)`` (signed int64); the
k bloom probes derive from it by splitting into two 32-bit halves
(double hashing) — everything is integer arithmetic on the already-
computed key, no re-hashing of strings.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_DDL = "bucket int, bloom binary, n_items long, m_bits long, k_hashes int"


def bloom_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for an expected item count and target fpp."""
    expected_n = max(expected_n, 16)
    m = int(math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64  # round to whole words
    k = max(1, int(round(m / expected_n * math.log(2))))
    return m, min(k, 16)


def _probe_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on the 64-bit key."""
    h = hashes.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    ks = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n, k) positions → (n,) all-bits-set mask."""
    byte = bits[pos >> 3]
    return ((byte >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)


def build_blooms(seen: DataFrame, expected_per_bucket: int, fpp: float = 0.01) -> DataFrame:
    """seen(url_hash, bucket) → one bloom row per bucket (distributed)."""
    m_bits, k = bloom_params(expected_per_bucket, fpp)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        hashes = pdf["url_hash"].to_numpy()
        _set_bits(bits, _probe_positions(hashes, m_bits, k))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bloom": [bits.tobytes()],
                "n_items": [len(pdf)],
                "m_bits": [m_bits],
                "k_hashes": [k],
            }
        )

    return seen.select("url_hash", "bucket").groupBy("bucket").applyInPandas(
        build, schema=BLOOM_DDL
    )


def merge_bloom_delta(
    blooms: DataFrame, delta: DataFrame, shape: tuple[int, int] | None = None
) -> DataFrame:
    """OR a delta of (url_hash, bucket) into the per-bucket blooms.

    Existing buckets are ALWAYS probed with their own stored
    (m_bits, k_hashes) — a caller-supplied ``shape`` applies only to
    buckets created by this delta, so resuming with a different
    bloom_expected_per_bucket/fpp config cannot mis-probe (or index
    past) a snapshot's old-shape buffers. Pass ``shape`` to skip the
    driver round-trip that infers the new-bucket shape from the
    table."""
    if shape is None:
        row = blooms.select("m_bits", "k_hashes").first()
        shape = (int(row["m_bits"]), int(row["k_hashes"]))
    new_m_bits, new_k = shape

    joined = delta.select("url_hash", "bucket").groupBy("bucket").agg(
        F.collect_list("url_hash").alias("hashes")
    ).join(blooms, "bucket", "outer")

    def merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.to_dict("records"):
                if row["bloom"] is not None:
                    bits = np.frombuffer(bytes(row["bloom"]), dtype=np.uint8).copy()
                    n = int(row["n_items"])
                    m_bits, k = int(row["m_bits"]), int(row["k_hashes"])
                else:
                    bits = np.zeros(new_m_bits // 8, dtype=np.uint8)
                    n = 0
                    m_bits, k = new_m_bits, new_k
                hashes = row["hashes"]
                if hashes is not None and len(hashes):
                    arr = np.asarray(hashes, dtype=np.int64)
                    _set_bits(bits, _probe_positions(arr, m_bits, k))
                    n += len(arr)
                out.append((int(row["bucket"]), bits.tobytes(), n, m_bits, k))
            yield pd.DataFrame(
                out, columns=["bucket", "bloom", "n_items", "m_bits", "k_hashes"]
            )

    return joined.mapInPandas(merge, schema=BLOOM_DDL)


def might_contain_udf(blooms_by_bucket: dict[int, tuple[bytes, int, int]]):
    """Pandas UDF factory: (url_hash, bucket) → bloom membership.
    ``blooms_by_bucket`` is a small driver-side dict (broadcast by
    closure capture); at very large bucket counts use the equi-join
    variant instead."""

    @F.pandas_udf(T.BooleanType())
    def might_contain(url_hash: pd.Series, bucket: pd.Series) -> pd.Series:
        out = np.zeros(len(url_hash), dtype=bool)
        h = url_hash.to_numpy()
        b = bucket.to_numpy()
        for bk in np.unique(b):
            entry = blooms_by_bucket.get(int(bk))
            mask = b == bk
            if entry is None:
                out[mask] = False
                continue
            raw, m_bits, k = entry
            bits = np.frombuffer(raw, dtype=np.uint8)
            out[mask] = _test_bits(bits, _probe_positions(h[mask], m_bits, k))
        return pd.Series(out, index=url_hash.index)

    return might_contain


def collect_blooms(blooms: DataFrame) -> dict[int, tuple[bytes, int, int]]:
    return {
        int(r["bucket"]): (bytes(r["bloom"]), int(r["m_bits"]), int(r["k_hashes"]))
        for r in blooms.collect()
    }


def filter_unseen_join(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame,
    n_buckets: int,
) -> DataFrame:
    """filter_unseen with the bloom state as a TABLE instead of a
    driver dict — the 10^10-scale shape. Candidates cogroup with the
    bloom table on bucket (both sides shuffle on the same key; each
    task sees one bucket's candidates next to that bucket's single
    bloom row — the bloom bytes are never replicated per candidate and
    never touch the driver). Bloom-negatives are provably unseen and
    skip the exact check; bloom-positives anti-join against the exact
    seen set. Result identical to a plain anti-join (equivalence- and
    property-tested)."""
    import pyspark.sql.types as ST

    cand = candidates.withColumn(
        "_bkt", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).withColumn("_h", F.xxhash64("url"))

    def check(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(_maybe=pd.Series(dtype=bool))
        if bloom_pdf.empty:
            return cand_pdf.assign(_maybe=False)
        raw = bytes(bloom_pdf["bloom"].iloc[0])
        m_bits = int(bloom_pdf["m_bits"].iloc[0])
        k = int(bloom_pdf["k_hashes"].iloc[0])
        bits = np.frombuffer(raw, dtype=np.uint8)
        h = cand_pdf["_h"].to_numpy()
        maybe = _test_bits(bits, _probe_positions(h, m_bits, k))
        return cand_pdf.assign(_maybe=maybe)

    out_schema = ST.StructType(
        cand.schema.fields + [ST.StructField("_maybe", ST.BooleanType())]
    )
    tagged = (
        cand.groupBy("_bkt")
        .cogroup(blooms.groupBy(F.col("bucket").alias("_bkt")))
        .applyInPandas(check, schema=out_schema)
    )
    # one anti-join with the bloom verdict folded into the condition:
    # a row is dropped iff it is a bloom-positive AND exactly seen.
    # Referencing `tagged` once keeps a single cogroup subtree in the
    # plan (a fresh/suspects union would execute the shuffle + probe
    # kernel twice).
    return tagged.join(
        seen.select(F.col("url_hash").alias("_sh")),
        F.col("_maybe") & (tagged["_h"] == F.col("_sh")),
        "left_anti",
    ).drop("_maybe", "_bkt", "_h")


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    blooms_by_bucket: dict[int, tuple[bytes, int, int]],
    n_buckets: int,
) -> DataFrame:
    """Exact unseen set with the bloom pre-pass: bloom-negatives pass
    straight through (no false negatives); bloom-positives are
    exact-checked by anti-join. Result is identical to a plain
    anti-join of candidates against seen (property-tested)."""
    tagged = candidates.withColumn(
        "_maybe",
        might_contain_udf(blooms_by_bucket)(
            F.xxhash64("url"),
            F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"),
        ),
    )
    fresh = tagged.filter(~F.col("_maybe")).drop("_maybe")
    suspects = tagged.filter(F.col("_maybe")).drop("_maybe")
    confirmed_new = suspects.join(
        seen.select(F.col("url_hash").alias("_sh")),
        F.xxhash64(suspects["url"]) == F.col("_sh"),
        "left_anti",
    )
    return fresh.unionByName(confirmed_new)
