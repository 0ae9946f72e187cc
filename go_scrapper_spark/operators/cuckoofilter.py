"""Partitioned cuckoo URL-seen filter (SURVEY.md §4.2-2, north rule:
"bloom/cuckoo URL-seen filter").

The deletion-capable sibling of the bloom filter in
``operators/seenfilter.py``: same per-``url_hash``-bucket partitioning,
same no-false-negative contract, same cogroup check kernel shape — but
membership is stored as 16-bit partial-key fingerprints in a 4-way
cuckoo table (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014), so a URL can be *removed*. That is the primitive
a recrawl/expiry policy needs: re-admitting a stale URL to the
frontier means deleting it from the seen filter, which a bloom cannot
do without a rebuild.

No-false-negative guarantee (the crawl must never silently drop an
unseen URL) holds unconditionally: a kick chain that exhausts its
budget leaves one fingerprint homeless — it parks in the bucket's
victim stash (the paper's "stash", here unbounded), and the membership
check consults table OR stash. The stash stays empty below ~0.84 load;
sizing uses 0.75.

Keys are the engine's Spark-native ``xxhash64(canonical_url)`` int64 —
fingerprint and both candidate slots derive from it with integer ops
only (no re-hashing of strings), mirroring seenfilter's double-hash
derivation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUCKOO_DDL = (
    "bucket int, table binary, stash binary, n_items long, m_slots long"
)

SLOTS_PER_BUCKET = 4
_FP_MIX = np.uint64(0x5BD1E995)  # odd mixer: fp -> partner-bucket offset
_MAX_KICKS = 500


def cuckoo_params(expected_n: int, load_factor: float = 0.75) -> int:
    """Slot-bucket count m (power of two) for an expected item count."""
    expected_n = max(expected_n, 16)
    need = int(expected_n / (SLOTS_PER_BUCKET * load_factor)) + 1
    m = 1
    while m < need:
        m <<= 1
    return m


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """Nonzero 16-bit partial keys from the int64 url_hash."""
    h = hashes.astype(np.uint64)
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _slot_indexes(
    hashes: np.ndarray, fp: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """(i1, i2) candidate slot-buckets; partner derivation is the
    standard partial-key XOR, so i2's partner is i1 again (delete and
    kick both rely on this involution)."""
    mask = np.uint64(m - 1)
    i1 = (hashes.astype(np.uint64) & mask).astype(np.int64)
    off = (fp.astype(np.uint64) * _FP_MIX) & mask
    i2 = (i1.astype(np.uint64) ^ off).astype(np.int64)
    return i1, i2


def _partner(idx: int, fp: int, m: int) -> int:
    return int((np.uint64(idx) ^ ((np.uint64(fp) * _FP_MIX) & np.uint64(m - 1))))


def _insert_many(
    table: np.ndarray, stash: list[int], hashes: np.ndarray, m: int
) -> None:
    """Insert int64 keys into a (m, 4) uint16 table in place.
    Deterministic kick order (victim slot cycles with the attempt
    counter) so a rebuilt filter is byte-identical. A kick chain that
    exhausts its budget parks the one homeless FINGERPRINT in the
    bucket's ``stash`` — the key it belonged to stays positive via the
    stash check, so no insert can ever create a false negative."""
    fps = _fingerprints(hashes)
    i1s, i2s = _slot_indexes(hashes, fps, m)
    for fp, i1, i2 in zip(fps, i1s, i2s):
        placed = False
        for idx in (i1, i2):
            free = np.flatnonzero(table[idx] == 0)
            if free.size:
                table[idx, free[0]] = fp
                placed = True
                break
        if placed:
            continue
        # cuckoo kicks: evict a resident fingerprint to its partner
        # bucket. The new key's fp is swapped IN on the first hop, so
        # after the chain only the final evictee is homeless.
        idx, cur = int(i1), int(fp)
        for attempt in range(_MAX_KICKS):
            victim = attempt % SLOTS_PER_BUCKET
            cur, table[idx, victim] = int(table[idx, victim]), int(cur)
            idx = _partner(idx, cur, m)
            free = np.flatnonzero(table[idx] == 0)
            if free.size:
                table[idx, free[0]] = cur
                break
        else:
            stash.append(int(cur))


def _contains(
    table: np.ndarray, stash: np.ndarray, hashes: np.ndarray, m: int
) -> np.ndarray:
    """Vectorized membership for int64 keys against one bucket's
    (m, 4) table + victim stash."""
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    fps = _fingerprints(hashes)
    i1s, i2s = _slot_indexes(hashes, fps, m)
    hit = (table[i1s] == fps[:, None]).any(axis=1)
    hit |= (table[i2s] == fps[:, None]).any(axis=1)
    if stash.size:
        hit |= np.isin(fps, stash)
    return hit


def _delete_many(
    table: np.ndarray, stash: list[int], hashes: np.ndarray, m: int
) -> int:
    """Remove ONE fingerprint occurrence per key (standard cuckoo
    delete: only call for keys previously inserted). Returns the
    number of removals."""
    fps = _fingerprints(hashes)
    i1s, i2s = _slot_indexes(hashes, fps, m)
    removed = 0
    for fp, i1, i2 in zip(fps, i1s, i2s):
        done = False
        for idx in (i1, i2):
            slots = np.flatnonzero(table[idx] == fp)
            if slots.size:
                table[idx, slots[0]] = 0
                removed += 1
                done = True
                break
        if not done and int(fp) in stash:
            stash.remove(int(fp))
            removed += 1
    return removed


def _row(bucket: int, table: np.ndarray, stash: list[int], n: int, m: int):
    return (
        int(bucket),
        table.tobytes(),
        np.asarray(sorted(stash), dtype=np.uint16).tobytes(),
        int(n),
        int(m),
    )


def _load(row) -> tuple[np.ndarray, list[int], int, int]:
    m = int(row["m_slots"])
    table = (
        np.frombuffer(bytes(row["table"]), dtype=np.uint16)
        .reshape(m, SLOTS_PER_BUCKET)
        .copy()
    )
    st_raw = row["stash"]
    stash = (
        list(np.frombuffer(bytes(st_raw), dtype=np.uint16)) if st_raw else []
    )
    return table, stash, int(row["n_items"]), m


def build_cuckoos(
    seen: DataFrame, expected_per_bucket: int, load_factor: float = 0.75
) -> DataFrame:
    """seen(url_hash, bucket) → one cuckoo row per bucket (distributed,
    applyInPandas per bucket — the exact shape of build_blooms)."""
    m = cuckoo_params(expected_per_bucket, load_factor)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((m, SLOTS_PER_BUCKET), dtype=np.uint16)
        stash: list[int] = []
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        _insert_many(table, stash, hashes, m)
        return pd.DataFrame(
            [_row(pdf["bucket"].iloc[0], table, stash, len(hashes), m)],
            columns=["bucket", "table", "stash", "n_items", "m_slots"],
        )

    return seen.groupBy("bucket").applyInPandas(build, schema=CUCKOO_DDL)


def merge_cuckoo_delta(
    cuckoos: DataFrame, delta: DataFrame, expected_per_bucket: int | None = None
) -> DataFrame:
    """Fold a (url_hash, bucket) delta into the cuckoo table — the
    per-wave incremental update, same outer-join + kernel shape as
    merge_bloom_delta. New buckets size from ``expected_per_bucket``
    (falls back to the table's first row's shape)."""
    new_m = (
        cuckoo_params(expected_per_bucket)
        if expected_per_bucket is not None
        else None
    )

    joined = (
        delta.select("url_hash", "bucket")
        .groupBy("bucket")
        .agg(F.collect_list("url_hash").alias("hashes"))
        .join(cuckoos, "bucket", "outer")
    )

    def merge(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for row in pdf.to_dict("records"):
                if row["table"] is not None:
                    table, stash, n, m = _load(row)
                else:
                    m = new_m if new_m is not None else cuckoo_params(16)
                    table = np.zeros((m, SLOTS_PER_BUCKET), dtype=np.uint16)
                    stash, n = [], 0
                hashes = row["hashes"]
                if hashes is not None and len(hashes):
                    arr = np.asarray(hashes, dtype=np.int64)
                    _insert_many(table, stash, arr, m)
                    n += len(arr)
                out.append(_row(row["bucket"], table, stash, n, m))
            yield pd.DataFrame(
                out, columns=["bucket", "table", "stash", "n_items", "m_slots"]
            )

    return joined.mapInPandas(merge, schema=CUCKOO_DDL)


def delete_hashes(cuckoos: DataFrame, removals: DataFrame) -> DataFrame:
    """Remove keys (url_hash, bucket) from the filter — the recrawl /
    seen-expiry primitive a bloom cannot express. Only delete keys that
    were inserted (cuckoo-filter contract; deleting a never-inserted
    key may evict an unrelated colliding fingerprint)."""
    joined = (
        removals.select("url_hash", "bucket")
        .groupBy("bucket")
        .agg(F.collect_list("url_hash").alias("hashes"))
        .join(cuckoos, "bucket", "right_outer")
    )

    def drop(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for row in pdf.to_dict("records"):
                table, stash, n, m = _load(row)
                hashes = row["hashes"]
                if hashes is not None and len(hashes):
                    arr = np.asarray(hashes, dtype=np.int64)
                    n -= _delete_many(table, stash, arr, m)
                out.append(_row(row["bucket"], table, stash, n, m))
            yield pd.DataFrame(
                out, columns=["bucket", "table", "stash", "n_items", "m_slots"]
            )

    return joined.mapInPandas(drop, schema=CUCKOO_DDL)


def filter_unseen_cuckoo_join(
    candidates: DataFrame,
    seen: DataFrame,
    cuckoos: DataFrame,
    n_buckets: int,
) -> DataFrame:
    """Exact unseen set with the cuckoo pre-pass — the drop-in sibling
    of seenfilter.filter_unseen_join: candidates cogroup with the
    cuckoo table on bucket, cuckoo-negatives are provably unseen,
    positives anti-join the exact seen set. Result identical to a
    plain anti-join (property-tested)."""
    import pyspark.sql.types as ST

    cand = candidates.withColumn(
        "_bkt", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).withColumn("_h", F.xxhash64("url"))

    def check(cand_pdf: pd.DataFrame, ck_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(_maybe=pd.Series(dtype=bool))
        if ck_pdf.empty:
            return cand_pdf.assign(_maybe=False)
        table, stash, _n, m = _load(ck_pdf.iloc[0])
        h = cand_pdf["_h"].to_numpy(dtype=np.int64)
        maybe = _contains(
            table, np.asarray(stash, dtype=np.uint16), h, m
        )
        return cand_pdf.assign(_maybe=maybe)

    out_schema = ST.StructType(
        cand.schema.fields + [ST.StructField("_maybe", ST.BooleanType())]
    )
    tagged = (
        cand.groupBy("_bkt")
        .cogroup(cuckoos.groupBy(F.col("bucket").alias("_bkt")))
        .applyInPandas(check, schema=out_schema)
    )
    return tagged.join(
        seen.select(F.col("url_hash").alias("_sh")),
        F.col("_maybe") & (tagged["_h"] == F.col("_sh")),
        "left_anti",
    ).drop("_maybe", "_bkt", "_h")
