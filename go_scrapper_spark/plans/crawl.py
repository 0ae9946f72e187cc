"""The batch frontier scheduler — superstep crawl loop (SURVEY.md §3.3, §7).

Each superstep (wave) is one declarative Spark plan:

    pending frontier
      → per-host top-k wave selection (W3, politeness budget A5)
      → fetch join against the pages table (J4 — the synthetic web;
        a real deployment swaps this stage for an HTTP mapInPandas)
      → vectorized extraction, one html read per page (P-series, §2.10)
      → review finishing (hash P18 already applied; b64 P12 JVM-side)
      → outlink candidates: robots filter (S9/J5) → in-wave dedup (U2)
        → anti-join vs frontier/seen (J3)
      → frontier merge + seen/extracted/metrics deltas
      → snapshot commit (atomic; resume-idempotent via wave_id stamps)

The loop itself is plain driver Python — deterministic and resumable
from the last committed snapshot. Each superstep reads its frontier
from the previous snapshot's parquet, which also truncates lineage (no
iterative-plan blowup).

Scale design (10^10 frontier): frontier/seen bucketed by host/url hash
(Iceberg ``bucket()``), wave selection windows align with that
bucketing, the robots/budget joins broadcast, the fetch join is
storage-partitioned on url bucket, AQE handles residual skew. The
frontier merge here is a full rewrite against the parquet-snapshot
backend; on Iceberg it becomes MERGE INTO (merge-on-read) with
identical semantics.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_scrapper_spark.functions.extract import extract_pages
from go_scrapper_spark.functions.urltools import canonicalize_udf
from go_scrapper_spark.operators.dedupe import local_checkpoint_no_stats
from go_scrapper_spark.operators.politeness import apply_robots
from go_scrapper_spark.operators.wave import host_budget, select_wave
from go_scrapper_spark.sources.storage import SnapshotStore

RUN_TS = 1700000000  # single run-level scrape timestamp (P11 determinism)

SEED_SEQ_STRIDE = 10_000_000  # seq space per task; outlink offsets nest inside


@dataclass
class CrawlConfig:
    max_attempts: int = 5  # 5 total fetch attempts per url (main.go:1079-1099)
    window_ms: int = 30_000  # superstep politeness window (A5)
    default_k: int = 10  # colly Parallelism fallback (collyfunc.go:179)
    n_buckets: int = 64  # host/url hash buckets (skew + storage partitioning)
    max_supersteps: int = 1000
    partition_frontier: bool = False  # partitionBy(host_bucket) on write (scale mode)
    fail_attempts_fn: object = None  # url -> int; transient-failure injection (Python)
    # JVM-native failure expression (url column -> int column); preferred
    # over fail_attempts_fn — keeps the fetch stage out of Python entirely
    fail_attempts_col: object = None
    metrics: bool = True
    # small-file control for the parquet-snapshot backend: coalesce each
    # delta table to this many files before write. At cluster scale this
    # is replaced by Iceberg bucket partitioning + target-file-size
    # compaction; locally it avoids 64 tiny files per table per wave.
    write_partitions: int | None = 8
    # checkpoint interval: commit a resumable snapshot every K waves.
    # Intermediate waves keep the frontier as an eager localCheckpoint
    # (lineage truncated, no table commit) and accumulate deltas in
    # memory — identical semantics (a resume recomputes the uncommitted
    # waves deterministically), K× fewer commit round-trips.
    checkpoint_every: int = 1
    # partitioned-bloom seen-filter (SURVEY.md §4.2-2): prefilter
    # candidate URLs through per-bucket blooms so the exact anti-join
    # touches only bloom-positives. Semantics identical (no false
    # negatives — tests/test_seenfilter.py); the win appears when the
    # frontier no longer fits a comfortable anti-join, i.e. at 10^8+.
    use_bloom: bool = False
    bloom_expected_per_bucket: int = 100_000
    bloom_fpp: float = 0.01
    # which approximate seen-filter backs the pre-pass when use_bloom
    # is on: "bloom" (operators/seenfilter.py, smallest bytes/key) or
    # "cuckoo" (operators/cuckoofilter.py, 16-bit fingerprints,
    # DELETION-capable — expire_urls() can retract keys in place; the
    # bloom backend must rebuild from the surviving frontier instead).
    # Both share the cogroup check shape and the no-false-negative
    # contract, so the fetch log is identical across all three modes.
    seen_backend: str = "bloom"
    # cross-request cookie carry (S10 fidelity; reference
    # collyfunc.go:48,99-101,161-163): the reference keeps ONE global
    # []*http.Cookie that every response overwrites with its host's jar
    # and every subsequent request attaches — cross-host and racy under
    # its own async collector. The engine models the sane determinized
    # form: a per-HOST cookie-state table, wave-atomic (all of wave w
    # attaches the state left by wave w-1; the lexicographically-last
    # successful response per host in a wave writes that host's next
    # value). The pure-Python model implements the identical rule, and
    # fetch-log equivalence with cookies on is the test. Off by default:
    # fetch_log then keeps its original schema byte-for-byte.
    cookies: bool = False
    # live-fetch seam (S3/S4): when set, the fetch stage runs
    # operators/transport.fetch_with_transport instead of the
    # pages-table join — everything downstream (status routing, retry
    # ledger, extraction, cookie carry) is identical between the two
    # paths. Factory must be picklable; one client per partition.
    transport_factory: object = None
    # overlap the snapshot commit with the next wave's planning: the
    # commit's parquet-encoding jobs run from a background driver
    # thread (Spark's scheduler is thread-safe) while the main thread
    # selects and fetches the next wave. Commits stay strictly ordered
    # (a new commit joins the previous future first) and the manifest
    # is still written last, so atomicity/resume semantics are
    # unchanged — a kill mid-overlap leaves the previous committed
    # snapshot, exactly like a kill mid-commit did before. This was
    # the last serial disk-bound leg in the N→4N scaling profile.
    async_commit: bool = True


def _fail_udf(fn):
    @F.pandas_udf(T.IntegerType())
    def fail_attempts(urls: pd.Series) -> pd.Series:
        if fn is None:
            return pd.Series(0, index=urls.index)
        return urls.map(fn)

    return fail_attempts


def _host_col(url_col):
    return F.lower(F.parse_url(url_col, F.lit("HOST")))


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages_df: DataFrame | None,
        robots_df: DataFrame,
        store: SnapshotStore,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        # pages are immutable for the whole run: hash-partition them by the
        # join key ONCE and persist — every wave's fetch join then reuses
        # this partitioning and only shuffles the (politeness-capped) wave
        # side. This is the local analogue of the Iceberg bucket(url) /
        # storage-partitioned-join design (SURVEY.md §4.2-3): the pages
        # table is never re-shuffled per superstep.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # pages_df may be None when cfg.transport_factory supplies the
        # fetch stage (live-crawl mode: there is no pages table)
        self.pages = (
            pages_df.select("url", "html").repartition(n_part, "url").persist()
            if pages_df is not None
            else None
        )
        self.robots = robots_df.persist()
        self.store = store
        self.budgets = host_budget(robots_df, self.cfg.window_ms, self.cfg.default_k)
        self._fail_attempts = _fail_udf(self.cfg.fail_attempts_fn)
        # transient inter-wave state for checkpoint_every > 1
        self._frontier_cache: DataFrame | None = None
        # superseded frontier checkpoints of the current checkpoint
        # window: the window's lazily-persisted wave subtrees root their
        # lineage at these frames, so they must stay alive (spillable
        # MEMORY_AND_DISK blocks) until the post-commit free step — freeing them
        # eagerly would truncate the recompute path of any evicted
        # persist block
        self._frontier_history: list[DataFrame] = []
        self._pending_deltas: dict[str, list[DataFrame]] = {}
        self._pending_metrics: list[tuple] = []
        # persisted wave subtrees awaiting the next snapshot commit
        self._pending_mats: list[DataFrame] = []
        self._last_commit_wait: float = 0.0
        # bloom seen-filter state (use_bloom): the per-bucket bloom
        # TABLE (bucket, bloom, m_bits, k_hashes) — held as an eagerly
        # checkpointed DataFrame between waves, merged distributively
        # (merge_bloom_delta) and committed with each snapshot. Bloom
        # bytes never touch the driver: the membership check cogroups
        # candidates with this table on bucket.
        self._bloom_df: DataFrame | None = None
        # per-host cookie state (cfg.cookies): (host, cookie) table,
        # O(hosts), eagerly checkpointed per wave like the bloom table
        # and committed with each snapshot so a resume carries the jar.
        self._cookie_df: DataFrame | None = None
        # G3 incremental-crawl state (main.go:563-654): per-task
        # last_review_hashes and probe-window scheduler state. Both are
        # O(task list) — the same driver-side scale as the reference's
        # CLI payload — and are committed with every snapshot so a
        # resumed run continues the probe schedule deterministically.
        # None = not yet loaded (seed() or a resume populates it).
        self._inc_hashes: dict[int, tuple[str, ...]] | None = None
        self._inc_state: dict[int, dict] = {}
        # in-flight async commit (cfg.async_commit): at most ONE —
        # submitting the next commit joins this future first, and
        # run() joins it before returning, so the store is always
        # consistent when control leaves the engine
        self._commit_future = None
        self._commit_pool = None
        # wave-invariant Column cache (round 7): every Column/lit call
        # is a py4j round-trip, and the wave loop used to rebuild
        # ~4,000 identical expression objects per superstep — profiled
        # as the bulk of the per-wave "plan" phase (driver-only Python,
        # 0.5-0.8 s/wave; Catalyst itself is ~0.02 s). Columns are
        # immutable unresolved expressions, so the static ones are
        # built once and reused across waves; only genuinely per-wave
        # values (the wave_id literal) are constructed per superstep.
        self._col_cache: dict = {}

    def _cc(self, key: str, build):
        """Build-once cache for wave-invariant Column expressions."""
        col = self._col_cache.get(key)
        if col is None:
            col = build()
            self._col_cache[key] = col
        return col

    def _join_commit(self) -> None:
        """Wait for the in-flight async commit (if any); re-raises its
        exception so a failed commit fails the run loudly."""
        fut, self._commit_future = self._commit_future, None
        if fut is not None:
            fut.result()

    def flush_commits(self) -> None:
        """Public barrier for callers that drive ``run_superstep``
        directly (run() joins automatically): returns once every
        submitted snapshot commit is durable on disk. A kill BEFORE
        this point may lose the in-flight commit — the resume contract
        then replays from the previous manifest, exactly like a kill
        mid-commit always did."""
        self._join_commit()

    # ------------------------------------------------------------------ seeds

    def seed(self, seeds_df: DataFrame) -> None:
        """Snapshot 0 = the seeded frontier (profile URLs, depth 0).
        seq = task_seq * stride reproduces the reference's
        one-task-at-a-time issue order within each host.

        Tasks with last_review_hashes enter incremental (G3) mode:
        their hashes are collected driver-side (the task list is the
        CLI payload — O(config), not O(data)) and FirstPageOnly is
        ignored for them, mirroring the reference's else-if priority
        (main.go:563-571)."""
        # seeds are read twice (incremental-hash collect + frontier
        # build); without the persist the whole upstream pipeline — for
        # search-resolved seeds that is the search fetch join plus the
        # candidate extraction — evaluates twice
        seeds_df = seeds_df.persist()
        self._inc_hashes = {}
        # the cached probe-window Column derives from the task keys —
        # drop it so a (re-)seed can never serve a stale schedule
        self._col_cache.pop("nf_probe_window", None)
        # filter server-side: only incremental tasks reach the driver
        # (a 10^5-task batch with no hashes collects ZERO rows, not all)
        inc_rows = (
            seeds_df.select("seq", "last_review_hashes")
            .filter(
                F.size(F.coalesce(F.col("last_review_hashes"), F.array())) > 0
            )
            .collect()
        )
        for r in inc_rows:
            self._inc_hashes[int(r["seq"])] = tuple(r["last_review_hashes"])
        self._inc_state = {
            tk: {"unlocked": 0, "done": False, "started": False,
                 "hit": False, "n_reviews": 0}
            for tk in self._inc_hashes
        }
        inc_keys = list(self._inc_hashes)
        fpo_col = F.coalesce(F.col("first_page_only"), F.lit(0))
        if inc_keys:
            fpo_col = F.when(F.col("seq").cast("long").isin(inc_keys), F.lit(0)).otherwise(fpo_col)
        frontier = (
            seeds_df.filter(F.col("profile_key").isNotNull() & (F.col("profile_key") != ""))
            .select(
                canonicalize_udf(F.col("profile_key")).alias("url"),
                (F.col("seq").cast("long") * SEED_SEQ_STRIDE).alias("seq"),
                fpo_col.alias("fpo"),
            )
            .select(
                "url",
                F.xxhash64("url").alias("url_hash"),
                _host_col(F.col("url")).alias("host"),
                F.pmod(F.xxhash64(_host_col(F.col("url"))), F.lit(self.cfg.n_buckets))
                .cast("int")
                .alias("host_bucket"),
                F.lit(0).alias("depth"),
                "seq",
                "fpo",
                F.lit(0).alias("attempt"),
                F.lit("pending").alias("state"),
                F.lit(0).cast("long").alias("wave_id"),
                F.lit(None).cast("int").alias("probe_window"),
            )
            .dropDuplicates(["url"])
        )
        # mirror the wave path: eager-checkpoint the seeded frontier,
        # keep it as the in-memory frontier for wave 1, and commit
        # snapshot 0 in the background — wave 1's planning overlaps the
        # seed commit instead of waiting on it, and never re-reads the
        # snapshot it is derived from. (run() / flush_commits() joins
        # before anything reads the store.)
        frontier = local_checkpoint_no_stats(frontier)
        self._frontier_cache = frontier
        seen = frontier.select(
            "url_hash",
            F.pmod(F.col("url_hash"), F.lit(self.cfg.n_buckets)).cast("int").alias("bucket"),
            F.lit(0).cast("long").alias("wave_id"),
        )
        self._submit_commit(0, {"frontier": frontier, "seen": seen, **self._inc_tables()})
        seeds_df.unpersist()

    # --------------------------------------------------------------- superstep

    def _seen_ops(self):
        """The seen-filter backend behind cfg.seen_backend, as four
        uniform hooks (build / merge-delta / filter / snapshot table
        name). Both backends take and return one row per bucket and
        share the cogroup membership-check shape, so every call site
        is backend-blind."""
        cfg = self.cfg
        if cfg.seen_backend == "cuckoo":
            from go_scrapper_spark.operators import cuckoofilter as ckf

            return {
                "build": lambda seen: ckf.build_cuckoos(
                    seen, cfg.bloom_expected_per_bucket
                ),
                "merge": lambda tbl, delta: ckf.merge_cuckoo_delta(
                    tbl, delta, cfg.bloom_expected_per_bucket
                ),
                "filter": ckf.filter_unseen_cuckoo_join,
                "table": "seen_cuckoo",
            }
        if cfg.seen_backend != "bloom":
            raise ValueError(
                f"unknown seen_backend {cfg.seen_backend!r}"
                " (expected 'bloom' or 'cuckoo')"
            )
        from go_scrapper_spark.operators import seenfilter as sfilter

        return {
            "build": lambda seen: sfilter.build_blooms(
                seen, cfg.bloom_expected_per_bucket, cfg.bloom_fpp
            ),
            "merge": lambda tbl, delta: sfilter.merge_bloom_delta(
                tbl,
                delta,
                shape=sfilter.bloom_params(
                    cfg.bloom_expected_per_bucket, cfg.bloom_fpp
                ),
            ),
            "filter": sfilter.filter_unseen_join,
            "table": "seen_bloom",
        }

    def _ensure_seen_filter(self, frontier: DataFrame) -> None:
        """Load the committed seen-filter table (resume) or build it
        from the current frontier (fresh start) — both fully
        distributed, backend-blind via _seen_ops."""
        import os

        cfg = self.cfg
        ops = self._seen_ops()
        latest = self.store.latest_wave()
        snap_seen = (
            os.path.join(self.store._snap_dir(latest), ops["table"])
            if latest is not None
            else None
        )
        if snap_seen and os.path.exists(snap_seen):
            seen_df = self.store.read_snapshot_table(latest, ops["table"])
        else:
            seen0 = frontier.select(
                "url_hash",
                F.pmod("url_hash", F.lit(cfg.n_buckets)).cast("int").alias("bucket"),
            )
            seen_df = ops["build"](seen0)
        self._bloom_df = local_checkpoint_no_stats(seen_df)

    def run_superstep(self, wave_id: int) -> dict:
        """One wave. Returns per-wave metric dict; 'fetched'==0 with
        'pending'==0 means the crawl is complete. stats['phase_secs']
        carries the wave's driver-side phase breakdown (plan build /
        checkpoint / metrics / commit) — the skew-tail audit's
        instrument."""
        cfg = self.cfg
        _phases: dict = {}
        _pt = [time.time()]

        def _ph(name: str) -> None:
            now = time.time()
            _phases[name] = round(now - _pt[0], 2)
            _pt[0] = now
        if self._frontier_cache is not None:
            frontier = self._frontier_cache
        else:
            frontier = self.store.read_snapshot_table(
                self.store.latest_wave(), "frontier"
            )
        if cfg.use_bloom and self._bloom_df is None:
            self._ensure_seen_filter(frontier)

        if cfg.cookies and self._cookie_df is None:
            # resume path: reuse the committed jar; fresh start: empty
            latest = self.store.latest_wave()
            snap_ck = (
                os.path.join(self.store._snap_dir(latest), "cookies")
                if latest is not None
                else None
            )
            if snap_ck and os.path.exists(snap_ck):
                ck = self.store.read_snapshot_table(latest, "cookies")
            else:
                ck = self.spark.createDataFrame([], "host string, cookie string")
            self._cookie_df = local_checkpoint_no_stats(ck)

        pending = frontier.filter(
            (F.col("state") == "pending") & (F.col("attempt") < cfg.max_attempts)
        )
        if self._inc_hashes is None:
            self._load_inc_state()
        if self._inc_state:
            # G3 probe-window admission (main.go:607-654): a pagination
            # row of an incremental task is schedulable only while its
            # window is unlocked and the task hasn't matched a seen
            # hash. The state table is O(tasks) → broadcast join.
            sdf = self.spark.createDataFrame(
                [(tk, st["unlocked"], st["done"])
                 for tk, st in self._inc_state.items()],
                "task_key long, unlocked int, done boolean",
            )
            pending = (
                pending.withColumn(
                    "_tk", F.floor(F.col("seq") / SEED_SEQ_STRIDE).cast("long")
                )
                .join(F.broadcast(sdf), F.col("_tk") == sdf.task_key, "left")
                .filter(
                    F.col("probe_window").isNull()
                    | (
                        ~F.coalesce(F.col("done"), F.lit(False))
                        & (F.col("probe_window") <= F.coalesce("unlocked", F.lit(0)))
                    )
                )
                .drop("task_key", "unlocked", "done", "_tk")
            )

        wave = select_wave(pending, self.budgets, cfg.default_k)

        # Fetch with IN-WAVE retries, mirroring the reference's immediate
        # r.Request.Retry() loop (main.go:333-354, 1079-1099): a URL's
        # transient failures and its eventual success/exhaustion all
        # happen inside the politeness slot that dequeued it. fa = the
        # number of leading attempts that fail transiently.
        max_a = self._cc("max_a", lambda: F.lit(cfg.max_attempts))
        fa_expr = self._cc(
            "fa_expr",
            lambda: (
                cfg.fail_attempts_col()
                if cfg.fail_attempts_col is not None
                else self._fail_attempts(F.col("url"))
            ),
        )
        if cfg.transport_factory is not None:
            from go_scrapper_spark.operators.transport import fetch_with_transport

            fetch_base = fetch_with_transport(
                wave, cfg.transport_factory, cfg.max_attempts
            )
        else:
            # shuffle_hash: pages is pre-partitioned on url (zero
            # exchange on that side, the storage-partitioned-join
            # analogue) and the wave side shuffles its politeness-capped
            # rows. Without the hint AQE broadcasts the wave side —
            # a serial driver build of up to ~10^5 rows per wave.
            fetch_base = wave.join(
                self.pages.hint("shuffle_hash"), "url", "left"
            ).withColumn("_fa", fa_expr)
        fetched = (
            fetch_base
            .withColumn("_succ", self._cc("f_succ", lambda: (
                F.col("html").isNotNull()
                & (F.col("_fa") < max_a - F.col("attempt"))
            )))
            .withColumn("_n_attempts", self._cc("f_natt", lambda: (
                F.when(F.col("_succ"), F.col("_fa") + 1 - F.col("attempt"))
                .otherwise(max_a - F.col("attempt"))
            )))
            .withColumn("status", self._cc("f_status", lambda: (
                F.when(F.col("_succ"), F.lit(200)).otherwise(
                    F.when(F.col("html").isNotNull(), F.lit(503))
                    .otherwise(F.lit(404))
                )
            )))
            .persist()
        )

        from go_scrapper_spark.functions.ua import ua_col

        # one materialization per subtree per wave: [1] wave select +
        # fetch join, [2] extraction, [3] candidate pipeline. Everything
        # downstream — deltas, stats, the frontier merge — is a lazy
        # projection over these three. All three are LAZY persists: the
        # single metrics action below materializes them together in one
        # driver round-trip (three eager localCheckpoints here would be
        # three sequential job launches per wave — the per-wave fixed
        # cost that dominates crawl wall time at sandbox payload).
        # Persisted frames from transient waves stay cached until the
        # next snapshot commit writes them (unpersisted after
        # the snapshot commit). Recompute-on-eviction is deterministic
        # BECAUSE every frontier checkpoint of the window is kept alive
        # until the post-commit free step (_frontier_history) — these subtrees
        # root their lineage there. The window is still only as
        # fault-tolerant as localCheckpoint itself: fine in local mode,
        # while on a cluster an executor loss inside a window loses
        # checkpoint blocks and the run restarts from the last snapshot
        # (which is exactly what the snapshot store is for).
        mat = lambda df: df.persist()  # noqa: E731

        # one log row per ATTEMPT (the reference logs each retry):
        # attempt index i gets 503 while transient, then 200/404
        att_i = F.col("_att")
        log_src = fetched
        ck_cols: list = []
        if cfg.cookies:
            # every request of this wave attaches the PRE-wave per-host
            # jar (the state update below happens after this plan is
            # built, and plans capture their input frames)
            log_src = fetched.join(
                F.broadcast(self._cookie_df), "host", "left"
            )
            ck_cols = ["cookie"]
        fetch_log = mat(
            log_src.select(
                F.lit(wave_id).cast("long").alias("wave_id"),
                "host", "url", "depth", "seq", "html", "_fa", *ck_cols,
                self._cc("fl_att", lambda: F.explode(
                    F.sequence(
                        F.col("attempt"),
                        F.col("attempt") + F.col("_n_attempts") - 1,
                    )
                ).alias("_att")),
            )
            .select(
                "wave_id", "host", "url", "depth", "seq",
                self._cc("fl_attempt", lambda: att_i.alias("attempt")),
                self._cc("fl_status", lambda: (
                    F.when(att_i < F.col("_fa"), F.lit(503))
                    .when(F.col("html").isNotNull(), F.lit(200))
                    .otherwise(F.lit(404))
                    .alias("status")
                )),
                self._cc("fl_ua",
                         lambda: ua_col(F.col("url"), att_i).alias("ua")),
                self._cc("fl_bytes", lambda: (
                    F.when(
                        (att_i >= F.col("_fa")) & F.col("html").isNotNull(),
                        F.length("html"),
                    ).otherwise(F.lit(0)).cast("long").alias("n_bytes")
                )),
                *ck_cols,
            )
        )
        ok = fetched.filter(F.col("_succ"))
        union = mat(extract_pages(ok))
        self._pending_mats += [fetch_log, union]

        reviews = self._finish_reviews(union.filter(F.col("kind") == "review"), wave_id)
        pagetexts = union.filter(F.col("kind") == "pagetext").select(
            F.lit(wave_id).cast("long").alias("wave_id"), "url", "text"
        )
        pagemeta = union.filter(F.col("kind") == "pagemeta").select(
            F.lit(wave_id).cast("long").alias("wave_id"), "url",
            "business_id", "review_count", "non_rec_count", "agg_score",
        )

        new_rows = mat(self._new_frontier_rows(union, frontier, wave_id))
        self._pending_mats.append(new_rows)

        if cfg.use_bloom and self._bloom_df is not None:
            # fold this wave's delta into the seen-filter table — fully
            # distributed (groupBy bucket + a per-bucket numpy kernel
            # inside the backend's merge); no url_hash ever reaches the
            # driver. The eager localCheckpoint truncates lineage so
            # the table doesn't accrete a per-wave plan chain.
            delta = new_rows.select(
                "url_hash",
                F.pmod("url_hash", F.lit(cfg.n_buckets)).cast("int").alias("bucket"),
            )
            merged = local_checkpoint_no_stats(
                self._seen_ops()["merge"](self._bloom_df, delta)
            )
            # graveyard, not immediate unpersist: an in-flight async
            # commit may still be writing the superseded filter table
            self._frontier_history.append(self._bloom_df)
            self._bloom_df = merged

        if cfg.cookies:
            # per-host jar update: the lexicographically-LAST successful
            # response of the wave per host (max (depth, seq, url) — the
            # wave's within-host issue order) writes the host's next
            # cookie, a deterministic digest of that final URL (the
            # model computes the identical rule). O(hosts) state, eager
            # checkpoint like the bloom table; the superseded frame goes
            # to the checkpoint graveyard because this wave's pending
            # fetch_log plan still reads it.
            from pyspark.sql import Window

            w_last = Window.partitionBy("host").orderBy(
                F.col("depth").desc(), F.col("seq").desc(), F.col("url").desc()
            )
            last = (
                ok.select("host", "depth", "seq", "url")
                .withColumn("_rn", F.row_number().over(w_last))
                .filter(F.col("_rn") == 1)
                .select(
                    "host",
                    F.substring(
                        F.md5(F.concat(F.lit("ck-"), F.col("url")).cast("binary")),
                        1, 8,
                    ).alias("cookie"),
                )
            )
            merged_ck = local_checkpoint_no_stats(
                self._cookie_df.alias("o")
                .join(last.alias("n"), "host", "full")
                .select(
                    "host",
                    F.coalesce(F.col("n.cookie"), F.col("o.cookie")).alias("cookie"),
                )
            )
            self._frontier_history.append(self._cookie_df)
            self._cookie_df = merged_ck

        # frontier merge (MERGE INTO on Iceberg; full-rewrite on parquet
        # store). With in-wave retries a dequeued URL always terminates:
        # fetched on success, failed after the 5-attempt budget.
        upd = fetched.select(
            "url",
            self._cc("fm_state", lambda: (
                F.when(F.col("_succ"), F.lit("fetched"))
                .otherwise(F.lit("failed"))
                .alias("_new_state")
            )),
            self._cc("fm_attempt", lambda: (
                F.col("attempt") + F.col("_n_attempts")
            ).alias("_new_attempt")),
        )
        frontier_next = (
            frontier.join(upd, "url", "left")
            .select(
                "url", "url_hash", "host", "host_bucket", "depth", "seq", "fpo",
                self._cc("fm_att2", lambda: F.coalesce(
                    "_new_attempt", "attempt").alias("attempt")),
                self._cc("fm_state2", lambda: F.coalesce(
                    "_new_state", "state").alias("state")),
                F.when(F.col("_new_state").isNotNull(), F.lit(wave_id).cast("long"))
                .otherwise(F.col("wave_id"))
                .alias("wave_id"),
                "probe_window",
            )
            .unionByName(new_rows)
        )

        seen_delta = new_rows.select(
            "url_hash",
            F.pmod(F.col("url_hash"), F.lit(cfg.n_buckets)).cast("int").alias("bucket"),
            F.lit(wave_id).cast("long").alias("wave_id"),
        )

        # Materialize the wave's persisted chain LINEARLY before any
        # multi-branch job touches it: new_rows → union → fetched is one
        # lineage, so a single action fills all three caches at full
        # parallelism with zero contention. Without this, the metrics
        # crossJoin's branches race on the shared uncached persists and
        # tasks stall on each other's cache-block locks — measured at
        # 16c/n_biz=24k as ~4x total executor-time inflation versus the
        # 4-core run of the SAME job (the round-3 "fold everything into
        # one action" layout was right for the 6k-payload driver floor
        # and wrong for wave-dominated payloads). The frontier
        # localCheckpoint below doubles as the materializer on every
        # wave (its heavy branch IS that lineage), so a wave costs
        # exactly two driver actions; commit waves then hand the warm
        # caches to the (async) table writers.
        maybe_ckpt = (
            cfg.checkpoint_every <= 1
            or wave_id % cfg.checkpoint_every == 0
            or wave_id >= cfg.max_supersteps
        )
        # BOTH wave kinds now checkpoint the frontier eagerly and keep
        # it as the in-memory frontier for the next wave (the heavy
        # branch of frontier_next IS the wave's persisted lineage, so
        # this doubles as the linear cache materializer). Keeping the
        # frontier in memory across commits removes the next wave's
        # read-back of the just-written snapshot — the dependency that
        # would otherwise force the async commit to be joined
        # immediately. The superseded checkpoint is NOT freed here:
        # this window's pending persists recompute through it on
        # eviction, so it lives until the commit's free step.
        _ph("plan")
        if os.environ.get("CRAWL_PHASE_DEBUG") == "1":
            # split the ckpt phase: Catalyst analysis+optimization+
            # physical planning (driver-only) vs the checkpoint job
            frontier_next._jdf.queryExecution().executedPlan()
            _ph("qplan")
        new_frontier = local_checkpoint_no_stats(frontier_next)
        if self._frontier_cache is not None:
            self._frontier_history.append(self._frontier_cache)
        self._frontier_cache = new_frontier
        _ph("ckpt")
        if os.environ.get("CRAWL_PHASE_DEBUG") == "1":
            _phases["parts"] = new_frontier.rdd.getNumPartitions()
            _phases["rows"] = new_frontier.count()
            _ph("dbg")

        if cfg.metrics:
            # micro-job over the now-warm caches: crossJoin of the
            # 1-row aggregates collapses the remaining collect
            # round-trips into a single action
            row = (
                fetch_log.agg(
                    F.count("*").alias("attempted"),
                    F.count(F.when(F.col("status") == 200, 1)).alias("fetched"),
                    F.sum("n_bytes").alias("bytes"),
                )
                .crossJoin(
                    union.agg(
                        F.count(F.when(F.col("kind") == "review", 1)).alias("reviews"),
                        F.count(F.when(F.col("kind") == "outlink", 1)).alias("outlinks"),
                    )
                )
                .crossJoin(new_rows.agg(F.count("*").alias("discovered")))
                .collect()[0]
            )
            stats = {
                "wave_id": wave_id,
                "attempted": row["attempted"],
                "fetched": row["fetched"],
                "bytes": row["bytes"] or 0,
                "reviews": row["reviews"],
                "outlinks": row["outlinks"],
                "discovered": row["discovered"],
            }
        else:
            # no-metrics path: fetch_log is the one subtree the linear
            # materialization above does not cover (it branches off
            # fetched, now cached); new_rows is a cached scan
            stats = {
                "wave_id": wave_id,
                "attempted": fetch_log.count(),
                "fetched": 0, "bytes": 0, "reviews": 0, "outlinks": 0,
                # discovered emitted on both paths so the committed
                # metrics table carries the same rows regardless of
                # cfg.metrics
                "discovered": new_rows.count(),
            }
        _ph("metrics")
        self._pending_metrics.extend(
            (wave_id, k, int(v)) for k, v in stats.items() if k != "wave_id"
        )

        # deltas are lazy projections over the wave's checkpointed frames —
        # writing them at commit time costs no recompute of heavy stages
        deltas = {
            "fetch_log": fetch_log,
            "extracted": reviews,
            "pagetext": pagetexts,
            "pagemeta": pagemeta,
            "seen": seen_delta,
        }
        for name, df in deltas.items():
            self._pending_deltas.setdefault(name, []).append(df)

        if self._inc_state:
            # G3 window-boundary bookkeeping, BEFORE the commit so the
            # snapshot carries the post-wave scheduler state
            self._update_inc_state(
                union,
                new_frontier if new_frontier is not None else frontier_next,
            )

        is_checkpoint = maybe_ckpt or stats["attempted"] == 0
        if is_checkpoint:
            tables = {"frontier": new_frontier}
            for name, dfs in self._pending_deltas.items():
                acc = dfs[0]
                for nxt in dfs[1:]:
                    acc = acc.unionByName(nxt)
                tables[name] = acc
            tables["metrics"] = self.spark.createDataFrame(
                self._pending_metrics, "wave_id long, metric string, value long"
            )
            tables.update(self._inc_tables())
            if cfg.use_bloom and self._bloom_df is not None:
                # filter table rides the snapshot → resume skips rebuild
                tables[self._seen_ops()["table"]] = self._bloom_df
            if cfg.cookies and self._cookie_df is not None:
                # cookie jar rides the snapshot → resume carries state
                tables["cookies"] = self._cookie_df
            self._submit_commit(wave_id, tables)
            _phases["commit_wait"] = self._last_commit_wait
        _ph("commit")
        fetched.unpersist()
        stats["pending"] = None  # filled by run()
        stats["phase_secs"] = _phases
        return stats

    def _submit_commit(self, wave_id: int, tables: dict) -> None:
        """Commit + cache-release, overlapped with the next wave when
        cfg.async_commit. The pending state is snapshotted-and-swapped
        on the MAIN thread first, so the next wave accumulates into
        fresh lists while the background thread writes and frees only
        this window's frames. The current frontier checkpoint is NOT
        freed — the next wave plans from it (and every table the
        commit writes roots in frames owned by this closure)."""
        from go_scrapper_spark.operators.dedupe import free_local_checkpoint

        mats_to_free = self._pending_mats
        hist_to_free = self._frontier_history
        self._pending_mats = []
        self._frontier_history = []
        self._pending_deltas = {}
        self._pending_metrics = []

        def _commit_and_free():
            self._commit(wave_id, tables)
            # the window's frames are on disk now — release caches
            for df in hist_to_free:
                free_local_checkpoint(df)
            for df in mats_to_free:
                df.unpersist()

        # strict commit ordering: wait for the previous in-flight
        # commit before starting this one (also re-raises its errors)
        _t_wait = time.time()
        self._join_commit()
        self._last_commit_wait = round(time.time() - _t_wait, 2)
        if not self.cfg.async_commit:
            _commit_and_free()
            return
        if self._commit_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._commit_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="snapshot-commit"
            )
        self._commit_future = self._commit_pool.submit(_commit_and_free)

    # ------------------------------------------------------------------- run

    def run(self, seeds_df: DataFrame | None = None) -> dict:
        """Drive supersteps until the frontier drains. Resumes from the
        last committed snapshot if one exists (seeds_df ignored then)."""
        t0 = time.time()
        latest = self.store.latest_wave()
        if latest is None:
            assert seeds_df is not None, "fresh run needs seeds"
            self.seed(seeds_df)
            latest = 0
        total = {"supersteps": 0, "fetched": 0, "reviews": 0, "attempted": 0,
                 "bytes": 0, "wave_secs": [], "wave_phases": []}
        for wave_id in range(latest + 1, self.cfg.max_supersteps + 1):
            t_w = time.time()
            stats = self.run_superstep(wave_id)
            total["supersteps"] += 1
            total["wave_secs"].append(round(time.time() - t_w, 2))
            total["wave_phases"].append(stats.get("phase_secs", {}))
            for k in ("fetched", "reviews", "attempted", "bytes"):
                total[k] += stats[k]
            if stats["attempted"] == 0:
                break
        # the final wave's commit may still be encoding in the
        # background — the run is only DONE when it is on disk, and
        # callers read the store the moment run() returns
        self._join_commit()
        total["wall_sec"] = time.time() - t0
        return total

    # ----------------------------------------------------- recrawl / expiry
    #
    # The two maintenance primitives of an incremental crawler, both
    # committed as their own snapshot so a later run()/resume continues
    # from the edited state:
    #
    #   refresh_urls — re-fetch KNOWN pages in place (state→pending,
    #     attempt→0). Seen-membership is untouched: the page is
    #     re-fetched but its outlinks still dedup against the filter.
    #     Works with every seen backend (the filter never learns).
    #
    #   expire_urls — FORGET pages: rows leave the frontier and their
    #     keys leave the seen filter, so the next time any fetched page
    #     links to them they are re-admitted as fresh discoveries.
    #     This is the op that needs a deletion-capable filter: the
    #     cuckoo backend retracts the keys in place
    #     (cuckoofilter.delete_hashes); the bloom backend cannot unset
    #     bits and rebuilds from the surviving frontier instead (same
    #     result, full-scan cost — the documented reason seen_backend=
    #     "cuckoo" exists).

    def _current_frontier(self) -> DataFrame:
        if self._frontier_cache is not None:
            return self._frontier_cache
        latest = self.store.latest_wave()
        if latest is None:
            raise ValueError("no committed snapshot to maintain")
        return self.store.read_snapshot_table(latest, "frontier")

    def _maintenance_commit(self, frontier: DataFrame) -> int:
        """Commit an edited frontier (+ carried filter/cookie/inc
        state) as snapshot latest+1 and make it the live frontier."""
        # join any in-flight async superstep commit FIRST: latest_wave()
        # read before that commit lands would hand out the same wave id
        # and clobber the superstep's snapshot (a caller driving
        # run_superstep directly never passes through flush_commits)
        self._join_commit()
        if self._inc_hashes is None:
            self._load_inc_state()
        if self.cfg.use_bloom and self._bloom_df is None:
            # carry the committed filter into the maintenance snapshot
            # (membership is unchanged on this path — refresh edits
            # only state/attempt; expire sets _bloom_df itself first)
            self._ensure_seen_filter(frontier)
        wave = (self.store.latest_wave() or 0) + 1
        frontier = local_checkpoint_no_stats(frontier)
        if self._frontier_cache is not None:
            self._frontier_history.append(self._frontier_cache)
        self._frontier_cache = frontier
        tables = {"frontier": frontier, **self._inc_tables()}
        if self.cfg.use_bloom and self._bloom_df is not None:
            tables[self._seen_ops()["table"]] = self._bloom_df
        if self.cfg.cookies and self._cookie_df is not None:
            tables["cookies"] = self._cookie_df
        self._submit_commit(wave, tables)
        self._join_commit()
        return wave

    def _target_hashes(self, urls_df: DataFrame) -> DataFrame:
        """(url_hash) keys for a caller's url column, canonicalized the
        same way the frontier keys were."""
        return (
            urls_df.select(canonicalize_udf(F.col("url")).alias("url"))
            .dropDuplicates(["url"])
            .select(F.xxhash64("url").alias("url_hash"))
        )

    def refresh_urls(self, urls_df: DataFrame) -> int:
        """Schedule known URLs for re-fetch; returns how many frontier
        rows were flipped back to pending."""
        frontier = self._current_frontier()
        targets = self._target_hashes(urls_df)
        n = frontier.join(targets, "url_hash", "left_semi").count()
        hit = F.col("_refresh").isNotNull()
        new_frontier = (
            frontier.join(
                targets.withColumn("_refresh", F.lit(True)),
                "url_hash",
                "left",
            )
            .withColumn(
                "state",
                F.when(hit, F.lit("pending")).otherwise(F.col("state")),
            )
            .withColumn(
                "attempt",
                F.when(hit, F.lit(0)).otherwise(F.col("attempt")),
            )
            .drop("_refresh")
        )
        self._maintenance_commit(new_frontier)
        return n

    def expire_urls(self, urls_df: DataFrame) -> int:
        """Forget URLs entirely (frontier + seen filter); returns how
        many frontier rows were removed. Future discoveries of these
        URLs re-enter the crawl as if never seen."""
        cfg = self.cfg
        frontier = self._current_frontier()
        targets = self._target_hashes(urls_df)
        # only keys actually present leave the filter — the cuckoo
        # delete contract forbids removing a never-inserted key (it
        # could evict an unrelated colliding fingerprint); checkpoint
        # pins the removal set before the frontier it derives from is
        # swapped out underneath it
        removals = (
            frontier.join(targets, "url_hash", "left_semi")
            .select(
                "url_hash",
                F.pmod("url_hash", F.lit(cfg.n_buckets))
                .cast("int")
                .alias("bucket"),
            )
            .localCheckpoint(eager=True)
        )
        n = removals.count()
        new_frontier = frontier.join(
            removals.select("url_hash").hint("shuffle_hash"),
            "url_hash",
            "left_anti",
        )
        if cfg.use_bloom:
            if self._bloom_df is None:
                self._ensure_seen_filter(frontier)
            if cfg.seen_backend == "cuckoo":
                from go_scrapper_spark.operators import cuckoofilter as ckf

                updated = ckf.delete_hashes(self._bloom_df, removals)
            else:
                updated = self._seen_ops()["build"](
                    new_frontier.select(
                        "url_hash",
                        F.pmod("url_hash", F.lit(cfg.n_buckets))
                        .cast("int")
                        .alias("bucket"),
                    )
                )
            self._frontier_history.append(self._bloom_df)
            self._bloom_df = local_checkpoint_no_stats(updated)
        self._maintenance_commit(new_frontier)
        return n

    # --------------------------------------------------------------- helpers

    def _new_frontier_rows(
        self, union: DataFrame, frontier: DataFrame, wave_id: int
    ) -> DataFrame:
        cfg = self.cfg
        cand = (
            union.filter(self._cc(
                "nf_outlink", lambda: F.col("kind") == "outlink"))
            .select(
                self._cc("nf_url", lambda: F.col("out_url").alias("url")),
                self._cc("nf_depth",
                         lambda: F.col("out_depth").alias("depth")),
                self._cc("nf_seq", lambda: F.col("out_seq").alias("seq")),
                self._cc("nf_fpo", lambda: F.coalesce(
                    F.col("out_fpo"), F.lit(0)).alias("fpo")),
            )
            .withColumn("host", self._cc(
                "nf_host", lambda: _host_col(F.col("url"))))
        )
        cand = apply_robots(cand, self.robots)
        # in-wave dedup: first discovery wins (min (depth, seq, fpo) per
        # url). The lexicographic key is PACKED into one BIGINT —
        # min(struct) forces a SortAggregate (sort per shuffle partition
        # + interpreted struct comparisons; profiled at ~90 s executor
        # time per 750k-outlink wave), while min(bigint) is a codegen'd
        # HashAggregate with map-side partial aggregation. Bounds that
        # make the packing exact: depth < 2^17, seq < 2^44 (task_seq
        # below ~1.76M at the 10^7 stride), fpo ∈ {0,1} — pack =
        # (depth·2^45 + seq)·2 + fpo < 2^63 preserves the exact order.
        # guard the packing bounds (round-5 ADVICE): a deeper crawl or
        # a larger seq stride must FAIL LOUDLY, never silently corrupt
        # the min-ordering (wrong canonical discovery). One codegen'd
        # branch per row; raise_error aborts the wave with the
        # offending values in the message.
        def _build_min_pack():
            in_bounds = (
                (F.col("depth") >= 0) & (F.col("depth") < F.lit(1 << 17))
                & (F.col("seq") >= 0) & (F.col("seq") < F.lit(1 << 44))
                & F.col("fpo").isin(0, 1)
            )
            pack = F.when(
                in_bounds,
                (F.col("depth").cast("long") * F.lit(1 << 45)
                 + F.col("seq")) * 2
                + F.col("fpo"),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("frontier pack overflow: depth="),
                        F.col("depth").cast("string"),
                        F.lit(" seq="), F.col("seq").cast("string"),
                        F.lit(" fpo="), F.col("fpo").cast("string"),
                        F.lit(" (bounds: depth<2^17, seq<2^44, fpo in {0,1})"),
                    )
                ).cast("long")
            )
            return F.min(pack).alias("_p")

        cand = (
            cand.groupBy("url", "host")
            .agg(self._cc("nf_min_pack", _build_min_pack))
            .select(
                "url", "host",
                self._cc("nf_unpack_depth", lambda: F.expr(
                    f"(_p div 2) div {1 << 45}").cast("int").alias("depth")),
                self._cc("nf_unpack_seq", lambda: (
                    F.expr("_p div 2") % F.lit(1 << 45)).alias("seq")),
                self._cc("nf_unpack_fpo", lambda: (
                    F.col("_p") % 2).cast("int").alias("fpo")),
            )
        )
        # cross-superstep dedup (exact J3): with use_bloom, the
        # per-bucket bloom pre-pass routes only bloom-positives into the
        # exact anti-join — same result, scales past anti-join comfort.
        # The bloom state is a TABLE cogrouped on bucket (no driver
        # dict, no closure-captured bytes).
        if cfg.use_bloom and self._bloom_df is not None:
            cand = self._seen_ops()["filter"](
                cand, frontier.select("url_hash"), self._bloom_df, cfg.n_buckets
            )
        else:
            # shuffle_hash hint, NOT broadcast: the frontier side is
            # hundreds of thousands of URLs within a wave and 10^10 at
            # the design scale — AQE happily broadcasts anything under
            # the 64 MB threshold, and that broadcast BUILD is a
            # single-threaded driver collect measured at 13-28 s per
            # wave (the dominant serial term in the 4c→16c scaling gap).
            # A shuffled hash anti-join is fully parallel on both sides
            # and is the only shape that survives the design scale.
            cand = cand.join(
                frontier.select("url").hint("shuffle_hash"), "url", "left_anti"
            )
        return cand.select(
            "url",
            self._cc("nf_url_hash",
                     lambda: F.xxhash64("url").alias("url_hash")),
            "host",
            self._cc("nf_host_bucket", lambda: F.pmod(
                F.xxhash64("host"), F.lit(cfg.n_buckets)
            ).cast("int").alias("host_bucket")),
            "depth", "seq", "fpo",
            self._cc("nf_attempt", lambda: F.lit(0).alias("attempt")),
            self._cc("nf_state", lambda: F.lit("pending").alias("state")),
            F.lit(wave_id).cast("long").alias("wave_id"),
            # probe_window depends only on the run's task keys (loaded
            # once before wave 1), so it is wave-invariant too
            self._cc("nf_probe_window", lambda:
                     self._probe_window_col().alias("probe_window")),
        )

    # ------------------------------------------------- incremental (G3)

    def _probe_window_col(self):
        """Probe-window tag for discovered URLs (main.go:563-654):
        incremental tasks' pagination pages get floor(start/50); the
        non-rec bootstrap page gets the -1 barrier sentinel (always
        admissible, holds the window boundary closed until fetched —
        the reference's wg.Wait covers it); everything else NULL.
        All JVM-side expressions — no Python in the candidate path."""
        inc_keys = list(self._inc_hashes or {})
        if not inc_keys:
            return F.lit(None).cast("int")
        is_inc = F.floor(F.col("seq") / SEED_SEQ_STRIDE).cast("long").isin(inc_keys)
        start_s = F.regexp_extract(
            F.col("url"), r"[?&](?:not_recommended_)?start=(\d+)", 1
        )
        is_pag = F.col("url").contains("/review_feed?") | F.col("url").contains(
            "not_recommended_start="
        )
        is_root = F.col("url").contains("/not_recommended_reviews/") & ~F.col(
            "url"
        ).contains("not_recommended_start=")
        return (
            F.when(
                is_inc & is_pag & (start_s != ""),
                F.floor(start_s.cast("long") / 50).cast("int"),
            )
            .when(is_inc & is_root, F.lit(-1))
            .otherwise(F.lit(None).cast("int"))
        )

    def _inc_tables(self) -> dict:
        """Snapshot tables carrying incremental scheduler state (empty
        dict when the run has no incremental tasks)."""
        if not self._inc_hashes:
            return {}
        from go_scrapper_spark.schemas import INC_HASHES_SCHEMA, INC_STATE_SCHEMA

        hash_rows = [
            (tk, h) for tk, hs in self._inc_hashes.items() for h in hs
        ]
        state_rows = [
            (tk, st["unlocked"], st["done"], st["started"], st["hit"],
             st["n_reviews"])
            for tk, st in self._inc_state.items()
        ]
        return {
            "inc_hashes": self.spark.createDataFrame(hash_rows, INC_HASHES_SCHEMA),
            "inc_state": self.spark.createDataFrame(state_rows, INC_STATE_SCHEMA),
        }

    def _load_inc_state(self) -> None:
        """Rebuild incremental state from the latest committed snapshot
        (resume path). No-op into empty state when the run is not
        incremental."""
        import os

        self._inc_hashes, self._inc_state = {}, {}
        latest = self.store.latest_wave()
        if latest is None:
            return
        snap = self.store._snap_dir(latest)
        if not os.path.exists(os.path.join(snap, "inc_hashes")):
            return
        for r in self.store.read_snapshot_table(latest, "inc_hashes").collect():
            self._inc_hashes.setdefault(int(r["task_key"]), [])
            self._inc_hashes[int(r["task_key"])].append(r["review_hash"])
        self._inc_hashes = {k: tuple(v) for k, v in self._inc_hashes.items()}
        for r in self.store.read_snapshot_table(latest, "inc_state").collect():
            self._inc_state[int(r["task_key"])] = {
                "unlocked": int(r["unlocked"]), "done": bool(r["done"]),
                "started": bool(r["started"]), "hit": bool(r["hit"]),
                "n_reviews": int(r["n_reviews"]),
            }

    def _update_inc_state(self, union: DataFrame, frontier_next: DataFrame) -> None:
        """Per-task window-boundary bookkeeping (main.go:615-641):
        accumulate this wave's review counts and seen-hash hits, then —
        once a task has no admissible pagination left pending (the
        boundary, = the reference's wg.Wait between widenings) — stop
        if a hash matched or no reviews were collected, else unlock the
        next probe window. Two O(tasks)-row collects per wave, only in
        incremental runs."""
        str100 = SEED_SEQ_STRIDE * 100
        hdf = self.spark.createDataFrame(
            [(tk, h) for tk, hs in self._inc_hashes.items() for h in hs],
            "task_key long, review_hash string",
        ).withColumn("_hit", F.lit(1))
        rev = union.filter(F.col("kind") == "review").select(
            F.floor(F.col("arrival_idx") / str100).cast("long").alias("task_key"),
            "review_hash",
        )
        for r in (
            rev.join(F.broadcast(hdf), ["task_key", "review_hash"], "left")
            .groupBy("task_key")
            .agg(
                F.count("*").alias("n"),
                F.max(F.coalesce("_hit", F.lit(0))).alias("hit"),
            )
            .collect()
        ):
            st = self._inc_state.get(int(r["task_key"]))
            if st is not None:
                st["n_reviews"] += int(r["n"])
                st["hit"] = st["hit"] or bool(r["hit"])
        mp = {
            int(r["task_key"]): int(r["mp"])
            for r in (
                frontier_next.filter(
                    (F.col("state") == "pending")
                    & (F.col("attempt") < self.cfg.max_attempts)
                    & F.col("probe_window").isNotNull()
                )
                .groupBy(
                    F.floor(F.col("seq") / SEED_SEQ_STRIDE)
                    .cast("long")
                    .alias("task_key")
                )
                .agg(F.min("probe_window").alias("mp"))
                .collect()
            )
        }
        for tk, st in self._inc_state.items():
            if st["done"]:
                continue
            m = mp.get(tk)
            if m is not None:
                st["started"] = True
            if not st["started"]:
                continue  # profile not extracted yet — no schedule to gate
            if m is not None and m <= st["unlocked"]:
                continue  # window still in flight — not at the boundary
            # boundary: all admitted pagination terminal (wg.Wait passed)
            if st["n_reviews"] == 0 or st["hit"] or m is None:
                # no reviews at all (main.go:616 len(reviews)==0), a
                # seen hash matched (main.go:950-960), or pagination
                # exhausted — stop scheduling this task's windows
                st["done"] = True
            else:
                st["unlocked"] = m  # widen to the next 50-window

    def _finish_reviews(self, reviews: DataFrame, wave_id: int) -> DataFrame:
        """b64 field encoding (P12, main.go:1064-1077) — JVM-side
        base64 over utf8 bytes; empty fields pass through (Go only
        encodes non-empty). review_hash was computed pre-b64 in the
        extractor (hash-then-encode order, main.go:985-987)."""

        def _build_static_cols():
            def b64(col):
                return F.when(
                    F.length(col) > 0, F.base64(F.col(col).cast("binary"))
                ).otherwise(F.col(col))

            return [
                "url",
                "parent_id", "review_id", "author_id",
                b64("author_name").alias("author_name"),
                b64("text").alias("text"),
                "rating", "source_date",
                F.unix_timestamp(
                    F.to_timestamp("source_date", "M/d/yyyy")
                ).alias("posted_at"),
                F.lit(RUN_TS).cast("long").alias("scraped_at"),
                "not_recommended", "photos",
                F.transform(
                    "responses",
                    lambda r: F.struct(
                        F.when(F.length(r["author_name"]) > 0,
                               F.base64(r["author_name"].cast("binary")))
                        .otherwise(r["author_name"]).alias("author_name"),
                        F.when(F.length(r["text"]) > 0,
                               F.base64(r["text"].cast("binary")))
                        .otherwise(r["text"]).alias("text"),
                        r["posted_at"].alias("posted_at"),
                    ),
                ).alias("responses"),
                "review_hash",
                "arrival_idx",
            ]

        return reviews.select(
            *self._cc("finish_reviews_cols", _build_static_cols),
            F.lit(wave_id).cast("long").alias("wave_id"),
        )

    def ordered_extracted(self) -> DataFrame | None:
        """Final result ordering (W1): date-desc, with the reference's
        arrival-order tiebreak made explicit and deterministic
        (wave, page seq, index-in-page; main.go:984-1007). The order
        contract lives in operators/incremental.order_cols — the same
        list the incremental cut uses, so they cannot desynchronize."""
        from go_scrapper_spark.operators.incremental import order_cols

        df = self.store.read_appended("extracted")
        if df is None:
            return None
        return df.orderBy(*order_cols())

    def final_extracted(self) -> DataFrame | None:
        """ordered_extracted with the incremental cut applied: for
        tasks carrying last_review_hashes, drop the first seen-hash row
        and everything after it in output order (main.go:950-960)."""
        from go_scrapper_spark.operators.incremental import (
            order_cols,
            truncate_per_task,
        )

        df = self.store.read_appended("extracted")
        if df is None:
            return None
        if self._inc_hashes is None:
            self._load_inc_state()
        if self._inc_hashes:
            df = truncate_per_task(df, self._inc_hashes, SEED_SEQ_STRIDE)
        return df.orderBy(*order_cols())

    def inc_hash_matched(self) -> bool:
        """True iff any incremental task matched a seen hash during the
        crawl (drives the NO_REVIEWS_SINCE_LAST_MATCH status,
        main.go:953-956)."""
        if self._inc_hashes is None:
            self._load_inc_state()
        return any(st["hit"] for st in self._inc_state.values())

    def _commit(self, wave_id: int, tables: dict) -> None:
        part = (
            {"frontier": ["host_bucket"]} if self.cfg.partition_frontier else None
        )
        if self.cfg.write_partitions:
            tables = {
                name: df.coalesce(self.cfg.write_partitions)
                for name, df in tables.items()
            }
        self.store.commit(wave_id, tables, partition_by=part)
