"""Sessionization: the applyInPandasWithState streaming operator must
agree with the batch gaps-and-islands twin. Under an AvailableNow
drain the contract is exact and deterministic:

- every non-last session per user is emitted in-batch (closed by a
  later event);
- a user's LAST session is emitted iff its event-time timeout
  (session_end + gap) falls before the final watermark
  (max event time - watermark delay) — the drain runs one final
  micro-batch that fires those timeouts;
- last sessions still inside the watermark horizon remain in state.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from go_scrapper_spark.streaming.sessionize import sessionize_batch, sessionize_stream

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP_MIN = 30


@pytest.fixture(scope="module")
def stream_result(spark):
    base = tempfile.mkdtemp(prefix="sess-")
    events_dir = base + "/events"
    import os

    os.makedirs(events_dir)
    shutil.copy(EVENTS, events_dir + "/part-0.parquet")
    sessionize_stream(
        spark, events_dir, base + "/ckpt", "sess_out", gap_minutes=GAP_MIN
    )
    rows = spark.sql("SELECT * FROM sess_out").collect()
    shutil.rmtree(base, ignore_errors=True)
    return rows


def _key(r):
    return (
        r["user_id"], r["session_start_ms"], r["session_end_ms"],
        r["n_events"], r["sum_value_cents"],
    )


def test_stream_equals_batch_closed_sessions(spark, stream_result):
    gap_ms = GAP_MIN * 60 * 1000
    wm_delay_ms = 60 * 60 * 1000  # sessionize_stream's "1 hour" watermark
    events = spark.read.parquet(EVENTS)
    max_ts = events.agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    final_wm = max_ts - wm_delay_ms
    batch = sessionize_batch(events, gap_minutes=GAP_MIN)
    w = Window.partitionBy("user_id").orderBy(F.col("session_start_ms").desc())
    closed = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") > 1)  # closed by a later event
            | (F.col("session_end_ms") + gap_ms < final_wm)  # timed out
        )
        .drop("_rn")
    )
    got = sorted(_key(r) for r in stream_result)
    exp = sorted(_key(r) for r in closed.collect())
    assert got == exp
    assert len(got) > 0


def test_batch_matches_pure_python_model(spark):
    """Property check on adversarial small inputs: duplicate
    timestamps, exact-gap boundaries, single-event users."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    gap_ms = 30 * 60 * 1000

    def py_sessionize(rows):
        out = []
        by_user = {}
        for eid, ms, uid, cents in rows:
            by_user.setdefault(uid, []).append((ms, eid, cents))
        for uid, evs in by_user.items():
            evs.sort()
            cur = None
            for ms, _eid, cents in evs:
                if cur is None or ms - cur[1] > gap_ms:
                    if cur:
                        out.append((uid, *cur))
                    cur = [ms, ms, 1, cents]
                else:
                    cur[1], cur[2], cur[3] = ms, cur[2] + 1, cur[3] + cents
            if cur:
                out.append((uid, *cur))
        return sorted(tuple(r) for r in out)

    event = st.tuples(
        st.integers(0, 10**6),                      # event_id
        st.integers(0, 4 * gap_ms),                 # ts_ms (exact-gap edges likely)
        st.integers(0, 3),                          # user_id
        st.integers(-500, 500),                     # cents
    )

    @settings(max_examples=8, deadline=None)
    @given(st.lists(event, min_size=1, max_size=40, unique_by=lambda e: e[0]))
    def check(rows):
        df = spark.createDataFrame(
            [(eid, ms, uid, cents / 100.0) for eid, ms, uid, cents in rows],
            "event_id long, ts_ms long, user_id long, value double",
        ).select(
            "event_id", "user_id", "value",
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        )
        got = sorted(
            (r["user_id"], r["session_start_ms"], r["session_end_ms"],
             r["n_events"], r["sum_value_cents"])
            for r in sessionize_batch(df, gap_minutes=30).collect()
        )
        assert got == py_sessionize(rows)

    check()


def test_stream_sessions_respect_gap(spark, stream_result):
    gap_ms = GAP_MIN * 60 * 1000
    # no emitted session may span a gap larger than the threshold —
    # verify against the raw events
    ev = {
        (r["user_id"], int(r["ts_ms"]))
        for r in spark.read.parquet(EVENTS)
        .select("user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"))
        .collect()
    }
    by_user: dict[int, list[int]] = {}
    for u, t in ev:
        by_user.setdefault(u, []).append(t)
    for u in by_user:
        by_user[u].sort()
    for r in stream_result:
        times = [
            t for t in by_user[r["user_id"]]
            if r["session_start_ms"] <= t <= r["session_end_ms"]
        ]
        assert len(times) == r["n_events"]
        assert all(b - a <= gap_ms for a, b in zip(times, times[1:]))
