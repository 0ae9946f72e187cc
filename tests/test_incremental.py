"""Incremental truncation semantics (F4/W2, main.go:950-960): the
list is cut at the FIRST seen hash in output order — seen row and
everything after dropped; no seen hash → nothing dropped."""

import pytest

from go_scrapper_spark.operators.incremental import truncate_at_seen_hash


@pytest.fixture(scope="module")
def extracted(spark):
    rows = [
        # (url, review_hash, posted_at, wave_id, arrival_idx)
        ("u1", "h-new-1", 500, 1, 1),
        ("u1", "h-new-2", 400, 1, 2),
        ("u1", "h-seen-a", 300, 1, 3),  # first seen hash in order
        ("u1", "h-old-1", 200, 1, 4),
        ("u1", "h-seen-b", 100, 2, 5),
    ]
    return spark.createDataFrame(
        rows, "url string, review_hash string, posted_at long, wave_id long, arrival_idx long"
    )


def test_cut_at_first_seen(extracted):
    got = sorted(
        r["review_hash"]
        for r in truncate_at_seen_hash(extracted, ["h-seen-a", "h-seen-b"]).collect()
    )
    assert got == ["h-new-1", "h-new-2"]


def test_no_seen_hash_keeps_all(extracted):
    assert truncate_at_seen_hash(extracted, ["nope"]).count() == 5


def test_empty_hash_list_is_noop(extracted):
    assert truncate_at_seen_hash(extracted, []).count() == 5


def test_seen_only_later_in_order(extracted):
    # only the last row's hash is seen → cut keeps the first four
    got = truncate_at_seen_hash(extracted, ["h-seen-b"]).count()
    assert got == 4
