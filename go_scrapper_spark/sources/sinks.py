"""Output sinks (SURVEY.md S6/S7).

S6 — JSONL review dump byte-compatible with the reference
(utils/utils.go:25-40: Go json.Encoder, SetEscapeHTML(false), one
object per line, omitempty struct tags). Spark's own JSON writer
escapes per RFC 8259 and cannot reproduce Go's omitempty/no-HTML-escape
byte layout, so the serializer is the pure-Python gojson module applied
in an Arrow-batched mapInPandas — the documented slow-path exception
(golden byte fidelity is the whole point of this sink).

S7 — run metadata/metrics (main.go:962-982), with *correct*
request/bytes counters (the reference's are pass-by-value broken and
always report 0 — collyfunc.go:90-111 vs main.go:970-971; we report
real values and note the divergence).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_scrapper_spark.functions.gojson import go_jsonl_row

# ReviewFomate JSON tag order (main.go:110-124); omitempty on all but
# review_hash (Go emits `"review_hash":""` even when empty).
_FIELD_ORDER = [
    ("parent_id", "parent_id"),
    ("author_name", "author_name"),
    ("text", "text"),
    ("source_date", "source_date"),
    ("review_id", "review_id"),
    ("author_id", "author_id"),
    ("photos", "photos"),
    ("not_recommended", "not_recommended"),
    ("rating", "rating"),
    ("scraped_at", "scraped_at"),
    ("posted_at", "posted_at"),
    ("responses", "responses"),
]


def _record(row: dict) -> str:
    out: dict = {}
    for key, col in _FIELD_ORDER:
        v = row.get(col)
        if v is None or v == "" or v == 0 or v is False or (
            isinstance(v, (list, tuple)) and len(v) == 0
        ):
            continue  # Go omitempty zero-value semantics
        if key == "responses":
            v = [
                {
                    k2: x[k2]
                    for k2 in ("author_name", "text", "posted_at")
                    if x.get(k2)  # OwnerReply fields are omitempty too
                }
                for x in v
            ]
        if key == "photos":
            v = list(v)
        out[key] = v
    out["review_hash"] = row.get("review_hash") or ""
    return go_jsonl_row(out)


def to_jsonl_lines(extracted: DataFrame) -> DataFrame:
    """DataFrame of go-compatible JSONL lines (one string column)."""

    def ser(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lines = []
            for row in pdf.to_dict("records"):
                for k in ("photos",):
                    if row.get(k) is not None and not isinstance(row[k], list):
                        row[k] = list(row[k])
                if row.get("responses") is not None:
                    row["responses"] = [dict(x) for x in row["responses"]]
                lines.append(_record(row))
            yield pd.DataFrame({"line": lines})

    return extracted.mapInPandas(ser, schema="line string")


def write_jsonl(extracted: DataFrame, path: str) -> None:
    """Distributed JSONL dump (the reference appends to one file
    single-threaded, main.go:936-948; we write a directory of part
    files — same lines, scalable layout)."""
    to_jsonl_lines(extracted).write.mode("overwrite").text(path)


def meta_json(
    profile_key: str,
    scraping_status: str,
    item_scraped_count: int,
    request_count: int,
    response_bytes: int,
    histogram_score: float = 0.0,
    histogram_total: int = 0,
    start_time: str = "",
    finish_time: str = "",
) -> str:
    """The -meta.json payload (Meta struct, main.go:168-177).
    Unlike the reference, request_count/response_bytes carry real
    values (the Go counters are by-value broken, always 0)."""
    data = {
        "histogram": {
            "primary": {"score": histogram_score, "total_revews": histogram_total}
        },
        "profile_key": profile_key,
        "start_time": start_time,
        "finish_time": finish_time,
        "scraping_status": scraping_status,
        "item_scraped_count": item_scraped_count,
        "downloader/request_count": request_count,
        "downloader/response_bytes": response_bytes,
    }
    return json.dumps(data, ensure_ascii=False, separators=(",", ":"))
