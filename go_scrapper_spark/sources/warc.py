"""WARC (ISO 28500) record parsing → the engine's pages table.

The north star frames the input as "Common-Crawl-style pages"
(BASELINE.json input_hint: ``url, warc_ts, html, text, lang``), and
Common Crawl ships as WARC files. This module closes that last step: a
user points ``warc_to_pages`` at a table of raw WARC blobs (one row
per .warc file, e.g. from ``spark.read.format('binaryFile')``) and
gets exactly the pages table the crawl/extract pipeline consumes —
``text``/``lang`` are downstream products of the extract + lang-ID
stages, not inputs.

Layout parsed (the subset every WARC reader honors):
    WARC/1.0\r\n
    <Name>: <value>\r\n ...            (case-insensitive names)
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n                           (record separator)
``Content-Length`` governs the payload extent — a payload containing
``\r\n\r\n`` (every HTML page) must NOT terminate the record early.
For ``WARC-Type: response`` records the payload is an HTTP message;
the status line, Content-Type header, and body are split out.

Scale shape: files are independent → ``mapInPandas`` with one Python
parser per Arrow batch; a 100 TB WARC corpus parses as one
embarrassingly parallel stage partitioned by file, no shuffle at all
(the standard Common-Crawl access pattern). Per-record Python cost is
one memoryview scan; bodies are never copied more than once.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = b"\r\n"


def build_warc(records: list[dict]) -> bytes:
    """Serialize records (dicts with ``headers: dict`` and
    ``payload: bytes``) to WARC bytes. Independent of the parser —
    round-trip identity is a real test, not a tautology."""
    out = bytearray()
    for r in records:
        out += b"WARC/1.0" + CRLF
        for k, v in r["headers"].items():
            out += f"{k}: {v}".encode() + CRLF
        payload = r["payload"]
        out += f"Content-Length: {len(payload)}".encode() + CRLF
        out += CRLF
        out += payload
        out += CRLF + CRLF
    return bytes(out)


def http_response(body: bytes, status: int = 200,
                  content_type: str = "text/html") -> bytes:
    """Minimal HTTP/1.1 response payload for a WARC response record."""
    reason = {200: "OK", 404: "Not Found", 503: "Service Unavailable"}.get(
        status, "Status"
    )
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


def split_warc_records(blob: bytes) -> list[dict]:
    """Pure-Python record splitter (the executor kernel; also directly
    unit-tested). Returns one dict per record with lowercase header
    keys, the raw payload, and the split HTTP fields for responses."""
    records: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while blob.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(CRLF + CRLF, pos)
        if head_end < 0:
            break  # truncated trailer
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break  # not a record boundary: stop rather than guess
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" not in ln:
                continue
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            # untrusted bytes: a malformed Content-Length means the
            # payload extent is unknowable — stop advancing (same as
            # the non-WARC/ boundary check) so one corrupt record in a
            # 100 TB corpus degrades to dropped tail records in THIS
            # file, never a failed job.
            break
        body_start = head_end + 4
        payload = blob[body_start:body_start + clen]
        pos = body_start + clen
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_length": clen,
            "payload": payload,
            "http_status": None,
            "http_content_type": None,
            # non-response records (conversion/metadata/request/...)
            # carry no HTTP envelope: the payload IS the body — this
            # is what lets wet_to_docs read WET conversion records
            "body": payload,
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            hend = payload.find(CRLF + CRLF)
            hend = hend if hend >= 0 else len(payload)
            hlines = payload[:hend].decode("utf-8", "replace").split("\r\n")
            parts = hlines[0].split(" ")
            try:
                # non-numeric status (malformed origin server): null the
                # field, keep the record — never abort the parse job
                rec["http_status"] = int(parts[1]) if len(parts) > 1 else None
            except ValueError:
                rec["http_status"] = None
            for ln in hlines[1:]:
                if ln.lower().startswith("content-type:"):
                    rec["http_content_type"] = ln.partition(":")[2].strip()
            rec["body"] = payload[hend + 4:] if hend + 4 <= len(payload) else b""
        records.append(rec)
    return records


WARC_SCHEMA = (
    "file_id long, warc_type string, target_uri string, warc_date string, "
    "record_id string, content_length long, http_status int, "
    "http_content_type string, body binary"
)


def parse_warc(files_df: DataFrame, id_col: str = "file_id",
               bin_col: str = "warc") -> DataFrame:
    """(file_id, warc binary) → one row per WARC record."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for fid, blob in zip(pdf[id_col], pdf[bin_col]):
                for r in split_warc_records(bytes(blob)):
                    rows.append({
                        "file_id": int(fid),
                        "warc_type": r["warc_type"],
                        "target_uri": r["target_uri"],
                        "warc_date": r["warc_date"],
                        "record_id": r["record_id"],
                        "content_length": r["content_length"],
                        "http_status": r["http_status"],
                        "http_content_type": r["http_content_type"],
                        "body": r["body"],
                    })
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "warc_type", "target_uri", "warc_date",
                    "record_id", "content_length", "http_status",
                    "http_content_type", "body",
                ],
            )

    return files_df.select(id_col, bin_col).mapInPandas(gen, WARC_SCHEMA)


def pages_to_warc(pages: DataFrame, n_files: int = 64,
                  url_col: str = "url", ts_col: str = "warc_ts",
                  html_col: str = "html") -> DataFrame:
    """Distributed WARC sink — the inverse of ``warc_to_pages``: a
    pages table (url, warc_ts, html) → (file_id, warc binary), one
    serialized WARC blob per output file, ready for
    ``df.write`` / object-store upload. This closes the archive-output
    leg of the Common-Crawl loop (read WARC ✓ parse_warc; write WARC
    here), so a crawl's fetched pages can be re-shipped in the same
    interchange format the corpus arrived in.

    Determinism (byte-reproducible output, required for the
    round-trip oracle and for resumable re-exports):
      - file assignment is ``xxhash64(url) % n_files`` — content-
        addressed, no global row numbering, no single-partition sort;
      - records within a file are sorted by url;
      - WARC-Record-ID is derived from md5 of the url + date (no
        wall-clock UUIDs);
      - WARC-Date is the page's own ``warc_ts`` in ISO-8601 Zulu.

    Scale shape: ONE hash shuffle on file_id (same key the blobs are
    emitted under), then an embarrassingly parallel per-group encode;
    group size is bounded by choosing n_files ~ corpus_bytes / 1 GB
    (the Common-Crawl segment convention), so a 100 TB export is
    ~100k independent 1 GB encode tasks."""
    import hashlib

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        recs = []
        for url, date, body in zip(pdf[url_col], pdf["_warc_date"],
                                   pdf[html_col]):
            body = bytes(body) if body is not None else b""
            rid = hashlib.md5(f"{url}\n{date}".encode()).hexdigest()
            recs.append({
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": url,
                    "WARC-Date": date,
                    "WARC-Record-ID": f"<urn:md5:{rid}>",
                },
                "payload": http_response(body),
            })
        return pd.DataFrame({
            "file_id": [int(pdf["_fid"].iloc[0])],
            "warc": [build_warc(recs)],
        })

    # untrusted rows degrade, never abort: a record without a target
    # URI cannot be archived (dropped row); a null timestamp stamps
    # the epoch rather than emitting a literal "None" header
    staged = pages.filter(F.col(url_col).isNotNull()).select(
        F.col(url_col), F.col(html_col),
        F.coalesce(
            F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit("1970-01-01T00:00:00Z"),
        ).alias("_warc_date"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_files))
        .cast("long").alias("_fid"),
    )
    return staged.groupBy("_fid").applyInPandas(
        encode, "file_id long, warc binary"
    )


def pages_to_wet(pages: DataFrame, n_files: int = 64,
                 url_col: str = "url", ts_col: str = "warc_ts",
                 text_col: str = "text") -> DataFrame:
    """WET sink — Common Crawl's extracted-text companion format: one
    WARC *conversion* record per page, payload = plain UTF-8 text (no
    HTTP envelope), Content-Type text/plain. This is the format the
    text-only consumers (CCNet and most LLM-corpus pipelines) read
    instead of the full WARC, so the engine can ship its
    main-content-extracted corpus in the ecosystem's interchange shape.

    Same determinism contract and scale shape as ``pages_to_warc``:
    content-addressed file assignment (xxhash64(url) % n_files),
    in-file url sort, derived record IDs — byte-identical output under
    any input partitioning; ONE hash shuffle then embarrassingly
    parallel per-file encodes."""
    import hashlib

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        recs = []
        for url, date, text in zip(pdf[url_col], pdf["_warc_date"],
                                   pdf[text_col]):
            rid = hashlib.md5(
                f"{url}\n{date}\nconversion".encode()
            ).hexdigest()
            recs.append({
                "headers": {
                    "WARC-Type": "conversion",
                    "WARC-Target-URI": url,
                    "WARC-Date": date,
                    "WARC-Record-ID": f"<urn:md5:{rid}>",
                    "Content-Type": "text/plain",
                },
                "payload": (text or "").encode("utf-8"),
            })
        return pd.DataFrame({
            "file_id": [int(pdf["_fid"].iloc[0])],
            "warc": [build_warc(recs)],
        })

    staged = pages.filter(F.col(url_col).isNotNull()).select(
        F.col(url_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(
            F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit("1970-01-01T00:00:00Z"),
        ).alias("_warc_date"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_files))
        .cast("long").alias("_fid"),
    )
    return staged.groupBy("_fid").applyInPandas(
        encode, "file_id long, warc binary"
    )


def wet_to_docs(files_df: DataFrame, id_col: str = "file_id",
                bin_col: str = "warc") -> DataFrame:
    """WET blobs → (url, warc_ts, text): the conversion-record reader
    twin of ``warc_to_pages`` (which reads the HTTP response records)."""
    recs = parse_warc(files_df, id_col, bin_col)
    return recs.filter(F.col("warc_type") == "conversion").select(
        F.col("target_uri").alias("url"),
        F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.decode(F.col("body"), "UTF-8").alias("text"),
    )


def cdx_index(records: DataFrame) -> DataFrame:
    """CDX(J)-style capture index over parsed WARC records — the
    lookup sidecar every web archive ships next to its WARC files
    (and what Common Crawl's cc-index is built from). One row per
    HTTP response capture:

      surt_key — canonicalized SURT form of the url: host labels
                 reversed and comma-joined + ')' + path (scheme and
                 'www.' prefix dropped, lowercased) — groups all
                 captures of one page across hosts' name variants
                 and sorts hosts hierarchically;
      ts14     — 14-digit timestamp (yyyyMMddHHmmss) from WARC-Date;
      url, mime, status, digest (md5 of the payload body), rec_len.

    All JVM-side expressions over parse_warc output — codegen'd, no
    Python, no shuffle (the sort is the consumer's choice; a real
    export would write it bucketed+sorted by surt_key so lookups
    partition-prune)."""
    resp = records.filter(F.col("warc_type") == "response")
    bare = F.regexp_replace(F.lower("target_uri"), r"^https?://(www\.)?", "")
    host = F.regexp_extract(bare, r"^([^/]+)", 1)
    path = F.regexp_replace(bare, r"^[^/]*", "")
    return resp.select(
        F.concat(
            F.array_join(F.reverse(F.split(host, r"\.")), ","),
            F.lit(")"),
            F.when(path == "", "/").otherwise(path),
        ).alias("surt_key"),
        F.substring(
            F.regexp_replace("warc_date", r"[^0-9]", ""), 1, 14
        ).alias("ts14"),
        F.col("target_uri").alias("url"),
        F.coalesce(
            F.regexp_extract("http_content_type", r"^([^;]+)", 1), F.lit("")
        ).alias("mime"),
        F.coalesce(F.col("http_status"), F.lit(-1)).cast("int").alias("status"),
        F.coalesce(F.md5("body"), F.lit("")).alias("digest"),
        F.col("content_length").cast("long").alias("rec_len"),
    )


def warc_to_pages(files_df: DataFrame, id_col: str = "file_id",
                  bin_col: str = "warc") -> DataFrame:
    """WARC blobs → the engine's pages-table shape
    (url, warc_ts, html): response records with a 200 status only —
    exactly what CrawlEngine/extract consume."""
    recs = parse_warc(files_df, id_col, bin_col)
    return (
        recs.filter(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            F.col("target_uri").alias("url"),
            F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
            F.col("body").alias("html"),
        )
    )
