"""Go-encoding/json-compatible serialization + review hashing (P18, S6).

The reference hashes a JSON-marshalled string list (main.go:1009-1036):
``json.Marshal(lst)`` HTML-escapes ``< > &`` to ``\\u003c \\u003e
\\u0026`` and the reference then replaces those three back
(main.go:1029-1031). Net effect = compact JSON with standard Go string
escaping, no HTML escaping. Python's ``json.dumps(ensure_ascii=False,
separators=(',',':'))`` matches Go byte-for-byte for all inputs except
U+2028/U+2029, which Go always escapes — patched below.

This module is pure Python (no Spark imports): it is used inside
vectorized pandas UDFs, by the synthetic-web generator, and by the
pure-Python reference model, guaranteeing all three agree byte-for-byte.
"""

from __future__ import annotations

import base64
import hashlib
import json


def go_marshal_string_list(lst: list[str]) -> bytes:
    """Byte-identical to Go's json.Marshal([]string) after the
    reference's \\u003c/\\u003e/\\u0026 back-substitution."""
    s = json.dumps(lst, ensure_ascii=False, separators=(",", ":"))
    # Go escapes U+2028/U+2029 even outside HTML mode; Python does not.
    s = s.replace("\u2028", "\\u2028").replace("\u2029", "\\u2029")
    return s.encode("utf-8")


def review_hash(
    text: str | None,
    author_name: str | None,
    first_response_text: str | None,
    review_id: str | None,
) -> str:
    """md5 review hash per the priority rules of main.go:1009-1036.

    - no text, no author, no (non-empty first) response, but an id → [id]
    - a first response with non-empty text → [text, author, response]
    - otherwise → [text, author]

    Missing fields hash as empty strings (Go zero values).
    """
    text = text or ""
    author_name = author_name or ""
    first_response_text = first_response_text or ""
    review_id = review_id or ""
    if not text and not author_name and not first_response_text and review_id:
        lst = [review_id]
    elif first_response_text:
        lst = [text, author_name, first_response_text]
    else:
        lst = [text, author_name]
    return hashlib.md5(go_marshal_string_list(lst)).hexdigest()


def b64_field(s: str | None) -> str | None:
    """Field-level base64 encoding applied before output
    (main.go:1064-1077); empty/None passes through (Go only encodes
    non-empty fields)."""
    if not s:
        return s
    return base64.standard_b64encode(s.encode("utf-8")).decode("ascii")


def go_jsonl_row(record: dict) -> str:
    """One JSONL output line matching the reference sink (S6):
    Go json.Encoder with SetEscapeHTML(false) — i.e. standard compact
    JSON, omitempty semantics handled by the caller passing only
    non-zero fields."""
    s = json.dumps(record, ensure_ascii=False, separators=(",", ":"))
    return s.replace("\u2028", "\\u2028").replace("\u2029", "\\u2029")
