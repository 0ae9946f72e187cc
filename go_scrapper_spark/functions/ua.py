"""User-agent rotation (SURVEY.md S11).

The reference picks a random UA per request from a hard-coded list
with unseeded rand.Intn (collyfunc.go:17-46, 98, 158) — not
reproducible. Determinized here (documented divergence): the UA is
``UA_POOL[xxhash64(url, attempt) % len(UA_POOL)]``, computed JVM-side.
The pool is our own small generic set, not the reference's list.
"""

from __future__ import annotations

from pyspark.sql import functions as F

UA_POOL = [
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64) Gecko/20100101 Firefox/119.0",
    "Mozilla/5.0 (Windows NT 11.0; Win64; x64) AppleWebKit/537.36 Chrome/119.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Apple Silicon) AppleWebKit/605.1.15 Version/16.6 Safari/605.1.15",
]


def ua_col(url_col, attempt_col):
    """Deterministic per-(url, attempt) UA selection."""
    idx = F.pmod(F.xxhash64(url_col, attempt_col), F.lit(len(UA_POOL)))
    return F.element_at(
        F.array(*[F.lit(u) for u in UA_POOL]), (idx + 1).cast("int")
    )
