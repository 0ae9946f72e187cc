"""String distance — pure-Python Levenshtein identical to Spark's
``levenshtein`` (unit-cost insert/delete/substitute). Used by the
reference scheduling model so the deterministic matcher (J1, replacing
the reference's external match service S5) agrees exactly with the
engine's JVM-side expression."""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]
