"""External-call seams: HTTP fetch stage + match-service POST (S3-S5).

In this sandbox the "network" is the pages-table join (the synthetic
web is deterministic, which is what makes crawl-order equivalence
testable). A real deployment swaps that join for live HTTP without
touching the superstep loop — THIS module is that seam:

- ``fetch_with_transport``: a mapInPandas fetch stage producing the
  exact (html, _fa) columns the pages-join produces, so everything
  downstream of the fetch (status routing F6, retry ledger F5, the
  extraction pipeline, cookie carry) is byte-identical between the two
  fetch paths. The reference's transport semantics live here: per-host
  proxy/TLS config and the 200 s timeout (collyfunc.go:65-122) belong
  to the transport callable, the in-wave retry loop (main.go:333-354,
  1079-1099) is the attempt iteration below.
- ``match_via_service``: the reference POSTs search candidates to an
  external match service and uses the returned winner
  (main.go:434-468); the engine's default is the deterministic
  in-engine argmin (plans/search.py). This variant restores the POST
  through the same seam, one request per task (the reference's shape).

Both are tested against a local ThreadingHTTPServer stub
(tests/test_transport.py) running the same synthetic web, proving the
pages-join and the live fetcher interchange under the identical
superstep loop.

Scale shape: one transport client per PARTITION (factory called inside
the mapInPandas generator, never pickled per row); politeness still
bounds per-host request counts upstream (select_wave), so a partition
issues at most its wave-slice of requests. No driver round-trips.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# transport protocol: factory() -> fetch; fetch(url, attempt,
# max_attempts) -> (fa, body) where fa = the absolute index of the
# first non-503 attempt (the retry ledger's fail-attempt count) and
# body = page bytes on 200, None on 404/exhaustion. max_attempts is
# the ENGINE's budget (cfg.max_attempts), threaded per call — the
# transport must never issue a request with attempt index >=
# max_attempts, so the wire traffic always respects the budget the
# frontier accounting assumes.
TransportFactory = Callable[
    [], Callable[[str, int, int], tuple[int, bytes | None]]
]


def fetch_with_transport(
    wave_df: DataFrame,
    transport_factory: TransportFactory,
    max_attempts: int = 5,
) -> DataFrame:
    """The live-fetch twin of ``wave.join(pages).withColumn('_fa', …)``:
    appends (html binary, _fa int) to the wave rows by calling the
    transport, retrying in-wave exactly like the reference
    (main.go:333-354): attempts run inside the politeness slot until
    success or the 5-attempt budget is gone."""
    out_schema = T.StructType(
        list(wave_df.schema.fields)
        + [
            T.StructField("html", T.BinaryType(), True),
            T.StructField("_fa", T.IntegerType(), True),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = transport_factory()  # one client per partition
        for pdf in it:
            htmls: list = []
            fas: list = []
            for url, att in zip(pdf["url"], pdf["attempt"]):
                fa, body = fetch(str(url), int(att), max_attempts)
                htmls.append(body)
                fas.append(int(fa))
            yield pdf.assign(
                html=pd.Series(htmls, index=pdf.index, dtype=object),
                _fa=pd.Series(fas, index=pdf.index, dtype="int32"),
            )

    return wave_df.mapInPandas(gen, out_schema)


def http_transport_factory(
    base_url: str, timeout_sec: float = 200.0
) -> TransportFactory:
    """A urllib transport for a gateway that serves arbitrary URLs:
    GET {base_url}/fetch with the target in ``X-Orig-Url`` and the
    attempt index in ``X-Attempt`` (the local stub uses the attempt
    header to emulate transient 503s deterministically; a production
    gateway ignores it). 200 → body; 503 → retry in-wave; anything
    else → miss. The 200 s timeout mirrors collyfunc.go:122. The
    attempt budget is NOT baked in here — the engine threads
    cfg.max_attempts through every fetch call, so wire attempts can
    never exceed what the frontier accounting assumes."""

    def factory():
        import urllib.error
        import urllib.request

        def fetch(
            url: str, attempt: int, max_attempts: int
        ) -> tuple[int, bytes | None]:
            for i in range(attempt, max_attempts):
                req = urllib.request.Request(
                    base_url + "/fetch",
                    headers={"X-Orig-Url": url, "X-Attempt": str(i)},
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout_sec) as r:
                        return i, r.read()
                except urllib.error.HTTPError as e:
                    if e.code == 503:
                        continue  # transient: in-wave retry
                    return i, None  # hard miss (404 etc.)
            return max_attempts, None  # budget exhausted on 503s

        return fetch

    return factory


# match-service protocol: factory() -> match; match(payload dict) ->
# winner cand_url ('' = no match). Payload mirrors main.go:434-468:
# the task's name/address text plus every extracted candidate.
MatchServiceFactory = Callable[[], Callable[[dict], str]]


def match_via_service(
    cands: DataFrame, target: DataFrame, service_factory: MatchServiceFactory
) -> DataFrame:
    """(task_id, resolved_key) via one POST per task — the S5 external
    variant. Candidates group per task with applyInPandas (tasks are
    independent → embarrassingly parallel; candidate lists are tiny).
    Falls back to '' when the service returns no winner, same as the
    in-engine path's NO_SEARCH_RESULTS contract."""
    joined = cands.join(target, "task_id")

    def per_task(pdf: pd.DataFrame) -> pd.DataFrame:
        match = service_factory()
        task_id = int(pdf["task_id"].iloc[0])
        payload = {
            "name": str(pdf["t_name"].iloc[0]),
            "text": str(pdf["t_text"].iloc[0]),
            "candidates": [
                {
                    "cand_name": str(r.cand_name),
                    "cand_text": str(r.cand_text),
                    "cand_url": str(r.cand_url),
                }
                for r in pdf.itertuples()
            ],
        }
        return pd.DataFrame(
            {"task_id": [task_id], "resolved_key": [match(payload) or ""]}
        )

    return joined.groupBy("task_id").applyInPandas(
        per_task, "task_id int, resolved_key string"
    )


def http_match_service_factory(base_url: str, timeout_sec: float = 30.0) -> MatchServiceFactory:
    """POST the payload as JSON to {base_url}/match; the response body
    is JSON {"winner": "<cand_url>"} (main.go:434-468's shape,
    determinized)."""

    def factory():
        import urllib.request

        def match(payload: dict) -> str:
            req = urllib.request.Request(
                base_url + "/match",
                data=json.dumps(payload, sort_keys=True).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout_sec) as r:
                return json.loads(r.read().decode()).get("winner", "")

        return match

    return factory
