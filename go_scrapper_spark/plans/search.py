"""Search → hovercard → match profile-key resolution (SURVEY.md §3.2).

Tasks whose ``profile_key`` is empty resolve it by: building the
search URL (P14, QueryEscape semantics — main.go:427-431), fetch-
joining the pages table, extracting hovercard candidates with the
island regex (P2/F2/F3), and picking the winner with a deterministic
in-engine matcher (J1/J2) that replaces the reference's external match
service POST (S5, main.go:434-468): score = levenshtein(name) +
levenshtein(address text), argmin with URL tie-break.

Divergences from the reference, both documented + determinized:
- the external matcher is an in-engine edit-distance argmin;
- the winner URL is used as-is (the reference prefixes
  ``https://www.yelp.com`` — main.go:442 — which only works because it
  is single-host).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from go_scrapper_spark.functions.extract import extract_search_candidates

SEARCH_HOST = "www.search.example"

CAND_DDL = (
    "task_id int, cand_name string, cand_text string, "
    "cand_url string, cand_reviews double"
)


def build_search_url(seeds: DataFrame) -> DataFrame:
    """QueryEscape(name/address) exactly as main.go:427-430 —
    Spark's url_encode is application/x-www-form-urlencoded, the same
    encoding as Go's url.QueryEscape."""
    address = F.concat_ws(" ", "street", "state", "city", "zip")
    return seeds.withColumn(
        "search_url",
        F.concat(
            F.lit(f"https://{SEARCH_HOST}/search?find_desc="),
            F.url_encode(F.col("business_name")),
            F.lit("&find_loc="),
            F.url_encode(address),
        ),
    )


def _extract_candidates(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for task_id, url, body in zip(pdf["task_id"], pdf["search_url"], pdf["html"]):
            if body is None:
                continue
            for c in extract_search_candidates(url, bytes(body)):
                rows.append({"task_id": int(task_id), **c})
        yield pd.DataFrame(
            rows, columns=["task_id", "cand_name", "cand_text", "cand_url", "cand_reviews"]
        )


def resolve_profile_keys(
    seeds: DataFrame, pages: DataFrame, match_service_factory=None
) -> DataFrame:
    """Return the seeds with empty profile_keys resolved (tasks whose
    search yields no candidates keep '' — NO_SEARCH_RESULTS, F6).

    ``match_service_factory`` switches J1/J2 from the in-engine
    edit-distance argmin to the reference's external match-service POST
    (S5, main.go:434-468) through operators/transport.match_via_service
    — same inputs, same (task_id, resolved_key) contract.

    Short-circuits when every seed already carries a profile_key: the
    resolution plan fetch-joins the FULL pages corpus, which an
    all-direct batch must never pay (the seed list is the CLI payload
    — O(tasks) — so the emptiness probe is trivially cheap, while the
    skipped join is O(corpus))."""
    direct = seeds.filter(F.col("profile_key") != "")
    searchy = seeds.filter(F.col("profile_key") == "")
    if searchy.isEmpty():
        return seeds

    with_urls = build_search_url(searchy)
    # broadcast the O(tasks) search-URL side and probe the corpus in
    # place: a shuffle join here would move EVERY page's html across
    # the cluster to match a task list thousands of times smaller.
    # Inner join is value-identical to the former left join — taskless
    # pages can't match, pageless tasks produce no candidates either
    # way (the final left join with `winners` restores them with '').
    fetched = pages.select(F.col("url").alias("search_url"), "html").join(
        F.broadcast(with_urls.select("task_id", "search_url")), "search_url"
    )
    cands = fetched.select("task_id", "search_url", "html").mapInPandas(
        _extract_candidates, schema=CAND_DDL
    )

    # target text = street + ", " + city + ", " + state + " " + zip (main.go:361)
    target = searchy.select(
        "task_id",
        F.col("business_name").alias("t_name"),
        F.concat_ws(
            "", F.col("street"), F.lit(", "), F.col("city"), F.lit(", "),
            F.col("state"), F.lit(" "), F.col("zip"),
        ).alias("t_text"),
    )
    if match_service_factory is not None:
        from go_scrapper_spark.operators.transport import match_via_service

        winners = match_via_service(cands, target, match_service_factory)
        winners = winners.filter(F.col("resolved_key") != "").select(
            "task_id", "resolved_key"
        )
    else:
        scored = cands.join(F.broadcast(target), "task_id").withColumn(
            "score",
            F.levenshtein("t_name", "cand_name")
            + F.levenshtein("t_text", "cand_text"),
        )
        w = Window.partitionBy("task_id").orderBy(
            F.col("score").asc(), F.col("cand_url").asc()
        )
        winners = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("task_id", F.col("cand_url").alias("resolved_key"))
        )
    resolved = (
        searchy.join(winners, "task_id", "left")
        .withColumn("profile_key", F.coalesce("resolved_key", F.lit("")))
        .drop("resolved_key")
    )
    return direct.unionByName(resolved)
