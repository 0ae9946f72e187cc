"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — runs the batch frontier crawl engine
  end-to-end on the deterministic synthetic web (seed=42) and returns
  the extracted review records in the reference's output order.
- ``queries()``/``oracle_sql()``: one entry per implemented operator
  from SURVEY.md §2 + the training-data pipeline tier, verified against
  DuckDB on the sf tables (see go_scrapper_spark/oracle_queries.py for
  the exactness conventions that make the value-hash compare exact).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # repo-local pkg

from pyspark.sql import DataFrame, SparkSession

from go_scrapper_spark import oracle_queries
from go_scrapper_spark.plans.crawl import CrawlConfig, CrawlEngine
from go_scrapper_spark.sources import synthetic_web as sw
from go_scrapper_spark.sources.storage import SnapshotStore


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the synthetic web (profile → feed/non-rec fan-out
    → extraction → dedup/seen → snapshot commits) and return extracted
    reviews ordered date-desc (reference main.go:984-1007 semantics).

    The sf0.001 documents table is read as a smoke check of the testdata
    path; the crawl itself runs on the deterministic synthetic web the
    engine is specified against (BASELINE.json input_hint shape).
    """
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()

    cfg = sw.WebConfig(n_biz=6, flaky_mod=10**9)  # no transient failures: smoke path
    pages = sw.generate_pages_df(spark, cfg, n_partitions=4)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="entry-crawl-"))
    engine = CrawlEngine(
        spark,
        pages,
        sw.robots_df(spark, cfg),
        store,
        CrawlConfig(metrics=False),
    )
    from go_scrapper_spark.plans.search import resolve_profile_keys

    engine.run(resolve_profile_keys(sw.seeds_df(spark, cfg), pages))
    return engine.ordered_extracted()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return oracle_queries.queries()


def oracle_sql() -> dict[str, str]:
    return oracle_queries.oracle_sql()
