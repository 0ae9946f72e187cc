"""Task-schema fidelity (S2/S10): every json tag of the reference's
Spider struct (main.go:31-52) — including the declared-but-unused
fields business_id / client_id / batch_id / persona.additional_cookies
/ persona.other_proxies — must survive parse_tasks + SEEDS_SCHEMA
round-tripping, and the dead -s/--setvar flag (main.go:188-196, sval
unused in yelpSpiderRun) must be accepted by the CLI."""

from __future__ import annotations

import base64
import json

from jobs.crawl import parse_tasks

FULL_TASK = {
    # every Spider json tag (reference main.go:31-52)
    "profile_key": "https://s1.example/biz/acme",
    "business_name": "Acme Anvils",
    "last_review_hashes": ["aa", "bb"],
    "first_page_only": 1,
    "business_id": 77,
    "client_id": 12,
    "batch_id": 3,
    "task_id": 9,
    "persona": {
        "additional_cookies": {"sessionid": "xyz", "n": 1},
        "proxy": "http://proxy:8080",
        "other_proxies": ["http://p2:8080", "http://p3:8080"],
    },
    "address": {
        "city": "Springfield",
        "state": "IL",
        "street": "1 Main St",
        "zip": "62701",
    },
}


def _b64(obj) -> str:
    return base64.standard_b64encode(json.dumps(obj).encode()).decode()


def test_parse_tasks_carries_every_spider_field():
    row = parse_tasks(_b64(FULL_TASK))[0]
    assert row["task_id"] == 9
    assert row["profile_key"] == "https://s1.example/biz/acme"
    assert row["business_name"] == "Acme Anvils"
    assert row["last_review_hashes"] == ["aa", "bb"]
    assert row["first_page_only"] == 1
    assert row["business_id"] == 77
    assert row["client_id"] == 12
    assert row["batch_id"] == 3
    assert row["proxy"] == "http://proxy:8080"
    assert row["other_proxies"] == ["http://p2:8080", "http://p3:8080"]
    # interface{} in Go → carried as its JSON serialization
    assert json.loads(row["additional_cookies"]) == {"sessionid": "xyz", "n": 1}
    assert row["street"] == "1 Main St"
    assert row["city"] == "Springfield"
    assert row["state"] == "IL"
    assert row["zip"] == "62701"


def test_parse_tasks_minimal_task_defaults():
    row = parse_tasks(_b64({"profile_key": "https://h/x"}))[0]
    assert row["business_id"] is None
    assert row["client_id"] is None
    assert row["batch_id"] is None
    assert row["additional_cookies"] is None
    assert row["other_proxies"] is None
    assert row["first_page_only"] == 0


def test_seeds_schema_accepts_full_task(spark):
    from go_scrapper_spark.schemas import SEEDS_SCHEMA

    df = spark.createDataFrame(parse_tasks(_b64([FULL_TASK])), schema=SEEDS_SCHEMA)
    r = df.collect()[0]
    assert r["business_id"] == 77 and r["batch_id"] == 3
    assert r["other_proxies"] == ["http://p2:8080", "http://p3:8080"]
    # field names cover the Spider struct tag-for-tag (address/persona
    # flattened; filename is Go-internal, not a json tag)
    expected = {
        "task_id", "profile_key", "business_name", "street", "city", "state",
        "zip", "last_review_hashes", "first_page_only", "proxy",
        "business_id", "client_id", "batch_id", "additional_cookies",
        "other_proxies", "seq",
    }
    assert set(df.columns) == expected


def test_setvar_flag_accepted():
    from jobs.crawl import build_parser

    ns = build_parser().parse_args(["-a", "e30=", "-o", "/tmp/x", "-s", "NAME=VALUE"])
    assert ns.setvar == "NAME=VALUE"
