"""JSONL sink byte-fidelity (S6): Go omitempty semantics, field order,
no HTML escaping (utils/utils.go:25-40 + encoder config)."""

import json

from go_scrapper_spark.sources.sinks import _record, meta_json


def test_jsonl_full_record_field_order_and_values():
    row = {
        "parent_id": "",
        "author_name": "QW5h",
        "text": "aGVsbG8=",
        "source_date": "1/2/2020",
        "review_id": "R1",
        "author_id": "U1",
        "photos": ["https://h/p.jpg"],
        "not_recommended": True,
        "rating": 4,
        "scraped_at": 1700000000,
        "posted_at": 1577923200,
        "responses": [{"author_name": "Qm8=", "text": "eA==", "posted_at": "1/3/2020"}],
        "review_hash": "abc123",
    }
    line = _record(row)
    assert line == (
        '{"author_name":"QW5h","text":"aGVsbG8=","source_date":"1/2/2020",'
        '"review_id":"R1","author_id":"U1","photos":["https://h/p.jpg"],'
        '"not_recommended":true,"rating":4,"scraped_at":1700000000,'
        '"posted_at":1577923200,'
        '"responses":[{"author_name":"Qm8=","text":"eA==","posted_at":"1/3/2020"}],'
        '"review_hash":"abc123"}'
    )


def test_jsonl_omitempty_zero_values():
    # Go omitempty drops "", 0, false, nil/empty slices; review_hash stays
    row = {
        "parent_id": "", "author_name": "", "text": "", "source_date": "",
        "review_id": "", "author_id": "", "photos": None,
        "not_recommended": False, "rating": 0, "scraped_at": 0,
        "posted_at": 0, "responses": None, "review_hash": "",
    }
    assert _record(row) == '{"review_hash":""}'


def test_jsonl_no_html_escaping():
    row = {"text": "a & <b>", "review_hash": "h"}
    line = _record(row)
    assert '"a & <b>"' in line  # SetEscapeHTML(false) semantics


def test_meta_json_shape():
    m = json.loads(
        meta_json("https://x/biz/1", "SUCCESS_SCRAPED", 42, 17, 12345,
                  histogram_score=4.5, histogram_total=100)
    )
    assert m["histogram"]["primary"] == {"score": 4.5, "total_revews": 100}
    assert m["scraping_status"] == "SUCCESS_SCRAPED"
    assert m["downloader/request_count"] == 17  # real value, not the Go 0-bug
