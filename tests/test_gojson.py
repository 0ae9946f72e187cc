"""Go-encoding/json byte-compat + review-hash branch goldens
(SURVEY.md P18; reference main.go:1009-1036, 1064-1077)."""

import hashlib

from go_scrapper_spark.functions.gojson import (
    b64_field,
    go_marshal_string_list,
    review_hash,
)


def test_marshal_compact_no_html_escape():
    # Go json.Marshal then the reference's </>/& undo
    assert go_marshal_string_list(["a & <b>", "X"]) == b'["a & <b>","X"]'


def test_marshal_string_escapes():
    assert go_marshal_string_list(['q"t', "a\\b", "n\nn", "t\tt"]) == (
        b'["q\\"t","a\\\\b","n\\nn","t\\tt"]'
    )


def test_marshal_unicode_passthrough():
    # Go writes valid UTF-8 directly (except U+2028/29)
    assert go_marshal_string_list(["héllo"]) == '["héllo"]'.encode("utf-8")
    assert go_marshal_string_list(["a b"]) == b'["a\\u2028b"]'


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


def test_hash_branch_id_only():
    # no text/author/response but id exists → [id] (main.go:1014-1016)
    assert review_hash(None, None, None, "R1") == _md5(b'["R1"]')
    assert review_hash("", "", "", "R1") == _md5(b'["R1"]')


def test_hash_branch_with_response():
    # first response has text → [text, author, response] (main.go:1017-1021)
    assert review_hash("t", "a", "resp", "R1") == _md5(b'["t","a","resp"]')


def test_hash_branch_text_author():
    # default branch (main.go:1022-1026); id ignored when text present
    assert review_hash("t", "a", None, "R1") == _md5(b'["t","a"]')
    assert review_hash("t", "a", "", None) == _md5(b'["t","a"]')


def test_hash_entities_survive_escaping():
    # the <>& back-substitution is what makes these hashes Go-identical
    assert review_hash("a & <b>", "x", None, None) == _md5(b'["a & <b>","x"]')


def test_b64_field():
    assert b64_field("hello") == "aGVsbG8="
    assert b64_field("") == ""
    assert b64_field(None) is None
