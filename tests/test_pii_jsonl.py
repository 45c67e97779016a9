"""PII redaction, JSON field extraction, JSONL round-trip."""
from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from dupers_ray.sources.jsonl import read_jsonl, write_jsonl
from dupers_ray.stages.jsonx import extract_json_int
from dupers_ray.stages.pii import redact_pii


def test_redact_pii_kinds():
    t = pa.table(
        {
            "text": [
                "mail me at a.b+c@sub.example.org today",
                "server 192.168.1.254 and 10.0.0.1 up",
                "call 555-123-4567",
                "no pii here",
                "x@y.io and 1.2.3.4 and 555-000-1111",
                "",
                None,
            ]
        }
    )
    out = redact_pii(t)
    assert out.column("n_email").to_pylist() == [1, 0, 0, 0, 1, 0, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 2, 0, 0, 1, 0, 0]
    assert out.column("n_phone").to_pylist() == [0, 0, 1, 0, 1, 0, 0]
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail me at <EMAIL> today"
    assert red[1] == "server <IP> and <IP> up"
    assert red[2] == "call <PHONE>"
    assert red[4] == "<EMAIL> and <IP> and <PHONE>"
    assert red[6] is None


def test_extract_json_int():
    t = pa.table(
        {
            "props": [
                '{"k": 87}',
                '{"k":-3, "other": 1}',
                '{"nope": 5}',
                None,
            ]
        }
    )
    out = extract_json_int(t)
    assert out.column("k").to_pylist() == [87, -3, None, None]


def test_jsonl_roundtrip(tmp_path):
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("name", pa.string()),
            ("score", pa.float64()),
            ("ts", pa.timestamp("us")),
        ]
    )
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "name": ["a", "b", None],
            "score": [1.5, -2.25, 0.0],
            "ts": pa.array([1_700_000_000_000_001, 2, None], pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "out")
    write_jsonl(rd.from_arrow(t), d)
    back = read_jsonl(d, schema=schema).to_pandas().sort_values("id")
    orig = t.to_pandas().sort_values("id")
    for c in schema.names:
        assert list(back[c].fillna("~")) == list(orig[c].fillna("~")), c


def test_extract_json_str_and_jsonld():
    import pyarrow as pa

    from dupers_ray.stages.jsonx import (
        extract_json_int,
        extract_json_str,
        extract_jsonld,
    )

    pages = pa.table({"html": pa.array([
        b'<html><script type="application/ld+json">'
        b'{"@type": "Article", "name": "A b", "position": 3}</script></html>',
        b"<html><script>var x=1;</script></html>",          # no ld+json
        b"<HTML><SCRIPT TYPE='APPLICATION/LD+JSON'>{\"name\": \"up\"}"
        b"</SCRIPT></HTML>",                                  # case/quotes
        b"\xff\xfe garbage",                                  # invalid utf-8
        None,
    ], pa.binary())})
    t = extract_jsonld(pages)
    got = t.column("jsonld").to_pylist()
    assert got[0] == '{"@type": "Article", "name": "A b", "position": 3}'
    assert got[1] is None and got[3] is None and got[4] is None
    assert got[2] == '{"name": "up"}'

    t = extract_json_str(t, col="jsonld", key="@type", out_col="type")
    t = extract_json_str(t, col="jsonld", key="name", out_col="name")
    t = extract_json_int(t, col="jsonld", key="position")
    assert t.column("type").to_pylist()[0] == "Article"
    assert t.column("name").to_pylist()[:3] == ["A b", None, "up"]
    assert t.column("position").to_pylist()[0] == 3
