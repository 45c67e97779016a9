from __future__ import annotations

import numpy as np
import pyarrow as pa

from dupers_ray.stages.textstats import (
    fingerprint,
    lang_id,
    quality_stats,
    token_counts,
)


def test_token_counts():
    t = pa.table({"text": ["one two three", "", "a,b c", None]})
    out = token_counts(t)
    assert out.column("n_tokens_ws").to_pylist() == [3, 0, 2, 0]
    # BPE-ish: "a" "," "b" "c" = 4 pieces
    assert out.column("n_tokens_bpe").to_pylist() == [3, 0, 4, 0]


def test_quality_stats_ranges():
    t = pa.table(
        {"text": ["The quick brown fox is on the hill and it was there for a day.",
                  "%%% ### @@@ !!!", ""]}
    )
    out = quality_stats(t)
    q = out.column("quality_score").to_pylist()
    assert 0 <= min(q) and max(q) <= 1
    assert q[0] > q[1] > 0 or q[1] == 0  # prose beats punctuation soup
    assert q[2] == 0.0
    assert out.column("n_words").to_pylist()[2] == 0


def test_lang_id():
    t = pa.table(
        {
            "text": [
                "the cat sat on the mat and it was the best of times for all of them",
                "der hund und die katze sind in dem haus mit den kindern und nicht allein",
                "xyzzy plugh qwerty",
                "",
            ]
        }
    )
    out = lang_id(t)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "und", "und"]


def test_fingerprint_order_sensitive_ws_insensitive():
    t = pa.table(
        {"text": ["alpha beta gamma", "alpha  beta\tgamma", "gamma beta alpha", ""]}
    )
    out = fingerprint(t).column("fingerprint").to_pylist()
    assert out[0] == out[1]      # whitespace-insensitive
    assert out[0] != out[2]      # order-sensitive
    assert out[3] != out[0]
