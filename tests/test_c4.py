"""C4 line-level cleaner + blocklist scorer (stages/c4.py).

Pins each published C4 rule (Raffel et al. 2020 §2.2) on handcrafted
lines, the list-offset reassembly, and the word-boundary blocklist
semantics — plus a Dataset-level streaming pass.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from dupers_ray.stages.c4 import (
    blocklist_stats,
    blocklist_stats_batch,
    c4_clean,
    c4_clean_batch,
)


def _one(text: str, **kw):
    t = pa.table({"doc_id": [1], "text": [text]})
    return c4_clean_batch(t, **kw)


GOOD = "alpha beta gamma delta epsilon."  # 5 words, terminal '.'


class TestC4Lines:
    def test_keeps_terminal_punct_lines_only(self):
        out = _one("\n".join([GOOD, "no terminal punct here at all", GOOD, GOOD]))
        assert out.num_rows == 1
        assert out.column("cleaned_text")[0].as_py() == "\n".join([GOOD, GOOD, GOOD])
        assert out.column("n_lines")[0].as_py() == 4
        assert out.column("n_kept")[0].as_py() == 3

    @pytest.mark.parametrize("punct", [".", "!", "?", '"'])
    def test_terminal_punct_variants(self, punct):
        line = "one two three four five" + punct
        out = _one("\n".join([line, GOOD, GOOD]))
        assert out.column("n_kept")[0].as_py() == 3

    def test_short_lines_dropped(self):
        out = _one("\n".join(["tiny line only four.", GOOD, GOOD, GOOD]))
        assert out.column("n_kept")[0].as_py() == 3

    def test_javascript_lines_dropped_case_insensitive(self):
        bad = "please enable JavaScript to continue browsing."
        out = _one("\n".join([bad, GOOD, GOOD, GOOD]))
        assert out.column("n_kept")[0].as_py() == 3
        assert "JavaScript" not in out.column("cleaned_text")[0].as_py()


class TestC4Pages:
    def test_page_with_brace_dropped(self):
        assert _one("\n".join([GOOD, GOOD, GOOD]) + " x { y").num_rows == 0

    def test_page_with_lorem_ipsum_dropped(self):
        assert _one("\n".join([GOOD, GOOD, GOOD, "Lorem Ipsum dolor."])).num_rows == 0

    def test_page_below_min_lines_dropped(self):
        assert _one("\n".join([GOOD, GOOD])).num_rows == 0
        assert _one("\n".join([GOOD, GOOD]), min_lines=2).num_rows == 1

    def test_empty_and_null_text(self):
        t = pa.table({"doc_id": [1, 2], "text": ["", None]})
        assert c4_clean_batch(t).num_rows == 0

    def test_offsets_reassembly_across_docs(self):
        # doc 1 keeps lines 0 and 2; doc 2 keeps line 1 — offsets must
        # not bleed lines across docs
        t = pa.table(
            {
                "doc_id": [1, 2],
                "text": [
                    "\n".join([GOOD, "drop me", GOOD, GOOD]),
                    "\n".join(["nope", GOOD, GOOD, GOOD]),
                ],
            }
        )
        out = c4_clean_batch(t)
        assert out.column("cleaned_text").to_pylist() == [
            "\n".join([GOOD, GOOD, GOOD]),
            "\n".join([GOOD, GOOD, GOOD]),
        ]


class TestBlocklist:
    def test_word_boundary_not_substring(self):
        t = pa.table(
            {"doc_id": [1, 2], "text": ["a spark of sparkly sparks", "sparkly only"]}
        )
        out = blocklist_stats_batch(t, terms=("spark",))
        # 'spark' matches; 'sparkly'/'sparks' do not
        assert out.column("n_hits").to_pylist() == [1, 0]

    def test_keep_flag_integer_exact(self):
        # 1 hit in 20 words = 5% -> keep at max_hit_pct=5; 1 in 19 -> drop
        t = pa.table(
            {
                "doc_id": [1, 2],
                "text": ["spark " + "w " * 19, "spark " + "w " * 18],
            }
        )
        out = blocklist_stats_batch(t, terms=("spark",), max_hit_pct=5)
        assert out.column("n_words").to_pylist() == [20, 19]
        assert out.column("keep").to_pylist() == [True, False]

    def test_null_text(self):
        t = pa.table({"doc_id": [1], "text": [None]})
        out = blocklist_stats_batch(t, terms=("spark",))
        assert out.column("n_hits").to_pylist() == [0]
        assert out.column("keep").to_pylist() == [True]


class TestDatasetLevel:
    def test_streaming_pass(self, ray_session):
        import ray.data as rd

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": list(range(8)),
                    "text": ["\n".join([GOOD, GOOD, GOOD])] * 4
                    + ["too few lines."] * 4,
                }
            )
        )
        out = c4_clean(docs).to_pandas()
        assert len(out) == 4
        assert (out["n_kept"] == 3).all()
        bl = blocklist_stats(docs, terms=("alpha",), max_hit_pct=50).to_pandas()
        assert len(bl) == 8
