"""normalize_text kernel semantics + grouped_quantiles_disc vs DuckDB."""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from dupers_ray.stages.normalize import normalize_text
from dupers_ray.stages.sketch import grouped_quantiles_disc


def test_normalize_text_cases():
    t = pa.table(
        {
            "text": [
                "Hello,  World!",
                "a.b-c_d",  # punctuation joins, underscore is stripped too
                "  \t tabs\nand\nnewlines  ",
                "!!!",
                "",
                None,
                "MiXeD 42 Case",
            ]
        }
    )
    out = normalize_text(t).column("text_norm").to_pylist()
    assert out == [
        "hello world",
        "abc_d" if False else "abcd",  # [^a-z0-9\s] strips '_' as well
        "tabs and newlines",
        "",
        "",
        None,
        "mixed 42 case",
    ]


def test_normalize_idempotent():
    t = pa.table({"text": ["Some,   THING  here!!", "x  y"]})
    once = normalize_text(t)
    twice = normalize_text(
        pa.table({"text": once.column("text_norm")})
    ).column("text_norm")
    assert twice.to_pylist() == once.column("text_norm").to_pylist()


def test_grouped_quantiles_matches_percentile_disc():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 4, 1500),
            "v": rng.integers(0, 80, 1500).astype(np.int64),
        }
    )
    got = (
        grouped_quantiles_disc(
            rd.from_pandas(df).repartition(9),
            group_col="g", value_col="v", qs=(0.25, 0.5, 0.9, 1.0),
            out_cols=("q25", "q50", "q90", "q100"),
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        SELECT g,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS q25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS q50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY v) AS q90,
               percentile_disc(1.0)  WITHIN GROUP (ORDER BY v) AS q100
        FROM df GROUP BY g ORDER BY g
        """
    ).df()
    for c in ["q25", "q50", "q90", "q100"]:
        assert list(got[c].astype(int)) == list(exp[c].astype(int)), c
