"""Direct parity against the reference's OWN conformance corpus.

The Go reference pins golden SHA-256 digests for three files of its test
bucket (/root/reference/internal/mock/mock.go:53-59, sources :46-52) and
its e2e dupe test plants a duplicated file across bucket1/bucket2
(bucket2/CRXFs0KNUCfl is a byte-copy of bucket1/CRXFs0KNUCfl, used by
TestDupeCommand, pkg/database/database_dupe_test.go). Running the ENGINE
over the same bytes must reproduce those digests and that dupe verdict —
the strongest parity evidence available without a Go toolchain.
"""

from __future__ import annotations

import os

import pytest
import ray.data as rd

from dupers_ray.pipelines.exact_dedup import exact_dupe_pairs
from dupers_ray.pipelines.ingest import ingest_binary_files

REF = "/root/reference/testdata"

# /root/reference/internal/mock/mock.go:53-59 (sources :46-52)
GOLDEN = {
    "0vlLaUEvzAWP": "1a1d76a3187ccee147e6c807277273afbad5d2680f5eadf1012310743e148f22",
    "3a9dnxgSVEnJ": "1bdd103eace1a58d2429d447ac551030a9da424056d2d89a77b1366a04f1f1cc",
    "12wZkDDR9CQ0": "c5f338d4057fb107793032de91b264707c3c27bf9970687a78a080a4bf095c26",
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present"
)


def test_golden_digests_of_reference_bucket1():
    from dupers_ray.stages.digest import add_digests

    ds = ingest_binary_files(f"{REF}/bucket1")
    out = ds.map_batches(
        add_digests, fn_kwargs={"content_col": "html"}, batch_format="pyarrow"
    ).to_pandas()
    by_name = {os.path.basename(u): d for u, d in zip(out["url"], out["digest"])}
    for name, want in GOLDEN.items():
        assert by_name[name] == want, name


def test_reference_dupe_scenario():
    """bucket2/CRXFs0KNUCfl duplicates bucket1/CRXFs0KNUCfl (the e2e dupe
    fixture) — the engine must report exactly that cross-bucket pair among
    the regular files."""
    ds = ingest_binary_files([f"{REF}/bucket1", f"{REF}/bucket2"])
    pairs = exact_dupe_pairs(ds, id_col="url", content_col="html").to_pandas()
    names = {
        (os.path.basename(a), os.path.basename(b))
        for a, b in zip(pairs["url"], pairs["match_url"])
    }
    assert ("CRXFs0KNUCfl", "CRXFs0KNUCfl") in names
    # and nothing else among the plain files (the two archive files in
    # bucket1 are unique blobs; zip in bucket2 is distinct)
    plain_dupes = {p for p in names if not p[0].endswith((".zip", ".7z"))}
    assert plain_dupes == {("CRXFs0KNUCfl", "CRXFs0KNUCfl")}


def test_reference_csv_export_roundtrip():
    """testdata/export-bucket1.csv is the reference's golden CSV fixture;
    our importer must accept it and recover one digest per bucket1 file
    listed (io.go:88-123 format)."""
    from dupers_ray.sources.csv_io import import_csv

    bucket, ds = import_csv(f"{REF}/export-bucket1.csv")
    df = ds.to_pandas()
    assert len(df) > 0
    assert df["digest"].str.len().eq(64).all()
    # digests for the three golden files must match mock.go's values
    by_name = {os.path.basename(u): d for u, d in zip(df["url"], df["digest"])}
    for name, want in GOLDEN.items():
        if name in by_name:
            assert by_name[name] == want
