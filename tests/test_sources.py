"""CSV round-trip (reference format parity) + archive explode tests."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.sources.archive import classify_mime, explode_archives, sniff_mime
from dupers_ray.sources.csv_io import CSVFormatError, export_csv, import_csv
from dupers_ray.stages.digest import digest_dataset


def test_csv_roundtrip(tmp_path):
    ds = digest_dataset(
        rd.from_items(
            [{"url": "a/x.txt", "text": "hello"}, {"url": "a/y.txt", "text": "world"}]
        )
    )
    p = str(tmp_path / "export.csv")
    n = export_csv(ds, "bucket1", p)
    assert n == 2
    head = open(p).readline().strip()
    assert head == "sha256_sum,path#bucket1"  # io.go:106-117 format
    bucket, back = import_csv(p)
    assert bucket == "bucket1"
    df = back.to_pandas().sort_values("url").reset_index(drop=True)
    orig = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert df["url"].tolist() == orig["url"].tolist()
    assert df["digest"].tolist() == orig["digest"].tolist()
    assert (df["bucket"] == "bucket1").all()


def test_csv_import_rejects_bad(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("wrong_header\nabc,def\n")
    with pytest.raises(CSVFormatError):
        import_csv(str(p))
    p2 = tmp_path / "rows.csv"
    p2.write_text(
        "sha256_sum,path#b\n"
        + "zz" * 32 + ",badhex\n"            # invalid hex → rejected
        + "ab" * 32 + ",good.txt\n"
        + "ab" * 16 + ",short.txt\n"          # wrong length → rejected
    )
    bucket, ds = import_csv(str(p2))
    assert ds.count() == 1
    assert ds.take(1)[0]["url"] == "good.txt"


def _zip_bytes(files: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in files.items():
            z.writestr(name, data)
    return buf.getvalue()


def _tgz_bytes(files: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        for name, data in files.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_sniff_mime():
    assert sniff_mime(_zip_bytes({"a": b"1"})) == "application/zip"
    assert sniff_mime(gzip.compress(b"data")) == "application/gzip"
    assert sniff_mime(b"plain text", "x.txt") is None
    assert sniff_mime(None, "x.zip") == "application/zip"  # extension fallback
    assert sniff_mime(b"", "x.7z") == "application/x-7z-compressed"


def test_explode_archives():
    zb = _zip_bytes({"inner/a.txt": b"AAA", "b.txt": b"BBB"})
    tb = _tgz_bytes({"c.txt": b"CCC"})
    t = pa.table(
        {
            "url": ["arch.zip", "arch.tgz", "plain.txt"],
            "html": pa.array([zb, tb, b"notarchive"], pa.binary()),
        }
    )
    out = explode_archives(t)
    rows = dict(zip(out.column("url").to_pylist(), out.column("html").to_pylist()))
    # path-join keys (dupe.go:665 parity)
    assert rows["arch.zip/inner/a.txt"] == b"AAA"
    assert rows["arch.zip/b.txt"] == b"BBB"
    assert rows["arch.tgz/c.txt"] == b"CCC"
    assert rows["plain.txt"] == b"notarchive"
    m = dict(zip(out.column("url").to_pylist(), out.column("is_member").to_pylist()))
    assert m["arch.zip/b.txt"] is True and m["plain.txt"] is False


def test_explode_corrupt_archive_kept():
    t = pa.table(
        {"url": ["bad.zip"], "html": pa.array([b"PK\x03\x04corrupt"], pa.binary())}
    )
    out = explode_archives(t)
    assert out.num_rows == 1
    assert out.column("archive_error").to_pylist()[0] is not None


def test_nested_archive_not_walked():
    inner_zip = _zip_bytes({"deep.txt": b"DDD"})
    outer = _zip_bytes({"nested.zip": inner_zip})
    t = pa.table({"url": ["o.zip"], "html": pa.array([outer], pa.binary())})
    out = explode_archives(t)
    # one member row: the inner zip as opaque bytes (dupe.go:603 parity)
    assert out.column("url").to_pylist() == ["o.zip/nested.zip"]
    assert out.column("html").to_pylist()[0] == inner_zip


def test_classify_mime_batch():
    t = pa.table(
        {
            "url": ["a.zip", "b.txt"],
            "html": pa.array([_zip_bytes({"x": b"1"}), b"hi"], pa.binary()),
        }
    )
    out = classify_mime(t)
    assert out.column("mime").to_pylist() == ["application/zip", None]
