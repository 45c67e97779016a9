"""From-scratch zstd decoder (sources/zstd_codec.py) — reference parity for
the archive walker's .zst handling (pkg/dupe/internal/archive/archive.go:42-68).

Three layers: pinned binary fixtures produced by the real `zstd` CLI (work
without the binary present), live CLI roundtrips across levels when the
binary exists, and structural edge cases (multi-frame, skippable frames,
checksum verification, dictionary rejection)."""

from __future__ import annotations

import io
import os
import random
import shutil
import struct
import subprocess
import tarfile

import pyarrow as pa
import pytest

from dupers_ray.sources.zstd_codec import ZstdError, xxh64, zstd_decompress

DATA = os.path.join(os.path.dirname(__file__), "data", "zstd")
HAVE_CLI = shutil.which("zstd") is not None


def _gen_text(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    words = ["the", "quick", "brown", "fox", "zstd", "frame", "block", "entropy",
             "sequence", "literal", "offset", "match", "huffman", "fse"]
    out, total = [], 0
    while total < n:
        w = rng.choice(words)
        out.append(w)
        total += len(w) + 1
    return (" ".join(out)).encode()[:n]


def _gen_bytes(seed: int, n: int) -> bytes:
    return random.Random(seed).randbytes(n)


def _gen_low_entropy(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    return bytes(bytearray(rng.choice(b"abcdef") for _ in range(n)))


# --------------------------------------------------------------- pinned CLI fixtures

FIXTURES = {
    # fname -> expected payload (regenerated deterministically, not committed)
    "text_19.zst": _gen_text(1, 20000),        # FSE weights + sequences, level 19
    "rand_1.zst": _gen_bytes(2, 4096),         # incompressible -> raw blocks
    "lowent_19.zst": _gen_low_entropy(3, 50000),  # 4-stream Huffman literals
    "text_3.zst": _gen_text(4, 3000),          # small, level 3
}


@pytest.mark.parametrize("fname", sorted(FIXTURES))
def test_fixture_decode(fname):
    comp = open(os.path.join(DATA, fname), "rb").read()
    assert zstd_decompress(comp) == FIXTURES[fname]


def test_fixture_tar_zst_explode():
    """explode_archives walks .tar.zst members with path-join keys
    (dupe.go:665 parity), one level only."""
    from dupers_ray.sources.archive import explode_archives

    comp = open(os.path.join(DATA, "members.tar.zst"), "rb").read()
    batch = pa.table({"url": ["bucket/members.tar.zst"], "html": [comp]})
    out = explode_archives(batch)
    rows = {u: c for u, c in zip(out.column("url").to_pylist(),
                                 out.column("html").to_pylist())}
    assert rows == {
        "bucket/members.tar.zst/docs/a.txt": _gen_text(5, 1000),
        "bucket/members.tar.zst/docs/b.bin": _gen_bytes(6, 500),
    }
    assert out.column("archive_error").to_pylist() == [None, None]


def test_single_file_zst_explode():
    """A bare .zst (not a tar) explodes to one member named by stripping
    the suffix — the gzip convention the reference's walker mirrors."""
    from dupers_ray.sources.archive import explode_archives

    comp = open(os.path.join(DATA, "text_3.zst"), "rb").read()
    batch = pa.table({"url": ["b/notes.txt.zst"], "html": [comp]})
    out = explode_archives(batch)
    assert out.column("url").to_pylist() == ["b/notes.txt.zst/notes.txt"]
    assert out.column("html").to_pylist() == [FIXTURES["text_3.zst"]]


# ------------------------------------------------------------------ xxh64


def test_xxh64_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"a", seed=1) != xxh64(b"a")
    # exercises every length branch: 32-byte stripes + 8/4/1 tails
    blob = bytes(range(256)) * 3 + b"tail"
    assert xxh64(blob) == xxh64(bytes(blob))


# ------------------------------------------------------------- structure


def test_multi_frame_and_skippable():
    f1 = open(os.path.join(DATA, "text_3.zst"), "rb").read()
    skippable = struct.pack("<II", 0x184D2A50, 5) + b"extra"
    assert (
        zstd_decompress(f1 + skippable + f1)
        == FIXTURES["text_3.zst"] * 2
    )


def test_checksum_mismatch_detected():
    comp = bytearray(open(os.path.join(DATA, "text_19.zst"), "rb").read())
    assert comp[4] & 0x04, "fixture must carry a content checksum"
    comp[-1] ^= 0xFF  # flip checksum bits
    with pytest.raises(ZstdError, match="checksum"):
        zstd_decompress(bytes(comp))


def test_bad_magic_and_truncation():
    with pytest.raises(ZstdError):
        zstd_decompress(b"\x00\x01\x02\x03\x04")
    good = open(os.path.join(DATA, "text_3.zst"), "rb").read()
    with pytest.raises(ZstdError):
        zstd_decompress(good[: len(good) // 2])


def test_dictionary_frames_rejected():
    # hand-built frame header with Dictionary_ID_flag = 1 and dict id 7
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x21, 0x07])
    with pytest.raises(ZstdError, match="dictionar"):
        zstd_decompress(frame)


def test_rle_and_raw_blocks():
    """Hand-built frame: raw block + RLE block (RLE block_size is the
    REGENERATED size, data is one byte)."""
    fhd = bytes([0x20])  # single-segment, FCS flag 0 -> 1-byte FCS
    fcs = bytes([13])
    raw = struct.pack("<I", (5 << 3) | (0 << 1) | 0)[:3] + b"hello"
    rle = struct.pack("<I", (8 << 3) | (1 << 1) | 1)[:3] + b"z"
    frame = struct.pack("<I", 0xFD2FB528) + fhd + fcs + raw + rle
    assert zstd_decompress(frame) == b"hello" + b"z" * 8


# ----------------------------------------------------------- live CLI sweep


@pytest.mark.skipif(not HAVE_CLI, reason="zstd CLI not on PATH")
@pytest.mark.parametrize("level", ["-1", "-3", "-9", "-19"])
def test_cli_roundtrip_levels(level):
    payloads = [
        b"",
        b"a",
        b"hello world " * 200,
        _gen_bytes(42, 100),
        _gen_bytes(43, 70000),
        b"the quick brown fox jumps over the lazy dog. " * 3000,
        _gen_low_entropy(44, 50000),
        b"\x00" * 131072,
    ]
    for p in payloads:
        comp = subprocess.run(
            ["zstd", level, "-c"], input=p, capture_output=True, check=True
        ).stdout
        assert zstd_decompress(comp) == p


@pytest.mark.skipif(not HAVE_CLI, reason="zstd CLI not on PATH")
def test_cli_roundtrip_fuzz():
    """Seeded mixed-structure payloads across levels — exercises repcodes,
    treeless literals, and table-repeat modes that only multi-block frames
    produce."""
    rng = random.Random(7)
    for trial in range(12):
        parts = []
        for _ in range(rng.randint(1, 6)):
            kind = rng.randrange(4)
            n = rng.randint(0, 40000)
            if kind == 0:
                parts.append(rng.randbytes(n))
            elif kind == 1:
                parts.append(bytes([rng.randrange(256)]) * n)
            elif kind == 2:
                parts.append(_gen_text(rng.randrange(1 << 30), n))
            else:
                parts.append(_gen_low_entropy(rng.randrange(1 << 30), n))
        payload = b"".join(parts)
        lvl = rng.choice(["-1", "-5", "-12", "-19", "-22"])
        args = ["zstd", lvl, "-c"] + (["--ultra"] if lvl == "-22" else [])
        comp = subprocess.run(args, input=payload, capture_output=True, check=True).stdout
        assert zstd_decompress(comp) == payload, f"trial {trial} lvl {lvl} n={len(payload)}"


@pytest.mark.skipif(not HAVE_CLI, reason="zstd CLI not on PATH")
def test_cli_tar_zst_large_roundtrip():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        for i in range(20):
            data = _gen_text(100 + i, 5000)
            info = tarfile.TarInfo(f"f{i:02d}.txt")
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    comp = subprocess.run(
        ["zstd", "-15", "-c"], input=buf.getvalue(), capture_output=True, check=True
    ).stdout
    from dupers_ray.sources.archive import explode_archives

    out = explode_archives(pa.table({"url": ["x.tar.zst"], "html": [comp]}))
    assert out.num_rows == 20
    assert out.column("html").to_pylist()[3] == _gen_text(103, 5000)
