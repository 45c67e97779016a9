"""From-scratch baseline JPEG codec (functions/jpeg.py): round-trip
fidelity, structural invariants that would catch a mirrored
encoder/decoder bug, subsampling, restart markers, and typed errors."""
from __future__ import annotations

import numpy as np
import pytest

from dupers_ray.functions.jpeg import (
    ZIGZAG,
    BadJpeg,
    UnsupportedJpeg,
    _dct2,
    _idct2,
    decode_jpeg,
    encode_jpeg,
)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-checks (T.81 Figure 5): first diagonal and last entries
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_dct_orthonormal_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 8, 8))
    assert np.allclose(_idct2(_dct2(x)), x, atol=1e-12)


def test_solid_colors_exact():
    # DC-only path: any solid color must survive bit-exact
    for color in ((0, 0, 0), (255, 255, 255), (200, 50, 90)):
        img = np.zeros((16, 24, 3), np.uint8)
        img[...] = color
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(out.astype(int) - np.array(color)).max() <= 1


def test_grayscale_roundtrip():
    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.tile(x, (32, 1))
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (32, 64, 3)
    err = np.abs(out[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 2
    # grayscale decodes with identical channels
    assert np.array_equal(out[..., 0], out[..., 1])


def test_noise_roundtrip_quality_bound():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 56, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 8.0  # lossy, but must stay in JPEG-typical range


def test_odd_sizes_and_subsampling():
    rng = np.random.default_rng(2)
    for shape in ((1, 1, 3), (7, 9, 3), (17, 33, 3)):
        img = rng.integers(0, 256, shape, np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
            assert out.shape == shape


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    for sub in ("444", "420"):
        a = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        b = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling=sub, restart_interval=3)
        )
        assert np.array_equal(a, b)


def test_higher_quality_is_closer():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    errs = []
    for q in (30, 60, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]


def test_typed_errors():
    with pytest.raises(BadJpeg):
        decode_jpeg(b"")
    with pytest.raises(BadJpeg):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    blob = encode_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(BadJpeg):
        decode_jpeg(blob[: len(blob) // 2])
    # progressive marker -> Unsupported
    prog = bytearray(blob)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg(bytes(prog))


def test_decoder_survives_mutations():
    rng = np.random.default_rng(5)
    blob = encode_jpeg(
        rng.integers(0, 256, (24, 24, 3), np.uint8), quality=80
    )
    for _ in range(60):
        kind = rng.integers(0, 3)
        if kind == 0:
            mutant = blob[: rng.integers(0, len(blob))]
        elif kind == 1:
            m = bytearray(blob)
            m[rng.integers(0, len(blob))] ^= 1 << rng.integers(0, 8)
            mutant = bytes(m)
        else:
            i = int(rng.integers(0, len(blob)))
            mutant = blob[:i] + bytes(rng.integers(0, 256, 8, np.uint8)) + blob[i:]
        try:
            out = decode_jpeg(mutant)
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass  # BadJpeg/UnsupportedJpeg are ValueErrors — the contract


def test_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code; the decoder must skip them, not misparse 0xFF as a marker."""
    import numpy as np

    from dupers_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.linspace(0, 255, 24 * 16 * 3).reshape(24, 16, 3).astype(np.uint8)
    data = encode_jpeg(img, quality=90)
    assert data[:2] == b"\xff\xd8"
    padded = data[:2] + b"\xff" * 3 + data[2:]
    a = decode_jpeg(data)
    b = decode_jpeg(padded)
    assert (a == b).all()
