from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.stages.multimodal import (
    ImageDecoder,
    ImageFeaturizer,
    decode_images,
    sample_frames,
)


def _media(n=6):
    return pa.table(
        {
            "media_id": [f"m{i}" for i in range(n)],
            "kind": ["image"] * n,
            "payload": pa.array([f"imgbytes{i}".encode() for i in range(n)], pa.binary()),
            "mime": ["image/jpeg"] * n,
            "width": pa.array([640] * n, pa.int32()),
            "height": pa.array([480] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        }
    )


def test_stub_decoder_raises():
    dec = ImageDecoder(decoder="stub")
    with pytest.raises(NotImplementedError):
        dec(_media())


def test_fake_decode_deterministic_pipeline():
    ds = rd.from_arrow(_media()).repartition(2)
    out = decode_images(ds, decoder="fake", target=(8, 8)).to_pandas()
    assert len(out) == 6
    assert set(out.columns) == {"media_id", "pixels", "mean_intensity"}
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
    # determinism: same payload → same pixels across runs
    out2 = decode_images(rd.from_arrow(_media()), decoder="fake", target=(8, 8)).to_pandas()
    m1 = dict(zip(out["media_id"], out["pixels"]))
    m2 = dict(zip(out2["media_id"], out2["pixels"]))
    assert m1 == m2
    # different payloads → different pixels
    assert m1["m0"] != m1["m1"]


def test_featurizer_shapes():
    ds = rd.from_arrow(_media())
    feats = (
        decode_images(ds, decoder="fake", target=(8, 8))
        .map_batches(ImageFeaturizer, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert len(feats) == 6
    v = np.asarray(feats["embedding"][0])
    assert v.shape == (51,) and v.dtype == np.float32


def test_sample_frames_fanout():
    t = pa.table(
        {
            "media_id": ["v1", "v2"],
            "duration_ms": pa.array([3500, 800], pa.int32()),
            "payload": pa.array([b"vid1", b"vid2"], pa.binary()),
        }
    )
    out = sample_frames(t, every_ms=1000)
    rows = list(zip(out.column("media_id").to_pylist(), out.column("frame_ts_ms").to_pylist()))
    assert rows == [("v1", 0), ("v1", 1000), ("v1", 2000), ("v1", 3000), ("v2", 0)]


def test_png_codec_all_filters_and_color_types():
    """decode_png reconstructs every spec filter type (checked against an
    independent per-pixel reference) and grey/RGBA/palette color types."""
    import struct
    import zlib

    from dupers_ray.functions.png import _SIG, _chunk, decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (21, 13, 3), np.uint8)
    assert (decode_png(encode_png(img)) == img).all()

    h, w, ch = 10, 6, 3
    img2 = rng.integers(0, 256, (h, w, ch), np.uint8)
    flat = img2.reshape(h, w * ch).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)

    rows = []
    for y in range(h):
        f = y % 5
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        cur, filt = flat[y], np.empty(w * ch, np.int32)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b, c = prev[i], (prev[i - ch] if i >= ch else 0)
            pred = [0, a, b, (a + b) // 2, paeth(a, b, c)][f]
            filt[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
    png = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img2).all()

    # palette color type
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (5, 4), np.uint8)
    raw = np.zeros((5, 1 + 4), np.uint8)
    raw[:, 1:] = idx
    png3 = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png3) == pal[idx]).all()

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_decoder_pipeline_real_decode():
    """decoder='png' decodes REAL payloads through the actor-pool stage:
    resized pixels and mean intensity match a driver-side reference."""
    from dupers_ray.functions.png import decode_png, encode_png, resize_nearest

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (24 + i, 17 + i, 3), np.uint8) for i in range(5)]
    t = pa.table(
        {
            "media_id": [f"p{i}" for i in range(5)],
            "kind": ["image"] * 5,
            "payload": pa.array([encode_png(m) for m in imgs], pa.binary()),
            "mime": ["image/png"] * 5,
            "width": pa.array([m.shape[1] for m in imgs], pa.int32()),
            "height": pa.array([m.shape[0] for m in imgs], pa.int32()),
            "duration_ms": pa.array([0] * 5, pa.int32()),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    out = decode_images(ds, decoder="png", target=(8, 8)).to_pandas()
    out = out.set_index("media_id")
    for i, m in enumerate(imgs):
        want = resize_nearest(decode_png(encode_png(m)), 8, 8)
        got = np.frombuffer(out.loc[f"p{i}", "pixels"], np.uint8).reshape(8, 8, 3)
        assert (got == want).all()
        assert abs(out.loc[f"p{i}", "mean_intensity"] - want.mean()) < 1e-9


def test_wav_decode_matches_stdlib_writer():
    """AudioDecoder parses PCM WAV written by the stdlib wave module;
    features match driver-side reference computation."""
    import io
    import wave

    from dupers_ray.stages.multimodal import AudioDecoder, decode_audio

    rng = np.random.default_rng(3)
    rate = 16000
    clips = []
    for i in range(4):
        n = 1000 + 300 * i
        x = (np.sin(2 * np.pi * 440 * (i + 1) * np.arange(n) / rate)
             + 0.1 * rng.standard_normal(n))
        pcm = np.clip(x * 0.5, -1, 1)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes((pcm * 32768).clip(-32768, 32767).astype(np.int16).tobytes())
        clips.append((buf.getvalue(), n))

    t = pa.table(
        {
            "media_id": [f"a{i}" for i in range(4)],
            "kind": ["audio"] * 4,
            "payload": pa.array([c for c, _ in clips], pa.binary()),
            "mime": ["audio/wav"] * 4,
            "width": pa.array([0] * 4, pa.int32()),
            "height": pa.array([0] * 4, pa.int32()),
            "duration_ms": pa.array([0] * 4, pa.int32()),
        }
    )
    out = decode_audio(rd.from_arrow(t).repartition(2)).to_pandas().set_index("media_id")
    for i, (payload, n) in enumerate(clips):
        row = out.loc[f"a{i}"]
        assert row["n_samples"] == n
        assert row["sample_rate"] == rate
        x, r = AudioDecoder._decode_wav(payload)
        assert r == rate and len(x) == n
        assert abs(row["rms"] - np.sqrt(np.mean(x * x))) < 1e-12
        assert 0 < row["spectral_centroid_hz"] < rate / 2

    # stereo → mono mix and 8-bit path
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        st = np.zeros(400, np.int16)
        st[::2] = 1000   # L
        st[1::2] = 3000  # R
        w.writeframes(st.tobytes())
    x, r = AudioDecoder._decode_wav(buf.getvalue())
    assert r == 8000 and len(x) == 200
    assert abs(x[0] - (1000 + 3000) / 2 / 32768) < 1e-12

    with pytest.raises(ValueError):
        AudioDecoder._decode_wav(b"garbage")


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
    level=st.integers(0, 9),
)
def test_png_roundtrip_property(h, w, seed, level):
    """encode→decode is the identity for any RGB image size/content."""
    from dupers_ray.functions.png import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    assert (decode_png(encode_png(img, level=level)) == img).all()


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**32 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=16),
)
def test_png_decode_any_filter_sequence(h, w, seed, filters):
    """decode reconstructs rows filtered with ANY per-row filter choice,
    checked against an independent per-pixel reference encoder."""
    import struct
    import zlib

    from dupers_ray.functions.png import _SIG, _chunk, decode_png

    ch = 3
    img = np.random.default_rng(seed).integers(0, 256, (h, w, ch), np.uint8)
    flat = img.reshape(h, w * ch).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)

    rows = []
    for y in range(h):
        f = filters[y % len(filters)]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        cur, filt = flat[y], np.empty(w * ch, np.int32)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b, c = prev[i], (prev[i - ch] if i >= ch else 0)
            pred = [0, a, b, (a + b) // 2, paeth(a, b, c)][f]
            filt[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
    png = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


# ---------------------------------------------------------------------------
# MP3 frame-header parser (ISO/IEC 11172-3 walk; round-3 verdict #8)
# ---------------------------------------------------------------------------

def _mp3_frame(kbps_idx: int, kbps: int, sr_idx: int, rate: int) -> bytes:
    flen = 144 * kbps * 1000 // rate
    return bytes([0xFF, 0xFB, (kbps_idx << 4) | (sr_idx << 2), 0]) + bytes(flen - 4)


def test_parse_mp3_cbr_and_id3_skip():
    from dupers_ray.stages.multimodal import parse_mp3_frames

    body = _mp3_frame(9, 128, 0, 44100) * 5
    tag = b"ID3" + bytes([3, 0, 0, 0, 0, 0, 20]) + bytes(20)
    m = parse_mp3_frames(tag + body)
    assert m["n_frames"] == 5
    assert m["sample_rate"] == 44100
    assert m["n_samples"] == 5 * 1152
    assert m["duration_ms"] == round(5 * 1152 * 1000 / 44100)
    assert m["bitrate_kbps"] == pytest.approx(128.0)
    assert not m["vbr"]
    assert (m["layer"], m["version"]) == (3, "1")


def test_parse_mp3_vbr_resync_and_truncation():
    from dupers_ray.stages.multimodal import parse_mp3_frames

    # garbage prefix (no sync), alternating 64/128 kbps, truncated tail
    data = (
        bytes([0x00, 0x12, 0x34])
        + _mp3_frame(5, 64, 2, 32000)
        + _mp3_frame(9, 128, 2, 32000)
        + _mp3_frame(5, 64, 2, 32000)
        + _mp3_frame(9, 128, 2, 32000)[:-10]  # truncated final frame
    )
    m = parse_mp3_frames(data)
    assert m["n_frames"] == 3
    assert m["sample_rate"] == 32000
    assert m["vbr"]
    # length-weighted mean over equal-duration frames = plain mean
    assert m["bitrate_kbps"] == pytest.approx((64 + 128 + 64) / 3)
    with pytest.raises(ValueError):
        parse_mp3_frames(b"not audio at all")


def test_mp3_header_parser_stage():
    from dupers_ray.stages.multimodal import Mp3HeaderParser

    tbl = pa.table({
        "media_id": ["a", "b", "c"],
        "payload": pa.array(
            [_mp3_frame(9, 128, 0, 44100) * 4, b"garbage only", None],
            pa.binary(),
        ),
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(Mp3HeaderParser, batch_format="pyarrow",
                     zero_copy_batch=True, concurrency=(1, 2))
        .to_pandas()
        .set_index("media_id")
    )
    assert out.loc["a", "n_frames"] == 4
    assert out.loc["a", "duration_ms_dec"] == round(4 * 1152 * 1000 / 44100)
    assert out.loc["b", "n_frames"] == 0  # hostile input -> zero row, no raise
    assert out.loc["c", "n_frames"] == 0


def test_synth_doc_mp3_matches_arithmetic_oracle():
    from dupers_ray.stages.multimodal import parse_mp3_frames
    from dupers_ray.synth import synth_doc_mp3

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "n_chars": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
    })
    out = synth_doc_mp3(batch)
    for doc_id, nc, payload in zip([0, 1, 2, 3, 4, 5], [10, 11, 12, 13, 14, 15],
                                   out.column("payload").to_pylist()):
        m = parse_mp3_frames(payload)
        assert m["n_frames"] == 3 + nc % 8
        assert m["sample_rate"] == (44100 if doc_id % 2 == 0 else 32000)
        assert m["vbr"] == (doc_id % 3 == 2)
        assert m["n_samples"] == (3 + nc % 8) * 1152
