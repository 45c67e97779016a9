"""Audio fingerprint dedup (stages/audiohash.py): rate/gain/noise
invariance of the spectral fingerprint, discrimination, and the
actor-pool cluster pipeline end-to-end over synthetic WAV payloads."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.stages.audiohash import (
    audio_dup_clusters,
    encode_wav_pcm16,
    hash_audio,
    spectral_fingerprint,
)


def _tone(freqs, rate, dur=0.5, amp=0.2):
    t = np.arange(int(rate * dur)) / rate
    return sum(amp * np.sin(2 * np.pi * f * t) for f in freqs)


FREQS_A = [300.0, 700.0, 1200.0, 2500.0]
FREQS_B = [400.0, 900.0, 1500.0, 2800.0]


def test_fingerprint_rate_and_gain_invariant():
    a8 = spectral_fingerprint(_tone(FREQS_A, 8000), 8000)
    a44 = spectral_fingerprint(_tone(FREQS_A, 44100), 44100)
    a_quiet = spectral_fingerprint(_tone(FREQS_A, 16000, amp=0.01), 16000)
    assert a8 == a44 == a_quiet != 0


def test_fingerprint_noise_robust():
    rng = np.random.default_rng(0)
    x = _tone(FREQS_A, 8000)
    noisy = x + rng.standard_normal(len(x)) * 0.01
    assert spectral_fingerprint(noisy, 8000) == spectral_fingerprint(x, 8000)


def test_fingerprint_discriminates():
    a = spectral_fingerprint(_tone(FREQS_A, 8000), 8000)
    b = spectral_fingerprint(_tone(FREQS_B, 8000), 8000)
    # one moved peak also changes the hash
    c = spectral_fingerprint(_tone([300.0, 700.0, 1200.0, 2600.0], 8000), 8000)
    assert len({a, b, c}) == 3


def test_wav_roundtrip():
    from dupers_ray.stages.multimodal import AudioDecoder

    x = _tone(FREQS_A, 8000)
    y, rate = AudioDecoder._decode_wav(encode_wav_pcm16(x, 8000))
    assert rate == 8000 and len(y) == len(x)
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization only


def test_audio_dup_clusters_end_to_end():
    payloads = [
        encode_wav_pcm16(_tone(FREQS_A, 8000), 8000),          # 0
        encode_wav_pcm16(_tone(FREQS_A, 44100, amp=0.1), 44100),  # 1: re-render of 0
        encode_wav_pcm16(_tone(FREQS_B, 16000), 16000),        # 2
        b"not audio",                                           # 3
    ]
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })).repartition(2)

    hashes = hash_audio(ds, id_col="media_id", concurrency=2).to_pandas()
    hashes = hashes.set_index("media_id").sort_index()
    assert hashes.loc[3, "decode_error"] is not None
    assert hashes.loc[0, "fingerprint"] == hashes.loc[1, "fingerprint"]
    assert hashes.loc[0, "fingerprint"] != hashes.loc[2, "fingerprint"]

    out = audio_dup_clusters(ds, id_col="media_id", concurrency=2)
    got = out.to_pandas().set_index("media_id").sort_index()
    assert len(got) == 3  # corrupt row excluded
    assert got.loc[0, "cluster_id"] == got.loc[1, "cluster_id"] == 0
    assert got.loc[2, "cluster_id"] == 2


def test_silent_and_short_clips_never_cluster_together():
    """Zero-fingerprint clips (silence, <16 samples, out-of-band) are
    flagged no_spectral_content and EXCLUDED from clustering — they must
    not merge into one giant false-dup group."""
    silent = encode_wav_pcm16(np.zeros(4000), 8000)
    tiny = encode_wav_pcm16(np.zeros(4), 8000)
    real = encode_wav_pcm16(_tone(FREQS_A, 8000), 8000)
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(range(3), pa.int64()),
        "payload": pa.array([silent, tiny, real], pa.binary()),
    }))
    h = hash_audio(ds, id_col="media_id", concurrency=1).to_pandas()
    h = h.set_index("media_id")
    assert h.loc[0, "decode_error"] == "no_spectral_content"
    assert h.loc[1, "decode_error"] == "no_spectral_content"
    assert h.loc[2, "decode_error"] is None
    got = audio_dup_clusters(ds, id_col="media_id", concurrency=1).to_pandas()
    assert got["media_id"].tolist() == [2]


def test_all_corrupt_input_yields_empty_not_crash():
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([b"junk", b"more junk"], pa.binary()),
    }))
    got = audio_dup_clusters(ds, id_col="media_id", concurrency=1)
    assert got.count() == 0
