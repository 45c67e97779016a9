"""Audio fingerprint dedup — spectral-peak hashing over decoded PCM.

The audio analogue of stages/imagehash.py: decode (RIFF/WAV PCM via the
stdlib parser shared with multimodal.AudioDecoder), extract a compact
SAMPLE-RATE-INVARIANT spectral fingerprint, and cluster equal
fingerprints with one groupby. The technique — constellation of
dominant spectral peaks, quantized in Hz — is the public
landmark-hashing idea (Wang 2003, "An Industrial-Strength Audio Search
Algorithm"; Haitsma & Kalker 2002), reduced to a whole-clip hash.

Invariance contract (pytest-pinned): the same tonal content rendered at
DIFFERENT sample rates (8 kHz vs 44.1 kHz), different amplitudes, or
with small additive noise produces the SAME fingerprint, because peaks
are measured in Hz via each clip's own FFT resolution and quantized to
``bin_hz`` bins; byte-level digests (the reference's checksum path,
pkg/dupe/dupe.go:648) catch none of these re-renderings.

Ray-Data shape: ``AudioHasher`` actor pool (decoder + FFT plan state in
``__init__``), corrupt payloads kept with ``decode_error``; equal-hash
clustering is ONE groupby of (fingerprint, id) 16-byte rows — exact
match needs no banding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dupers_ray.functions.hashing import splitmix64


def spectral_fingerprint(
    x: np.ndarray,
    rate: int,
    *,
    n_peaks: int = 4,
    bin_hz: float = 100.0,
    fmin: float = 150.0,
    fmax: float = 4000.0,
) -> int:
    """64-bit fingerprint: the ``n_peaks`` strongest spectral peaks in
    [fmin, fmax], quantized to ``bin_hz`` bins, sorted, and mixed with
    splitmix64. Whole-clip magnitude spectrum (rfft) — for tonal/looped
    content the peak SET is stable across sample rates and gains."""
    if len(x) < 16:
        return 0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
    band = (freqs >= fmin) & (freqs <= min(fmax, rate / 2.0))
    if not band.any():
        return 0
    mag = mag * band  # zero out-of-band bins, keep indexing aligned
    # greedy peak picking with half-bin suppression so one wide peak
    # doesn't claim several slots
    half = max(1, int(round(bin_hz / 2.0 / (freqs[1] - freqs[0]))))
    peaks: list[int] = []
    m = mag.copy()
    for _ in range(n_peaks):
        i = int(np.argmax(m))
        if m[i] <= 0:
            break
        peaks.append(int(round(freqs[i] / bin_hz)))
        m[max(0, i - half) : i + half + 1] = 0.0
    if not peaks:
        return 0
    acc = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for p in sorted(set(peaks)):
            acc = splitmix64(
                np.array([acc ^ np.uint64(p)], np.uint64)
            )[0]
    return int(acc)


class AudioHasher:
    """Actor-pool stage: (id, payload WAV bytes) → (id, fingerprint
    uint64, sample_rate, n_samples, decode_error). Decoder + config
    state built once per actor; corrupt rows kept, never dropped."""

    def __init__(self, *, id_col: str = "media_id", payload_col: str = "payload",
                 n_peaks: int = 4, bin_hz: float = 100.0):
        from dupers_ray.stages.multimodal import AudioDecoder

        self.id_col = id_col
        self.payload_col = payload_col
        self.n_peaks = n_peaks
        self.bin_hz = bin_hz
        self._decode = AudioDecoder._decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        n = len(payloads)
        # int64 VIEW of the 64-bit hash: uint64 groupby keys above 2^63
        # degrade to pickled-object blocks in Ray (see verify skill notes)
        fp = np.zeros(n, np.int64)
        sr = np.zeros(n, np.int32)
        ns = np.zeros(n, np.int64)
        err: list[str | None] = [None] * n
        for i, p in enumerate(payloads):
            try:
                x, rate = self._decode(p or b"")
                f = spectral_fingerprint(
                    x, rate, n_peaks=self.n_peaks, bin_hz=self.bin_hz
                )
                if f == 0:
                    # short/silent/out-of-band clips share the 0 sentinel;
                    # flag them so clustering never merges unrelated
                    # silence into one giant false-dup group (imagehash
                    # applies the same rule to its zero hashes)
                    err[i] = "no_spectral_content"
                fp[i] = np.uint64(f).astype(np.int64)
                sr[i], ns[i] = rate, len(x)
            except Exception as ex:  # noqa: BLE001 — corrupt rows flow on
                err[i] = f"{type(ex).__name__}: {ex}"
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "fingerprint": pa.array(fp),
            "sample_rate": pa.array(sr),
            "n_samples": pa.array(ns),
            "decode_error": pa.array(err, pa.string()),
        })


def hash_audio(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_peaks: int = 4,
    bin_hz: float = 100.0,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    return ds.select_columns([id_col, payload_col]).map_batches(
        AudioHasher,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col,
            "n_peaks": n_peaks, "bin_hz": bin_hz,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_dup_clusters(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_peaks: int = 4,
    bin_hz: float = 100.0,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    """(id, cluster_id = min id sharing the fingerprint) for every
    decodable row. Exact-fingerprint grouping: per-batch partial min
    (combiner) then one groupby over (fingerprint → min_id) — the same
    pre-aggregated shuffle shape as exact_dedup, 16 B/row."""
    import pyarrow.compute as pc

    hashes = hash_audio(
        ds, id_col=id_col, payload_col=payload_col,
        n_peaks=n_peaks, bin_hz=bin_hz, concurrency=concurrency,
    ).materialize()  # consumed twice: group mins + final mapping

    import pyarrow.compute as _pc

    ok = hashes.map_batches(
        lambda t: t.filter(_pc.is_null(t.column("decode_error"))),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def partial_min(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table({
            "fingerprint": t.column("fingerprint"),
            id_col: t.column(id_col),
        }).to_pandas()
        out = df.groupby("fingerprint", sort=False)[id_col].min().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    # one row per DISTINCT fingerprint (bounded by content diversity, not
    # corpus size) — take_all is empty-safe where an arrow-refs concat of
    # a schema-less empty aggregate is not
    agg_col = f"min({id_col})"
    rows = (
        ok.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fingerprint")
        .min(id_col)
        .take_all()
    )
    import ray

    fps = np.array([r["fingerprint"] for r in rows], np.int64)
    cls = np.array([r[agg_col] for r in rows], np.int64)
    order = np.argsort(fps)
    ref = ray.put((fps[order], cls[order]))

    def assign(t: pa.Table) -> pa.Table:
        f, c = ray.get(ref)
        mine = np.asarray(t.column("fingerprint"), dtype=np.int64)
        idx = np.searchsorted(f, mine)
        idx = np.clip(idx, 0, max(len(f) - 1, 0))
        cluster = c[idx] if len(f) else np.zeros(len(mine), np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "cluster_id": pa.array(cluster, pa.int64()),
        })

    return ok.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def encode_wav_pcm16(x: np.ndarray, rate: int) -> bytes:
    """float waveform in [-1, 1] → 16-bit PCM mono RIFF/WAV bytes (the
    inverse of multimodal.AudioDecoder._decode_wav's PCM-16 branch)."""
    import struct

    pcm = np.clip(np.asarray(x, np.float64), -1.0, 1.0)
    raw = (pcm * 32767.0).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
