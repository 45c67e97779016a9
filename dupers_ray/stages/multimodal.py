"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

Decode kernels: ``decoder="png"`` / ``"jpeg"`` / ``"auto"`` are REAL
decodes via the from-scratch codecs (functions/png.py — zlib + spec
filters; functions/jpeg.py — baseline-sequential T.81; "auto"
dispatches on the payload magic); ``decoder="stub"`` raises
NotImplementedError (the honest production default for formats needing
external codecs — webp/avif/ffmpeg video); ``decoder="fake"`` produces a
DETERMINISTIC pseudo-decode from the payload bytes so the Ray-side
plumbing — schemas, batch sizing, actor signatures, output layout — is
testable without fixtures. Swapping in PIL/ffmpeg later only replaces
the kernel inside ``__init__``-loaded state.

Batch-size note (SURVEY.md §7.4): payload rows are WIDE — callers should
pass small ``batch_size`` (default 64) and let blocks hold few rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),    # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),       # metadata as crawled (may be 0/unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_decode_image(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes → (h, w, 3) uint8 via
    sha256-seeded tiling. Same payload → same pixels, any process."""
    seed = np.frombuffer(hashlib.sha256(payload).digest(), np.uint8)
    reps = int(np.ceil(h * w * 3 / len(seed)))
    return np.tile(seed, reps)[: h * w * 3].reshape(h, w, 3)


class ImageDecoder:
    """Actor-pool stage: payload → fixed-size decoded tensor + stats.

    Output: (media_id, pixels: binary of h*w*3 uint8, mean_intensity).
    State (decoder choice, target size) loads once per actor."""

    def __init__(self, *, decoder: str = "stub", target: tuple[int, int] = (32, 32)):
        if decoder not in ("stub", "fake", "png", "jpeg", "auto"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if decoder in ("png", "jpeg", "auto"):
            # kernel state loaded once per actor; "auto" dispatches on the
            # payload magic (PNG vs baseline JPEG — both from-scratch
            # codecs: functions/png.py, functions/jpeg.py)
            from dupers_ray.functions.png import decode_png, resize_nearest
            from dupers_ray.functions.jpeg import decode_jpeg
            from dupers_ray.stages.imagehash import _decode_any

            self._decode = {
                "png": decode_png, "jpeg": decode_jpeg, "auto": _decode_any,
            }[decoder]
            self._resize = resize_nearest
        self.decoder = decoder
        self.h, self.w = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "external codec formats (webp/avif/video) are not available "
                "in this environment; construct ImageDecoder(decoder='auto') "
                "for real PNG + baseline-JPEG decode, or decoder='fake' for "
                "deterministic plumbing tests"
            )
        payloads = batch.column("payload").to_pylist()
        pixels = []
        means = np.empty(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            if self.decoder == "fake":
                img = _fake_decode_image(p or b"", self.h, self.w)
            else:
                img = self._resize(self._decode(p or b""), self.h, self.w)
            pixels.append(img.tobytes())
            means[i] = float(img.mean())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "pixels": pa.array(pixels, pa.binary()),
                "mean_intensity": pa.array(means),
            }
        )


class ImageFeaturizer:
    """Actor-pool stage: decoded pixels → feature vector (channel-mean +
    16-bin histogram = 51 float32s). Fully batch-vectorized: the
    fixed-size pixel payloads view zero-copy as an (n, h*w*3) matrix
    (functions/arrowview), channel means are one mean over axis 1, and
    all n×3 histograms come from ONE bincount over a composite
    (row, channel, bin) index. Bin index (v*16)//255 clipped to 15 is
    exactly np.histogram(bins=16, range=(0, 255)) (edges i*15.9375 are
    binary-exact), so outputs are bit-identical to the per-row version."""

    DIM = 3 + 48

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dupers_ray.functions.arrowview import binary_matrix

        n = batch.num_rows
        if n == 0:
            flat = np.empty(0, np.float32)
        else:
            px = binary_matrix(batch.column("pixels"), np.uint8)
            px = px.reshape(n, -1, 3)
            chan_mean = (px.astype(np.float32).mean(axis=1) / 255.0)  # (n, 3)
            binidx = np.minimum(
                (px.astype(np.uint32) * 16) // 255, 15
            )  # (n, pix, 3)
            row = np.arange(n, dtype=np.int64)[:, None, None]
            chan = np.arange(3, dtype=np.int64)[None, None, :]
            composite = (row * 3 + chan) * 16 + binidx
            hist = np.bincount(
                composite.reshape(-1), minlength=n * 48
            ).reshape(n, 48)
            histf = hist.astype(np.float32)
            histf /= np.maximum(1.0, histf.sum(axis=1, keepdims=True))
            flat = np.concatenate(
                [chan_mean.astype(np.float32), histf], axis=1
            ).reshape(-1)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), self.DIM)
        return pa.table({"media_id": batch.column("media_id"), "embedding": emb})


# MPEG audio frame-header tables (ISO/IEC 11172-3 §2.4.2.3 and the
# MPEG-2/2.5 LSF extensions) — written from the public spec, the same
# from-scratch precedent as functions/jpeg.py (T.81). Index 0 = "free"
# and 15 = reserved in the bitrate tables (treated invalid here).
_MP3_BITRATES = {
    # (version_key, layer): kbps by 4-bit index; version_key 1 = MPEG1,
    # 2 = MPEG2/2.5 (they share tables)
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
}
_MP3_RATES = {  # by version bits (00=2.5, 10=2, 11=1) then 2-bit index
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def parse_mp3_frames(data: bytes) -> dict:
    """From-scratch MPEG-1/2/2.5 Layer I/II/III frame-header walk: skips a
    leading ID3v2 tag (syncsafe size), then steps frame to frame via the
    spec's frame-length formula, resyncing on garbage. Returns real
    container metadata — the PCM decode (Huffman + IMDCT + synthesis
    filterbank) stays a declared boundary, like RAR compressed members
    (sources/rar5.py): header metadata is honest decode, audio
    fingerprints require WAV.

    Output keys: n_frames, sample_rate, n_samples, duration_ms,
    bitrate_kbps (length-weighted mean, so VBR is averaged), vbr (bool),
    layer (1/2/3), version ('1' | '2' | '2.5')."""
    pos, n = 0, len(data)
    # ID3v2: "ID3" ver(2) flags(1) size(4 syncsafe)
    if n >= 10 and data[:3] == b"ID3":
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    frames = 0
    samples = 0
    dur_ms = 0.0
    br_sum = 0.0
    br_seen: set[int] = set()
    sr0 = 0
    layer0 = 0
    ver0 = ""
    while pos + 4 <= n:
        b0, b1, b2 = data[pos], data[pos + 1], data[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            pos += 1  # resync
            continue
        ver_bits = (b1 >> 3) & 0x3       # 00=2.5, 01=reserved, 10=2, 11=1
        layer_bits = (b1 >> 1) & 0x3     # 01=III, 10=II, 11=I
        if ver_bits == 1 or layer_bits == 0:
            pos += 1
            continue
        layer = 4 - layer_bits           # 1/2/3
        vkey = 1 if ver_bits == 3 else 2
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if sr_idx == 3:
            pos += 1
            continue
        kbps = _MP3_BITRATES[(vkey, layer)][br_idx]
        if kbps == 0:  # free-format / reserved — not walkable
            pos += 1
            continue
        rate = _MP3_RATES[ver_bits][sr_idx]
        if layer == 1:
            flen = (12 * kbps * 1000 // rate + padding) * 4
            spf = 384
        else:
            spf = 576 if (layer == 3 and vkey == 2) else 1152
            flen = spf // 8 * kbps * 1000 // rate + padding
        if flen <= 4 or pos + flen > n:
            break  # truncated final frame: stop, keep what we have
        if frames == 0:
            sr0, layer0 = rate, layer
            ver0 = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
        elif rate != sr0 or layer != layer0:
            break  # stream property change — treat as end of this stream
        frames += 1
        samples += spf
        dur_ms += spf * 1000.0 / rate
        br_sum += kbps * (spf * 1000.0 / rate)
        br_seen.add(kbps)
        pos += flen
    if frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "n_frames": frames,
        "sample_rate": sr0,
        "n_samples": samples,
        "duration_ms": int(round(dur_ms)),
        "bitrate_kbps": br_sum / dur_ms if dur_ms else 0.0,
        "vbr": len(br_seen) > 1,
        "layer": layer0,
        "version": ver0,
    }


class Mp3HeaderParser:
    """Actor-pool stage: MP3 payload → real container metadata via
    :func:`parse_mp3_frames`. Output: (media_id, n_frames, sample_rate,
    n_samples, duration_ms_dec, bitrate_kbps, vbr, layer, mpeg_version);
    unparseable payloads yield n_frames 0 (never a raise mid-stream —
    crawled audio is hostile input)."""

    def __init__(self, *, id_col: str = "media_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nf = np.zeros(n, np.int64)
        sr = np.zeros(n, np.int32)
        ns = np.zeros(n, np.int64)
        dur = np.zeros(n, np.int32)
        br = np.zeros(n, np.float64)
        vbr = np.zeros(n, bool)
        layer = np.zeros(n, np.int32)
        ver = [""] * n
        for i, p in enumerate(batch.column("payload").to_pylist()):
            try:
                m = parse_mp3_frames(p or b"")
            except ValueError:
                continue
            nf[i], sr[i], ns[i] = m["n_frames"], m["sample_rate"], m["n_samples"]
            dur[i], br[i], vbr[i] = m["duration_ms"], m["bitrate_kbps"], m["vbr"]
            layer[i], ver[i] = m["layer"], m["version"]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_frames": pa.array(nf),
            "sample_rate": pa.array(sr),
            "n_samples": pa.array(ns),
            "duration_ms_dec": pa.array(dur),
            "bitrate_kbps": pa.array(br),
            "vbr": pa.array(vbr),
            "layer": pa.array(layer),
            "mpeg_version": pa.array(ver, pa.string()),
        })


class AudioDecoder:
    """Actor-pool stage: WAV payload → waveform features. REAL decode for
    PCM WAV (RIFF parse + numpy frombuffer — stdlib-only, like the PNG
    codec); ``decoder="stub"`` raises for compressed formats (mp3/ogg need
    external codecs). Output: (media_id, n_samples, sample_rate,
    duration_ms_dec, rms, zero_cross_rate, spectral_centroid_hz).

    Feature kernels are vectorized numpy (FFT for the centroid); state
    (decoder choice, fft size) loads once per actor."""

    def __init__(self, *, decoder: str = "wav", n_fft: int = 2048):
        if decoder not in ("wav", "stub"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.n_fft = n_fft

    @staticmethod
    def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
        """RIFF/WAVE PCM (8/16/32-bit int, float32) → (mono float64 in
        [-1, 1], sample_rate)."""
        import struct

        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, fmt, raw = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + sz]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                raw = body
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if fmt is None or raw is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt, n_ch, rate, _, _, bits = fmt
        if audio_fmt == 1:  # integer PCM
            dt = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
            if dt is None:
                raise ValueError(f"unsupported PCM width {bits}")
            x = np.frombuffer(raw, dt).astype(np.float64)
            if bits == 8:
                x = (x - 128.0) / 128.0
            else:
                x = x / float(2 ** (bits - 1))
        elif audio_fmt == 3 and bits == 32:  # IEEE float
            x = np.frombuffer(raw, np.float32).astype(np.float64)
        else:
            raise ValueError(f"unsupported WAV format code {audio_fmt}")
        if n_ch > 1:
            x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
        return x, rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "compressed-audio PCM decode (Huffman+IMDCT) is a declared "
                "boundary; PCM WAV decodes for real via "
                "AudioDecoder(decoder='wav'), and MP3 container metadata "
                "(frames/rate/duration/bitrate) parses for real via "
                "Mp3HeaderParser (ISO 11172-3 frame-header walk)"
            )
        n = batch.num_rows
        ns = np.zeros(n, np.int64)
        sr = np.zeros(n, np.int32)
        dur = np.zeros(n, np.int32)
        rms = np.zeros(n, np.float64)
        zcr = np.zeros(n, np.float64)
        cent = np.zeros(n, np.float64)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            x, rate = self._decode_wav(p or b"")
            ns[i], sr[i] = len(x), rate
            if not len(x):
                continue
            dur[i] = int(len(x) * 1000 / rate)
            rms[i] = float(np.sqrt(np.mean(x * x)))
            zcr[i] = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) if len(x) > 1 else 0.0
            w = x[: self.n_fft]
            mag = np.abs(np.fft.rfft(w, self.n_fft))
            freqs = np.fft.rfftfreq(self.n_fft, 1.0 / rate)
            tot = mag.sum()
            cent[i] = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_samples": pa.array(ns),
                "sample_rate": pa.array(sr),
                "duration_ms_dec": pa.array(dur),
                "rms": pa.array(rms),
                "zero_cross_rate": pa.array(zcr),
                "spectral_centroid_hz": pa.array(cent),
            }
        )


def decode_audio(
    ds: "ray.data.Dataset",
    *,
    decoder: str = "wav",
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Audio analogue of decode_images: actor pool, small batches."""
    return ds.map_batches(
        AudioDecoder,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def sample_frames(
    batch: pa.Table, *, every_ms: int = 1000
) -> pa.Table:
    """Video stage: 1→N fan-out of frame-sample rows (media_id, frame_ts_ms,
    payload) based on duration metadata. The frame EXTRACTION is the stub
    (payload passed through); the fan-out plumbing is real and vectorized
    (repeat counts + arange-minus-group-start, the same gather trick as
    the shingle windower; Arrow take for the variable-width columns)."""
    import pyarrow.compute as pc

    durs = np.asarray(
        pc.fill_null(batch.column("duration_ms"), 0).to_numpy(
            zero_copy_only=False
        ),
        np.int64,
    )
    counts = (np.maximum(durs, 1) + every_ms - 1) // every_ms
    total = int(counts.sum())
    rep = np.repeat(np.arange(len(durs), dtype=np.int64), counts)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    frame_ix = np.arange(total, dtype=np.int64) - starts
    idx = pa.array(rep)
    return pa.table(
        {
            "media_id": batch.column("media_id").take(idx),
            "frame_ts_ms": pa.array((frame_ix * every_ms).astype(np.int32)),
            "payload": batch.column("payload").take(idx),
        }
    )


def decode_images(
    ds: "ray.data.Dataset",
    *,
    decoder: str = "stub",
    target: tuple[int, int] = (32, 32),
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Wide-payload stage: SMALL batch_size, actor pool (decoder state per
    actor), zero-copy Arrow in/out."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"decoder": decoder, "target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
