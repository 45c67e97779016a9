"""From-scratch zstandard (RFC 8878) frame DECODER — stdlib only.

Reference parity: dupers extracts ``.zst`` members via its archive walker
(pkg/dupe/internal/archive/archive.go:42-68; MIME const archive.go:16-33).
This container has no zstandard binding, so the frame format is implemented
directly from the public RFC: frame/block headers, raw/RLE/compressed
blocks, Huffman-coded literals (single- and four-stream, direct and
FSE-compressed weights, treeless repeat), FSE-coded sequences
(predefined/RLE/compressed/repeat table modes), repcode offset history,
and xxHash64 content-checksum verification.

Scope: decode only (the engine never needs to produce .zst), single
segment or windowed frames, no dictionaries. Pure Python — archive member
extraction is a fan-out leaf (sources/archive.py), not a benchmarked hot
path; payloads are member-sized, not corpus-sized.
"""

from __future__ import annotations

__all__ = ["ZstdError", "zstd_decompress", "xxh64"]


class ZstdError(ValueError):
    """Malformed or unsupported zstd data."""


_MASK64 = (1 << 64) - 1
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public one-shot reference algorithm); zstd stores its low
    32 bits as the frame content checksum."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _MASK64
        v2 = (seed + _XXP2) & _MASK64
        v3 = seed & _MASK64
        v4 = (seed - _XXP1) & _MASK64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = _rotl((v + lane * _XXP2) & _MASK64, 31) * _XXP1 & _MASK64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _XXP2) & _MASK64, 31) * _XXP1 & _MASK64)) * _XXP1 + _XXP4) & _MASK64
    else:
        h = (seed + _XXP5) & _MASK64
    h = (h + n) & _MASK64
    while i + 8 <= n:
        k = _rotl(int.from_bytes(data[i : i + 8], "little") * _XXP2 & _MASK64, 31) * _XXP1 & _MASK64
        h = (_rotl(h ^ k, 27) * _XXP1 + _XXP4) & _MASK64
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _XXP1 & _MASK64), 23) * _XXP2 + _XXP3) & _MASK64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _XXP5 & _MASK64), 11) * _XXP1) & _MASK64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _MASK64
    h ^= h >> 29
    h = (h * _XXP3) & _MASK64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------- bitstreams


class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    __slots__ = ("val", "nbits", "pos")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        self.nbits = 8 * len(data)
        self.pos = 0

    def read(self, k: int) -> int:
        v = (self.val >> self.pos) & ((1 << k) - 1)
        self.pos += k
        if self.pos > self.nbits:
            raise ZstdError("FSE header overread")
        return v

    def rewind(self, k: int) -> None:
        self.pos -= k

    @property
    def bytepos(self) -> int:
        return (self.pos + 7) // 8


class _BackBits:
    """Backward bit reader: zstd Huffman/FSE bitstreams are written forward
    and read from the end; the final byte's highest set bit marks the start.
    Reads past the beginning return zero-padded values with pos < 0 (the
    exhaustion signal interleaved FSE decoding relies on)."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("bitstream missing start marker")
        self.val = int.from_bytes(data, "little")
        self.pos = 8 * (len(data) - 1) + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        avail = self.pos + n  # bits that actually existed
        if avail <= 0:
            return 0
        return (self.val & ((1 << avail) - 1)) << (n - avail)

    def peek(self, n: int) -> int:
        if self.pos >= n:
            return (self.val >> (self.pos - n)) & ((1 << n) - 1)
        avail = max(self.pos, 0)
        return (self.val & ((1 << avail) - 1)) << (n - avail)


# ----------------------------------------------------------------------- FSE


def _fse_read_distribution(fwd: _FwdBits, max_accuracy: int) -> tuple[list[int], int]:
    """Normalized count distribution (RFC 8878 §4.1.1): threshold-coded
    probabilities, -1 meaning 'less than 1', 2-bit repeat flags after 0s."""
    accuracy = fwd.read(4) + 5
    if accuracy > max_accuracy:
        raise ZstdError(f"FSE accuracy {accuracy} > {max_accuracy}")
    remaining = 1 << accuracy
    probs: list[int] = []
    while remaining > 0:
        bits = (remaining + 1).bit_length()
        val = fwd.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - (remaining + 1)
        if (val & lower_mask) < threshold:
            fwd.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        p = val - 1
        remaining -= -p if p < 0 else p
        probs.append(p)
        if p == 0:
            rep = fwd.read(2)
            probs.extend([0] * rep)
            while rep == 3:
                rep = fwd.read(2)
                probs.extend([0] * rep)
        if len(probs) > 256:
            raise ZstdError("FSE distribution too long")
    if remaining != 0:
        raise ZstdError("FSE distribution does not sum to table size")
    return probs, accuracy


def _fse_build(probs: list[int], accuracy: int):
    """FSE decode table: (symbol, num_bits, baseline) per state. -1 probs
    get one cell each at the table's end; positive probs spread with the
    standard (size/2 + size/8 + 3) step."""
    size = 1 << accuracy
    sym = [0] * size
    nbits = [0] * size
    base = [0] * size
    state_desc = [0] * len(probs)
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            sym[high] = s
            high -= 1
            state_desc[s] = 1
        elif p > 0:
            state_desc[s] = p
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("corrupt FSE distribution")
    for i in range(size):
        c = state_desc[sym[i]]
        state_desc[sym[i]] = c + 1
        nb = accuracy - (c.bit_length() - 1)
        nbits[i] = nb
        base[i] = (c << nb) - size
    return sym, nbits, base, accuracy


def _fse_rle(symbol: int):
    """Degenerate 1-state table for RLE sequence-table mode."""
    return [symbol], [0], [0], 0


# ------------------------------------------------------------------- Huffman


def _huf_weights_fse(blob: bytes) -> list[int]:
    """FSE-compressed Huffman weights: table description then a backward
    stream decoded by two interleaved states until exhaustion."""
    fwd = _FwdBits(blob)
    probs, accuracy = _fse_read_distribution(fwd, max_accuracy=6)
    sym, nbits, base, _ = _fse_build(probs, accuracy)
    bb = _BackBits(blob[fwd.bytepos :])
    s1 = bb.read(accuracy)
    s2 = bb.read(accuracy)
    weights: list[int] = []
    while True:
        weights.append(sym[s1])
        s1 = base[s1] + bb.read(nbits[s1])
        if bb.pos < 0:
            weights.append(sym[s2])
            break
        weights.append(sym[s2])
        s2 = base[s2] + bb.read(nbits[s2])
        if bb.pos < 0:
            weights.append(sym[s1])
            break
        if len(weights) > 254:
            raise ZstdError("too many Huffman weights")
    return weights


def _huf_build(weights: list[int]):
    """Huffman decode table from explicit weights; the LAST symbol's weight
    is implied (completes the weight sum to a power of two). Table of
    2^max_bits entries filled in (weight asc, symbol asc) order — the
    canonical huff0 layout."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("empty Huffman table")
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("corrupt Huffman weights")
    weights = weights + [left.bit_length()]
    if max_bits > 11:
        raise ZstdError("Huffman max bits > 11")
    size = 1 << max_bits
    table: list[tuple[int, int]] = [(0, 0)] * size
    pos = 0
    for s in sorted(range(len(weights)), key=lambda s: (weights[s], s)):
        w = weights[s]
        if w == 0:
            continue
        span = 1 << (w - 1)
        entry = (s, max_bits + 1 - w)
        for i in range(pos, pos + span):
            table[i] = entry
        pos += span
    if pos != size:
        raise ZstdError("Huffman weights do not fill the table")
    return table, max_bits


def _huf_decode(stream: bytes, table, max_bits: int, out_size: int) -> bytes:
    bb = _BackBits(stream)
    out = bytearray(out_size)
    for i in range(out_size):
        s, nb = table[bb.peek(max_bits)]
        bb.pos -= nb
        out[i] = s
    return bytes(out)


# ------------------------------------------------------------------ literals


def _decode_literals(block: bytes, off: int, ctx: dict) -> tuple[bytes, int]:
    b0 = block[off]
    ltype = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if ltype <= 1:  # Raw / RLE
        if size_fmt in (0, 2):
            rs = b0 >> 3
            off += 1
        elif size_fmt == 1:
            rs = (b0 >> 4) | (block[off + 1] << 4)
            off += 2
        else:
            rs = (b0 >> 4) | (block[off + 1] << 4) | (block[off + 2] << 12)
            off += 3
        if ltype == 0:
            lits = bytes(block[off : off + rs])
            if len(lits) != rs:
                raise ZstdError("truncated raw literals")
            return lits, off + rs
        return bytes(block[off : off + 1]) * rs, off + 1

    # Compressed / Treeless
    if size_fmt == 0:
        h = int.from_bytes(block[off : off + 3], "little")
        rs, cs, n_streams = (h >> 4) & 0x3FF, (h >> 14) & 0x3FF, 1
        off += 3
    elif size_fmt == 1:
        h = int.from_bytes(block[off : off + 3], "little")
        rs, cs, n_streams = (h >> 4) & 0x3FF, (h >> 14) & 0x3FF, 4
        off += 3
    elif size_fmt == 2:
        h = int.from_bytes(block[off : off + 4], "little")
        rs, cs, n_streams = (h >> 4) & 0x3FFF, (h >> 18) & 0x3FFF, 4
        off += 4
    else:
        h = int.from_bytes(block[off : off + 5], "little")
        rs, cs, n_streams = (h >> 4) & 0x3FFFF, (h >> 22) & 0x3FFFF, 4
        off += 5
    blob = bytes(block[off : off + cs])
    if len(blob) != cs:
        raise ZstdError("truncated literals section")
    off += cs

    if ltype == 2:  # new Huffman table
        hb = blob[0]
        if hb < 128:
            weights = _huf_weights_fse(blob[1 : 1 + hb])
            tdesc = 1 + hb
        else:
            n_w = hb - 127
            nbytes = (n_w + 1) // 2
            raw = blob[1 : 1 + nbytes]
            weights = []
            for i in range(n_w):
                weights.append((raw[i // 2] >> 4) if i % 2 == 0 else (raw[i // 2] & 0xF))
            tdesc = 1 + nbytes
        ctx["huf"] = _huf_build(weights)
        blob = blob[tdesc:]
    elif ctx["huf"] is None:
        raise ZstdError("treeless literals without a previous table")
    table, max_bits = ctx["huf"]

    if n_streams == 1:
        return _huf_decode(blob, table, max_bits, rs), off
    if len(blob) < 6:
        raise ZstdError("truncated 4-stream jump table")
    s1 = int.from_bytes(blob[0:2], "little")
    s2 = int.from_bytes(blob[2:4], "little")
    s3 = int.from_bytes(blob[4:6], "little")
    s4 = len(blob) - 6 - s1 - s2 - s3
    if s4 < 0:
        raise ZstdError("corrupt 4-stream jump table")
    part = (rs + 3) // 4
    sizes_out = (part, part, part, rs - 3 * part)
    if sizes_out[3] < 0:
        raise ZstdError("corrupt 4-stream regenerated size")
    pieces, p = [], 6
    for sz_in, sz_out in zip((s1, s2, s3, s4), sizes_out):
        pieces.append(_huf_decode(blob[p : p + sz_in], table, max_bits, sz_out))
        p += sz_in
    return b"".join(pieces), off


# ----------------------------------------------------------------- sequences

# literal-length codes (RFC 8878 §3.1.1.3.2.1.3)
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_EXTRA = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
# match-length codes
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_EXTRA = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# predefined distributions (§3.1.1.3.2.2.1)
_LL_DEFAULT = (
    [4, 3] + [2] * 11 + [1, 1, 1] + [2] * 9 + [3, 2] + [1] * 5 + [-1] * 4,
    6,
)
_ML_DEFAULT = ([1, 4, 3] + [2] * 6 + [1] * 37 + [-1] * 7, 6)
_OF_DEFAULT = ([1] * 6 + [2] * 3 + [1] * 15 + [-1] * 5, 5)


def _seq_table(block: bytes, off: int, mode: int, ctx: dict, key: str, default, max_acc: int, max_sym: int):
    if mode == 0:
        probs, acc = default
        table = _fse_build(probs, acc)
    elif mode == 1:
        symbol = block[off]
        off += 1
        if symbol > max_sym:
            raise ZstdError(f"RLE symbol {symbol} out of range for {key}")
        table = _fse_rle(symbol)
    elif mode == 2:
        fwd = _FwdBits(block[off:])
        probs, acc = _fse_read_distribution(fwd, max_accuracy=max_acc)
        if len(probs) > max_sym + 1:
            raise ZstdError(f"too many symbols in {key} table")
        table = _fse_build(probs, acc)
        off += fwd.bytepos
    else:  # repeat
        table = ctx[key]
        if table is None:
            raise ZstdError(f"repeat mode without a previous {key} table")
    ctx[key] = table
    return table, off


def _decode_sequences(block: bytes, off: int, ctx: dict):
    b0 = block[off]
    if b0 == 0:
        return [], off + 1
    if b0 < 128:
        nseq, off = b0, off + 1
    elif b0 < 255:
        nseq, off = ((b0 - 128) << 8) + block[off + 1], off + 2
    else:
        nseq, off = block[off + 1] + (block[off + 2] << 8) + 0x7F00, off + 3
    modes = block[off]
    off += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    ll_t, off = _seq_table(block, off, modes >> 6, ctx, "seq_ll", _LL_DEFAULT, 9, 35)
    of_t, off = _seq_table(block, off, (modes >> 4) & 3, ctx, "seq_of", _OF_DEFAULT, 8, 31)
    ml_t, off = _seq_table(block, off, (modes >> 2) & 3, ctx, "seq_ml", _ML_DEFAULT, 9, 52)

    bb = _BackBits(block[off:])
    ll_sym, ll_nb, ll_base, ll_acc = ll_t
    of_sym, of_nb, of_base, of_acc = of_t
    ml_sym, ml_nb, ml_base, ml_acc = ml_t
    ll_s = bb.read(ll_acc)
    of_s = bb.read(of_acc)
    ml_s = bb.read(ml_acc)
    seqs = []
    for i in range(nseq):
        of_code = of_sym[of_s]
        ml_code = ml_sym[ml_s]
        ll_code = ll_sym[ll_s]
        # extra bits read in offset, match, literal order (§3.1.1.3.2.1.2)
        of_val = (1 << of_code) + bb.read(of_code)
        ml = _ML_BASE[ml_code] + bb.read(_ML_EXTRA[ml_code])
        ll = _LL_BASE[ll_code] + bb.read(_LL_EXTRA[ll_code])
        seqs.append((ll, of_val, ml))
        if i != nseq - 1:  # LL, then ML, then OF state updates
            ll_s = ll_base[ll_s] + bb.read(ll_nb[ll_s])
            ml_s = ml_base[ml_s] + bb.read(ml_nb[ml_s])
            of_s = of_base[of_s] + bb.read(of_nb[of_s])
            if bb.pos < 0:
                raise ZstdError("sequence bitstream exhausted early")
    return seqs, len(block)


def _exec_sequences(seqs, lits: bytes, out: bytearray, reps: list[int]) -> None:
    lpos = 0
    for ll, of_val, ml in seqs:
        if ll:
            out += lits[lpos : lpos + ll]
            lpos += ll
        if of_val > 3:
            dist = of_val - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = dist
        else:
            idx = of_val - 1 if ll != 0 else of_val
            if idx == 0:
                dist = reps[0]
            elif idx == 1:
                dist = reps[1]
                reps[1] = reps[0]
                reps[0] = dist
            elif idx == 2:
                dist = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = dist
            else:  # of_val == 3 with ll == 0: rep1 - 1
                dist = reps[0] - 1
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = dist
        if dist <= 0 or dist > len(out):
            raise ZstdError("match offset out of window")
        start = len(out) - dist
        if ml <= dist:
            out += out[start : start + ml]
        else:  # overlap: the last `dist` bytes repeat with period `dist`
            seg = bytes(out[start:])
            q, r = divmod(ml, dist)
            out += seg * q + seg[:r]
    out += lits[lpos:]


# -------------------------------------------------------------- frame decode


def _decode_block(block: bytes, ctx: dict, reps: list[int], out: bytearray) -> None:
    lits, off = _decode_literals(block, 0, ctx)
    seqs, _ = _decode_sequences(block, off, ctx)
    if seqs:
        _exec_sequences(seqs, lits, out, reps)
    else:
        out += lits


def zstd_decompress(data: bytes) -> bytes:
    """Decode one or more concatenated zstd frames (skippable frames are
    skipped); verifies frame content size and xxh64 content checksum when
    present. Raises ZstdError on malformed or dictionary-requiring input."""
    out_all = bytearray()
    off = 0
    n = len(data)
    while off < n:
        if off + 4 > n:
            raise ZstdError("truncated frame magic")
        magic = int.from_bytes(data[off : off + 4], "little")
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            size = int.from_bytes(data[off + 4 : off + 8], "little")
            off += 8 + size
            continue
        if magic != 0xFD2FB528:
            raise ZstdError(f"bad magic {magic:#x}")
        off += 4
        fhd = data[off]
        off += 1
        if fhd & 0x08:
            raise ZstdError("reserved frame-header bit set")
        single = (fhd >> 5) & 1
        if not single:
            off += 1  # window descriptor — decoding in memory, size unused
        did_bytes = (0, 1, 2, 4)[fhd & 3]
        if int.from_bytes(data[off : off + did_bytes], "little"):
            raise ZstdError("dictionaries not supported")
        off += did_bytes
        fcs_flag = fhd >> 6
        fcs_bytes = (1 if single else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_bytes:
            fcs = int.from_bytes(data[off : off + fcs_bytes], "little")
            off += fcs_bytes
            if fcs_bytes == 2:
                fcs += 256

        # per-frame decode state: repeatable FSE/Huffman tables + repcodes
        ctx = {"huf": None, "seq_ll": None, "seq_of": None, "seq_ml": None}
        reps = [1, 4, 8]
        out = bytearray()
        while True:
            if off + 3 > n:
                raise ZstdError("truncated block header")
            bh = int.from_bytes(data[off : off + 3], "little")
            off += 3
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                if off + bsize > n:
                    raise ZstdError("truncated raw block")
                out += data[off : off + bsize]
                off += bsize
            elif btype == 1:  # RLE: bsize is the REGENERATED size
                out += data[off : off + 1] * bsize
                off += 1
            elif btype == 2:
                block = data[off : off + bsize]
                if len(block) != bsize:
                    raise ZstdError("truncated compressed block")
                off += bsize
                _decode_block(block, ctx, reps, out)
            else:
                raise ZstdError("reserved block type")
            if bh & 1:
                break
        if fcs is not None and len(out) != fcs:
            raise ZstdError(f"content size mismatch: {len(out)} != {fcs}")
        if (fhd >> 2) & 1:  # content checksum
            want = int.from_bytes(data[off : off + 4], "little")
            off += 4
            if xxh64(bytes(out)) & 0xFFFFFFFF != want:
                raise ZstdError("content checksum mismatch")
        out_all += out
    return bytes(out_all)
