"""Minimal from-scratch 7z reader (stdlib only — no py7zr in this env).

Implements the subset of the public 7z format (7zFormat.txt, shipped with
7-Zip / p7zip) needed to enumerate and extract members for hashing:

- signature + start header, ENCODED next headers (kEncodedHeader)
- streams info: kPackInfo / kUnpackInfo (folders) / kSubStreamsInfo
- single-coder folders with Copy, LZMA1, LZMA2, Deflate or BZip2 coders
  (decoded with lzma/zlib/bz2 raw modes)
- files info: names (UTF-16LE), empty-stream/empty-file bit vectors

Anything else (AES encryption, BCJ/delta filter chains, multi-coder
folders, external streams) raises :class:`Unsupported7z` — callers keep
the archive row intact with ``archive_error`` set, never dropping data.

Reference parity: dupers ``Read7Zip`` (pkg/dupe/dupe.go:648-693) hashes
every member keyed ``join(archivePath, member)`` (dupe.go:665); its
conformance fixture is testdata/randomfiles.7z. The engine's
tests/test_sources.py extracts that fixture and checks the member bytes
equal the sibling randomfiles.tar.xz file byte-for-byte.
"""

from __future__ import annotations

import bz2
import io
import lzma
import struct
import zlib

SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_ARCHIVE_PROPS = 0x02
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17
_K_DUMMY = 0x19


class Bad7z(ValueError):
    """Malformed archive."""


class Unsupported7z(ValueError):
    """Valid 7z using features outside this reader's subset."""


def _read_number(f: io.BytesIO) -> int:
    """7z variable-length uint64 (first-byte mask encoding)."""
    b0 = f.read(1)
    if not b0:
        raise Bad7z("truncated number")
    first = b0[0]
    mask = 0x80
    value = 0
    for i in range(8):
        if not (first & mask):
            value |= (first & (mask - 1)) << (8 * i)
            return value
        nxt = f.read(1)
        if not nxt:
            raise Bad7z("truncated number")
        value |= nxt[0] << (8 * i)
        mask >>= 1
    return value


def _read_bitvector(f: io.BytesIO, n: int) -> list[bool]:
    out: list[bool] = []
    mask, b = 0, 0
    for _ in range(n):
        if mask == 0:
            b = f.read(1)[0]
            mask = 0x80
        out.append(bool(b & mask))
        mask >>= 1
    return out


def _read_optional_bitvector(f: io.BytesIO, n: int) -> list[bool]:
    all_defined = f.read(1)[0]
    if all_defined:
        return [True] * n
    return _read_bitvector(f, n)


class _Coder:
    __slots__ = ("codec", "props", "nin", "nout")

    def __init__(self, codec: bytes, props: bytes, nin: int, nout: int):
        self.codec, self.props, self.nin, self.nout = codec, props, nin, nout


class _Folder:
    __slots__ = (
        "coders", "bind_pairs", "packed_indices", "unpack_sizes", "crc_defined"
    )

    def __init__(self):
        self.coders: list[_Coder] = []
        self.bind_pairs: list[tuple[int, int]] = []
        self.packed_indices: list[int] = []
        self.unpack_sizes: list[int] = []
        self.crc_defined = False

    @property
    def num_packed(self) -> int:
        total_in = sum(c.nin for c in self.coders)
        return total_in - len(self.bind_pairs)

    def output_size(self) -> int:
        # the folder's final output is the out-stream not consumed by a
        # bind pair; with a single coder that's its only output
        consumed = {o for _, o in self.bind_pairs}
        for i, sz in enumerate(self.unpack_sizes):
            if i not in consumed:
                return sz
        raise Bad7z("folder has no unbound output")


def _read_folder(f: io.BytesIO) -> _Folder:
    folder = _Folder()
    num_coders = _read_number(f)
    for _ in range(num_coders):
        flags = f.read(1)[0]
        id_size = flags & 0x0F
        codec = f.read(id_size)
        nin = nout = 1
        if flags & 0x10:  # complex coder
            nin = _read_number(f)
            nout = _read_number(f)
        props = b""
        if flags & 0x20:
            props = f.read(_read_number(f))
        if flags & 0x80:
            raise Unsupported7z("alternative coder methods")
        folder.coders.append(_Coder(codec, props, nin, nout))
    total_out = sum(c.nout for c in folder.coders)
    for _ in range(total_out - 1):
        folder.bind_pairs.append((_read_number(f), _read_number(f)))
    num_packed = sum(c.nin for c in folder.coders) - len(folder.bind_pairs)
    if num_packed > 1:
        for _ in range(num_packed):
            folder.packed_indices.append(_read_number(f))
    return folder


def _parse_streams_info(f: io.BytesIO) -> dict:
    """kPackInfo / kUnpackInfo / kSubStreamsInfo → dict with pack_pos,
    pack_sizes, folders, substream counts+sizes."""
    info: dict = {"pack_pos": 0, "pack_sizes": [], "folders": [],
                  "num_unpack_streams": None, "substream_sizes": None}
    while True:
        pid = _read_number(f)
        if pid == _K_END:
            break
        if pid == _K_PACK_INFO:
            info["pack_pos"] = _read_number(f)
            num_pack = _read_number(f)
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                if sub == _K_SIZE:
                    info["pack_sizes"] = [_read_number(f) for _ in range(num_pack)]
                elif sub == _K_CRC:
                    defined = _read_optional_bitvector(f, num_pack)
                    f.read(4 * sum(defined))
                else:
                    raise Bad7z(f"unexpected id {sub:#x} in PackInfo")
        elif pid == _K_UNPACK_INFO:
            if _read_number(f) != _K_FOLDER:
                raise Bad7z("expected kFolder")
            num_folders = _read_number(f)
            if f.read(1)[0] != 0:
                raise Unsupported7z("external folder definitions")
            folders = [_read_folder(f) for _ in range(num_folders)]
            if _read_number(f) != _K_UNPACK_SIZE:
                raise Bad7z("expected kCodersUnpackSize")
            for folder in folders:
                n_out = sum(c.nout for c in folder.coders)
                folder.unpack_sizes = [_read_number(f) for _ in range(n_out)]
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                if sub == _K_CRC:
                    defined = _read_optional_bitvector(f, num_folders)
                    f.read(4 * sum(defined))
                    # remembered so SubStreamsInfo kCRC can count exactly the
                    # streams whose CRC is still unknown (7zFormat.txt: a
                    # 1-stream folder with a defined folder CRC gets none)
                    for folder, dfn in zip(folders, defined):
                        folder.crc_defined = dfn
                else:
                    raise Bad7z(f"unexpected id {sub:#x} in UnpackInfo")
            info["folders"] = folders
        elif pid == _K_SUBSTREAMS:
            folders = info["folders"]
            nums = [1] * len(folders)
            sizes: list[int] = []
            digests_read = False
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                if sub == _K_NUM_UNPACK_STREAM:
                    nums = [_read_number(f) for _ in range(len(folders))]
                elif sub == _K_SIZE:
                    # per folder: n-1 explicit sizes, last = remainder
                    for folder, n in zip(folders, nums):
                        if n == 0:
                            continue
                        explicit = [_read_number(f) for _ in range(n - 1)]
                        sizes.extend(explicit)
                        sizes.append(folder.output_size() - sum(explicit))
                elif sub == _K_CRC:
                    # digests exist only for streams whose CRC is unknown:
                    # every stream of an n!=1 folder, plus 1-stream folders
                    # WITHOUT a folder CRC from UnpackInfo (7zFormat.txt).
                    # CRC values are unused here, only the byte count matters.
                    n_undigested = sum(
                        n for folder, n in zip(folders, nums)
                        if not (n == 1 and folder.crc_defined)
                    )
                    defined = _read_optional_bitvector(f, n_undigested)
                    f.read(4 * sum(defined))
                    digests_read = True
                else:
                    raise Bad7z(f"unexpected id {sub:#x} in SubStreamsInfo")
            info["num_unpack_streams"] = nums
            info["substream_sizes"] = sizes if sizes else None
            _ = digests_read
        else:
            raise Bad7z(f"unexpected id {pid:#x} in StreamsInfo")
    return info


_LZMA2_DICT = {
    40: 0xFFFFFFFF,
}


def _lzma2_dict_size(p: int) -> int:
    if p > 40:
        raise Bad7z("bad LZMA2 dict property")
    if p == 40:
        return 0xFFFFFFFF
    return (2 | (p & 1)) << (p // 2 + 11)


def _decode_folder(folder: _Folder, packed: bytes) -> bytes:
    if len(folder.coders) != 1:
        raise Unsupported7z(
            f"multi-coder folder ({len(folder.coders)} coders, e.g. BCJ/AES)"
        )
    coder = folder.coders[0]
    out_size = folder.output_size()
    cid = coder.codec
    if cid == b"\x00":  # Copy
        return packed[:out_size]
    if cid == b"\x03\x01\x01":  # LZMA1
        if len(coder.props) < 5:
            raise Bad7z("short LZMA1 props")
        d = coder.props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        dict_size = struct.unpack("<I", coder.props[1:5])[0]
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
                      "dict_size": max(dict_size, 1 << 12)}],
        )
        return dec.decompress(packed, max_length=out_size)
    if cid == b"\x21":  # LZMA2
        if len(coder.props) < 1:
            raise Bad7z("short LZMA2 props")
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2,
                      "dict_size": max(_lzma2_dict_size(coder.props[0]), 1 << 12)}],
        )
        return dec.decompress(packed, max_length=out_size)
    if cid == b"\x04\x01\x08":  # Deflate
        return zlib.decompressobj(-15).decompress(packed, out_size)
    if cid == b"\x04\x02\x02":  # BZip2
        return bz2.decompress(packed)[:out_size]
    raise Unsupported7z(f"coder {cid.hex()}")


def _parse_files_info(f: io.BytesIO) -> list[dict]:
    num_files = _read_number(f)
    files = [{"name": None, "empty_stream": False, "empty_file": False}
             for _ in range(num_files)]
    empty_streams: list[bool] = [False] * num_files
    while True:
        pid = _read_number(f)
        if pid == _K_END:
            break
        size = _read_number(f)
        block = io.BytesIO(f.read(size))
        if pid == _K_EMPTY_STREAM:
            empty_streams = _read_bitvector(block, num_files)
            for fi, e in zip(files, empty_streams):
                fi["empty_stream"] = e
        elif pid == _K_EMPTY_FILE:
            n_empty = sum(empty_streams)
            bits = _read_bitvector(block, n_empty)
            j = 0
            for fi in files:
                if fi["empty_stream"]:
                    fi["empty_file"] = bits[j]
                    j += 1
        elif pid == _K_NAME:
            if block.read(1)[0] != 0:
                raise Unsupported7z("external names")
            raw = block.read()
            names = raw.decode("utf-16-le").split("\x00")
            for fi, name in zip(files, names):
                fi["name"] = name.replace("\\", "/")
        else:
            pass  # mtime/attributes/dummy — not needed for hashing parity
    return files


def read_7z_members(data: bytes) -> list[tuple[str, bytes]]:
    """All (member_name, member_bytes) of an in-memory 7z archive.

    Total over untrusted bytes: any low-level parse failure (struct
    underrun, index error, decoder error) surfaces as :class:`Bad7z`, so
    callers need only catch the two typed errors (the fuzz contract —
    reference analogue: archive_fuzz.go feeds arbitrary bytes)."""
    try:
        return _read_7z_members_checked(data)
    except (Bad7z, Unsupported7z):
        raise
    except Exception as ex:  # noqa: BLE001 — corrupt input, typed re-raise
        raise Bad7z(f"corrupt archive: {type(ex).__name__}: {ex}") from ex


def _read_7z_members_checked(data: bytes) -> list[tuple[str, bytes]]:
    if data[:6] != SIGNATURE:
        raise Bad7z("bad signature")
    nh_off, nh_size = struct.unpack("<QQ", data[12:28])
    header = data[32 + nh_off : 32 + nh_off + nh_size]
    if len(header) != nh_size:
        raise Bad7z("truncated next header")
    f = io.BytesIO(header)
    pid = _read_number(f)
    if pid == _K_ENCODED_HEADER:
        info = _parse_streams_info(f)
        folders = info["folders"]
        if len(folders) != 1:
            raise Unsupported7z("multi-folder encoded header")
        base = 32 + info["pack_pos"]
        packed = data[base : base + info["pack_sizes"][0]]
        f = io.BytesIO(_decode_folder(folders[0], packed))
        pid = _read_number(f)
    if pid != _K_HEADER:
        raise Bad7z(f"expected kHeader, got {pid:#x}")

    streams: dict | None = None
    files: list[dict] = []
    while True:
        pid = _read_number(f)
        if pid == _K_END:
            break
        if pid == _K_ARCHIVE_PROPS:
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                f.read(_read_number(f))
        elif pid == _K_MAIN_STREAMS:
            streams = _parse_streams_info(f)
        elif pid == _K_FILES_INFO:
            files = _parse_files_info(f)
        else:
            raise Unsupported7z(f"header section {pid:#x}")

    # decode folders → concatenated substream bytes
    substreams: list[bytes] = []
    if streams is not None and streams["folders"]:
        folders = streams["folders"]
        nums = streams["num_unpack_streams"] or [1] * len(folders)
        sizes = streams["substream_sizes"]
        pack_sizes = streams["pack_sizes"]
        offset = 32 + streams["pack_pos"]
        pack_idx = 0
        size_idx = 0
        for folder, n_sub in zip(folders, nums):
            n_packed = folder.num_packed
            if n_packed != 1:
                raise Unsupported7z("folder with multiple packed streams")
            packed = data[offset : offset + pack_sizes[pack_idx]]
            offset += pack_sizes[pack_idx]
            pack_idx += 1
            if n_sub == 0:
                # folder output feeds no file: appending it would shift every
                # later member onto the wrong bytes (silent corruption)
                continue
            out = _decode_folder(folder, packed)
            if n_sub == 1:
                substreams.append(out)
                if sizes is not None:
                    size_idx += 1
            else:
                pos = 0
                for _ in range(n_sub):
                    sz = sizes[size_idx]
                    size_idx += 1
                    substreams.append(out[pos : pos + sz])
                    pos += sz

    out_members: list[tuple[str, bytes]] = []
    k = 0
    for fi in files:
        name = fi["name"] or f"member{k}"
        if fi["empty_stream"]:
            if fi["empty_file"]:
                out_members.append((name, b""))
            # else: directory entry — skip (dupers hashes files only)
            continue
        if k >= len(substreams):
            raise Bad7z("more files than substreams")
        out_members.append((name, substreams[k]))
        k += 1
    return out_members
