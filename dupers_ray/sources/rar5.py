"""Minimal from-scratch RAR5 reader (stdlib only — no rarfile/unrar here).

Implements the subset of the public RAR 5.0 archive format (rarlab.com
"technote" — the format spec is public; the RAR *compression algorithm*
is not) needed to enumerate and extract members for hashing:

- signature ``Rar!\\x1a\\x07\\x01\\x00`` + vint-framed block headers with
  per-header CRC32 validation
- main / file / service / end-of-archive block traversal
- **stored** members (compression method 0) extracted with data-CRC32
  verification; directories skipped

Anything outside that subset — RAR-compressed members (proprietary
algorithm), encryption, split volumes, RAR4 archives — raises
:class:`UnsupportedRar`; callers keep the archive row intact with
``archive_error`` set, never dropping data silently.

Reference parity: dupers extracts rar via its archives library
(pkg/dupe/internal/archive/archive.go:24,81 maps ``.rar`` ↔
``application/vnd.rar``; dupe.go:604-646 walks members keyed
``join(archivePath, member)``). This engine reaches parity for stored
members and surfaces an explicit, typed error for compressed ones.
"""

from __future__ import annotations

import io
import struct
import zlib

SIGNATURE = b"Rar!\x1a\x07\x01\x00"
_SIGNATURE_RAR4 = b"Rar!\x1a\x07\x00"

# block types (technote §"General archive structure")
_T_MAIN = 1
_T_FILE = 2
_T_SERVICE = 3
_T_CRYPT = 4
_T_END = 5

# generic header flags
_HF_EXTRA = 0x01
_HF_DATA = 0x02
_HF_SPLIT_BEFORE = 0x08
_HF_SPLIT_AFTER = 0x10

# file header flags
_FF_DIRECTORY = 0x01
_FF_MTIME = 0x02
_FF_CRC32 = 0x04


class BadRar(ValueError):
    """Malformed archive."""


class UnsupportedRar(ValueError):
    """Valid RAR using features outside this reader's subset."""


def _read_vint(f: io.BytesIO) -> int:
    """Little-endian base-128 varint, low 7 bits per byte, high bit
    continues (technote §"vint")."""
    result = 0
    for shift in range(0, 70, 7):
        b = f.read(1)
        if not b:
            raise BadRar("truncated vint")
        result |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return result
    raise BadRar("vint too long")


def _read_u32(f: io.BytesIO) -> int:
    b = f.read(4)
    if len(b) != 4:
        raise BadRar("truncated uint32")
    return struct.unpack("<I", b)[0]


def read_rar5_members(data: bytes) -> list[tuple[str, bytes]]:
    """Enumerate (member_name, member_bytes) from a RAR5 archive.

    Stored (method-0) members only; the proprietary RAR compression is
    not implemented, so any compressed member raises
    :class:`UnsupportedRar` and the caller records ``archive_error``.
    """
    if data[: len(_SIGNATURE_RAR4)] == _SIGNATURE_RAR4 and data[: len(SIGNATURE)] != SIGNATURE:
        raise UnsupportedRar("RAR4 archive (only the RAR5 format is supported)")
    if data[: len(SIGNATURE)] != SIGNATURE:
        raise BadRar("not a RAR5 archive")
    f = io.BytesIO(data)
    f.seek(len(SIGNATURE))
    members: list[tuple[str, bytes]] = []
    saw_end = False
    while not saw_end:
        head = f.read(1)
        if not head:
            break  # no end-of-archive block; tolerate like a truncated tail
        f.seek(-1, io.SEEK_CUR)
        header_crc = _read_u32(f)
        size_start = f.tell()
        header_size = _read_vint(f)
        size_vint = data[size_start : f.tell()]
        header_data = f.read(header_size)
        if len(header_data) != header_size:
            raise BadRar("truncated block header")
        # the CRC covers the header-size vint itself plus the header data
        # (technote "Header CRC32"; matches libarchive/rarfile)
        if zlib.crc32(size_vint + header_data) != header_crc:
            raise BadRar("block header CRC mismatch")
        h = io.BytesIO(header_data)
        btype = _read_vint(h)
        bflags = _read_vint(h)
        _read_vint(h) if bflags & _HF_EXTRA else 0
        data_size = _read_vint(h) if bflags & _HF_DATA else 0
        if btype == _T_CRYPT:
            raise UnsupportedRar("encrypted archive")
        if btype == _T_END:
            saw_end = True
        elif btype == _T_FILE:
            if bflags & (_HF_SPLIT_BEFORE | _HF_SPLIT_AFTER):
                raise UnsupportedRar("split (multi-volume) file")
            file_flags = _read_vint(h)
            unpacked_size = _read_vint(h)
            _read_vint(h)  # attributes
            if file_flags & _FF_MTIME:
                _read_u32(h)
            data_crc = _read_u32(h) if file_flags & _FF_CRC32 else None
            comp_info = _read_vint(h)
            _read_vint(h)  # host OS
            name_len = _read_vint(h)
            name_b = h.read(name_len)
            if len(name_b) != name_len:
                raise BadRar("truncated file name")
            name = name_b.decode("utf-8", errors="replace")
            payload = f.read(data_size)
            if len(payload) != data_size:
                raise BadRar("truncated file data")
            if file_flags & _FF_DIRECTORY:
                continue
            method = (comp_info >> 7) & 0x07
            if method != 0:
                raise UnsupportedRar(
                    f"member {name!r} uses RAR compression method {method} "
                    "(proprietary algorithm; only stored members are supported)"
                )
            if len(payload) != unpacked_size:
                raise BadRar(f"stored member {name!r} size mismatch")
            if data_crc is not None and zlib.crc32(payload) != data_crc:
                raise BadRar(f"member {name!r} data CRC mismatch")
            members.append((name, payload))
        else:
            # main / service / unknown-skippable blocks: skip their data
            f.seek(data_size, io.SEEK_CUR)
    return members
