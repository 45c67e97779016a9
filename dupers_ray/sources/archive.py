"""Archive classification + member explode — dupers' `up+` verbs.

Reference: pkg/dupe/internal/archive/archive.go:42-153 classifies by
extension map and magic bytes (MIME/Extension/ReadMIME); dupe.go:604-799
(WalkArchiver/Read7Zip/Read) walks archives and hashes every member, keyed
``join(archivePath, member)`` (dupe.go:665,776). Archives nested inside
archives are intentionally NOT walked (dupe.go:603) — same here.

Engine: a 1→N ``map_batches`` fan-out over binary payload rows. ZIP/TAR/
GZ/BZ2/XZ use the stdlib; 7z uses the from-scratch stdlib-only reader in
sources/sevenzip.py (Read7Zip parity, dupe.go:648-693 — archives using
unsupported 7z features flow through with ``archive_error`` set); zstd
(.zst / .tar.zst) uses the from-scratch RFC 8878 decoder in
sources/zstd_codec.py; RAR5 uses the from-scratch header reader in
sources/rar5.py (stored members extracted with CRC checks; members using
the proprietary RAR compression flow through with ``archive_error``).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import posixpath
import tarfile
import zipfile

import pyarrow as pa
import pyarrow.compute as pc

# magic-byte table (subset of archive.go:16-33's 14 MIME consts)
_MAGICS: list[tuple[bytes, str]] = [
    (b"PK\x03\x04", "application/zip"),
    (b"PK\x05\x06", "application/zip"),          # empty zip
    (b"\x1f\x8b", "application/gzip"),
    (b"7z\xbc\xaf\x27\x1c", "application/x-7z-compressed"),
    (b"BZh", "application/x-bzip2"),
    (b"\xfd7zXZ\x00", "application/x-xz"),
    (b"Rar!\x1a\x07", "application/vnd.rar"),
    (b"\x28\xb5\x2f\xfd", "application/zstd"),
    (b"ustar", "application/x-tar"),             # at offset 257, handled below
]

_EXT_MIME = {
    ".zip": "application/zip", ".gz": "application/gzip", ".tgz": "application/gzip",
    ".7z": "application/x-7z-compressed", ".bz2": "application/x-bzip2",
    ".xz": "application/x-xz", ".rar": "application/vnd.rar",
    ".zst": "application/zstd", ".tar": "application/x-tar",
}

EXTRACTABLE = {
    "application/zip", "application/gzip", "application/x-bzip2",
    "application/x-xz", "application/x-tar", "application/x-7z-compressed",
    "application/zstd", "application/vnd.rar",
}


_MAX_MAGIC = 8  # longest prefix any magic needs


def _sniff_parts(
    prefix: bytes | None, tar_mark: bytes | None, length: int | None, name: str,
) -> str | None:
    if prefix:
        for magic, mime in _MAGICS:
            if mime == "application/x-tar":
                continue
            if prefix[: len(magic)] == magic:
                return mime
        if length is not None and length > 262 and tar_mark == b"ustar":
            return "application/x-tar"
    ext = posixpath.splitext((name or "").lower())[1]
    return _EXT_MIME.get(ext)


def sniff_mime(data: bytes | None, name: str = "") -> str | None:
    """Magic-byte sniff with extension fallback (archive.go MIME +
    Extension semantics: content wins, extension breaks ties)."""
    if data is None:
        return _sniff_parts(None, None, None, name)
    return _sniff_parts(data[:_MAX_MAGIC], data[257:262], len(data), name)


def _sniff_column(batch: pa.Table, content_col: str, name_col: str) -> list[str | None]:
    """Per-row MIME without materializing payloads: only 8-byte prefixes,
    the 5-byte tar mark, lengths and names cross into Python — the payload
    bytes stay in the Arrow buffer (100-TB ingest is mostly non-archives)."""
    col = batch.column(content_col)
    prefixes = pc.binary_slice(col, 0, _MAX_MAGIC).to_pylist()
    tar_marks = pc.binary_slice(col, 257, 262).to_pylist()
    lengths = pc.binary_length(col).to_pylist()
    names = batch.column(name_col).to_pylist()
    return [
        _sniff_parts(p, t, ln, n or "")
        for p, t, ln, n in zip(prefixes, tar_marks, lengths, names)
    ]


def classify_mime(
    batch: pa.Table, *, content_col: str = "html", name_col: str = "url",
    out_col: str = "mime",
) -> pa.Table:
    mimes = _sniff_column(batch, content_col, name_col)
    return batch.append_column(out_col, pa.array(mimes, pa.string()))


def _members(data: bytes, mime: str, name: str) -> list[tuple[str, bytes]]:
    """Extract (member_name, member_bytes). One level only — members that
    are themselves archives are returned as opaque bytes (dupe.go:603)."""
    if mime == "application/zip":
        out = []
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            for info in z.infolist():
                if info.is_dir():
                    continue
                out.append((info.filename, z.read(info)))
        return out
    if mime == "application/x-tar":
        out = []
        with tarfile.open(fileobj=io.BytesIO(data)) as t:
            for m in t.getmembers():
                if not m.isfile():
                    continue
                f = t.extractfile(m)
                if f is not None:
                    out.append((m.name, f.read()))
        return out
    if mime == "application/gzip":
        inner = gzip.decompress(data)
        if len(inner) > 262 and inner[257:262] == b"ustar":  # .tar.gz
            return _members(inner, "application/x-tar", name)
        base = posixpath.basename(name)
        stem = base[:-3] if base.lower().endswith(".gz") else base + ".out"
        return [(stem, inner)]
    if mime == "application/x-bzip2":
        return [(posixpath.basename(name) + ".out", bz2.decompress(data))]
    if mime == "application/x-xz":
        inner = lzma.decompress(data)
        if len(inner) > 262 and inner[257:262] == b"ustar":  # .tar.xz
            return _members(inner, "application/x-tar", name)
        return [(posixpath.basename(name) + ".out", inner)]
    if mime == "application/x-7z-compressed":
        from dupers_ray.sources.sevenzip import read_7z_members

        return read_7z_members(data)
    if mime == "application/zstd":
        from dupers_ray.sources.zstd_codec import zstd_decompress

        inner = zstd_decompress(data)
        if len(inner) > 262 and inner[257:262] == b"ustar":  # .tar.zst
            return _members(inner, "application/x-tar", name)
        base = posixpath.basename(name)
        stem = base[:-4] if base.lower().endswith(".zst") else base + ".out"
        return [(stem, inner)]
    if mime == "application/vnd.rar":
        from dupers_ray.sources.rar5 import read_rar5_members

        return read_rar5_members(data)
    raise ValueError(f"unsupported archive mime {mime!r}")


def explode_archives(
    batch: pa.Table, *, content_col: str = "html", name_col: str = "url",
) -> pa.Table:
    """1→N fan-out: archive rows become one row per member with
    ``url = join(archive_url, member)`` (dupe.go:665,776 path-join parity);
    non-archive rows pass through unchanged. Failed extractions keep the
    original row with ``archive_error`` set (never drop data silently).
    Output: (url, content: binary, is_member: bool, archive_error).

    Non-archive rows (the overwhelming majority of a web corpus) never
    cross into Python — they are mask-filtered in Arrow and re-emitted
    with constant metadata columns; only rows whose magic/extension says
    "archive" are materialized for extraction. Output row order is
    pass-through rows then member rows (no order contract)."""
    mimes = _sniff_column(batch, content_col, name_col)
    lengths = pc.binary_length(batch.column(content_col)).to_pylist()
    is_arch = pa.array(
        [m in EXTRACTABLE and bool(ln) for m, ln in zip(mimes, lengths)],
        pa.bool_(),
    )
    plain = batch.filter(pc.invert(is_arch))
    plain_out = pa.table(
        {
            name_col: plain.column(name_col).cast(pa.string()),
            content_col: plain.column(content_col).cast(pa.binary()),
            "is_member": pa.array([False] * plain.num_rows, pa.bool_()),
            "archive_error": pa.nulls(plain.num_rows, pa.string()),
        }
    )
    arch = batch.filter(is_arch)
    if arch.num_rows == 0:
        return plain_out
    urls_out: list[str] = []
    content_out: list[bytes | None] = []
    member_out: list[bool] = []
    err_out: list[str | None] = []
    arch_mimes = [m for m, keep in zip(mimes, is_arch.to_pylist()) if keep]
    datas = arch.column(content_col).to_pylist()
    names = arch.column(name_col).to_pylist()
    for data, name, mime in zip(datas, names, arch_mimes):
        try:
            members = _members(data, mime, name or "")
        except Exception as ex:  # noqa: BLE001 — corrupt archives flow on
            urls_out.append(name)
            content_out.append(data)
            member_out.append(False)
            err_out.append(f"{type(ex).__name__}: {ex}")
            continue
        for mname, mdata in members:
            urls_out.append(posixpath.join(name or "", mname))
            content_out.append(mdata)
            member_out.append(True)
            err_out.append(None)
    exploded = pa.table(
        {
            name_col: pa.array(urls_out, pa.string()),
            content_col: pa.array(content_out, pa.binary()),
            "is_member": pa.array(member_out, pa.bool_()),
            "archive_error": pa.array(err_out, pa.string()),
        }
    )
    return pa.concat_tables([plain_out, exploded])
