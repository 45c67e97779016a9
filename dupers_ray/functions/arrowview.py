"""Zero-copy numpy views over Arrow binary columns.

The engine stores fixed-width payloads (MinHash signatures, embedding
vectors) as plain ``binary`` columns — Arrow hash joins and parquet
round-trips handle binary, but not fixed_size_list. Turning those columns
back into (n, w) numpy matrices via ``b"".join(col.to_pylist())`` costs a
Python object per row plus two full copies; for a 600k-doc signature
table that is ~300 MB of driver-side copying per consumer. A uniform-
width binary column's Arrow data buffer already IS the concatenation, so
this helper just reinterprets the buffer (plus an offset-uniformity
check), falling back to the copy path for ragged or null-bearing input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def binary_matrix(col: "pa.ChunkedArray | pa.Array", dtype) -> np.ndarray:
    """(n, w) matrix view of a uniform-width Arrow binary column —
    zero-copy from the Arrow data buffer when the column has no nulls and
    one width; copy fallback otherwise. Rows must be non-empty."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # 0-chunk edge
            col = (
                col.chunk(0)
                if col.num_chunks
                else pa.array([], pa.binary())
            )
    n = len(col)
    dtype = np.dtype(dtype)
    if n == 0:
        return np.empty((0, 0), dtype)
    if col.null_count == 0:
        bufs = col.buffers()
        osize = 8 if pa.types.is_large_binary(col.type) else 4
        otype = np.int64 if osize == 8 else np.int32
        off = np.frombuffer(bufs[1], otype)[col.offset : col.offset + n + 1]
        w = off[1] - off[0]
        if w > 0 and w % dtype.itemsize == 0 and (np.diff(off) == w).all():
            data = np.frombuffer(bufs[2], np.uint8)[off[0] : off[-1]]
            return data.view(dtype).reshape(n, -1)
    flat = np.frombuffer(
        b"".join(v or b"" for v in col.to_pylist()), dtype
    )
    return flat.reshape(n, -1)
