"""Vectorized string/binary <-> (lengths, corpus-blob) conversion via Arrow.

The analog of the reference's DELTA_LENGTH_BYTE_ARRAY decomposition
(lengths stream + concatenated bytes — reference:
EncValuesWriterFactory.java:118-120): Arrow's variable-length layout IS that
decomposition, so we lean on pyarrow buffers instead of per-string Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def to_blob(values: np.ndarray, binary: bool = False) -> tuple[np.ndarray, bytes]:
    """object array of str/bytes -> (int64 lengths, concatenated blob)."""
    typ = pa.large_binary() if binary else pa.large_utf8()
    arr = pa.array(values, type=typ)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
    data_buf = arr.buffers()[2]
    blob = data_buf.to_pybytes() if data_buf is not None else b""
    lengths = np.diff(offsets)
    # arr may not start at offset 0 after slicing; ours never slices, but be safe
    blob = blob[offsets[0] : offsets[-1]]
    return lengths, blob


def arrow_to_lb(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """Arrow string/binary array (null-free) -> (int64 lengths, blob view)
    straight from the Arrow buffers — ZERO per-value Python objects. This is
    the hot-path complement of to_blob: the encode UDF feeds fsst/plain
    directly from the wire representation."""
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.large_utf8())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return np.zeros(len(arr), dtype=np.int64), memoryview(b"")
    blob = memoryview(data_buf)[offsets[0] : offsets[-1]]
    return np.diff(offsets), blob


def lb_to_arrow(lengths: np.ndarray, blob, mask: np.ndarray | None,
                binary: bool = False) -> pa.Array:
    """(dense lengths, blob) + optional notnull mask -> Arrow array (nulls
    reinflated as zero-length slots under a validity bitmap) — zero
    per-value Python objects, the decode-side complement of arrow_to_lb."""
    big = pa.large_binary() if binary else pa.large_utf8()
    if mask is None:
        n = len(lengths)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        arr = pa.Array.from_buffers(
            big, n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)]
        )
    else:
        n = len(mask)
        full = np.zeros(n, dtype=np.int64)
        full[mask] = lengths
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(full, out=offsets[1:])
        validity = pa.py_buffer(np.packbits(mask, bitorder="little").tobytes())
        arr = pa.Array.from_buffers(
            big, n,
            [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
            null_count=int(n - mask.sum()),
        )
    return arr.cast(pa.binary() if binary else pa.string())


def from_blob(lengths: np.ndarray, blob: bytes, binary: bool = False) -> np.ndarray:
    """(lengths, blob) -> numpy object array of str/bytes (zero-copy Arrow build)."""
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    typ = pa.large_binary() if binary else pa.large_utf8()
    arr = pa.Array.from_buffers(
        typ, n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)]
    )
    return arr.to_numpy(zero_copy_only=False)
