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
