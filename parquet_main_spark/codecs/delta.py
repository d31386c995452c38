"""Delta codec for int64 / timestamps: zigzag deltas, FOR-bit-packed.

Analog of the reference's DELTA_BINARY_PACKED selection for INT32/INT64
(reference: EncValuesWriterFactory.java:150-152,163-165; reader
values/delta/DeltaBinaryPackingValuesReader.java:69-123). Our layout reuses
the FOR codec over zigzag(diff) instead of parquet's miniblock format —
same compression idea (good for sorted/near-sorted data such as ``warc_ts``),
new format.

Layout::

    u32 n
    if n > 0: i64 first, then forpack(zigzag(np.diff(values)))
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack
from .bitpack import zigzag_decode, zigzag_encode


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return struct.pack("<I", 0)
    deltas = zigzag_encode(np.diff(v)).astype(np.int64)
    if (deltas < 0).any():
        raise OverflowError("zigzag delta exceeds int64")
    return struct.pack("<Iq", n, int(v[0])) + forpack.encode(deltas)


def decode(buf: bytes | memoryview) -> np.ndarray:
    buf = memoryview(buf)
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    (first,) = struct.unpack_from("<q", buf, 4)
    deltas = zigzag_decode(forpack.decode(buf[12:]).astype(np.uint64))
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        np.cumsum(deltas, out=out[1:])
        out[1:] += first
    return out
