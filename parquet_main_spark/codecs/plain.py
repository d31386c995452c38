"""PLAIN codec — raw little-endian values / length-split byte blobs.

Analog of the reference's PLAIN fallback (reference:
EncValuesWriterFactory.java:121-123,153-155,166-168;
values/plain/PlainValuesReader.java:60-179). Fixed-width types are raw numpy
buffers; strings/binary are FOR-packed lengths + one concatenated blob
(the Arrow layout, cf. DELTA_LENGTH_BYTE_ARRAY —
EncValuesWriterFactory.java:118-120).

Layout::

    fixed-width:  u8 itemsize, u32 n, raw LE bytes
    var-length:   u32 n, u32 len_bytes, forpack(lengths), blob
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack
from .strutil import from_blob, to_blob

_DTYPES = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}


def encode_fixed(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values)
    return struct.pack("<BI", v.dtype.itemsize, len(v)) + v.tobytes()


def decode_fixed(buf: bytes | memoryview, dtype: np.dtype) -> np.ndarray:
    buf = memoryview(buf)
    itemsize, n = struct.unpack_from("<BI", buf, 0)
    return np.frombuffer(buf, dtype=dtype, count=n, offset=5).copy()


def encode_var_lb(lengths: np.ndarray, blob) -> bytes:
    """(lengths, blob) form — byte-identical to encode_var, no objects."""
    lb = forpack.encode(np.ascontiguousarray(lengths, dtype=np.int64))
    return struct.pack("<II", len(lengths), len(lb)) + lb + bytes(blob)


def decode_var_lb(buf: bytes | memoryview) -> tuple[np.ndarray, memoryview]:
    buf = memoryview(buf)
    n, len_bytes = struct.unpack_from("<II", buf, 0)
    lengths = forpack.decode(buf[8 : 8 + len_bytes])
    return lengths, buf[8 + len_bytes :]


def encode_var(values: np.ndarray, binary: bool = False) -> bytes:
    lengths, blob = to_blob(values, binary=binary)
    return encode_var_lb(lengths, blob)


def decode_var(buf: bytes | memoryview, binary: bool = False) -> np.ndarray:
    lengths, blob = decode_var_lb(buf)
    return from_blob(lengths, bytes(blob), binary=binary)
