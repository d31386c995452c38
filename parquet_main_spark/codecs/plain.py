"""PLAIN codec — raw little-endian values / length-split byte blobs.

Analog of the reference's PLAIN fallback (reference:
EncValuesWriterFactory.java:121-123,153-155,166-168;
values/plain/PlainValuesReader.java:60-179). Fixed-width types are raw numpy
buffers; strings/binary are FOR-packed lengths + one concatenated blob
(the Arrow layout, cf. DELTA_LENGTH_BYTE_ARRAY —
EncValuesWriterFactory.java:118-120).

PLAIN is the fallback of last resort, so its var-len blob is the one payload
that would otherwise ship entirely uncompressed (fsst declined = no substring
redundancy); a zstd wrap recovers entropy-level compression there — the
analog of the reference's general-purpose page compression with lazy
decompress (CompressedDataPageV1.java:15-45).

Layout::

    fixed-width:  u8 itemsize, u32 n, raw LE bytes
    var-length:   u8 flags, u32 n, u32 len_bytes,
                  [u64 raw_blob_size when flags&1], forpack(lengths), blob
                  (flags bit0: blob is zstd-compressed)
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack
from .strutil import from_blob, to_blob

_DTYPES = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}

#: only wrap blobs at least this large (zstd framing overhead), and only when
#: the compressed form actually saves >10% — determinism holds either way
#: (zstd at a fixed level is deterministic for a given library version)
_ZSTD_MIN_BLOB = 256
_ZSTD_MAX_RATIO = 0.9


def _zstd():
    import pyarrow as pa

    return pa.Codec("zstd")


def encode_fixed(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values)
    return struct.pack("<BI", v.dtype.itemsize, len(v)) + v.tobytes()


def decode_fixed(buf: bytes | memoryview, dtype: np.dtype) -> np.ndarray:
    buf = memoryview(buf)
    itemsize, n = struct.unpack_from("<BI", buf, 0)
    return np.frombuffer(buf, dtype=dtype, count=n, offset=5).copy()


#: probe a prefix before compressing multi-MB blobs: incompressible payloads
#: (already-compressed images, high-entropy binary) would otherwise pay a
#: full zstd pass per block just to be discarded
_ZSTD_PROBE_BYTES = 1 << 16
_ZSTD_PROBE_RATIO = 0.95


def encode_var_lb(lengths: np.ndarray, blob) -> bytes:
    """(lengths, blob) form — byte-identical to encode_var, no objects."""
    lb = forpack.encode(np.ascontiguousarray(lengths, dtype=np.int64))
    raw = bytes(blob)
    flags, payload = 0, raw
    if len(raw) >= _ZSTD_MIN_BLOB:
        z = _zstd()
        attempt = len(raw) <= 2 * _ZSTD_PROBE_BYTES or (
            len(bytes(z.compress(raw[:_ZSTD_PROBE_BYTES])))
            < _ZSTD_PROBE_RATIO * _ZSTD_PROBE_BYTES
        )
        if attempt:
            comp = bytes(z.compress(raw))
            if len(comp) < _ZSTD_MAX_RATIO * len(raw):
                flags, payload = 1, comp
    head = struct.pack("<BII", flags, len(lengths), len(lb))
    if flags & 1:
        head += struct.pack("<Q", len(raw))
    return head + lb + payload


def decode_var_lb(buf: bytes | memoryview) -> tuple[np.ndarray, memoryview]:
    buf = memoryview(buf)
    flags, n, len_bytes = struct.unpack_from("<BII", buf, 0)
    pos = 9
    raw_size = None
    if flags & 1:
        (raw_size,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
    lengths = forpack.decode(buf[pos : pos + len_bytes])
    payload = buf[pos + len_bytes :]
    if flags & 1:
        payload = memoryview(_zstd().decompress(payload, raw_size))
    return lengths, payload


def encode_var(values: np.ndarray, binary: bool = False) -> bytes:
    lengths, blob = to_blob(values, binary=binary)
    return encode_var_lb(lengths, blob)


def decode_var(buf: bytes | memoryview, binary: bool = False) -> np.ndarray:
    lengths, blob = decode_var_lb(buf)
    return from_blob(lengths, bytes(blob), binary=binary)
