"""Shared-prefix (incremental) string codec — DELTA_BYTE_ARRAY analog.

The reference selects parquet's DELTA_BYTE_ARRAY for prefix-compressible
strings (EncValuesWriterFactory.java:115-117): each value stores the length
of the prefix shared with its predecessor plus the remaining suffix. Ideal
for our url column, which arrives sorted within each block (the engine
sorts buckets by url).

Vectorized formulation (no per-row Python):

- encode: view the block as a padded (n, maxlen) uint8 matrix; the shared
  prefix length of consecutive rows is the argmax of the first byte-mismatch
  (one vectorized compare), clipped by both lengths;
- decode: scatter suffix bytes into the matrix, then for each COLUMN j
  forward-fill from the latest row that wrote column j
  (np.maximum.accumulate over row indices) — maxlen passes of O(n), fine
  for short strings like urls.

Layout::

    u32 n, u16 maxlen
    u32 len_bytes_a, forpack(value lengths)
    u32 len_bytes_b, forpack(prefix lengths)
    suffix blob (concatenated value[prefix_len:] bytes)

Only worthwhile for short, sorted, prefix-heavy columns — the selector
measures the actual prefix overlap on its sample (`prefix_ratio`).
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack
from .strutil import from_blob, to_blob

MAXLEN_LIMIT = 4096


def _char_matrix_lb(lengths: np.ndarray, blob) -> tuple[np.ndarray, np.ndarray, bytes]:
    n = len(lengths)
    maxlen = int(lengths.max()) if n else 0
    if maxlen > MAXLEN_LIMIT:
        raise ValueError("prefix codec: strings too long")
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    flat = np.frombuffer(blob, dtype=np.uint8)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    # scatter each value's bytes into its row (vectorized via flat indexing)
    row_idx = np.repeat(np.arange(n), lengths)
    col_idx = np.arange(len(flat)) - np.repeat(starts[:-1], lengths)
    mat[row_idx, col_idx] = flat
    return lengths.astype(np.int64), mat, blob


def encode_lb(lengths: np.ndarray, blob) -> bytes:
    """(lengths, blob) form — byte-identical to encode, no objects."""
    n = len(lengths)
    if n == 0:
        return struct.pack("<IH", 0, 0)
    lengths, mat, blob = _char_matrix_lb(np.ascontiguousarray(lengths, dtype=np.int64), blob)
    maxlen = mat.shape[1]
    if n == 1 or maxlen == 0:
        # maxlen == 0: every value is the empty string — no prefixes to share
        plens = np.zeros(n, dtype=np.int64)
    else:
        neq = mat[1:] != mat[:-1]
        any_neq = neq.any(axis=1)
        first_mismatch = np.where(any_neq, neq.argmax(axis=1), maxlen)
        plens = np.minimum(np.minimum(lengths[1:], lengths[:-1]), first_mismatch)
        plens = np.concatenate(([0], plens))
    # suffix blob: value[plen:] per row
    keep = np.zeros(int(lengths.sum()), dtype=bool)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    pos_in_row = np.arange(len(keep)) - np.repeat(starts[:-1], lengths)
    keep = pos_in_row >= np.repeat(plens, lengths)
    suffixes = np.frombuffer(blob, dtype=np.uint8)[keep].tobytes()
    la = forpack.encode(lengths)
    lb = forpack.encode(plens)
    return (
        struct.pack("<IH", n, maxlen)
        + struct.pack("<I", len(la)) + la
        + struct.pack("<I", len(lb)) + lb
        + suffixes
    )


def encode(values: np.ndarray, binary: bool = False) -> bytes:
    lengths, blob = to_blob(values, binary=binary)
    return encode_lb(lengths, blob)


def decode_lb(buf: bytes | memoryview) -> tuple[np.ndarray, bytes]:
    buf = memoryview(buf)
    n, maxlen = struct.unpack_from("<IH", buf, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64), b""
    pos = 6
    (la_len,) = struct.unpack_from("<I", buf, pos); pos += 4
    lengths = forpack.decode(buf[pos : pos + la_len]); pos += la_len
    (lb_len,) = struct.unpack_from("<I", buf, pos); pos += 4
    plens = forpack.decode(buf[pos : pos + lb_len]); pos += lb_len
    suffix = np.frombuffer(buf, dtype=np.uint8, offset=pos)

    slens = lengths - plens
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    written = np.zeros((n, maxlen), dtype=bool)
    row_idx = np.repeat(np.arange(n), slens)
    sstarts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(slens, out=sstarts[1:])
    col_idx = (np.arange(len(suffix)) - np.repeat(sstarts[:-1], slens)) + np.repeat(plens, slens)
    mat[row_idx, col_idx] = suffix[: len(row_idx)]
    written[row_idx, col_idx] = True

    rows = np.arange(n)
    for j in range(maxlen):
        src = np.where(written[:, j], rows, 0)
        np.maximum.accumulate(src, out=src)
        mat[:, j] = mat[src, j]

    # flatten back to a blob honoring per-row lengths
    take = np.zeros((n, maxlen), dtype=bool)
    col = np.arange(maxlen)
    take[:] = col[None, :] < lengths[:, None]
    return lengths, mat[take].tobytes()


def decode(buf: bytes | memoryview, binary: bool = False) -> np.ndarray:
    lengths, blob = decode_lb(buf)
    return from_blob(lengths, blob, binary=binary)
