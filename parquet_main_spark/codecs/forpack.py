"""Frame-of-reference + bit-packing codec ("FOR"), int64.

The analog of the reference's novel VARLEN_BIT_PACKED encoding
(reference: src/main/java/org/apache/parquet/column/values/vbp/
VarlenBitPackingValuesWriter.java:31-131 — 512-value groups, per-group min
subtracted as the base, per-group bit width, little-endian packing), and of
its reader's group-header skip arithmetic (VarlenBitPackingValuesReader.java:81-124).
Our layout differs deliberately (fixed 8-byte base instead of zigzag varint)
— it is a new format, not a byte-compatible port.

Layout (little-endian throughout)::

    u32 n
    repeated per 512-value group (last group may be short):
        u8  width            # bits per packed value
        i64 base             # group minimum
        ceil(g * width / 8) bytes of packed (value - base)

Skip-friendliness: a reader can jump whole groups from the headers alone
(the reference's D1 skip strategy); in our vectorized decode the whole block
is a single numpy pass so intra-block skipping is a slice.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import bit_width, pack_bits, unpack_bits

GROUP = 512


def encode(values: np.ndarray) -> bytes:
    """Encode an int64 array. Raises OverflowError if a group's range
    exceeds uint64 (mirrors the reference's overflow error,
    VarlenBitPackingValuesWriter.java:93-96)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    out = [struct.pack("<I", n)]
    for start in range(0, n, GROUP):
        g = v[start : start + GROUP]
        base = int(g.min())
        span = int(g.max()) - base
        if span < 0:
            raise OverflowError("group value range exceeds uint64")
        w = bit_width(span)
        out.append(struct.pack("<Bq", w, base))
        out.append(pack_bits((g - base).astype(np.uint64), w))
    return b"".join(out)


def decode(buf: bytes | memoryview) -> np.ndarray:
    buf = memoryview(buf)
    (n,) = struct.unpack_from("<I", buf, 0)
    pos = 4
    out = np.empty(n, dtype=np.int64)
    done = 0
    while done < n:
        g = min(GROUP, n - done)
        w, base = struct.unpack_from("<Bq", buf, pos)
        pos += 9
        nbytes = (g * w + 7) // 8
        out[done : done + g] = unpack_bits(buf[pos : pos + nbytes], g, w).astype(np.int64) + base
        pos += nbytes
        done += g
    return out
