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
    """Vectorized inverse: one pure-int pass over the 9-byte group headers
    (positions chain through payload sizes), then ONE multi-offset bit
    gather (_gather_bits with a per-value width array) + one base add for
    every group at once — no per-group numpy calls. Groups wider than 57
    bits (packed values near the uint64 span limit) fall back to the exact
    per-group unpack."""
    from .bitpack import _gather_bits, _pad8

    buf = memoryview(buf)
    (n,) = struct.unpack_from("<I", buf, 0)
    pos = 4
    groups: list[tuple[int, int, int, int]] = []  # (g, w, base, payload_pos)
    done = 0
    wide = False
    while done < n:
        g = min(GROUP, n - done)
        w, base = struct.unpack_from("<Bq", buf, pos)
        pos += 9
        groups.append((g, w, base, pos))
        wide = wide or w > 57
        pos += (g * w + 7) // 8
        done += g
    if not groups:
        return np.empty(0, dtype=np.int64)
    if wide:
        out = np.empty(n, dtype=np.int64)
        done = 0
        for g, w, base, p in groups:
            nbytes = (g * w + 7) // 8
            out[done : done + g] = (
                unpack_bits(buf[p : p + nbytes], g, w).astype(np.int64) + base
            )
            done += g
        return out
    gs = np.array([t[0] for t in groups], dtype=np.int64)
    ws = np.array([t[1] for t in groups], dtype=np.int64)
    bases = np.array([t[2] for t in groups], dtype=np.int64)
    pposs = np.array([t[3] for t in groups], dtype=np.int64)
    csum = np.concatenate(([0], np.cumsum(gs)[:-1]))
    within = np.arange(n, dtype=np.int64) - np.repeat(csum, gs)
    w_per = np.repeat(ws, gs)
    bit_off = np.repeat(pposs * 8, gs) + within * w_per
    vals = _gather_bits(_pad8(buf), bit_off, w_per)
    return vals.astype(np.int64) + np.repeat(bases, gs)
