"""Little-endian bit-packing kernels (vectorized numpy).

The primitive under the FOR codec and the RLE/bit-packed hybrid, mirroring
the reference's byte-level packers (reference:
src/main/java/org/apache/parquet/column/values/bitpacking/BitPacking.java:77-873,
ByteBitPackingValuesReader.java:96-123) but expressed as whole-array numpy
transforms instead of value-at-a-time Java.

Layout: values are packed contiguously, value 0 in the lowest bits of byte 0
(little-endian bit order), `ceil(n * width / 8)` bytes total.
"""

from __future__ import annotations

import numpy as np


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (non-negative ints < 2**width) into a little-endian
    bitstream of ``width`` bits per value."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"bit width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # (n, width) matrix of bits, little-endian within each value
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns a uint64 array of length ``n``.

    Fast path (width <= 57): per-value unaligned 8-byte little-endian load
    via one (n, 8) gather viewed as uint64, then shift + mask — each value's
    bits [j*width, (j+1)*width) sit within the 64 bits starting at its byte,
    since (bit_offset & 7) + width <= 7 + 57 <= 64. ~5x faster than the
    unpackbits bit-matrix route, which stays as the wide-width fallback."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    if width <= 57:
        return _gather_bits(_pad8(raw),
                            np.arange(n, dtype=np.int64) * width, width)
    bits = np.unpackbits(raw, bitorder="little", count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def _pad8(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """uint8 view of ``buf`` with the 8 slack bytes :func:`_gather_bits`
    requires appended — the ONE place that invariant is constructed."""
    raw = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
    return np.concatenate([raw, np.zeros(8, np.uint8)])


def _gather_bits(padded: np.ndarray, bit_offsets: np.ndarray,
                 width: int | np.ndarray) -> np.ndarray:
    """Values of ``width`` (<= 57) bits at arbitrary ``bit_offsets`` of a
    little-endian bitstream. ``padded`` must be a uint8 array with >= 8 slack
    bytes after the last addressed bit (so every 8-byte load is in bounds).
    Neither offsets nor widths need be uniform — the RLE decoder unpacks
    every packed segment of a block in ONE call despite the byte-padding
    gaps between segments, and the FOR decoder passes a per-value width
    array to unpack all its 512-value groups at once."""
    byte_idx = (bit_offsets >> 3).astype(np.int64)
    sh = (bit_offsets & 7).astype(np.uint64)
    b = padded[byte_idx[:, None] + np.arange(8, dtype=np.int64)[None, :]]
    u = (np.ascontiguousarray(b).view(np.dtype("<u8")).ravel()
         .astype(np.uint64, copy=False))  # explicit-LE view: no-op on x86
    if isinstance(width, np.ndarray):
        mask = (np.uint64(1) << width.astype(np.uint64)) - np.uint64(1)
    else:
        mask = np.uint64((1 << width) - 1)
    return (u >> sh) & mask


def bit_width(max_value: int) -> int:
    """Number of bits needed for values in [0, max_value]."""
    return int(max_value).bit_length() if max_value > 0 else 0


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned so small magnitudes get small codes."""
    v = np.ascontiguousarray(v, dtype=np.int64)
    return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)
