"""RLE / bit-packed hybrid codec for unsigned ids (vectorized numpy).

The analog of parquet's RunLengthBitPackingHybrid grammar as used by the
reference for dictionary ids, levels and booleans (reference:
src/main/java/org/apache/parquet/column/values/rle/
RunLengthBitPackingHybridDecoder.java:101-121 grammar;
skip arithmetic :127-159). Our grammar differs in one way: a bit-packed run's
header carries the exact VALUE count (not a count of 8-value groups), so no
mid-stream padding ambiguity exists.

Layout::

    u8  width                      # bits per value (0 => all zeros)
    u32 n                          # total value count
    repeated segments:
        varint header
          header & 1 == 0: RLE run   — count = header >> 1,
                                       value in ceil(width/8) bytes LE
          header & 1 == 1: packed run — count = header >> 1,
                                       ceil(count*width/8) packed bytes

Encoder strategy (whole-array, no per-value Python): run boundaries via
np.diff; runs >= MIN_RLE_RUN become RLE segments, maximal stretches of
shorter runs are fused into one bit-packed segment.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import pack_bits, unpack_bits

MIN_RLE_RUN = 8

#: decode walks segments in a Python loop, so the segment count per block is
#: bounded at encode time: when the run structure would produce more than
#: max(MAX_SEGMENTS_FLOOR, n // MIN_VALUES_PER_SEGMENT) segments (adversarial
#: run-length-~8 data -> n/8 segments), the whole block is emitted as ONE
#: bit-packed segment instead — for such short runs RLE barely compresses
#: anyway (varint header + value bytes per run vs run*width bits packed)
MAX_SEGMENTS_FLOOR = 8
MIN_VALUES_PER_SEGMENT = 64


def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    x = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        x |= (b & 0x7F) << shift
        if not (b & 0x80):
            return x, pos
        shift += 7


def encode(values: np.ndarray, width: int) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    vbytes = (width + 7) // 8
    out = [struct.pack("<BI", width, n)]
    if n == 0 or width == 0:
        return b"".join(out)
    # run-length decomposition (vectorized)
    change = np.flatnonzero(v[1:] != v[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    lengths = ends - starts
    is_rle = lengths >= MIN_RLE_RUN
    nruns = len(starts)
    # segment count this layout would produce: one per RLE run plus one per
    # maximal stretch of short runs (a stretch = a False-run in is_rle)
    n_rle = int(is_rle.sum())
    stretch_starts = ~is_rle & np.concatenate(([True], is_rle[:-1]))
    n_segments = n_rle + int(stretch_starts.sum())
    if n_segments > max(MAX_SEGMENTS_FLOOR, n // MIN_VALUES_PER_SEGMENT):
        out.append(_varint((n << 1) | 1))
        out.append(pack_bits(v, width))
        return b"".join(out)
    i = 0
    while i < nruns:
        if is_rle[i]:
            out.append(_varint(int(lengths[i]) << 1))
            out.append(int(v[starts[i]]).to_bytes(vbytes, "little"))
            i += 1
        else:
            j = i
            while j < nruns and not is_rle[j]:
                j += 1
            s, e = int(starts[i]), int(ends[j - 1])
            cnt = e - s
            out.append(_varint((cnt << 1) | 1))
            out.append(pack_bits(v[s:e], width))
            i = j
    return b"".join(out)


def decode(buf: bytes | memoryview) -> np.ndarray:
    """Two-pass vectorized decode: pass 1 walks the varint headers only
    (pure-int sequential work — header positions chain through the payload
    sizes, so this pass is inherently serial but touches no payload bytes);
    pass 2 materializes ALL RLE segments with one repeat + one scatter and
    ALL packed segments with one multi-offset bit-gather (_gather_bits),
    instead of one numpy slice-assign + unpack per segment. The encode-side
    segment bound (MAX_SEGMENTS_FLOOR/MIN_VALUES_PER_SEGMENT) keeps pass 1
    short even on adversarial run structure."""
    from .bitpack import _gather_bits, _pad8

    buf = memoryview(buf)
    width, n = struct.unpack_from("<BI", buf, 0)
    pos = 5
    out = np.empty(n, dtype=np.uint64)
    if width == 0:
        out[:] = 0
        return out
    vbytes = (width + 7) // 8
    done = 0
    rle_seg: list[tuple[int, int, int]] = []     # (out_start, cnt, value_pos)
    packed_seg: list[tuple[int, int, int]] = []  # (out_start, cnt, byte_pos)
    while done < n:
        header, pos = _read_varint(buf, pos)
        cnt = header >> 1
        if header & 1:
            packed_seg.append((done, cnt, pos))
            pos += (cnt * width + 7) // 8
        else:
            rle_seg.append((done, cnt, pos))
            pos += vbytes
        done += cnt

    if packed_seg:
        if width > 57:  # >57-bit values need >8-byte loads: exact fallback
            for s, cnt, p in packed_seg:
                nb = (cnt * width + 7) // 8
                out[s : s + cnt] = unpack_bits(buf[p : p + nb], cnt, width)
        else:
            # one bit-gather for every packed value of the block: absolute
            # bit offset = segment payload byte * 8 + within-segment index *
            # width (byte padding between segments is what stops a single
            # contiguous unpack)
            starts = np.array([g[0] for g in packed_seg], dtype=np.int64)
            cnts = np.array([g[1] for g in packed_seg], dtype=np.int64)
            bposs = np.array([g[2] for g in packed_seg], dtype=np.int64)
            total = int(cnts.sum())
            csum = np.concatenate(([0], np.cumsum(cnts)[:-1]))
            within = np.arange(total, dtype=np.int64) - np.repeat(csum, cnts)
            bit_off = np.repeat(bposs * 8, cnts) + within * width
            vals = _gather_bits(_pad8(buf), bit_off, width)
            out[np.repeat(starts - csum, cnts)
                + np.arange(total, dtype=np.int64)] = vals

    if rle_seg:
        if len(rle_seg) <= 4:
            for s, cnt, p in rle_seg:
                out[s : s + cnt] = int.from_bytes(buf[p : p + vbytes], "little")
        else:
            raw = np.frombuffer(buf, dtype=np.uint8)
            starts = np.array([g[0] for g in rle_seg], dtype=np.int64)
            cnts = np.array([g[1] for g in rle_seg], dtype=np.int64)
            vposs = np.array([g[2] for g in rle_seg], dtype=np.int64)
            vb = raw[vposs[:, None] + np.arange(vbytes, dtype=np.int64)[None, :]]
            weights = np.uint64(1) << (np.arange(vbytes, dtype=np.uint64)
                                       * np.uint64(8))
            vals = (vb.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64)
            total = int(cnts.sum())
            csum = np.concatenate(([0], np.cumsum(cnts)[:-1]))
            out[np.repeat(starts - csum, cnts)
                + np.arange(total, dtype=np.int64)] = np.repeat(vals, cnts)
    return out
