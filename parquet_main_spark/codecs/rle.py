"""RLE / bit-packed hybrid codec for unsigned ids (vectorized numpy).

The analog of parquet's RunLengthBitPackingHybrid grammar as used by the
reference for dictionary ids, levels and booleans (reference:
src/main/java/org/apache/parquet/column/values/rle/
RunLengthBitPackingHybridDecoder.java:101-121 grammar;
skip arithmetic :127-159). Our grammar differs in two ways: a bit-packed
run's header carries the exact VALUE count (not a count of 8-value groups),
and since round 6 every segment header lives in one fixed-width directory
up front, so DECODE has no serial header walk at all.

Layout (v2, written since round 6 — bit 7 of the first byte set)::

    u8  width | 0x80               # bits per value (0 => all zeros)
    u32 n                          # total value count
    u32 n_segments
    n_segments x u32               # count << 1 | is_packed  (the directory)
    payloads in directory order:
        RLE segment    — value in ceil(width/8) bytes LE
        packed segment — ceil(count*width/8) packed bytes

Both decode passes are now single vectorized expressions: the directory is
one ``np.frombuffer`` (payload positions = cumsum of sizes derived from it),
RLE materialization is one repeat + scatter, packed materialization one
multi-offset bit gather. The round-5 format needed a serial varint walk for
the headers; the directory costs 4 bytes/segment vs 1-3 for the varints,
bounded by the encode-side segment cap (max(8, n/64) segments).

Legacy layout (v1, bit 7 clear — pre-round-6 tables remain readable)::

    u8 width, u32 n, then repeated [varint(count<<1|is_packed), payload].
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import pack_bits, unpack_bits

MIN_RLE_RUN = 8

#: segment count per block is bounded at encode time: when the run structure
#: would produce more than max(MAX_SEGMENTS_FLOOR, n // MIN_VALUES_PER_SEGMENT)
#: segments (adversarial run-length-~8 data -> n/8 segments), the whole block
#: is emitted as ONE bit-packed segment instead — for such short runs RLE
#: barely compresses anyway, and the bound also caps the directory bytes
MAX_SEGMENTS_FLOOR = 8
MIN_VALUES_PER_SEGMENT = 64

_V2_FLAG = 0x80


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
    head = struct.pack("<BI", width | _V2_FLAG, n)
    if n == 0 or width == 0:
        return head + struct.pack("<I", 0)
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
    headers: list[int] = []
    payloads: list[bytes] = []
    if n_segments > max(MAX_SEGMENTS_FLOOR, n // MIN_VALUES_PER_SEGMENT):
        headers.append((n << 1) | 1)
        payloads.append(pack_bits(v, width))
    else:
        i = 0
        while i < nruns:
            if is_rle[i]:
                headers.append(int(lengths[i]) << 1)
                payloads.append(int(v[starts[i]]).to_bytes(vbytes, "little"))
                i += 1
            else:
                j = i
                while j < nruns and not is_rle[j]:
                    j += 1
                s, e = int(starts[i]), int(ends[j - 1])
                headers.append(((e - s) << 1) | 1)
                payloads.append(pack_bits(v[s:e], width))
                i = j
    return b"".join(
        [head, struct.pack("<I", len(headers)),
         np.asarray(headers, dtype="<u4").tobytes()] + payloads
    )


def decode(buf: bytes | memoryview) -> np.ndarray:
    """Fully vectorized decode of the v2 directory layout; v1 (pre-round-6
    varint headers) dispatches to the legacy two-pass walk so old tables
    stay readable."""
    buf = memoryview(buf)
    if not (buf[0] & _V2_FLAG):
        return _decode_v1(buf)
    width = buf[0] & 0x7F
    n, nseg = struct.unpack_from("<II", buf, 1)
    out = np.empty(n, dtype=np.uint64)
    if width == 0 or n == 0 or nseg == 0:
        out[:] = 0
        return out
    vbytes = (width + 7) // 8
    headers = np.frombuffer(buf, dtype="<u4", count=nseg, offset=9).astype(np.int64)
    cnts = headers >> 1
    packed = (headers & 1).astype(bool)
    sizes = np.where(packed, (cnts * width + 7) // 8, vbytes)
    poss = 9 + 4 * nseg + np.concatenate(([0], np.cumsum(sizes)[:-1]))
    out_starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    _materialize(out, width, vbytes, buf,
                 out_starts[packed], cnts[packed], poss[packed],
                 out_starts[~packed], cnts[~packed], poss[~packed])
    return out


def _materialize(out: np.ndarray, width: int, vbytes: int, buf: memoryview,
                 p_starts, p_cnts, p_poss, r_starts, r_cnts, r_poss) -> None:
    """Pass 2 shared by both layouts: ALL packed segments via one
    multi-offset bit gather, ALL RLE segments via one repeat + scatter."""
    from .bitpack import _gather_bits, _pad8

    if len(p_starts):
        if width > 57:  # >57-bit values need >8-byte loads: exact fallback
            for s, cnt, p in zip(p_starts, p_cnts, p_poss):
                s, cnt, p = int(s), int(cnt), int(p)
                nb = (cnt * width + 7) // 8
                out[s : s + cnt] = unpack_bits(buf[p : p + nb], cnt, width)
        else:
            # absolute bit offset = segment payload byte * 8 + within-segment
            # index * width (byte padding between segments is what stops a
            # single contiguous unpack)
            total = int(p_cnts.sum())
            csum = np.concatenate(([0], np.cumsum(p_cnts)[:-1]))
            within = np.arange(total, dtype=np.int64) - np.repeat(csum, p_cnts)
            bit_off = np.repeat(p_poss * 8, p_cnts) + within * width
            vals = _gather_bits(_pad8(buf), bit_off, width)
            out[np.repeat(p_starts - csum, p_cnts)
                + np.arange(total, dtype=np.int64)] = vals

    if len(r_starts):
        if len(r_starts) <= 4:
            for s, cnt, p in zip(r_starts, r_cnts, r_poss):
                s, cnt, p = int(s), int(cnt), int(p)
                out[s : s + cnt] = int.from_bytes(buf[p : p + vbytes], "little")
        else:
            raw = np.frombuffer(buf, dtype=np.uint8)
            vb = raw[r_poss[:, None] + np.arange(vbytes, dtype=np.int64)[None, :]]
            weights = np.uint64(1) << (np.arange(vbytes, dtype=np.uint64)
                                       * np.uint64(8))
            vals = (vb.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64)
            total = int(r_cnts.sum())
            csum = np.concatenate(([0], np.cumsum(r_cnts)[:-1]))
            out[np.repeat(r_starts - csum, r_cnts)
                + np.arange(total, dtype=np.int64)] = np.repeat(vals, r_cnts)


def _decode_v1(buf: memoryview) -> np.ndarray:
    """Legacy (pre-round-6) layout: serial varint header walk, then the same
    vectorized materialization. Kept so tables written by earlier engine
    versions decode unchanged."""
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

    def _cols(segs):
        return (np.array([g[0] for g in segs], dtype=np.int64),
                np.array([g[1] for g in segs], dtype=np.int64),
                np.array([g[2] for g in segs], dtype=np.int64))

    _materialize(out, width, vbytes, buf, *_cols(packed_seg), *_cols(rle_seg))
    return out
