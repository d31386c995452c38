"""FSST-style symbol-table string compression (deterministic, vectorized).

The reference has no FSST (its string story is dictionary/prefix codecs —
SURVEY.md §2.2 E-row); this implements the string codec the north rule
demands, following the public idea of FSST (Boncz, Neumann, Leis: "FSST:
Fast Random Access String Compression", VLDB 2020): build a small table of
frequent substrings ("symbols"), replace each occurrence with a 1-byte code.

Our variant trades peak ratio for exactness + whole-corpus vectorization:
instead of an escape byte, codes are drawn from byte values that do NOT occur
in the corpus (web text never uses all 256), so encoding is a chain of
C-speed ``bytes.replace`` calls and decoding is the exact reverse chain.
Symbols are substrings of the original corpus, hence can never contain a code
byte — each replace is therefore exactly invertible. If the corpus uses all
256 byte values or compression doesn't pay, we store the corpus raw
(flag byte 0): the codec never fails.

Determinism: symbol candidates are counted on a fixed-size prefix sample and
ranked by (score desc, length desc, bytes asc) — no hash-order dependence.

Column layout::

    u32 n, u32 len_bytes, forpack(lengths), corpus_blob

Corpus blob layout::

    u8 flag           # 1 = compressed, 0 = raw
    flag=1: u8 nsym, repeated (u8 code, u8 len, bytes), encoded corpus
    flag=0: raw corpus
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack
from .strutil import from_blob, to_blob

SAMPLE_MAX = 1 << 16
MAX_SYMBOLS = 96
SYM_LENGTHS = (8, 6, 4, 3, 2)
MIN_COUNT = 4


def _candidates(sample: bytes) -> list[tuple[int, bytes]]:
    """Frequent substrings of the sample, scored; deterministic order."""
    arr = np.frombuffer(sample, dtype=np.uint8)
    cands: dict[bytes, int] = {}
    for L in SYM_LENGTHS:
        if len(arr) < L:
            continue
        win = np.lib.stride_tricks.sliding_window_view(arr, L)
        view = np.ascontiguousarray(win).view(np.dtype((np.void, L))).ravel()
        uniq, counts = np.unique(view, return_counts=True)
        keep = counts >= MIN_COUNT
        ubytes = uniq[keep].tobytes()
        ucounts = counts[keep]
        for i in range(len(ucounts)):
            s = ubytes[i * L : (i + 1) * L]
            score = int(ucounts[i]) * (L - 1)
            if cands.get(s, 0) < score:
                cands[s] = score
    return sorted(((sc, s) for s, sc in cands.items()), key=lambda t: (-t[0], -len(t[1]), t[1]))


def compress_corpus(blob: bytes) -> bytes:
    """Compress a corpus; always returns a valid corpus blob (flag 0 or 1)."""
    raw = struct.pack("<B", 0) + blob
    if len(blob) < 64:
        return raw
    used = np.unique(np.frombuffer(blob, dtype=np.uint8))
    unused = sorted(set(range(256)) - set(int(b) for b in used))
    if not unused:
        return raw
    sample = blob[:SAMPLE_MAX]
    cands = _candidates(sample)[: min(len(unused), MAX_SYMBOLS)]
    if not cands:
        return raw
    # apply longest symbols first so "the " beats "th"
    order = sorted((s for _, s in cands), key=lambda s: (-len(s), s))
    table = []
    out = blob
    for sym, code in zip(order, unused):
        new = out.replace(sym, bytes([code]))
        if len(new) < len(out):
            table.append((code, sym))
            out = new
    header = bytearray(struct.pack("<BB", 1, len(table)))
    for code, sym in table:
        header += struct.pack("<BB", code, len(sym)) + sym
    if len(header) + len(out) >= len(raw):
        return raw
    return bytes(header) + out


def decompress_corpus(buf: bytes | memoryview) -> bytes:
    buf = bytes(buf)
    flag = buf[0]
    if flag == 0:
        return buf[1:]
    nsym = buf[1]
    pos = 2
    table = []
    for _ in range(nsym):
        code, slen = struct.unpack_from("<BB", buf, pos)
        pos += 2
        table.append((code, buf[pos : pos + slen]))
        pos += slen
    out = buf[pos:]
    for code, sym in reversed(table):
        out = out.replace(bytes([code]), sym)
    return out


def encode(values: np.ndarray, binary: bool = False) -> bytes:
    lengths, blob = to_blob(values, binary=binary)
    lb = forpack.encode(lengths)
    return struct.pack("<II", len(values), len(lb)) + lb + compress_corpus(blob)


def decode(buf: bytes | memoryview, binary: bool = False) -> np.ndarray:
    buf = memoryview(buf)
    n, len_bytes = struct.unpack_from("<II", buf, 0)
    lengths = forpack.decode(buf[8 : 8 + len_bytes])
    blob = decompress_corpus(buf[8 + len_bytes :])
    return from_blob(lengths, blob, binary=binary)
