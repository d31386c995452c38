"""FSST-style symbol-table string compression (deterministic, vectorized).

The reference has no FSST (its string story is dictionary/prefix codecs —
SURVEY.md §2.2 E-row); this implements the string codec the north rule
demands, following the public idea of FSST (Boncz, Neumann, Leis: "FSST:
Fast Random Access String Compression", VLDB 2020) and of recursive pair
compression (Re-Pair, Larsson & Moffat 1999): build a table of frequent
symbols, replace each occurrence with a 1-byte code.

Vectorized variant: codes are drawn from byte values that do NOT occur in
the corpus (web text never uses all 256), and symbols are byte PAIRS chosen
per iteration — so one numpy pass replaces ALL chosen pairs at once
(match -> non-overlapping greedy selection -> masked scatter), and K
iterations give effective symbol lengths up to 2^K original bytes. Decode
expands iterations in reverse — also one vectorized pass each. If the
corpus uses all 256 byte values or compression doesn't pay, the corpus is
stored raw (flag 0): the codec never fails.

Determinism: pair candidates ranked by (count desc, pair value asc); no
hash-order dependence.

Column layout::

    u32 n, u32 len_bytes, forpack(lengths), corpus_blob

Corpus blob layout::

    u8 flag            # 2 = pair-table compressed, 0 = raw
    flag=2: u8 niter, per iter (u8 npairs, npairs * (code, hi, lo)),
            u32 enc_len, encoded corpus
    flag=0: raw corpus
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack
from .strutil import from_blob, to_blob

MAX_ITERS = 3
PAIRS_PER_ITER = 64
MIN_COUNT = 4
SAMPLE_BYTES = 1 << 21  # pair stats from a 2 MiB prefix sample
# (pair-frequency ranks saturate well below this; larger samples only make
# the table-building pass dominate small block corpora)
CHUNK = 1 << 18  # cache-blocked application: all iterations per 256 KiB chunk
# (sweep on the sandbox VM: 256K gave the best aggregate multi-core encode
# throughput — 8 procs ~88 MB/s vs ~26 MB/s for whole-corpus passes)
_NONE = 0xFFFF


#: cached parity masks for _take_mask: allocating + filling a fresh `even`
#: array per call was ~35% of the whole compress loop (it runs once per
#: chunk per iteration); grown on demand so sample-sized (> CHUNK) inputs
#: from _build_tables still hit the cache. ONE tuple global so concurrent
#: compress calls in a threaded host process always observe a consistent,
#: fully-built (even, odd) pair (a single reference assignment is atomic
#: under the GIL; two separate globals are not).
_PARITY: tuple[np.ndarray, np.ndarray] = (np.zeros(0, dtype=bool),
                                          np.zeros(0, dtype=bool))


def _parity_masks(n: int) -> tuple[np.ndarray, np.ndarray]:
    global _PARITY
    even, odd = _PARITY
    if len(even) < n:
        size = max(n, CHUNK)
        even = np.zeros(size, dtype=bool)
        even[::2] = True
        odd = ~even
        _PARITY = (even, odd)
    return even[:n], odd[:n]


def _take_mask(match: np.ndarray) -> np.ndarray:
    """Non-overlapping selection of pair matches (a match at i covers bytes
    i, i+1): take even-position matches, then odd-position matches not
    blocked by an even neighbor — O(n) boolean ops, near-greedy."""
    n = len(match)
    even, odd = _parity_masks(n)
    take_even = match & even
    blk = np.zeros(n, dtype=bool)
    blk[1:] |= take_even[:-1]
    if n > 1:
        blk[:-1] |= take_even[1:]
    out = match & odd
    out &= ~blk
    out |= take_even
    return out


def _apply(a: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """One replacement pass: substitute every (non-overlapping) matched pair
    with its 1-byte code. Formulated without boolean fancy indexing — the
    obvious copy + masked scatter + ``out[keep]`` tail measured 3.0 ms per
    256 KiB chunk vs 0.6 ms for where + take(flatnonzero), and this pass
    dominates the whole encode job (byte-identical output either way)."""
    if len(a) < 2:
        return a
    pairs = a[:-1].astype(np.uint16) << 8
    pairs |= a[1:]
    pair_codes = lut.take(pairs)  # take() skips the intp cast of lut[pairs]
    take = _take_mask(pair_codes != _NONE)
    if not take.any():
        return a
    merged = np.empty(len(a), dtype=np.uint8)
    merged[:-1] = np.where(take, pair_codes.astype(np.uint8), a[:-1])
    merged[-1] = a[-1]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    np.logical_not(take, out=keep[1:])
    return merged.take(np.flatnonzero(keep))


def _build_tables(sample: np.ndarray, free: list[int]):
    """Derive the per-iteration pair tables from the sample alone (the
    replacement passes over the full corpus then apply fixed tables).
    Returns ``(iters, final_len)`` — the sample's compressed length falls
    out of table building for free, which is what :func:`probe_ratio`
    measures without a second application pass."""
    iters: list[tuple[np.ndarray, list[tuple[int, int, int]]]] = []
    a = sample
    for _ in range(MAX_ITERS):
        budget = min(PAIRS_PER_ITER, len(free))
        if budget < 1 or len(a) < 2:
            break
        pairs = (a[:-1].astype(np.uint16) << 8) | a[1:]
        counts = np.bincount(pairs, minlength=65536)
        counts[counts < MIN_COUNT] = 0
        order = np.lexsort((np.arange(65536), -counts))[:budget]
        chosen = order[counts[order] > 0]
        if len(chosen) == 0:
            break
        codes = np.array(free[: len(chosen)], dtype=np.uint8)
        free = free[len(chosen):]
        lut = np.full(65536, _NONE, dtype=np.uint16)
        lut[chosen] = codes
        nxt = _apply(a, lut)
        if len(nxt) == len(a):
            break
        a = nxt
        iters.append(
            (lut, [(int(c), int(p >> 8), int(p & 0xFF)) for c, p in zip(codes, chosen)])
        )
    return iters, len(a)


def compress_corpus(blob: bytes) -> bytes:
    """Compress a corpus; always returns a valid corpus blob (flag 0 or 2).

    Cache-blocked: the naive formulation streams the whole corpus from DRAM
    once per iteration (~40 passes total), which saturates memory bandwidth
    when many executor cores encode concurrently; here every 1 MiB chunk
    runs ALL iterations while resident in cache, so DRAM traffic is ~one
    read + one write of the corpus regardless of iteration count."""
    raw = b"\x00" + blob
    if len(blob) < 64:
        return raw
    a_full = np.frombuffer(blob, dtype=np.uint8)
    used = np.zeros(256, dtype=bool)
    used[a_full] = True  # one scatter pass (np.bincount on uint8 is ~50x slower)
    free = np.flatnonzero(~used).tolist()
    if len(free) < 8:
        return raw
    iters, _ = _build_tables(a_full[:SAMPLE_BYTES].copy(), free)
    if not iters:
        return raw
    pieces = []
    for start in range(0, len(a_full), CHUNK):
        c = a_full[start : start + CHUNK]
        for lut, _ in iters:
            c = _apply(c, lut)
        pieces.append(c)
    a = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
    header = bytearray(struct.pack("<BB", 2, len(iters)))
    for _, table in iters:
        header += struct.pack("<B", len(table))
        for code, hi, lo in table:
            header += struct.pack("<BBB", code, hi, lo)
    body = a.tobytes()
    out_blob = bytes(header) + struct.pack("<I", len(body)) + body
    return out_blob if len(out_blob) < len(raw) else raw


def probe_ratio(blob: bytes) -> float:
    """Measured compressed/raw ratio of a probe corpus WITHOUT running the
    application pass: ``_build_tables`` compresses the sample as a side
    effect of deriving the tables, so the selector's measurement is the
    final sample length plus the header bytes the real encode would emit.
    Mirrors :func:`compress_corpus`'s gates exactly (tiny/raw corpora
    report 1.0, i.e. "fsst would store raw"). The real encode additionally
    chunks at CHUNK boundaries (pairs never merge across a boundary), a
    <0.1% effect — far inside the selector's 5% hysteresis."""
    if len(blob) < 64:
        return 1.0
    a_full = np.frombuffer(blob, dtype=np.uint8)
    used = np.zeros(256, dtype=bool)
    used[a_full] = True
    free = np.flatnonzero(~used).tolist()
    if len(free) < 8:
        return 1.0
    sample = a_full[:SAMPLE_BYTES]
    iters, final_len = _build_tables(sample.copy(), free)
    if not iters:
        return 1.0
    header = 2 + sum(1 + 3 * len(table) for _, table in iters) + 4
    return min(1.0, (header + final_len) / max(1, len(sample)))


def decompress_corpus(buf: bytes | memoryview) -> bytes:
    buf = memoryview(buf)
    flag = buf[0]
    if flag == 0:
        return bytes(buf[1:])
    niter = buf[1]
    pos = 2
    iters = []
    for _ in range(niter):
        npairs = buf[pos]
        pos += 1
        table = []
        for _ in range(npairs):
            code, hi, lo = struct.unpack_from("<BBB", buf, pos)
            pos += 3
            table.append((code, hi, lo))
        iters.append(table)
    (enc_len,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    enc = np.frombuffer(buf, dtype=np.uint8, count=enc_len, offset=pos)

    # Precompose ALL iterations into one 256-entry expansion table:
    # g(code) = the FULL byte string the pipeline would produce for that
    # code. One level of pair expansion costs ~6 numpy passes; niter levels
    # cost 6*niter — the composed table decodes in ONE pass (encoded bytes
    # untouched, so bit-stability fixtures hold).
    #
    # Composition order: decode applies reversed(iters) sequentially, so
    # g builds from the identity through iters in ORIGINAL order — when
    # iteration k's (hi, lo) bytes are looked up, the table already equals
    # the expansion through iterations 0..k-1, exactly what those bytes
    # mean in iteration k's alphabet.
    exp: list[bytes] = [bytes([i]) for i in range(256)]
    for table in iters:
        prev = exp
        exp = list(prev)
        for code, hi, lo in table:
            exp[code] = prev[hi] + prev[lo]

    if enc_len == 0:
        return b""

    # Fast path: ONE pyarrow take of the 256-entry binary table by the code
    # bytes — the result's data buffer IS the expanded corpus (Arrow's
    # var-len layout concatenates the taken values), produced by a single
    # C++ kernel instead of ~5 numpy passes over int32 index arrays
    # (measured 86 -> 213 MB/s per core on the bench corpus, byte-identical).
    # Guarded by the int32 offset ceiling of pa.binary(): output is at most
    # enc_len * max-expansion-length bytes.
    if enc_len * max(len(e) for e in exp) < (1 << 31):
        import pyarrow as pa
        import pyarrow.compute as pc

        out = pc.take(pa.array(exp, type=pa.binary()), pa.array(enc))
        return out.buffers()[2].to_pybytes()

    lens_lut = np.array([len(e) for e in exp], dtype=np.int32)
    offs_lut = np.zeros(256, dtype=np.int32)
    np.cumsum(lens_lut[:-1], out=offs_lut[1:])
    flat = np.frombuffer(b"".join(exp), dtype=np.uint8)

    def expand(a: np.ndarray) -> np.ndarray:
        lens = lens_lut[a]
        ends = np.cumsum(lens, dtype=np.int32)  # chunk output < 2^31
        total = int(ends[-1]) if len(ends) else 0
        # out[j] = flat[table_off_of_its_code + (j - out_start_of_its_code)]
        #        = flat[delta_of_its_code + j] — ONE repeat, not two
        delta = offs_lut[a] - (ends - lens)
        idx = np.repeat(delta, lens)
        idx += np.arange(total, dtype=np.int32)
        return flat[idx]

    # chunked: expansion is per-byte local, so chunks decode independently
    # and the gather index arrays stay cache-sized
    pieces = [expand(enc[s : s + CHUNK]) for s in range(0, enc_len, CHUNK)]
    if not pieces:
        return b""
    return (np.concatenate(pieces) if len(pieces) > 1 else pieces[0]).tobytes()


def encode_lb(lengths: np.ndarray, blob) -> bytes:
    """(lengths, blob) form — byte-identical to encode, no objects."""
    lb = forpack.encode(np.ascontiguousarray(lengths, dtype=np.int64))
    return struct.pack("<II", len(lengths), len(lb)) + lb + compress_corpus(bytes(blob))


def decode_lb(buf: bytes | memoryview) -> tuple[np.ndarray, bytes]:
    buf = memoryview(buf)
    n, len_bytes = struct.unpack_from("<II", buf, 0)
    lengths = forpack.decode(buf[8 : 8 + len_bytes])
    return lengths, decompress_corpus(buf[8 + len_bytes :])


def encode(values: np.ndarray, binary: bool = False) -> bytes:
    lengths, blob = to_blob(values, binary=binary)
    return encode_lb(lengths, blob)


def decode(buf: bytes | memoryview, binary: bool = False) -> np.ndarray:
    lengths, blob = decode_lb(buf)
    return from_blob(lengths, blob, binary=binary)
