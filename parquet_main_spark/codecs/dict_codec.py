"""Sorted (order-preserving) dictionary codec.

Analog of the reference's dictionary family: hash-dictionary with RLE-packed
ids (reference: values/dictionary/DictionaryValuesWriter.java:66-635; ids via
the RLE hybrid :156-183) and — crucially — the one-pass ORDER-PRESERVING
dictionary (OnePassOrderPreservingDictionaryValuesWriter.java:22-269), whose
point is that ids are rank-ordered so range predicates evaluate directly in
id space (OnePassOrderPreservingDictionary.java:82-98).

At our block granularity one np.unique pass yields the sorted dictionary and
rank ids directly — no page-boundary re-encode needed (SURVEY.md §2.2 E4).
Determinism: np.unique sorts, so the dictionary is canonical for its content.

Data layout (ids):   rle(ids, width = bit_length(card-1))
Dict blob layout::

    u8 kind      # 0=utf8 1=binary 2=int64 3=float64
    u32 card
    kind 0/1: u32 len_bytes, forpack(lengths), blob
    kind 2/3: raw LE values (8B each)

Predicate translation (the reference's "in-situ query",
column/Dictionary.java:107-132): see :func:`translate_range` /
:func:`translate_isin` — predicates are evaluated once against the (tiny)
sorted dictionary and become integer comparisons on ids.
"""

from __future__ import annotations

import struct

import numpy as np

from . import forpack, rle
from .bitpack import bit_width
from .strutil import from_blob, to_blob

KIND_UTF8, KIND_BINARY, KIND_INT64, KIND_FLOAT64 = 0, 1, 2, 3


def sorted_unique(values: np.ndarray, kind: int) -> np.ndarray:
    """Canonical (sorted, typed) dictionary values for a value set."""
    if kind in (KIND_UTF8, KIND_BINARY):
        return np.unique(values)
    dtype = np.int64 if kind == KIND_INT64 else np.float64
    return np.unique(np.ascontiguousarray(values, dtype=dtype))


def pack_dict(uniq: np.ndarray, kind: int) -> bytes:
    """Serialize a sorted dictionary to the dict-blob layout."""
    if kind in (KIND_UTF8, KIND_BINARY):
        lengths, blob = to_blob(uniq, binary=(kind == KIND_BINARY))
        lb = forpack.encode(lengths)
        return struct.pack("<BII", kind, len(uniq), len(lb)) + lb + blob
    return struct.pack("<BI", kind, len(uniq)) + np.ascontiguousarray(uniq).tobytes()


def build(values: np.ndarray, kind: int) -> tuple[bytes, bytes]:
    """Return (ids_bytes, dict_blob) for non-null values."""
    if kind in (KIND_UTF8, KIND_BINARY):
        uniq, inverse = np.unique(values, return_inverse=True)
    else:
        dtype = np.int64 if kind == KIND_INT64 else np.float64
        uniq, inverse = np.unique(np.ascontiguousarray(values, dtype=dtype), return_inverse=True)
    ids = rle.encode(inverse.astype(np.uint64), bit_width(len(uniq) - 1))
    return ids, pack_dict(uniq, kind)


def load_dict(dict_blob: bytes | memoryview) -> np.ndarray:
    buf = memoryview(dict_blob)
    kind = buf[0]
    if kind in (KIND_UTF8, KIND_BINARY):
        _, card, len_bytes = struct.unpack_from("<BII", buf, 0)
        lengths = forpack.decode(buf[9 : 9 + len_bytes])
        return from_blob(lengths, bytes(buf[9 + len_bytes :]), binary=(kind == KIND_BINARY))
    _, card = struct.unpack_from("<BI", buf, 0)
    dtype = np.int64 if kind == KIND_INT64 else np.float64
    return np.frombuffer(buf, dtype=dtype, count=card, offset=5).copy()


def decode_ids(ids_bytes: bytes | memoryview) -> np.ndarray:
    return rle.decode(ids_bytes).astype(np.int64)


def decode(ids_bytes: bytes | memoryview, dict_blob: bytes | memoryview) -> np.ndarray:
    return load_dict(dict_blob)[decode_ids(ids_bytes)]


# ---- predicate translation (in-situ query) --------------------------------

def translate_range(sorted_dict: np.ndarray, lo=None, hi=None) -> tuple[int, int]:
    """value-range [lo, hi] (inclusive; None = open) -> id-range [a, b)."""
    a = 0 if lo is None else int(np.searchsorted(sorted_dict, lo, side="left"))
    b = len(sorted_dict) if hi is None else int(np.searchsorted(sorted_dict, hi, side="right"))
    return a, b


def translate_isin(sorted_dict: np.ndarray, values) -> np.ndarray:
    """value set -> sorted array of matching ids (absent values dropped)."""
    vals = np.asarray(values, dtype=sorted_dict.dtype)
    pos = np.searchsorted(sorted_dict, vals, side="left")
    ok = (pos < len(sorted_dict)) & (sorted_dict[np.minimum(pos, len(sorted_dict) - 1)] == vals)
    return np.unique(pos[ok])
