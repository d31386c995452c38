"""Codec registry: block-level encode/decode over dense numpy arrays.

The analog of the reference's per-column writer dispatch
(EncValuesWriterFactory.java:48-227 — (type, encoding) -> ValuesWriter) as a
plain function table. A "block" is a bounded slice of one column of one
partition (SURVEY.md §1 page analog); nulls are handled one level up via a
validity bitmap (the def-level analog, ParquetProperties.java:109-124), so
codecs here see only dense non-null values.

Logical types: int32 int64 float32 float64 bool timestamp string binary.
Every encoder returns ``(data, dict_blob | None, params)``; decoders are
exact inverses (bit-identity is asserted by tests/test_codecs.py).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from . import delta, dict_codec, forpack, fsst, plain, prefix, rle
from .bitpack import bit_width

#: bump when any on-disk block/codec layout changes (readers reject mismatches)
FORMAT_VERSION = 5

INT_TYPES = {"int8", "int16", "int32", "int64", "timestamp", "timestamp_ntz", "date32"}
FLOAT_TYPES = {"float32", "float64"}
VAR_TYPES = {"string", "binary"}

_NP_DTYPE = {
    "int8": np.int8,
    "int16": np.int16,
    "int32": np.int32,
    "int64": np.int64,
    "timestamp": np.int64,  # microseconds since epoch
    "timestamp_ntz": np.int64,
    "date32": np.int32,  # days since epoch
    "float32": np.float32,
    "float64": np.float64,
    "bool": np.bool_,
}

#: decode-side narrowing: codecs work in int64; these come back narrower
NARROW_INT = {"int8": np.int8, "int16": np.int16, "int32": np.int32, "date32": np.int32}

_INT_CODECS = ["dict", "rle", "for", "delta", "plain"]

_DICT_KIND = {
    **{t: dict_codec.KIND_INT64 for t in INT_TYPES},
    "float32": dict_codec.KIND_FLOAT64,
    "float64": dict_codec.KIND_FLOAT64,
    "string": dict_codec.KIND_UTF8,
    "binary": dict_codec.KIND_BINARY,
}

#: codecs applicable per logical type, in fallback preference order
APPLICABLE = {
    **{t: list(_INT_CODECS) for t in INT_TYPES},
    "bool": ["rle", "plain"],
    "float32": ["dict", "plain"],
    "float64": ["dict", "plain"],
    "string": ["dict", "fsst", "prefix", "plain"],
    "binary": ["dict", "fsst", "prefix", "plain"],
}


def _as_int64(values: np.ndarray, logical_type: str) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.int64)


def encode_block(
    values: np.ndarray, logical_type: str, codec: str
) -> tuple[bytes, bytes | None, dict[str, Any]]:
    """Encode dense non-null values. Raises on inapplicable codec/overflow —
    callers fall back down the APPLICABLE chain (the reference's dictionary
    fallback-to-plain analog, DictionaryValuesWriter.java:119-128)."""
    if codec == "plain":
        if logical_type in VAR_TYPES:
            return plain.encode_var(values, binary=logical_type == "binary"), None, {}
        if logical_type == "bool":
            return plain.encode_fixed(np.ascontiguousarray(values, dtype=np.uint8)), None, {}
        return plain.encode_fixed(np.ascontiguousarray(values, dtype=_NP_DTYPE[logical_type])), None, {}
    if codec == "for":
        return forpack.encode(_as_int64(values, logical_type)), None, {}
    if codec == "delta":
        return delta.encode(_as_int64(values, logical_type)), None, {}
    if codec == "rle":
        if logical_type == "bool":
            u = np.ascontiguousarray(values, dtype=np.uint64)
            return rle.encode(u, 1), None, {"base": 0}
        v = _as_int64(values, logical_type)
        base = int(v.min()) if len(v) else 0
        span = (int(v.max()) - base) if len(v) else 0
        return rle.encode((v - base).astype(np.uint64), bit_width(span)), None, {"base": base}
    if codec == "dict":
        kind = _DICT_KIND[logical_type]
        if logical_type in INT_TYPES:
            vals: np.ndarray = _as_int64(values, logical_type)
        elif logical_type in FLOAT_TYPES:
            vals = np.ascontiguousarray(values, dtype=np.float64)
        else:
            vals = values
        ids, blob = dict_codec.build(vals, kind)
        return ids, blob, {}
    if codec == "fsst":
        return fsst.encode(values, binary=logical_type == "binary"), None, {}
    if codec == "prefix":
        return prefix.encode(values, binary=logical_type == "binary"), None, {}
    raise ValueError(f"unknown codec {codec!r}")


def decode_block(
    data: bytes, dict_blob: bytes | None, logical_type: str, codec: str, params: dict[str, Any]
) -> np.ndarray:
    """Decode to dense values in the logical numpy dtype (object for var-len)."""
    if codec == "plain":
        if logical_type in VAR_TYPES:
            return plain.decode_var(data, binary=logical_type == "binary")
        if logical_type == "bool":
            return plain.decode_fixed(data, np.uint8).astype(np.bool_)
        return plain.decode_fixed(data, np.dtype(_NP_DTYPE[logical_type]))
    if codec == "for":
        out = forpack.decode(data)
    elif codec == "delta":
        out = delta.decode(data)
    elif codec == "rle":
        if logical_type == "bool":
            return rle.decode(data).astype(np.bool_)
        out = rle.decode(data).astype(np.int64) + int(params.get("base", 0))
    elif codec == "dict":
        vals = dict_codec.decode(data, dict_blob)
        if logical_type in NARROW_INT:
            return vals.astype(NARROW_INT[logical_type])
        if logical_type == "float32":
            return vals.astype(np.float32)
        return vals
    elif codec == "fsst":
        return fsst.decode(data, binary=logical_type == "binary")
    elif codec == "prefix":
        return prefix.decode(data, binary=logical_type == "binary")
    else:
        raise ValueError(f"unknown codec {codec!r}")
    if logical_type in NARROW_INT:
        return out.astype(NARROW_INT[logical_type])
    return out


def params_dumps(params: dict[str, Any]) -> str:
    return json.dumps(params, sort_keys=True, separators=(",", ":"))


def params_loads(s: str | None) -> dict[str, Any]:
    return json.loads(s) if s else {}
