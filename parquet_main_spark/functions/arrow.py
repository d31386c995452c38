"""Arrow column <-> dense numpy values + validity bitmap.

The null story of the engine: the reference carries nulls as RLE'd
definition levels (StringWriteSupport.java:70-72, ColumnWriterV1.java:162-168,
null-aware skip SkippingColumnReaderImpl.java:660-671); ours is an Arrow-style
validity bitmap packed with np.packbits — codecs only ever see dense non-null
values (SURVEY.md §2.2 E11 / §2.5 Q4).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pyspark.sql import types as T

LOGICAL_FROM_SPARK = {
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "bool",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "date": "date32",
    "string": "string",
    "binary": "binary",
}

SPARK_FROM_LOGICAL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "bool": "boolean",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "date32": "date",
    "string": "string",
    "binary": "binary",
}

_PA_FROM_LOGICAL = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
    "date32": pa.date32(),
    "string": pa.string(),
    "binary": pa.binary(),
}


def logical_types(schema: T.StructType) -> dict[str, str]:
    out = {}
    for f in schema.fields:
        name = f.dataType.typeName()
        if name not in LOGICAL_FROM_SPARK:
            raise TypeError(f"unsupported column type {name} for {f.name}")
        out[f.name] = LOGICAL_FROM_SPARK[name]
    return out


def arrow_to_dense(arr: pa.ChunkedArray | pa.Array, lt: str) -> tuple[np.ndarray, np.ndarray | None]:
    """-> (dense non-null values as numpy, notnull mask or None if no nulls).

    Dense dtypes: ints/timestamp -> int64/int32 exact, floats exact,
    string/binary -> object array.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mask = None
    if arr.null_count:
        mask = np.asarray(arr.is_valid())
        arr = arr.drop_null()
    if lt.startswith("timestamp"):
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    elif lt == "date32":
        vals = arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
    elif lt == "binary":
        vals = np.array(arr.to_pylist(), dtype=object) if len(arr) else np.empty(0, dtype=object)
    else:
        vals = arr.to_numpy(zero_copy_only=False)
        if lt == "string" and vals.dtype != object:
            vals = vals.astype(object)
    return vals, mask


def dense_to_arrow(values: np.ndarray, mask: np.ndarray | None, lt: str) -> pa.Array:
    """Reinflate nulls and convert to the Arrow type Spark expects."""
    typ = _PA_FROM_LOGICAL[lt]
    if mask is None:
        if lt.startswith("timestamp"):
            return pa.array(np.ascontiguousarray(values, dtype=np.int64)).cast(typ)
        if lt == "date32":
            return pa.array(np.ascontiguousarray(values, dtype=np.int32)).cast(typ)
        return pa.array(values, type=typ)
    n = len(mask)
    if lt in ("string", "binary"):
        full = np.empty(n, dtype=object)
        full[:] = None
        full[mask] = values
        return pa.array(full, type=typ)
    dtype = {"int8": np.int8, "int16": np.int16, "int32": np.int32, "int64": np.int64,
             "timestamp": np.int64, "timestamp_ntz": np.int64, "date32": np.int32,
             "float32": np.float32, "float64": np.float64, "bool": np.bool_}[lt]
    full = np.zeros(n, dtype=dtype)
    full[mask] = values
    arr = pa.array(full, mask=~mask)
    return arr.cast(typ)


def pack_validity(mask: np.ndarray | None) -> bytes | None:
    if mask is None:
        return None
    return np.packbits(mask, bitorder="little").tobytes()


def unpack_validity(buf: bytes | None, n: int) -> np.ndarray | None:
    if buf is None:
        return None
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little", count=n).astype(bool)


def canonical_sha_lb(lengths: np.ndarray, blob, mask: np.ndarray | None) -> str:
    """(lengths, blob) form of canonical_sha for var-len columns — produces
    the IDENTICAL digest without materializing value objects."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(lengths, dtype=np.int64).tobytes())
    h.update(blob)
    if mask is not None:
        h.update(np.packbits(mask, bitorder="little").tobytes())
    return h.hexdigest()


def canonical_sha(values: np.ndarray, mask: np.ndarray | None, lt: str) -> str:
    """SHA-256 of the canonical dense byte serialization + validity —
    the bit-identity fixture digest (FIXTURES.md invariant 1)."""
    h = hashlib.sha256()
    if lt in ("string", "binary"):
        from ..codecs.strutil import to_blob

        lengths, blob = to_blob(values, binary=lt == "binary")
        h.update(lengths.tobytes())
        h.update(blob)
    else:
        h.update(np.ascontiguousarray(values).tobytes())
    if mask is not None:
        h.update(np.packbits(mask, bitorder="little").tobytes())
    return h.hexdigest()
