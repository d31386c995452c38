"""Arrow column <-> dense numpy values + validity bitmap.

The null story of the engine: the reference carries nulls as RLE'd
definition levels (StringWriteSupport.java:70-72, ColumnWriterV1.java:162-168,
null-aware skip SkippingColumnReaderImpl.java:660-671); ours is an Arrow-style
validity bitmap packed with np.packbits — codecs only ever see dense non-null
values (SURVEY.md §2.2 E11 / §2.5 Q4).
"""

from __future__ import annotations

import hashlib
import re

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


_DEC_RE = re.compile(r"^decimal64\((\d+),(\d+)\)$")
_DEC128_RE = re.compile(r"^decimal128\((\d+),(\d+)\)$")
_VEC_RE = re.compile(r"^vector\((float32|float64)\)$")

_VEC_DTYPES = {"float32": (np.float32, pa.float32(), 4),
               "float64": (np.float64, pa.float64(), 8)}


def decimal_params(lt: str) -> tuple[int, int] | None:
    m = _DEC_RE.match(lt)
    return (int(m.group(1)), int(m.group(2))) if m else None


def decimal128_params(lt: str) -> tuple[int, int] | None:
    m = _DEC128_RE.match(lt)
    return (int(m.group(1)), int(m.group(2))) if m else None


def vector_params(lt: str) -> tuple[np.dtype, object, int] | None:
    """vector(float32|float64) -> (numpy dtype, arrow value type, itemsize),
    else None. Embedding columns (Spark array<float>/array<double>) are
    stored as their raw little-endian element bytes riding the var-len
    BINARY codec family — Arrow's list layout IS a (lengths, blob)
    decomposition, exactly like strings."""
    m = _VEC_RE.match(lt)
    return _VEC_DTYPES[m.group(1)] if m else None


def codec_type(lt: str) -> str:
    """Logical type as the CODECS see it: decimal64(p,s) is carried as its
    unscaled int64 (the reference stores decimals as fixed-width ints too,
    EncValuesWriterFactory.java:82-101); decimal128(p,s) — precision 19..38 —
    rides the BINARY codec family as a 16-byte ORDER-PRESERVING key
    (offset-binary big-endian, the FIXED_LEN_BYTE_ARRAY decimal analog), so
    dictionaries, zone maps and range predicates all work byte-wise;
    everything else maps to itself."""
    if lt.startswith("decimal64("):
        return "int64"
    if lt.startswith("decimal128(") or lt.startswith("vector("):
        return "binary"
    return lt


def dec128_key(unscaled: int) -> bytes:
    """Unscaled int128 -> 16-byte big-endian offset-binary key: byte order
    equals numeric order (two's complement with the sign bit flipped)."""
    return (unscaled + (1 << 127)).to_bytes(16, "big")


def dec128_unkey(key: bytes) -> int:
    return int.from_bytes(key, "big") - (1 << 127)


def spark_type(lt: str) -> str:
    p = decimal_params(lt) or decimal128_params(lt)
    if p:
        return f"decimal({p[0]},{p[1]})"
    vp = vector_params(lt)
    if vp:
        return "array<float>" if vp[2] == 4 else "array<double>"
    return SPARK_FROM_LOGICAL[lt]


def pa_type(lt: str):
    p = decimal_params(lt) or decimal128_params(lt)
    if p:
        return pa.decimal128(*p)
    vp = vector_params(lt)
    if vp:
        return pa.list_(vp[1])
    return _PA_FROM_LOGICAL[lt]


def logical_types(schema: T.StructType) -> dict[str, str]:
    out = {}
    for f in schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            p, s = f.dataType.precision, f.dataType.scale
            if p > 38:
                raise TypeError(
                    f"decimal precision > 38 not supported ({f.name}: decimal({p},{s}))"
                )
            out[f.name] = (f"decimal64({p},{s})" if p <= 18 else f"decimal128({p},{s})")
            continue
        if isinstance(f.dataType, T.ArrayType):
            et = f.dataType.elementType
            if isinstance(et, T.FloatType):
                out[f.name] = "vector(float32)"
                continue
            if isinstance(et, T.DoubleType):
                out[f.name] = "vector(float64)"
                continue
            raise TypeError(
                f"unsupported array element type {et.typeName()} for {f.name} "
                "(vector columns support float/double elements)"
            )
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
    elif lt.startswith("decimal64("):
        # decimal128 data buffer = 16-byte LE two's-complement ints; with
        # p <= 18 the signed value lives entirely in the low 64-bit word
        raw = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            offset=arr.offset * 16, count=2 * len(arr))
        vals = raw[::2].copy()
    elif lt.startswith("decimal128("):
        # p 19..38: full 16-byte value -> order-preserving big-endian
        # offset-binary keys (flip the two's-complement sign bit, byteswap)
        raw = np.frombuffer(arr.buffers()[1], dtype=np.uint64,
                            offset=arr.offset * 16, count=2 * len(arr))
        be = np.empty((len(arr), 2), dtype=">u8")
        be[:, 0] = raw[1::2] ^ np.uint64(1 << 63)  # high word, sign flipped
        be[:, 1] = raw[::2]
        # materialize the 16-byte keys as object bytes WITHOUT a Python
        # loop: view the packed buffer as a fixed-stride binary array and
        # let Arrow's C path cut it up
        off16 = np.arange(len(arr) + 1, dtype=np.int64) * 16
        keys = pa.Array.from_buffers(
            pa.large_binary(), len(arr),
            [None, pa.py_buffer(off16.tobytes()), pa.py_buffer(be.tobytes())],
        )
        vals = np.array(keys.to_pylist(), dtype=object) if len(arr) else \
            np.empty(0, dtype=object)
    elif lt.startswith("vector("):
        # each (non-null) vector as its raw element-bytes blob: object bytes,
        # the same shape the binary codec family dedups/sorts/bounds on
        b = vector_to_binary(arr, lt)  # arr already null-free here
        vals = np.array(b.to_pylist(), dtype=object) if len(b) else np.empty(0, dtype=object)
    elif lt == "binary":
        vals = np.array(arr.to_pylist(), dtype=object) if len(arr) else np.empty(0, dtype=object)
    else:
        vals = arr.to_numpy(zero_copy_only=False)
        if lt == "string" and vals.dtype != object:
            vals = vals.astype(object)
    return vals, mask


def vector_to_binary(arr: pa.ChunkedArray | pa.Array, lt: str) -> pa.Array:
    """list<float> column -> large_binary of each row's raw little-endian
    element bytes, validity preserved — Arrow's list layout already IS the
    (lengths, blob) decomposition the var-len codecs consume, so this is one
    flatten + one contiguous buffer view, zero per-row Python. Element-level
    nulls are rejected: a vector exists whole or is NULL."""
    import pyarrow.compute as pc

    np_dt, pa_vt, itemsize = vector_params(lt)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mask = np.asarray(arr.is_valid()) if arr.null_count else None
    flat = pc.list_flatten(arr)  # non-null rows' elements, row order
    if flat.null_count:
        raise TypeError(f"null element inside {lt} value")
    if flat.type != pa_vt:
        flat = flat.cast(pa_vt)
    blob = memoryview(flat.buffers()[1])[
        flat.offset * itemsize : (flat.offset + len(flat)) * itemsize
    ]
    lens = pc.list_value_length(arr)
    if lens.null_count:
        lens = lens.drop_null()
    dense_lens = np.asarray(lens, dtype=np.int64) * itemsize
    n = len(mask) if mask is not None else len(dense_lens)
    full = dense_lens
    if mask is not None:
        full = np.zeros(n, dtype=np.int64)
        full[mask] = dense_lens
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(full, out=offsets[1:])
    vbuf = None if mask is None else pa.py_buffer(
        np.packbits(mask, bitorder="little").tobytes()
    )
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [vbuf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
        null_count=0 if mask is None else int(n - mask.sum()),
    )


def lb_to_vector(lengths: np.ndarray, blob, mask: np.ndarray | None, lt: str) -> pa.Array:
    """(dense byte lengths, element blob) + optional notnull mask ->
    list<float> Arrow array — the decode-side inverse of vector_to_binary
    (nulls reinflate as empty slots under the validity bitmap)."""
    np_dt, pa_vt, itemsize = vector_params(lt)
    n = len(mask) if mask is not None else len(lengths)
    full = np.asarray(lengths, dtype=np.int64)
    if mask is not None:
        dense = full
        full = np.zeros(n, dtype=np.int64)
        full[mask] = dense
    elem_lens = full // itemsize
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(elem_lens, out=offsets[1:])
    child = pa.Array.from_buffers(pa_vt, int(offsets[-1]), [None, pa.py_buffer(blob)])
    vbuf = None if mask is None else pa.py_buffer(
        np.packbits(mask, bitorder="little").tobytes()
    )
    arr = pa.Array.from_buffers(
        pa.large_list(pa_vt), n, [vbuf, pa.py_buffer(offsets.tobytes())],
        null_count=0 if mask is None else int(n - mask.sum()),
        children=[child],
    )
    return arr.cast(pa.list_(pa_vt))


def dense_to_arrow(values: np.ndarray, mask: np.ndarray | None, lt: str) -> pa.Array:
    """Reinflate nulls and convert to the Arrow type Spark expects."""
    if vector_params(lt):
        # object array of per-row element-bytes blobs (dict/fallback paths)
        lengths = np.fromiter((len(v) for v in values), dtype=np.int64,
                              count=len(values))
        return lb_to_vector(lengths, b"".join(values), mask, lt)
    dp128 = decimal128_params(lt)
    if dp128:
        n = len(mask) if mask is not None else len(values)
        be = np.zeros((n, 2), dtype=">u8")
        if len(values):
            joined = np.frombuffer(b"".join(values), dtype=">u8").reshape(-1, 2)
            if mask is None:
                be[:] = joined
            else:
                be[mask] = joined
        pairs = np.empty((n, 2), dtype=np.uint64)  # little-endian (lo, hi)
        pairs[:, 0] = be[:, 1]
        pairs[:, 1] = be[:, 0].astype(np.uint64) ^ np.uint64(1 << 63)
        vbuf = None if mask is None else pa.py_buffer(
            np.packbits(mask, bitorder="little").tobytes()
        )
        return pa.Array.from_buffers(
            pa.decimal128(*dp128), n, [vbuf, pa.py_buffer(pairs.tobytes())],
            null_count=0 if mask is None else int(n - mask.sum()),
        )
    dp = decimal_params(lt)
    if dp:
        n = len(mask) if mask is not None else len(values)
        lo = np.zeros(n, dtype=np.int64)
        if mask is None:
            lo[:] = values
        else:
            lo[mask] = values
        pairs = np.empty((n, 2), dtype=np.int64)
        pairs[:, 0] = lo
        pairs[:, 1] = lo >> 63  # sign extension to the high word
        vbuf = None if mask is None else pa.py_buffer(
            np.packbits(mask, bitorder="little").tobytes()
        )
        return pa.Array.from_buffers(
            pa.decimal128(*dp), n, [vbuf, pa.py_buffer(pairs.tobytes())],
            null_count=0 if mask is None else int(n - mask.sum()),
        )
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
