"""Property-based codec fuzzing (hypothesis): every applicable
(type, codec) pair must either round-trip EXACTLY or raise — never return
wrong values. Pure numpy layer, no Spark, so hundreds of random cases run
in seconds. This is the adversarial complement of the fixed fixtures: the
reference's unit matrix (SURVEY.md §5) enumerates hand-picked cases; random
data probes the overflow/edge branches (empty blocks, single values,
all-equal runs, extreme int64 magnitudes, NaN floats, empty strings,
non-UTF8 bytes)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from parquet_main_spark.codecs import (
    APPLICABLE,
    _NP_DTYPE,
    decode_block,
    encode_block,
)

_INT_RANGES = {
    "int8": (-(2**7), 2**7 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "date32": (-(2**31), 2**31 - 1),
    "int64": (-(2**63), 2**63 - 1),
    "timestamp": (-(2**62), 2**62),
    "timestamp_ntz": (-(2**62), 2**62),
}


def _int_arrays(lt):
    lo, hi = _INT_RANGES[lt]
    return st.lists(st.integers(lo, hi), min_size=0, max_size=300).map(
        lambda xs: np.array(xs, dtype=np.int64)
    )


def _roundtrip(values, lt, codec):
    """Encode may REFUSE (ValueError/OverflowError — the fallback chain's
    contract); if it accepts, decode must be exact."""
    try:
        data, dict_blob, params = encode_block(values, lt, codec)
    except (ValueError, OverflowError):
        return None
    return decode_block(data, dict_blob, lt, codec, params)


@settings(max_examples=60, deadline=None)
@given(data=st.data(), lt=st.sampled_from(sorted(_INT_RANGES)))
def test_int_codecs_roundtrip_or_refuse(data, lt):
    values = data.draw(_int_arrays(lt))
    ct = "int64" if lt in ("timestamp", "timestamp_ntz") else lt
    for codec in APPLICABLE[ct]:
        got = _roundtrip(values, ct, codec)
        if got is None:
            continue
        want = values
        if ct in ("int8", "int16", "int32", "date32"):
            want = values.astype(_NP_DTYPE[ct]).astype(np.int64)
        np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want,
                                      err_msg=f"{ct}/{codec}")


@settings(max_examples=40, deadline=None)
@given(data=st.data(), lt=st.sampled_from(["float32", "float64"]))
def test_float_codecs_roundtrip_or_refuse(data, lt):
    width = 32 if lt == "float32" else 64
    xs = data.draw(st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=width),
        min_size=0, max_size=200))
    values = np.array(xs, dtype=_NP_DTYPE[lt])
    for codec in APPLICABLE[lt]:
        got = _roundtrip(values, lt, codec)
        if got is None:
            continue
        np.testing.assert_array_equal(
            np.asarray(got, dtype=_NP_DTYPE[lt]), values, err_msg=f"{lt}/{codec}"
        )


@settings(max_examples=40, deadline=None)
@given(xs=st.lists(st.text(max_size=40), min_size=0, max_size=150))
def test_string_codecs_roundtrip_or_refuse(xs):
    values = np.array(xs, dtype=object)
    for codec in APPLICABLE["string"]:
        got = _roundtrip(values, "string", codec)
        if got is None:
            continue
        assert list(got) == xs, codec


@settings(max_examples=40, deadline=None)
@given(xs=st.lists(st.binary(max_size=60), min_size=0, max_size=150))
def test_binary_codecs_roundtrip_or_refuse(xs):
    values = np.array(xs, dtype=object) if xs else np.empty(0, dtype=object)
    for codec in APPLICABLE["binary"]:
        got = _roundtrip(values, "binary", codec)
        if got is None:
            continue
        assert [bytes(b) for b in got] == xs, codec


@settings(max_examples=30, deadline=None)
@given(xs=st.lists(st.booleans(), min_size=0, max_size=300))
def test_bool_codecs_roundtrip(xs):
    values = np.array(xs, dtype=np.bool_)
    for codec in APPLICABLE["bool"]:
        got = _roundtrip(values, "bool", codec)
        assert got is not None, f"bool/{codec} refused"
        np.testing.assert_array_equal(np.asarray(got, dtype=np.bool_), values,
                                      err_msg=codec)


@settings(max_examples=40, deadline=None)
@given(xs=st.lists(st.integers(-(2**127) + 1, 2**127 - 1), min_size=0, max_size=120))
def test_decimal128_key_order_and_roundtrip(xs):
    """The 16-byte offset-binary keys ORDER exactly like the ints they
    encode, and unkey is the exact inverse — the property the zone maps,
    dictionaries and range predicates all lean on."""
    from parquet_main_spark.functions.arrow import dec128_key, dec128_unkey

    keys = [dec128_key(x) for x in xs]
    assert [dec128_unkey(k) for k in keys] == xs
    order_by_int = sorted(range(len(xs)), key=lambda i: xs[i])
    order_by_key = sorted(range(len(xs)), key=lambda i: keys[i])
    assert [xs[i] for i in order_by_int] == [xs[i] for i in order_by_key]


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_vector_blob_roundtrip(data):
    """vector_to_binary / lb_to_vector are exact inverses over ragged,
    null-bearing list<float32> arrays."""
    import pyarrow as pa

    from parquet_main_spark.functions.arrow import lb_to_vector, vector_to_binary

    rows = data.draw(st.lists(
        st.one_of(st.none(),
                  st.lists(st.floats(allow_nan=False, width=32), max_size=8)),
        max_size=60,
    ))
    arr = pa.array(rows, type=pa.list_(pa.float32()))
    b = vector_to_binary(arr, "vector(float32)")
    assert b.is_valid().to_pylist() == [r is not None for r in rows]
    mask = np.array([r is not None for r in rows]) if arr.null_count else None
    dense = b.drop_null() if b.null_count else b
    lengths = np.array([len(x) for x in dense.to_pylist()], dtype=np.int64)
    blob = b"".join(dense.to_pylist())
    back = lb_to_vector(lengths, blob, mask, "vector(float32)")
    got = back.to_pylist()
    for g, r in zip(got, rows):
        if r is None:
            assert g is None
        else:
            assert g == pa.array([r], type=pa.list_(pa.float32())).to_pylist()[0]


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_bitpack_gather_inverse_any_width(data):
    """pack_bits/unpack_bits are exact inverses at EVERY width 1..64 for
    arbitrary values — the width<=57 path is the 8-byte-gather fast route
    (_gather_bits), widths 58..64 the bit-matrix fallback; both must agree
    with the packer."""
    import numpy as np

    from parquet_main_spark.codecs.bitpack import pack_bits, unpack_bits

    width = data.draw(st.integers(1, 64))
    n = data.draw(st.integers(0, 700))
    hi = (1 << width) - 1
    vals = np.array(
        data.draw(st.lists(st.integers(0, hi), min_size=n, max_size=n)),
        dtype=np.uint64,
    )
    assert (unpack_bits(pack_bits(vals, width), n, width) == vals).all()


@given(st.data())
@settings(max_examples=80, deadline=None)
def test_gather_bits_matches_slow_reference(data):
    """_gather_bits at ARBITRARY (offset, width) pairs — the multi-segment
    RLE/FOR decode contract — against a bit-by-bit Python oracle."""
    import numpy as np

    from parquet_main_spark.codecs.bitpack import _gather_bits

    nbytes = data.draw(st.integers(1, 64))
    raw = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=nbytes, max_size=nbytes)),
        dtype=np.uint8,
    )
    n = data.draw(st.integers(1, 32))
    widths = np.array(data.draw(st.lists(st.integers(0, 57), min_size=n, max_size=n)),
                      dtype=np.int64)
    offs = np.array(
        [data.draw(st.integers(0, max(0, nbytes * 8 - int(w))))
         for w in widths], dtype=np.int64)
    padded = np.concatenate([raw, np.zeros(8, np.uint8)])
    got = _gather_bits(padded, offs, widths)

    bits = np.unpackbits(raw, bitorder="little")

    def bit(i):  # bits past the raw buffer read as 0 (the 8-byte pad)
        return int(bits[i]) if i < len(bits) else 0

    for k in range(n):
        w, o = int(widths[k]), int(offs[k])
        want = sum(bit(o + j) << j for j in range(w))
        assert int(got[k]) == want, (k, w, o)
