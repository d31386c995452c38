"""Whole-engine property test: random schema x values x nulls x block size
through the REAL encode group -> bucket file -> decode file path (no Spark
job per example — _encode_group/_decode_file run in-process, the same code
the executor tasks run; the Spark-level plumbing is covered by
tests/test_engine.py). Catches cross-column integration bugs the per-codec
round-trip fuzz (tests/test_codecs_property.py) cannot: plan/codec
interplay, validity reinflation across columns, block-group flushing,
dict-row overlay."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_main_spark.operators.decode import _decode_file
from parquet_main_spark.operators.encode import (
    _encode_group, _write_bucket_file,
)

# (logical type, element strategy) — every family the engine stores
_COLS = {
    "int64": st.integers(-(1 << 62), 1 << 62),
    "int32": st.integers(-(1 << 31), (1 << 31) - 1),
    "float64": st.floats(allow_nan=False, width=64),
    "bool": st.booleans(),
    "string": st.text(max_size=12),
    "binary": st.binary(max_size=12),
    "timestamp": st.integers(-(1 << 50), 1 << 50),  # micros
}
_PLANS = ["plain", "dict", "rle", "for", "delta", "fsst", "prefix"]
_APPLICABLE_PLAN = {
    "int64": ["plain", "dict", "rle", "for", "delta"],
    "int32": ["plain", "dict", "rle", "for", "delta"],
    "float64": ["plain", "dict"],
    "bool": ["plain", "rle"],
    "string": ["plain", "dict", "fsst", "prefix"],
    "binary": ["plain", "dict", "fsst", "prefix"],
    "timestamp": ["plain", "dict", "rle", "for", "delta"],
}


def _pa_type(lt: str):
    return {
        "int64": pa.int64(), "int32": pa.int32(), "float64": pa.float64(),
        "bool": pa.bool_(), "string": pa.string(), "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
    }[lt]


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_random_schema_roundtrips_exactly(data):
    import shutil
    import tempfile
    lts = data.draw(st.lists(st.sampled_from(sorted(_COLS)), min_size=1,
                             max_size=4))
    logical = {f"c{i}": lt for i, lt in enumerate(lts)}
    n = data.draw(st.integers(1, 200))
    block_size = data.draw(st.sampled_from([1, 3, 16, 64, 256]))
    arrays, plan = {}, {}
    for col, lt in logical.items():
        vals = data.draw(st.lists(
            st.one_of(st.none(), _COLS[lt]), min_size=n, max_size=n))
        arrays[col] = pa.array(vals, type=_pa_type(lt))
        plan[col] = data.draw(st.sampled_from(_APPLICABLE_PLAN[lt]))
    tbl = pa.table(arrays)

    out = tempfile.mkdtemp(prefix="engfuzz_")
    enc = _encode_group(logical, plan, block_size, [next(iter(logical))],
                        0, tbl, None, frozenset())
    _write_bucket_file(f"{out}/blocks", 0, enc)
    path = f"{out}/blocks/bucket=0/part-00000.parquet"

    try:
        got = pa.Table.from_batches(
            list(_decode_file(path, logical, list(logical), None, {})),
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    # the encoder sorts by the order_by column; compare as aligned multisets
    # by sorting BOTH sides on every column (nulls last, deterministic)
    order = [(c, "ascending") for c in logical]
    want = tbl.sort_by(order)
    got = got.sort_by(order)
    assert got.num_rows == n
    for col, lt in logical.items():
        g, w = got.column(col).to_pylist(), want.column(col).to_pylist()
        if lt == "float64":
            for a, b in zip(g, w):
                assert (a is None) == (b is None)
                if a is not None:
                    assert a == b or (math.isnan(a) and math.isnan(b))
        else:
            assert g == w, (col, lt, plan[col])
