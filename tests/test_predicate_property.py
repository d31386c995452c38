"""Property-based equivalence of the full predicate scan path.

Hypothesis generates arbitrary And/Or/Not trees over every op the engine
supports and checks `_decode_file` (zone-map classification, Kleene row
masks, in-situ dictionary translation, validity-bitmap null tests) against
an INDEPENDENT three-valued-logic oracle written directly in this file —
a row is returned iff the tree evaluates to SQL TRUE (not NULL, not
FALSE). The table is encoded once with tiny blocks so block pruning, the
definite-all-match classification (Not pruning), and boundary blocks are
all genuinely exercised; examples run through pyarrow only (no Spark job
per example), so the fuzz is cheap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hypothesis import given, settings, strategies as st

from parquet_main_spark.operators.decode import And, Not, Or, Predicate

COLS = {
    "id": "int64",     # sorted, dense — delta/zone-map friendly
    "v": "int64",      # nullable ints
    "f": "float64",    # nullable floats (no NaN: SQL NaN semantics differ)
    "lang": "string",  # low-cardinality -> dictionary path
    "t": "string",     # high-cardinality -> fsst/prefix path + startswith
}


def _make_pdf(n=512, seed=11):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-50, 50, n).astype("float64"),
            "f": np.round(rng.normal(0, 10, n), 3),
            "lang": rng.choice(["en", "de", "fr", "zh", "es"], n),
            "t": [f"doc-{rng.integers(0, 9)}{i:04d}" for i in range(n)],
        }
    )
    for col, frac in (("v", 0.15), ("f", 0.1), ("lang", 0.05), ("t", 0.08)):
        mask = rng.random(n) < frac
        pdf.loc[mask, col] = None
    pdf["v"] = pdf["v"].astype("Int64")
    return pdf


@pytest.fixture(scope="module")
def fuzz_table(spark, tmp_path_factory):
    from parquet_main_spark.operators.encode import (
        EncodeConfig, encode_table, gdicts_from_json, read_meta,
    )

    pdf = _make_pdf()
    out = str(tmp_path_factory.mktemp("predfuzz"))
    df = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "id long, v long, f double, lang string, t string",
    )
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="id",
                                         buckets=1, block_size=32,
                                         snapshot_id="fz"))
    meta = read_meta(spark, out)
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    import glob

    (path,) = glob.glob(f"{out}/blocks/bucket=*/*.parquet")
    return pdf, path, meta["logical"], gd


# ---------------------------------------------------------------- oracle

def _kleene(pred, pdf):
    """(true, false) boolean masks — rows in neither are NULL/unknown."""
    n = len(pdf)
    if isinstance(pred, And):
        t = np.ones(n, bool)
        f = np.zeros(n, bool)
        for c in pred.children:
            ct, cf = _kleene(c, pdf)
            t &= ct
            f |= cf
        return t, f
    if isinstance(pred, Or):
        t = np.zeros(n, bool)
        f = np.ones(n, bool)
        for c in pred.children:
            ct, cf = _kleene(c, pdf)
            t |= ct
            f &= cf
        return t, f
    if isinstance(pred, Not):
        ct, cf = _kleene(pred.child, pdf)
        return cf, ct
    s = pdf[pred.col]
    null = s.isna().to_numpy()
    if pred.op == "isnull":
        return null, ~null
    if pred.op == "notnull":
        return ~null, null
    vals = s.to_numpy(dtype=object)
    ok = ~null

    def cmp(fn):
        t = np.zeros(len(s), bool)
        idx = np.flatnonzero(ok)
        t[idx] = [fn(vals[i]) for i in idx]
        return t, ok & ~t

    if pred.op == "between":
        lo, hi = pred.value
        return cmp(lambda x: lo <= x <= hi)
    if pred.op == "isin":
        vv = set(pred.value)
        return cmp(lambda x: x in vv)
    if pred.op == "startswith":
        return cmp(lambda x: str(x).startswith(pred.value))
    import operator as op_mod

    fn = {"=": op_mod.eq, "!=": op_mod.ne, "<": op_mod.lt,
          "<=": op_mod.le, ">": op_mod.gt, ">=": op_mod.ge}[pred.op]
    return cmp(lambda x: fn(x, pred.value))


# ------------------------------------------------------------- strategies

_INT_VAL = st.integers(-60, 580)
_FLT_VAL = st.floats(-35, 35, allow_nan=False).map(lambda x: round(x, 2))
_LANG = st.sampled_from(["en", "de", "fr", "zh", "es", "xx"])
_TXT = st.sampled_from(["doc-1", "doc-100", "doc-7", "zzz", "doc-30001", ""])
_CMP = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])


def _leaf():
    return st.one_of(
        st.tuples(st.just("id"), _CMP, _INT_VAL),
        st.tuples(st.just("v"), _CMP, _INT_VAL),
        st.tuples(st.just("f"), _CMP, _FLT_VAL),
        st.tuples(st.just("lang"), st.sampled_from(["=", "!=", "<", ">="]), _LANG),
        st.tuples(st.just("t"), st.sampled_from(["=", "<", ">"]), _TXT),
        st.tuples(st.just("id"), st.just("between"),
                  st.tuples(_INT_VAL, _INT_VAL).map(lambda p: tuple(sorted(p)))),
        st.tuples(st.just("v"), st.just("isin"),
                  st.lists(_INT_VAL, min_size=1, max_size=5)),
        st.tuples(st.just("lang"), st.just("isin"),
                  st.lists(_LANG, min_size=1, max_size=3)),
        st.tuples(st.sampled_from(list(COLS)), st.sampled_from(["isnull", "notnull"]),
                  st.none()),
        st.tuples(st.just("t"), st.just("startswith"),
                  st.sampled_from(["doc-1", "doc", "z", "doc-99"])),
    ).map(lambda t: Predicate(*t))


def _tree(depth=2):
    if depth == 0:
        return _leaf()
    sub = _tree(depth - 1)
    return st.one_of(
        _leaf(),
        st.lists(sub, min_size=2, max_size=3).map(And),
        st.lists(sub, min_size=2, max_size=3).map(Or),
        sub.map(Not),
    )


@settings(max_examples=120, deadline=None)
@given(expr=_tree())
def _check_expr(fuzz, expr):
    from parquet_main_spark.operators.decode import _count_file, _decode_file

    pdf, path, logical, gd = fuzz
    batches = list(_decode_file(path, logical, ["id"], expr, gd))
    got = (np.sort(np.concatenate([b.column("id").to_numpy() for b in batches]))
           if batches else np.array([], dtype=np.int64))
    t, _f = _kleene(expr, pdf)
    want = np.sort(pdf["id"].to_numpy()[t])
    np.testing.assert_array_equal(got, want, err_msg=repr(expr))
    # the stats-only COUNT path agrees with the row path
    assert _count_file(path, logical, expr, gd) == len(want), repr(expr)


def test_predicate_trees_match_kleene_oracle(fuzz_table):
    _check_expr(fuzz_table)


# ------------------------------------------------- binary/timestamp table

def _make_pdf2(n=512, seed=23):
    import datetime

    rng = np.random.default_rng(seed)
    base = datetime.datetime(2024, 3, 1)
    ts = [base + datetime.timedelta(minutes=int(m))
          for m in rng.integers(0, 10_000, n)]
    blobs = []
    for i in range(n):
        L = int(rng.integers(0, 24))
        b = bytes(rng.integers(0, 256, L, dtype=np.uint8).tolist())
        # sprinkle 0xFF-prefixed values: the truncate-and-increment stats
        # bound has no finite value there (max_str = None -> conservative)
        if i % 37 == 0:
            b = b"\xff" * 9 + b
        blobs.append(b)
    tags = [bytes([b]) * (b % 3) for b in rng.integers(0, 6, n)]  # incl. b""
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "payload": blobs,
        "tag": tags,  # low-cardinality binary -> dictionary translation path
        "flag": rng.random(n) < 0.4,
    })
    for col, frac in (("ts", 0.1), ("payload", 0.12), ("tag", 0.1)):
        pdf.loc[np.asarray(rng.random(n) < frac), col] = None
    return pdf


@pytest.fixture(scope="module")
def fuzz_table2(spark, tmp_path_factory):
    from parquet_main_spark.operators.encode import (
        EncodeConfig, encode_table, gdicts_from_json, read_meta,
    )

    pdf = _make_pdf2()
    out = str(tmp_path_factory.mktemp("predfuzz2"))
    df = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "id long, ts timestamp, payload binary, tag binary, flag boolean",
    )
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="id",
                                         buckets=1, block_size=32,
                                         snapshot_id="fz2"))
    meta = read_meta(spark, out)
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    import glob

    (path,) = glob.glob(f"{out}/blocks/bucket=*/*.parquet")
    return pdf, path, meta["logical"], gd


def _micros(dt):
    import datetime

    return int((dt - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


_TS_VAL = st.integers(0, 10_000).map(
    lambda m: __import__("datetime").datetime(2024, 3, 1)
    + __import__("datetime").timedelta(minutes=m)
)
_BIN_VAL = st.one_of(
    st.binary(min_size=0, max_size=20),
    st.binary(min_size=0, max_size=6).map(lambda b: b"\xff" * 8 + b),
)


def _leaf2():
    return st.one_of(
        st.tuples(st.just("id"), _CMP, _INT_VAL),
        st.tuples(st.just("ts"), _CMP, _TS_VAL),
        st.tuples(st.just("payload"), _CMP, _BIN_VAL),
        st.tuples(st.just("flag"), st.sampled_from(["=", "!="]), st.booleans()),
        st.tuples(st.just("ts"), st.just("between"),
                  st.tuples(_TS_VAL, _TS_VAL).map(lambda p: tuple(sorted(p)))),
        st.tuples(st.just("payload"), st.just("isin"),
                  st.lists(_BIN_VAL, min_size=1, max_size=4)),
        st.tuples(st.just("tag"), _CMP,
                  st.sampled_from([b"", b"\x00", b"\x01\x01", b"\x03",
                                   b"\x04\x04", b"\x05\x05\x05"])),
        st.tuples(st.just("tag"), st.just("isin"),
                  st.lists(st.sampled_from([b"", b"\x01\x01", b"\x02\x02"]),
                           min_size=1, max_size=3)),
        st.tuples(st.sampled_from(["ts", "payload", "tag"]),
                  st.sampled_from(["isnull", "notnull"]), st.none()),
    ).map(lambda t: Predicate(*t))


def _tree2(depth=2):
    if depth == 0:
        return _leaf2()
    sub = _tree2(depth - 1)
    return st.one_of(
        _leaf2(),
        st.lists(sub, min_size=2, max_size=3).map(And),
        st.lists(sub, min_size=2, max_size=3).map(Or),
        sub.map(Not),
    )


@settings(max_examples=100, deadline=None)
@given(expr=_tree2())
def _check_expr2(fuzz, expr):
    import datetime

    from parquet_main_spark.operators.decode import (
        _count_file, _decode_file, _normalize_expr,
    )

    pdf, path, logical, gd = fuzz

    # scan()'s driver-side literal normalization: timestamps -> micros
    norm = _normalize_expr(expr, logical)
    batches = list(_decode_file(path, logical, ["id"], norm, gd))
    got = (np.sort(np.concatenate([b.column("id").to_numpy() for b in batches]))
           if batches else np.array([], dtype=np.int64))

    # oracle evaluates on the ORIGINAL python values (bytes/datetime compare
    # natively with the generated literals)
    t, _f = _kleene(expr, pdf)
    want = np.sort(pdf["id"].to_numpy()[t])
    np.testing.assert_array_equal(got, want, err_msg=repr(expr))
    assert _count_file(path, logical, norm, gd) == len(want), repr(expr)


def test_predicate_trees_binary_timestamp(fuzz_table2):
    _check_expr2(fuzz_table2)
