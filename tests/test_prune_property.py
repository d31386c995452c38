"""Property-based SOUNDNESS of driver-side file-list pruning.

Round 6 added two layers that drop whole bucket files before any task is
scheduled: bucket-hash candidates for equality/isin on the bucket key
(decode._bucket_candidates via the pure-Python xxh64 port) and
bucket-granularity zone maps from lineage stats_json
(decode._prune_files_by_lineage). Either one silently dropping a file
that holds a matching row is the worst failure mode a scan can have —
rows vanish with no error — so this fuzz drives random And/Or/Not trees
(bucket-key =/isin with present AND absent literals, ranges on stats
columns, null tests) against an independent Kleene oracle over the raw
pandas data and asserts: every bucket that contains an oracle-TRUE row
survives BOTH pruning layers. Salted tables additionally pin that the
candidate set expands to every salt variant of the encode expression.

Examples are pure driver-side planning (no Spark job each): the tables
are encoded once per module, then each example only walks predicate
trees, hashes literals, and reads the (tiny, cached) lineage stats.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from hypothesis import given, settings, strategies as st

from parquet_main_spark.operators.decode import (
    And, Not, Or, Predicate, _bucket_candidates, _list_block_files,
    _normalize_expr, _prune_files_by_bucket, _prune_files_by_lineage,
)

_BUCKET_PAT = re.compile(r"/bucket=(\d+)/")

N = 480
BUCKETS = 8


def _make_pdf(seed=29):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "u": [f"https://h{rng.integers(0, 40)}.example/p{i:04d}" for i in range(N)],
        "v": rng.integers(-100, 100, N).astype("float64"),
        "lang": rng.choice(["en", "de", "fr", "zh"], N),
    })
    pdf.loc[np.asarray(rng.random(N) < 0.12), "v"] = None
    pdf.loc[np.asarray(rng.random(N) < 0.06), "lang"] = None
    pdf["v"] = pdf["v"].astype("Int64")
    return pdf


def _encode(spark, pdf, out, **cfg_kw):
    from parquet_main_spark.operators.encode import EncodeConfig, encode_table

    df = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "u string, v long, lang string",
    )
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="u", buckets=BUCKETS, block_size=32,
        snapshot_id="pf", **cfg_kw))


def _fixture(spark, tmp_path_factory, **cfg_kw):
    from parquet_main_spark.operators.encode import read_meta

    pdf = _make_pdf()
    out = str(tmp_path_factory.mktemp("prunefuzz"))
    _encode(spark, pdf, out, **cfg_kw)
    meta = read_meta(spark, out)
    files = _list_block_files(out)
    # which bucket each url ACTUALLY landed in, read back from the encoded
    # files through the internal reader — the oracle maps matching rows to
    # real file membership, it never re-derives the hash under test
    from parquet_main_spark.operators.decode import _decode_file
    from parquet_main_spark.operators.encode import gdicts_from_json

    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    url_to_bucket = {}
    for path, _ in files:
        b = int(_BUCKET_PAT.search(path).group(1))
        for batch in _decode_file(path, meta["logical"], ["u"], None, gd):
            for s in batch.column("u").to_pylist():
                url_to_bucket[s] = b
    assert len(url_to_bucket) == len(pdf)  # urls are unique in _make_pdf
    return pdf, out, meta, files, url_to_bucket


@pytest.fixture(scope="module")
def plain_table(spark, tmp_path_factory):
    return _fixture(spark, tmp_path_factory)


@pytest.fixture(scope="module")
def salted_table(spark, tmp_path_factory):
    return _fixture(spark, tmp_path_factory, salt=3, salt_col="lang")


# ---------------------------------------------------------------- oracle

def _kleene_true(pred, pdf) -> np.ndarray:
    t, _ = _kleene(pred, pdf)
    return t


def _kleene(pred, pdf):
    n = len(pdf)
    if isinstance(pred, And):
        t, f = np.ones(n, bool), np.zeros(n, bool)
        for c in pred.children:
            ct, cf = _kleene(c, pdf)
            t &= ct
            f |= cf
        return t, f
    if isinstance(pred, Or):
        t, f = np.zeros(n, bool), np.ones(n, bool)
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
        t = np.zeros(n, bool)
        idx = np.flatnonzero(ok)
        t[idx] = [fn(vals[i]) for i in idx]
        return t, ok & ~t

    if pred.op == "isin":
        vv = set(pred.value)
        return cmp(lambda x: x in vv)
    if pred.op == "between":
        lo, hi = pred.value
        return cmp(lambda x: lo <= x <= hi)
    if pred.op == "startswith":
        return cmp(lambda x: str(x).startswith(pred.value))
    import operator as om

    fn = {"=": om.eq, "!=": om.ne, "<": om.lt, "<=": om.le,
          ">": om.gt, ">=": om.ge}[pred.op]
    return cmp(lambda x: fn(x, pred.value))


# ------------------------------------------------------------- strategies

_PDF = _make_pdf()
_PRESENT_U = st.sampled_from(sorted(_PDF["u"])[::37])
_ABSENT_U = st.sampled_from(
    ["https://h0.example/p9999", "nope", "", "https://h1.example/p0001x"])
_U_VAL = st.one_of(_PRESENT_U, _ABSENT_U)
_INT = st.integers(-120, 120)
_LANG = st.sampled_from(["en", "de", "fr", "zh", "xx"])


def _leaf():
    return st.one_of(
        st.tuples(st.just("u"), st.just("="), _U_VAL),
        st.tuples(st.just("u"), st.just("isin"),
                  st.lists(_U_VAL, min_size=1, max_size=4)),
        st.tuples(st.just("u"), st.sampled_from(["<", ">=", "startswith"]),
                  _U_VAL),
        st.tuples(st.just("v"), st.sampled_from(["=", "<", ">=", "!="]), _INT),
        st.tuples(st.just("v"), st.just("between"),
                  st.tuples(_INT, _INT).map(lambda p: tuple(sorted(p)))),
        st.tuples(st.just("lang"), st.sampled_from(["=", "!="]), _LANG),
        st.tuples(st.sampled_from(["u", "v", "lang"]),
                  st.sampled_from(["isnull", "notnull"]), st.none()),
    ).map(lambda t: Predicate(*t) if t[1] != "startswith"
          else Predicate(t[0], "startswith", str(t[2])))


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


# ---------------------------------------------------------------- checks

def _kept_buckets(expr, pdf, out, meta, files):
    kept = _prune_files_by_bucket(files, _bucket_candidates(expr, meta))
    kept = _prune_files_by_lineage(kept, out, _normalize_expr(
        expr, meta["logical"]), meta["logical"])
    return {int(_BUCKET_PAT.search(p).group(1)) for p, _ in kept}


@settings(max_examples=150, deadline=None)
@given(expr=_tree())
def _check_sound(fixture, expr):
    pdf, out, meta, files, url_to_bucket = fixture
    kept = _kept_buckets(expr, pdf, out, meta, files)
    need = {url_to_bucket[u]
            for u in pdf["u"].to_numpy()[_kleene_true(expr, pdf)]}
    missing = need - kept
    assert not missing, (
        f"pruning dropped buckets {sorted(missing)} holding matching rows: "
        f"{expr!r}")


def test_pruning_never_drops_matching_buckets(plain_table):
    _check_sound(plain_table)


def test_pruning_sound_on_salted_table(salted_table):
    _check_sound(salted_table)


def test_point_lookup_actually_prunes(plain_table):
    """Non-vacuity: a present-url equality keeps exactly one file (the fuzz
    above only proves soundness; this pins that pruning does anything)."""
    pdf, out, meta, files, url_to_bucket = plain_table
    u = pdf["u"].iloc[7]
    kept = _kept_buckets(Predicate("u", "=", u), pdf, out, meta, files)
    assert kept == {url_to_bucket[u]}


def test_salted_lookup_keeps_all_salt_variants(salted_table):
    pdf, out, meta, files, url_to_bucket = salted_table
    u = pdf["u"].iloc[7]
    cand = _bucket_candidates(Predicate("u", "=", u), meta)
    assert cand is not None and 1 <= len(cand) <= 3
    assert url_to_bucket[u] in cand
