"""scan_minmax / scan_distinct — in-situ aggregate pushdowns.

Ground truth is Spark itself over the original DataFrame (the engine must
agree with ``df.agg(min/max)`` / ``df.distinct()`` exactly, NaN and NULL
semantics included). The decode-free assertions monkeypatch the module's
``_decode_file`` to prove the metadata-only paths really never touch data
pages.
"""

from __future__ import annotations

import datetime
import decimal
import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_main_spark.operators import aggregates as agg
from parquet_main_spark.operators.aggregates import scan_distinct, scan_minmax
from parquet_main_spark.operators.decode import And, Not, Or, Predicate
from parquet_main_spark.operators.encode import EncodeConfig, encode_table


def _eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


def _minmax_truth(df, cols):
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.agg(*aggs).collect()[0].asDict()


def _check_minmax(spark, out, df, cols, pred=None, sdf=None, **kw):
    got = scan_minmax(spark, out, cols, predicate=pred,
                      **kw).collect()[0].asDict()
    want = _minmax_truth(sdf if sdf is not None else df, cols)
    assert set(got) == set(want)
    for k in want:
        assert _eq(got[k], want[k]), (k, got[k], want[k])


def _distinct_key(v):
    return (v is None, str(v))


def _check_distinct(spark, out, df, col, pred=None, sdf=None, **kw):
    got = sorted((r[0] for r in scan_distinct(spark, out, col, predicate=pred,
                                              **kw).collect()),
                 key=_distinct_key)
    src = sdf if sdf is not None else df
    want = sorted((r[0] for r in src.select(col).distinct().collect()),
                  key=_distinct_key)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert _eq(g, w), (col, g, w)


@pytest.fixture(scope="module")
def mixed(spark, tmp_path_factory):
    """Encoded table with every stats lane: ints, NaN-carrying floats,
    short + over-64-char strings (truncated min bounds), timestamps,
    nullable bools, decimal64, decimal128, binary, and a dict-planned
    low-cardinality column."""
    rows = []
    langs = ["en", "de", "fr", None, "zz"]
    for i in range(4000):
        rows.append((
            i,
            langs[i * 2654435761 % len(langs)],
            float(i % 997) if i % 31 else float("nan"),
            ("u" * 80 + f"{i:06d}") if i % 17 == 0 else f"s{i % 50:02d}",
            datetime.datetime(2025, 1, 1)
            + datetime.timedelta(seconds=i * 7),
            None if i % 13 == 0 else i % 2 == 0,
            decimal.Decimal(i * 7 % 10_000) / 100,
            decimal.Decimal(i * 104729 % (10 ** 20)) / 1000,
            (b"\x00" * 20 + i.to_bytes(3, "big")) if i % 11 == 0
            else i.to_bytes(2, "big"),
        ))
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("d64", T.DecimalType(10, 2)),
        T.StructField("d128", T.DecimalType(24, 3)),
        T.StructField("blob", T.BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path_factory.mktemp("agg") / "mixed")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="id", buckets=4, block_size=512,
        snapshot_id="agg"))
    return df, out


def test_minmax_all_lanes_no_predicate(spark, mixed):
    df, out = mixed
    _check_minmax(spark, out, df,
                  ["id", "val", "s", "ts", "flag", "d64", "d128", "blob"])


def test_minmax_with_predicates(spark, mixed):
    df, out = mixed
    cases = [
        (Predicate("lang", "=", "en"), df.filter(F.col("lang") == "en")),
        (Predicate("id", "between", (700, 900)),
         df.filter(F.col("id").between(700, 900))),
        (And([Predicate("flag", "=", True), Predicate("id", "<", 2000)]),
         df.filter((F.col("flag") == True) & (F.col("id") < 2000))),  # noqa: E712
    ]
    for pred, sdf in cases:
        _check_minmax(spark, out, df, ["id", "val", "s", "ts", "d64"],
                      pred=pred, sdf=sdf)


def test_distributed_path_matches_driver_path(spark, mixed):
    """max_driver_files=0 forces the one-task-per-file job; results must be
    identical to the (default) driver fast path."""
    df, out = mixed
    _check_minmax(spark, out, df, ["id", "val", "s", "ts", "d64", "blob"],
                  max_driver_files=0)
    _check_minmax(spark, out, df, ["id", "s"],
                  pred=Predicate("lang", "=", "en"),
                  sdf=df.filter(F.col("lang") == "en"), max_driver_files=0)
    for col in ["lang", "s", "val"]:
        _check_distinct(spark, out, df, col, max_driver_files=0)


def test_minmax_empty_match_is_all_null(spark, mixed):
    df, out = mixed
    row = scan_minmax(spark, out, ["id", "s"],
                      predicate=Predicate("id", ">", 10 ** 9)) \
        .collect()[0].asDict()
    assert all(v is None for v in row.values())


def test_minmax_int_lanes_never_decode(spark, mixed, monkeypatch):
    """ints/timestamps/decimals/NaN-free-block floats: every all-match
    block's bounds are exact, so the whole aggregate must come from stats
    rows alone."""
    df, out = mixed

    def boom(*a, **k):
        raise AssertionError("data pages were decoded")

    monkeypatch.setattr(agg, "_decode_file", boom)
    _check_minmax(spark, out, df, ["id", "ts", "d64", "d128"])


def test_minmax_rejects_vector_and_unknown(spark, mixed):
    _, out = mixed
    with pytest.raises(KeyError):
        scan_minmax(spark, out, ["nope"])


def test_distinct_all_columns(spark, mixed):
    df, out = mixed
    for col in ["lang", "s", "flag", "val", "d64", "d128", "blob", "ts"]:
        _check_distinct(spark, out, df, col)


def test_distinct_dict_column_never_decodes(spark, mixed, monkeypatch):
    """lang is dict-planned: the bucket dictionary rows must answer the
    whole DISTINCT (NULL presence comes from stats rows)."""
    df, out = mixed

    def boom(*a, **k):
        raise AssertionError("data pages were decoded")

    monkeypatch.setattr(agg, "_decode_file", boom)
    _check_distinct(spark, out, df, "lang")


def test_distinct_with_predicate_falls_back(spark, mixed):
    df, out = mixed
    _check_distinct(spark, out, df, "lang",
                    pred=Predicate("id", "<", 150),
                    sdf=df.filter(F.col("id") < 150))


def test_minmax_and_distinct_on_gdict_table(spark, tmp_path):
    """Global-dictionary path: gdict values merge driver-side, fallback
    blocks (values unseen by the sample) decode."""
    rows = [(i, f"k{i % 9}") for i in range(3000)]
    # one rare value far into the data so the stats sample may miss it
    rows[2913] = (2913, "rare-value")
    df = spark.createDataFrame(rows, "id long, k string")
    out = str(tmp_path / "gd")
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="id", buckets=2, block_size=256,
        snapshot_id="gd", global_dict_max_card=64))
    _check_distinct(spark, out, df, "k")
    _check_minmax(spark, out, df, ["k", "id"])
    _check_minmax(spark, out, df, ["k"],
                  pred=Predicate("k", "=", "rare-value"),
                  sdf=df.filter(F.col("k") == "rare-value"))


def test_minmax_distinct_forced_plain_column(spark, tmp_path):
    """A forced-plain low-card column has no dictionaries anywhere: distinct
    must decode (column-pruned) and still be exact; minmax stays exact via
    short-string stats."""
    df = spark.createDataFrame(
        [(i, f"v{i % 5}" if i % 7 else None) for i in range(1500)],
        "id long, v string")
    out = str(tmp_path / "plain")
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="id", buckets=2, block_size=256,
        snapshot_id="pl", plan_override={"v": "plain"}))
    _check_distinct(spark, out, df, "v")
    _check_minmax(spark, out, df, ["v"])


def test_multi_dir_minmax_and_distinct(spark, tmp_path):
    """List-of-dirs form (streaming batch dirs): per-dir pruning + per-dir
    global dictionaries, one combined answer — driver and distributed
    paths both."""
    rows = [(i, f"k{i % 7}" if i % 11 else None, float(i % 13)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, k string, x double")
    dirs = []
    for j, part in enumerate((df.filter(F.col("id") < 1000),
                              df.filter(F.col("id") >= 1000))):
        d = str(tmp_path / f"b{j}")
        encode_table(spark, part, EncodeConfig(
            out_dir=d, bucket_key="id", buckets=2, block_size=128,
            snapshot_id=f"b{j}", global_dict_max_card=64))
        dirs.append(d)
    for kw in ({}, {"max_driver_files": 0}):
        _check_minmax(spark, dirs, df, ["id", "k", "x"], **kw)
        _check_minmax(spark, dirs, df, ["k"],
                      pred=Predicate("id", "between", (500, 1500)),
                      sdf=df.filter(F.col("id").between(500, 1500)), **kw)
        _check_distinct(spark, dirs, df, "k", **kw)
    _check_distinct(spark, dirs, df, "k",
                    pred=Predicate("id", "<", 1200),
                    sdf=df.filter(F.col("id") < 1200))


def test_minmax_all_null_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None) for i in range(300)], "id long, v string")
    out = str(tmp_path / "nulls")
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="id", buckets=2, block_size=128,
        snapshot_id="nl"))
    row = scan_minmax(spark, out, ["v"]).collect()[0].asDict()
    assert row == {"min_v": None, "max_v": None}
    _check_distinct(spark, out, df, "v")


# ------------------------------------------------------------- property fuzz

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_FUZZ_COLS = ["id", "v", "g", "t2", "lang"]


def _mm_pdf(n=512, seed=29):
    rng = np.random.default_rng(seed)
    # t2: long strings sharing prefixes so block minima truncate at the
    # 64-char stats cap (the candidate-decode path), plus short outliers
    t2 = [("w" * 70 + f"{rng.integers(0, 9)}{i:05d}") if i % 3 else f"a{i:04d}"
          for i in range(n)]
    g = rng.normal(0, 5, n)
    g[rng.random(n) < 0.06] = np.nan  # aggregate-only column: NaN allowed
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-50, 50, n).astype("float64"),
        "g": np.round(g, 3),
        "t2": t2,
        "lang": rng.choice(["en", "de", "fr", "zh", "es"], n),
    })
    for col, frac in (("v", 0.15), ("lang", 0.05), ("t2", 0.06), ("g", 0.05)):
        mask = rng.random(n) < frac
        pdf.loc[mask, col] = None
    pdf["v"] = pdf["v"].astype("Int64")
    return pdf


@pytest.fixture(scope="module")
def mm_fuzz(spark, tmp_path_factory):
    import glob

    from parquet_main_spark.operators.encode import (
        gdicts_from_json, read_meta,
    )

    pdf = _mm_pdf()
    out = str(tmp_path_factory.mktemp("mmfuzz"))
    df = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "id long, v long, g double, t2 string, lang string")
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="id", buckets=1, block_size=32,
        snapshot_id="mmfz"))
    meta = read_meta(spark, out)
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    (path,) = glob.glob(f"{out}/blocks/bucket=*/*.parquet")
    return pdf, path, meta["logical"], gd


def _mm_oracle(pdf, keep, col):
    s = pdf[col][keep].dropna()
    vals = s.to_numpy()
    if not len(vals):
        return None, None
    if col == "g":
        nan = np.isnan(vals.astype(float))
        mn = float("nan") if nan.all() else float(np.nanmin(vals.astype(float)))
        mx = float("nan") if nan.any() else float(vals.astype(float).max())
        return mn, mx
    return min(vals), max(vals)


def _mm_trees():
    # predicates range over the NaN-free columns only (the existing Kleene
    # fuzzer's convention); aggregation targets include the NaN column
    from test_predicate_property import _tree  # noqa: F401

    base = st.one_of(st.none(), _mm_tree_remap(_tree()))
    return base


def _mm_tree_remap(strategy):
    # the imported strategy speaks the predfuzz schema (id, v, f, lang, t);
    # remap its columns onto this table's (f->v numeric, t->lang strings)
    def remap(e):
        if isinstance(e, And):
            return And([remap(c) for c in e.children])
        if isinstance(e, Or):
            return Or([remap(c) for c in e.children])
        if isinstance(e, Not):
            return Not(remap(e.child))
        col = {"f": "v", "t": "lang"}.get(e.col, e.col)
        v = e.value
        if e.col == "f" and e.op not in ("isnull", "notnull"):
            v = int(v) if not isinstance(v, (list, tuple)) else v
            if isinstance(v, tuple):
                v = tuple(int(x) for x in v)
        if e.col == "t" and e.op not in ("isnull", "notnull", "startswith"):
            v = "en" if not isinstance(v, (list, tuple)) else v
        if e.op == "startswith" and e.col == "t":
            v = "e"
        return Predicate(col, e.op, v)

    return strategy.map(remap)


@settings(max_examples=150, deadline=None)
@given(expr=_mm_trees())
def _check_minmax_expr(fuzz, expr):
    import pyarrow as pa

    from test_predicate_property import _kleene

    from parquet_main_spark.operators import aggregates as agg_mod

    pdf, path, logical, gd = fuzz
    it = iter([pa.record_batch({"path": [path], "dir_id": [0]})])
    (batch,) = list(agg_mod._minmax_tasks(logical, _FUZZ_COLS, expr, [gd], it))
    got = batch.to_pylist()[0]
    if expr is None:
        keep = np.ones(len(pdf), bool)
    else:
        keep, _ = _kleene(expr, pdf)
    for c in _FUZZ_COLS:
        mn, mx = _mm_oracle(pdf, keep, c)
        gmn, gmx = got[f"min_{c}"], got[f"max_{c}"]
        assert _eq(gmn, None if mn is None else type(gmn)(mn) if gmn is not None else mn), \
            (c, "min", gmn, mn, repr(expr))
        assert _eq(gmx, None if mx is None else type(gmx)(mx) if gmx is not None else mx), \
            (c, "max", gmx, mx, repr(expr))


def test_minmax_matches_kleene_oracle(mm_fuzz):
    _check_minmax_expr(mm_fuzz)


# ----------------------------------------------------------------- top-k

from parquet_main_spark.operators.aggregates import scan_topk  # noqa: E402


def _check_topk(spark, out, df, order_col, k, cols, pred=None, sdf=None,
                descending=True, **kw):
    got = sorted(scan_topk(spark, out, order_col, k, columns=cols,
                           predicate=pred, descending=descending,
                           **kw).collect())
    o = (F.col(order_col).desc_nulls_last() if descending
         else F.col(order_col).asc_nulls_last())
    src = sdf if sdf is not None else df
    want = sorted(src.select(*cols).orderBy(o).limit(k).collect())
    assert got == want, (order_col, k, got[:3], want[:3])


def test_topk_matches_spark(spark, mixed):
    df, out = mixed
    # id is unique -> deterministic row sets either direction; the
    # max_driver_files=0 runs force the distributed mapInArrow branch
    _check_topk(spark, out, df, "id", 17, ["id", "lang", "ts"])
    _check_topk(spark, out, df, "id", 17, ["id", "lang", "ts"],
                max_driver_files=0)
    _check_topk(spark, out, df, "id", 9, ["id", "s", "d128"],
                descending=False, max_driver_files=0)
    _check_topk(spark, out, df, "id", 17, ["id", "s"], descending=False)
    _check_topk(spark, out, df, "id", 9, ["id", "val"],
                pred=Predicate("lang", "=", "en"),
                sdf=df.filter(F.col("lang") == "en"))
    _check_topk(spark, out, df, "ts", 5, ["id", "ts"])


def test_topk_null_fill_when_k_exceeds_matches(spark, mixed):
    df, out = mixed
    sdf = df.filter(F.col("id") < 30)
    got = scan_topk(spark, out, "flag", 30, columns=["id", "flag"],
                    predicate=Predicate("id", "<", 30)).collect()
    assert len(got) == 30  # includes NULL-flag rows to fill k
    assert {r["id"] for r in got} == {r["id"] for r in sdf.collect()}


def test_topk_float_nan_ranks_greatest(spark, mixed):
    df, out = mixed
    got = scan_topk(spark, out, "val", 12, columns=["id", "val"]).collect()
    want = df.select("id", "val").orderBy(
        F.col("val").desc_nulls_last()).limit(12).collect()
    # NaN rows rank first in both engines; ids of NaN rows are a free set,
    # so compare the multiset of values NaN-insensitively + row count
    gv = sorted((math.isnan(r["val"]), r["val"]) for r in got
                if not math.isnan(r["val"]))
    wv = sorted((math.isnan(r["val"]), r["val"]) for r in want
                if not math.isnan(r["val"]))
    assert len(got) == len(want) == 12
    assert gv == wv
    assert sum(math.isnan(r["val"]) for r in got) == \
        sum(math.isnan(r["val"]) for r in want)


def test_topk_decodes_few_blocks(spark, mixed, monkeypatch):
    """The stats-guided selection must not decode whole files: driving the
    per-file kernel directly (scan_topk's workers run out-of-process, so
    the spy must run driver-side), a k=5 top-id pass over a multi-block
    bucket file restricts every _decode_file call to a small subset."""
    import glob

    from parquet_main_spark.operators.encode import (
        gdicts_from_json, read_meta,
    )

    df, out = mixed
    meta = read_meta(spark, out)
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    seen = []
    real = agg._decode_file

    def spy(path, logical, cols, expr, gdicts, restrict_blocks=None, **kw):
        seen.append(restrict_blocks)
        return real(path, logical, cols, expr, gdicts,
                    restrict_blocks=restrict_blocks, **kw)

    monkeypatch.setattr(agg, "_decode_file", spy)
    for path in glob.glob(f"{out}/blocks/bucket=*/*.parquet"):
        list(agg._topk_one(meta["logical"], ["id", "lang"], "id", 5, True,
                           None, gd, path))
    assert seen, "no decode at all?"
    # 4000 rows / 4 buckets / block_size 512 = 2 blocks per bucket; k=5
    # needs exactly the one block holding the bucket's max ids
    assert all(rb is not None and len(rb) == 1 for rb in seen), seen


def test_topk_nan_outranks_real_infinity(spark, tmp_path):
    """Spark's float total order ranks NaN above EVERY value including
    +inf; the per-file truncation must not tie them (a NaN->+inf value
    key would, and the cut could drop the NaN row the merge expects)."""
    vals = [float("inf"), float("nan"), 1.0, -float("inf"), None, 2.5,
            float("nan"), 3.0]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, val double")
    out = str(tmp_path / "naninf")
    encode_table(spark, df, EncodeConfig(
        out_dir=out, bucket_key="id", buckets=1, block_size=4,
        snapshot_id="ni"))
    for k in (1, 2, 3, 5):
        for desc in (True, False):
            got = agg.scan_topk(spark, out, "val", k,
                                columns=["id", "val"],
                                descending=desc).collect()
            order = F.col("val").desc_nulls_last() if desc \
                else F.col("val").asc_nulls_last()
            want = df.orderBy(order).limit(k).collect()
            def canon(rows):
                return sorted(
                    "None" if r["val"] is None
                    else "nan" if math.isnan(r["val"])
                    else repr(r["val"]) for r in rows)

            assert canon(got) == canon(want), (k, desc, canon(got), canon(want))


def test_topk_ships_at_most_k_rows_per_file(spark, mixed):
    """Per-file candidate truncation: even when the order column is
    scattered across every block (val = i % 997, so no block bound can be
    ruled out by the k-th value and phase 2 decodes them all), _topk_one
    must yield at most k rows per file — the global merge only ever needs
    a file's own top-k."""
    import glob

    from parquet_main_spark.operators.encode import (
        gdicts_from_json, read_meta,
    )

    df, out = mixed
    meta = read_meta(spark, out)
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    k = 5
    for path in glob.glob(f"{out}/blocks/bucket=*/*.parquet"):
        n = sum(b.num_rows
                for b in agg._topk_one(meta["logical"], ["id", "val"],
                                       "val", k, True, None, gd, path))
        assert 0 < n <= k, (path, n)


def test_topk_multi_dir(spark, tmp_path):
    rows = [(i, (i * 37) % 5000) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v long")
    dirs = []
    for j, part in enumerate((df.filter(F.col("id") < 2000),
                              df.filter(F.col("id") >= 2000))):
        d = str(tmp_path / f"t{j}")
        encode_table(spark, part, EncodeConfig(
            out_dir=d, bucket_key="id", buckets=2, block_size=128,
            snapshot_id=f"t{j}"))
        dirs.append(d)
    _check_topk(spark, dirs, df, "id", 21, ["id", "v"])
    _check_topk(spark, dirs, df, "id", 21, ["id", "v"], descending=False)


def _topk_oracle_vals(pdf, keep, col, k, descending):
    """Multiset of the top-k order values (NULLS LAST, NaN greatest) the
    SQL LIMIT would return — row identity is ambiguous under ties, the
    value multiset is not."""
    s = pdf[col][keep]
    nn = s.dropna()
    if col == "g":
        key = nn.astype(float).map(lambda v: float("inf") if v != v else v)
        order = key.sort_values(ascending=not descending).index
    else:
        order = nn.sort_values(ascending=not descending).index
    vals = [nn[i] for i in order[:k]]
    n_null = int(s.isna().sum())
    short = max(0, min(k - len(nn), n_null))
    return sorted(_canon_val(v) for v in vals), short


def _canon_val(v):
    import numbers

    if isinstance(v, float) and v != v:
        return (True, "nan")
    if isinstance(v, numbers.Number) and not isinstance(v, bool):
        return (False, repr(float(v)))
    return (False, str(v))


@settings(max_examples=120, deadline=None)
@given(expr=_mm_trees(),
       order_col=st.sampled_from(_FUZZ_COLS),
       k=st.sampled_from([1, 3, 17, 600]),
       descending=st.booleans())
def _check_topk_expr(fuzz, expr, order_col, k, descending):
    import pyarrow as pa

    from test_predicate_property import _kleene

    from parquet_main_spark.operators import aggregates as agg_mod

    pdf, path, logical, gd = fuzz
    cols = ["id", order_col] if order_col != "id" else ["id"]
    batches = list(agg_mod._topk_one(logical, cols, order_col, k,
                                     descending, expr, gd, path))
    cand = pd.concat([b.to_pandas() for b in batches],
                     ignore_index=True) if batches else \
        pd.DataFrame(columns=cols)
    if expr is None:
        keep = np.ones(len(pdf), bool)
    else:
        keep, _ = _kleene(expr, pdf)
    want_vals, want_nulls = _topk_oracle_vals(pdf, keep, order_col, k,
                                              descending)
    # candidates must contain the exact top-k after the global merge
    s = cand[order_col]
    nn = s.dropna()
    if order_col == "g":
        key = nn.astype(float).map(lambda v: float("inf") if v != v else v)
        order = key.sort_values(ascending=not descending).index
    else:
        order = nn.sort_values(ascending=not descending).index
    got_vals = sorted(_canon_val(v) for v in [nn[i] for i in order[:k]])
    assert got_vals == want_vals, (order_col, k, descending, repr(expr))
    # and enough NULL-ordered rows to fill k when non-nulls run short
    assert int(s.isna().sum()) >= want_nulls, (order_col, k, repr(expr))


def test_topk_matches_kleene_oracle(mm_fuzz):
    _check_topk_expr(mm_fuzz)


def test_aggregates_over_uri_table(spark, mixed):
    """The aggregate pushdowns accept URI table paths like scan does
    (file:// is the scheme the sandbox can serve): listing, meta, stats
    reads and candidate decodes all resolve through the same path
    machinery, driver and distributed branches both."""
    df, out = mixed
    uri = f"file://{out}"
    _check_minmax(spark, uri, df, ["id", "s", "val"])
    _check_minmax(spark, uri, df, ["id"], max_driver_files=0)
    _check_distinct(spark, uri, df, "lang")
    _check_topk(spark, uri, df, "id", 7, ["id", "lang"])
    _check_topk(spark, uri, df, "id", 7, ["id", "lang"], max_driver_files=0)


def test_topk_orders_by_decimal128_and_binary(spark, mixed):
    """The dense-domain k-th comparison must hold for the exotic bound
    lanes: decimal128 (16-byte order-preserving keys) and binary (hex
    stats, truncate-and-increment max bounds that are never exact)."""
    df, out = mixed
    for order_col, desc in (("d128", True), ("d128", False),
                            ("blob", True), ("blob", False)):
        got = sorted(
            r[order_col]
            for r in scan_topk(spark, out, order_col, 11,
                               columns=["id", order_col],
                               descending=desc).collect())
        o = (F.col(order_col).desc_nulls_last() if desc
             else F.col(order_col).asc_nulls_last())
        want = sorted(r[order_col] for r in
                      df.select("id", order_col).orderBy(o).limit(11)
                      .collect())
        assert got == want, (order_col, desc)


def test_aggregates_prune_file_list_by_bucket_hash(spark, mixed, monkeypatch):
    """An equality on the bucket key restricts the aggregate operators'
    FILE lists driver-side (the point-lookup prune, decode._bucket_candidates)
    — the kernels must open exactly one bucket file, not all four."""
    df, out = mixed
    calls = []
    real_mm, real_tk = agg._minmax_one, agg._topk_one

    def spy_mm(logical, cols, expr, gdicts, path, schema):
        calls.append(path)
        return real_mm(logical, cols, expr, gdicts, path, schema)

    def spy_tk(logical, cols, order_col, k, descending, expr, gdicts, path):
        calls.append(path)
        return real_tk(logical, cols, order_col, k, descending, expr,
                       gdicts, path)

    monkeypatch.setattr(agg, "_minmax_one", spy_mm)
    monkeypatch.setattr(agg, "_topk_one", spy_tk)
    pred = Predicate("id", "=", 1234)
    _check_minmax(spark, out, df, ["lang", "ts"], pred=pred,
                  sdf=df.filter(F.col("id") == 1234))
    assert len(calls) == 1, calls
    calls.clear()
    got = scan_topk(spark, out, "id", 1, columns=["id", "lang"],
                    predicate=pred).collect()
    assert len(calls) == 1 and len(got) == 1 and got[0]["id"] == 1234
