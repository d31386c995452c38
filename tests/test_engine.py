"""End-to-end engine tests: encode -> decode bit-identity, determinism,
resume-from-checkpoint, zone-map pruning, in-situ dictionary predicates.

Mirrors the reference's integration strategy (SURVEY.md §5: filtered scans
asserted against a sequential-read oracle, SkippingColumnReaderImplTest.java)
— our oracle is the original DataFrame itself.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from parquet_main_spark.operators.decode import Predicate, pruning_report, scan
from parquet_main_spark.operators.encode import EncodeConfig, encode_table, read_meta
from parquet_main_spark.sources.webpages import webpages

N_ROWS = 3000
BUCKETS = 8


def _sorted_pdf(df, order="url"):
    pdf = df.toPandas().sort_values(order).reset_index(drop=True)
    return pdf


@pytest.fixture(scope="module")
def encoded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc"))
    df = webpages(spark, N_ROWS, partitions=8)
    cfg = EncodeConfig(out_dir=out, buckets=BUCKETS, block_size=256, snapshot_id="t1")
    res = encode_table(spark, df, cfg)
    return out, df, res


def test_roundtrip_bit_identity(spark, encoded):
    out, df, res = encoded
    got = _sorted_pdf(scan(spark, out))[["url", "warc_ts", "html", "text", "lang"]]
    want = _sorted_pdf(df)[["url", "warc_ts", "html", "text", "lang"]]
    got["html"] = got["html"].map(bytes)
    want["html"] = want["html"].map(bytes)
    pd.testing.assert_frame_equal(got, want)


def test_plan_is_sensible(spark, encoded):
    _, _, res = encoded
    assert res.plan["lang"] in ("dict", "gdict")
    assert res.plan["warc_ts"] in ("delta", "for", "dict", "rle")
    assert res.plan["text"] in ("fsst", "dict")


def test_compression_wins(spark, encoded):
    out, _, _ = encoded
    blocks = spark.read.parquet(f"{out}/blocks")
    agg = blocks.groupBy("col").agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    )
    rows = {r["col"]: (r["raw"], r["enc"]) for r in agg.collect()}
    for col in ("lang", "text", "warc_ts", "url"):
        raw, enc = rows[col]
        assert enc < raw, f"{col}: {enc} >= {raw}"
    # 40 codes via dict: big win even with per-block dict overhead at
    # the tiny 256-row test block size (real block_size=65536 does better)
    assert rows["lang"][1] < rows["lang"][0] * 0.25


def test_determinism(spark, encoded, tmp_path):
    out, df, res = encoded
    out2 = str(tmp_path / "enc2")
    cfg2 = EncodeConfig(out_dir=out2, buckets=BUCKETS, block_size=256, snapshot_id="t1")
    encode_table(spark, webpages(spark, N_ROWS, partitions=3), cfg2)  # different partitioning
    l1 = spark.read.parquet(f"{out}/lineage").select("bucket", "content_sha").collect()
    l2 = spark.read.parquet(f"{out2}/lineage").select("bucket", "content_sha").collect()
    assert sorted(map(tuple, l1)) == sorted(map(tuple, l2))


def test_resume_matches_uninterrupted(spark, tmp_path):
    df = webpages(spark, N_ROWS, partitions=8)
    out = str(tmp_path / "resume")
    cfg = EncodeConfig(out_dir=out, buckets=BUCKETS, block_size=256, snapshot_id="t1")
    # simulate an interrupted run: only buckets {0,1,2} got done
    partial = df.filter(F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).isin(0, 1, 2))
    res1 = encode_table(spark, partial, cfg)
    assert res1.encoded_buckets <= 3
    # resume with the full input
    res2 = encode_table(spark, df, cfg)
    assert res2.resumed_buckets == res1.encoded_buckets
    assert res2.encoded_buckets == BUCKETS - res1.encoded_buckets
    # uninterrupted reference run
    out_ref = str(tmp_path / "ref")
    encode_table(spark, df, EncodeConfig(out_dir=out_ref, buckets=BUCKETS, block_size=256, snapshot_id="t1"))
    l1 = spark.read.parquet(f"{out}/lineage").select("bucket", "content_sha", "n_rows").collect()
    lr = spark.read.parquet(f"{out_ref}/lineage").select("bucket", "content_sha", "n_rows").collect()
    assert sorted(map(tuple, l1)) == sorted(map(tuple, lr))


@pytest.mark.parametrize(
    "pred_kwargs,sql",
    [
        (dict(col="lang", op="=", value="en"), "lang = 'en'"),
        (dict(col="lang", op="isin", value=["de", "fr", "nosuch"]), "lang in ('de','fr','nosuch')"),
        (dict(col="lang", op="between", value=("aa", "ff")), "lang between 'aa' and 'ff'"),
        (dict(col="url", op=">=", value="https://host5"), "url >= 'https://host5'"),
    ],
)
def test_predicate_scan_matches_oracle(spark, encoded, pred_kwargs, sql):
    out, df, _ = encoded
    got = scan(spark, out, columns=["url", "lang"], predicate=Predicate(**pred_kwargs))
    want = df.filter(sql).select("url", "lang")
    g = _sorted_pdf(got)
    w = _sorted_pdf(want)
    pd.testing.assert_frame_equal(g.reset_index(drop=True), w.reset_index(drop=True))


def test_timestamp_predicate(spark, encoded):
    out, df, _ = encoded
    cut_us = 1_735_689_600_000_000 + 1500 * 1_000_000
    got = scan(spark, out, columns=["url", "warc_ts"], predicate=Predicate("warc_ts", "<", cut_us))
    want = df.filter(F.col("warc_ts") < F.lit("2025-01-01 00:25:00").cast("timestamp")).select(
        "url", "warc_ts"
    )
    assert got.count() == want.count()


def test_block_pruning_effective(spark, encoded):
    out, _, _ = encoded
    # urls sorted within bucket => tight per-block url ranges => real pruning
    rep = pruning_report(spark, out, Predicate("url", ">=", "https://host999"))
    assert rep["pruned_blocks"] > 0
    assert rep["kept_blocks"] < rep["total_blocks"]


def test_column_pruning_scan(spark, encoded):
    out, df, _ = encoded
    got = scan(spark, out, columns=["lang"])
    assert got.columns == ["lang"]
    assert got.count() == N_ROWS


def test_salted_skew_bucketing(spark, tmp_path):
    """North-rule skew handling: bucketing by the zipf-skewed `lang`
    ('en' ~45% of rows) without salt puts ~half the table in one bucket;
    salting spreads each hot key over `salt` buckets while round-trip
    stays exact."""
    df = webpages(spark, N_ROWS, partitions=4)
    out = str(tmp_path / "salted")
    cfg = EncodeConfig(
        out_dir=out, bucket_key="lang", buckets=16, block_size=256,
        snapshot_id="t1", salt=8, salt_col="url",
    )
    encode_table(spark, df, cfg)
    sizes = {
        r["bucket"]: r["n_rows"]
        for r in spark.read.parquet(f"{out}/lineage").select("bucket", "n_rows").collect()
    }
    # 'en' alone is ~45% of rows; salted max bucket must hold far less
    assert max(sizes.values()) < 0.45 * N_ROWS
    assert len(sizes) >= 8
    got = _sorted_pdf(scan(spark, out, columns=["url", "lang"]))
    want = _sorted_pdf(df.select("url", "lang"))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_meta_roundtrip(spark, encoded):
    out, _, res = encoded
    meta = read_meta(spark, out)
    assert meta["plan"] == res.plan
    assert meta["config"]["buckets"] == BUCKETS


def test_binary_predicate_scan(spark, encoded):
    """Predicates on a BINARY column: zone maps store hex-prefix bounds
    (round-1 bug: binary stats were never written -> every block pruned)."""
    out, df, _ = encoded
    cut = b"<html><body>p"
    got = scan(spark, out, columns=["url", "html"], predicate=Predicate("html", ">=", cut))
    want = df.filter(F.col("html") >= F.lit(cut)).select("url", "html")
    assert got.count() == want.count()
    assert got.count() > 0  # must not silently return the empty set
    # and equality on a specific blob round-trips
    one = df.select("html").limit(1).collect()[0][0]
    got_eq = scan(spark, out, columns=["url"], predicate=Predicate("html", "=", bytes(one)))
    want_eq = df.filter(F.col("html") == F.lit(bytes(one))).count()
    assert got_eq.count() == want_eq


def test_compound_predicates(spark, encoded):
    """Conjunction of predicates on two different columns (the reference's
    pageFilter+rowFilter composition, SkippingColumnReaderImpl.java:430-437)."""
    out, df, _ = encoded
    preds = [
        Predicate("lang", "isin", ["en", "de"]),
        Predicate("url", ">=", "https://host5"),
    ]
    got = scan(spark, out, columns=["url", "lang"], predicate=preds)
    want = df.filter("lang in ('en','de') and url >= 'https://host5'").select("url", "lang")
    g = _sorted_pdf(got)
    w = _sorted_pdf(want)
    pd.testing.assert_frame_equal(g.reset_index(drop=True), w.reset_index(drop=True))
    assert got.count() > 0


def test_empty_isin_returns_empty(spark, encoded):
    out, _, _ = encoded
    got = scan(spark, out, columns=["url"], predicate=Predicate("lang", "isin", []))
    assert got.count() == 0


def test_nan_float_blocks_not_pruned(spark, tmp_path):
    """A NaN in a float block must not poison the zone map (NaN min/max would
    silently prune matching rows — ADVICE r1)."""
    df = spark.createDataFrame(
        [(i, float("nan") if i % 7 == 0 else float(i)) for i in range(200)],
        "k bigint, x double",
    )
    out = str(tmp_path / "nan")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=64, snapshot_id="t1"))
    got = scan(spark, out, columns=["k", "x"], predicate=Predicate("x", "<=", 50.0))
    assert got.count() == df.filter("x <= 50.0").count()


def test_datasource_roundtrip_and_pushdown(spark, encoded):
    """spark.read.format('pms_encoded') returns the exact table, and a
    .filter() is pushed into the source (consumed by pushFilters) so the
    result still matches the oracle filter."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out, df, _ = encoded
    got = spark.read.format(FORMAT_NAME).load(out)
    assert got.count() == N_ROWS
    g = _sorted_pdf(got.select("url", "lang", "warc_ts"))
    w = _sorted_pdf(df.select("url", "lang", "warc_ts"))
    pd.testing.assert_frame_equal(g.reset_index(drop=True), w.reset_index(drop=True))
    # pushed filters: equality, range, isin
    for cond in ("lang = 'en'", "url >= 'https://host5'", "lang in ('de','fr')"):
        assert got.filter(cond).count() == df.filter(cond).count(), cond


def test_single_giant_bucket_streams(spark, tmp_path):
    """Everything in ONE bucket across many input partitions: the streaming
    encoder accumulates exactly one bucket group (never the whole-partition
    list(it) of round 1) and many small blocks; decode streams it back from
    one file task."""
    df = webpages(spark, 5000, partitions=16)
    out = str(tmp_path / "giant")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=1, block_size=128,
                                         snapshot_id="t1"))
    blocks = spark.read.parquet(f"{out}/blocks")
    assert blocks.select("bucket").distinct().count() == 1
    assert blocks.filter("col = 'url' AND block_id >= 0").count() == (5000 + 127) // 128
    got = _sorted_pdf(scan(spark, out, columns=["url", "lang"]))
    want = _sorted_pdf(df.select("url", "lang"))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_bucket_shared_dictionary(spark, tmp_path):
    """Local-dict columns store ONE sorted dictionary per bucket (block_id=-1
    row, the reference's one-dict-page-per-chunk analog) — blocks carry only
    rank ids, and the in-situ isin translation still answers exactly."""
    df = webpages(spark, 2000, partitions=4).select("url", "lang")
    out = str(tmp_path / "bdict")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="url", buckets=4,
                                         block_size=128, snapshot_id="t1",
                                         global_dict_max_card=0),
                 plan={"url": "prefix", "lang": "dict"})
    rows = spark.read.parquet(f"{out}/blocks").filter("col = 'lang'").collect()
    dict_rows = [r for r in rows if r["block_id"] == -1]
    data_rows = [r for r in rows if r["block_id"] >= 0]
    assert len(dict_rows) == 4 and all(r["codec"] == "bdict" for r in dict_rows)
    assert all(r["codec"] == "bdict" and r["dict"] is None for r in data_rows)
    got = scan(spark, out, columns=["url", "lang"],
               predicate=Predicate("lang", "isin", ["en", "de"]))
    want = df.filter("lang in ('en','de')")
    assert got.count() == want.count() > 0
    full = _sorted_pdf(scan(spark, out))
    ref = _sorted_pdf(df)[full.columns.tolist()]
    pd.testing.assert_frame_equal(full.reset_index(drop=True), ref.reset_index(drop=True))


def test_date_short_byte_roundtrip(spark, tmp_path):
    """DATE / SMALLINT / TINYINT columns (reference accepts INT96/short types
    via EncValuesWriterFactory.java:82-101): encode, scan back bit-identical,
    and a date predicate prunes via the int zone map."""
    df = spark.sql(
        "SELECT id AS k, date_add(DATE '2024-01-01', CAST(id % 40 AS INT)) AS day, "
        "CAST(id % 100 AS SMALLINT) AS small, CAST(id % 20 AS TINYINT) AS tiny "
        "FROM range(2000)"
    )
    out = str(tmp_path / "typed")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=4,
                                         block_size=128, snapshot_id="t1"))
    got = _sorted_pdf(scan(spark, out), order="k")
    want = _sorted_pdf(df, order="k")[got.columns.tolist()]
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
    import datetime

    cut_days = (datetime.date(2024, 1, 15) - datetime.date(1970, 1, 1)).days
    n = scan(spark, out, columns=["k", "day"], predicate=Predicate("day", "<", cut_days)).count()
    assert n == df.filter("day < DATE '2024-01-15'").count() > 0
    n2 = scan(spark, out, columns=["k"], predicate=Predicate("small", "between", (10, 30))).count()
    assert n2 == df.filter("small BETWEEN 10 AND 30").count() > 0


def test_stale_buckets_cleared_on_new_snapshot(spark, tmp_path):
    """Re-encoding a FILTERED input into the same out_dir under a new
    snapshot must not leak phantom rows from the prior snapshot's buckets
    (ADVICE r1: dynamic overwrite only replaces buckets the new run writes)."""
    df = webpages(spark, 500, partitions=2)
    out = str(tmp_path / "reuse")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=BUCKETS,
                                         block_size=256, snapshot_id="s1"))
    smaller = df.filter(F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).isin(0, 1))
    encode_table(spark, smaller, EncodeConfig(out_dir=out, buckets=BUCKETS,
                                              block_size=256, snapshot_id="s2"))
    assert scan(spark, out, columns=["url"]).count() == smaller.count()


def test_decimal_roundtrip(spark, tmp_path):
    """DECIMAL(p<=18) columns ride the int codec family as unscaled int64:
    exact round-trip (incl. nulls) + unscaled-value predicate pruning."""
    df = spark.sql(
        "SELECT id AS k, CAST(id * 1.5 AS DECIMAL(12,2)) AS price, "
        "CAST(CASE WHEN id % 7 = 0 THEN NULL ELSE id * 0.001 END AS DECIMAL(9,3)) AS amt "
        "FROM range(1000)"
    )
    out = str(tmp_path / "dec")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=4,
                                         block_size=128, snapshot_id="t1"))
    got = _sorted_pdf(scan(spark, out), order="k")
    want = _sorted_pdf(df, order="k")[got.columns.tolist()]
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
    n = scan(spark, out, columns=["k", "price"],
             predicate=Predicate("price", ">=", 75_000)).count()  # unscaled 750.00
    assert n == df.filter("price >= 750.00").count() > 0


def test_null_predicates(spark, tmp_path):
    """isnull/notnull predicates answer from the validity bitmap alone —
    block payloads never decoded, blocks without nulls pruned for isnull."""
    df = spark.sql(
        "SELECT id AS k, CASE WHEN id % 5 = 0 THEN NULL ELSE CAST(id AS STRING) END AS v "
        "FROM range(1000)"
    )
    out = str(tmp_path / "nulls")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=64, snapshot_id="t1"))
    assert scan(spark, out, columns=["k"], predicate=Predicate("v", "isnull", None)).count() == 200
    assert scan(spark, out, columns=["k", "v"], predicate=Predicate("v", "notnull", None)).count() == 800
    # compound: notnull AND a value predicate
    n = scan(spark, out, columns=["k", "v"],
             predicate=[Predicate("v", "notnull", None), Predicate("k", "<", 100)]).count()
    assert n == df.filter("v IS NOT NULL AND k < 100").count()


def test_datasource_date_pushdown(spark, tmp_path):
    """Pushed DATE filters convert to int days before hitting the int zone
    maps (review finding: datetime.date leaked through conv())."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = spark.sql(
        "SELECT id AS k, date_add(DATE '2024-01-01', CAST(id % 40 AS INT)) AS day FROM range(800)"
    )
    out = str(tmp_path / "dsdate")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=128, snapshot_id="t1"))
    got = spark.read.format(FORMAT_NAME).load(out)
    for cond in ("day < DATE '2024-01-10'", "day IN (DATE '2024-01-03', DATE '2024-01-07')"):
        assert got.filter(cond).count() == df.filter(cond).count(), cond


def test_lineage_n_blocks_excludes_dict_rows(spark, tmp_path):
    df = webpages(spark, 1000, partitions=2).select("url", "lang")
    out = str(tmp_path / "nblk")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="url", buckets=2,
                                         block_size=128, snapshot_id="t1",
                                         global_dict_max_card=0),
                 plan={"url": "prefix", "lang": "dict"})
    rows = spark.read.parquet(f"{out}/lineage").collect()
    blocks = spark.read.parquet(f"{out}/blocks")
    for r in rows:
        real = blocks.filter(
            (F.col("bucket") == r["bucket"]) & (F.col("block_id") >= 0)
        ).select("block_id").distinct().count()
        assert r["n_blocks"] == real


def test_resume_with_bucket_dicts(spark, tmp_path):
    """Interrupted + resumed encode is byte-identical to uninterrupted when
    bucket-shared dictionaries are in play (dicts are per-bucket, so resume
    rebuilds exactly the same dict rows for the remaining buckets)."""
    df = webpages(spark, 1500, partitions=4).select("url", "lang")
    plan = {"url": "prefix", "lang": "dict"}
    cfg_kw = dict(buckets=4, block_size=128, snapshot_id="t1", global_dict_max_card=0)
    out = str(tmp_path / "resume_bd")
    partial = df.filter(F.pmod(F.xxhash64("url"), F.lit(4)).isin(0, 1))
    encode_table(spark, partial, EncodeConfig(out_dir=out, **cfg_kw), plan=plan)
    encode_table(spark, df, EncodeConfig(out_dir=out, **cfg_kw), plan=plan)
    out_ref = str(tmp_path / "ref_bd")
    encode_table(spark, df, EncodeConfig(out_dir=out_ref, **cfg_kw), plan=plan)
    l1 = spark.read.parquet(f"{out}/lineage").select("bucket", "content_sha", "n_rows").collect()
    lr = spark.read.parquet(f"{out_ref}/lineage").select("bucket", "content_sha", "n_rows").collect()
    assert sorted(map(tuple, l1)) == sorted(map(tuple, lr))
    got = scan(spark, out, columns=["url", "lang"],
               predicate=Predicate("lang", "isin", ["en", "de"]))
    assert got.count() == df.filter("lang in ('en','de')").count()


def test_datasource_decimal_pushdown(spark, tmp_path):
    """Pushed DECIMAL filters convert by scale to unscaled ints before
    hitting the int zone maps."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = spark.sql("SELECT id AS k, CAST(id * 1.5 AS DECIMAL(12,2)) AS price FROM range(600)")
    out = str(tmp_path / "dsdec")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=128, snapshot_id="t1"))
    got = spark.read.format(FORMAT_NAME).load(out)
    for cond in ("price >= 450.00", "price = 300.00"):
        assert got.filter(cond).count() == df.filter(cond).count(), cond


def test_null_bucket_key(spark, tmp_path):
    """NULL values in the bucket key hash deterministically (xxhash64(NULL)
    = seed constant) into one bucket and round-trip exactly."""
    df = spark.sql(
        "SELECT CASE WHEN id % 11 = 0 THEN NULL ELSE CONCAT('k', id) END AS k, id AS v "
        "FROM range(500)"
    )
    out = str(tmp_path / "nullkey")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=4,
                                         block_size=64, snapshot_id="t1"))
    got = scan(spark, out)
    assert got.count() == 500
    assert got.filter("k IS NULL").count() == df.filter("k IS NULL").count() > 0


@pytest.fixture()
def ny_session_tz(spark):
    """Temporarily run with a non-UTC session timezone (restores UTC)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield "America/New_York"
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_datasource_timestamp_pushdown_non_utc_session(spark, tmp_path, ny_session_tz):
    """Pushed timestamp filters stay exact when the session timezone is not
    UTC: Spark hands naive datetime literals in the SESSION zone, and the
    pushdown localizes them before comparing against the stored instants
    (consumed filters are never re-evaluated by Spark)."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = spark.sql(
        "SELECT id AS k, timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2024-03-01 00:00:00') AS ts "
        "FROM range(500)"
    )
    out = str(tmp_path / "dstz")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=128, snapshot_id="t1"))
    got = spark.read.format(FORMAT_NAME).load(out)
    for cond in ("ts = TIMESTAMP'2024-03-05 07:00:00'",
                 "ts >= TIMESTAMP'2024-03-15 00:00:00'",
                 "ts BETWEEN TIMESTAMP'2024-03-04 00:00:00' AND TIMESTAMP'2024-03-06 00:00:00'"):
        assert got.filter(cond).count() == df.filter(cond).count(), cond


def test_datasource_in_filter_with_null(spark, tmp_path):
    """col IN (..., NULL) pushes down exactly: NULL elements never match and
    are dropped instead of crashing planning or executor comparisons."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = spark.sql("SELECT id AS k, CAST(id % 7 AS INT) AS v, "
                   "CAST(id * 0.25 AS DECIMAL(10,2)) AS price FROM range(400)")
    out = str(tmp_path / "dsinnull")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=64, snapshot_id="t1"))
    got = spark.read.format(FORMAT_NAME).load(out)
    for cond in ("v IN (1, 3, NULL)", "price IN (25.00, NULL)", "k IN (NULL)"):
        assert got.filter(cond).count() == df.filter(cond).count(), cond


def test_gdict_timestamp_ntz_non_utc_session(spark, tmp_path, ny_session_tz):
    """Global-dictionary values for timestamp_ntz are wall-clock micros
    computed timezone-independently; a non-UTC session must not shift the
    dictionary relative to the encoder's Arrow wall micros."""
    df = spark.sql(
        "SELECT id AS k, CAST(timestampadd(HOUR, CAST(id % 24 AS INT), "
        "TIMESTAMP'2024-06-01 00:00:00') AS TIMESTAMP_NTZ) AS tntz FROM range(600)"
    )
    out = str(tmp_path / "ntzgd")
    res = encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                               block_size=128, snapshot_id="t1"))
    assert res.plan["tntz"] == "gdict"  # 24 distinct values -> global dict
    got = _sorted_pdf(scan(spark, out), order="k")
    want = _sorted_pdf(df, order="k")
    pd.testing.assert_series_equal(got["tntz"], want["tntz"])


def test_pruning_report_empty_predicates_raises(spark, encoded):
    out, _, _ = encoded
    with pytest.raises(ValueError, match="at least one predicate"):
        pruning_report(spark, out, [])


def test_corrupt_file_missing_column_row_raises(spark, tmp_path):
    """A bucket file missing one column's row for a block raises a
    descriptive corruption error (not a KeyError deep in decode)."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    df = spark.sql("SELECT CONCAT('u', id) AS url, CAST(id AS INT) AS v FROM range(300)")
    out = str(tmp_path / "corrupt")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=1, block_size=64,
                                         snapshot_id="t1"))
    path = sorted(glob.glob(f"{out}/blocks/bucket=*/*.parquet"))[0]
    tbl = pq.read_table(path)
    keep = pc.invert(pc.and_(pc.equal(tbl.column("col"), "v"),
                             pc.equal(tbl.column("block_id"), 2)))
    pq.write_table(tbl.filter(keep), path)
    with pytest.raises(Exception, match="corrupt encoded file"):
        scan(spark, out).count()


def test_scan_column_pruning_skips_blob_row_groups(spark, tmp_path, monkeypatch):
    """The writer emits one block-row per row group with `col` statistics, so
    a scan needing only a narrow column must never READ the row groups that
    hold the blob columns (chunk-selective reads — the reference's
    readNextRowGroup(ColumnChunkMetaData[]) analog)."""
    import glob

    import pyarrow.parquet as pq

    from parquet_main_spark.operators.decode import _decode_file
    from parquet_main_spark.operators.encode import gdicts_from_json, read_meta

    df = webpages(spark, 800, partitions=4)
    out = str(tmp_path / "colprune")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=2, block_size=128,
                                         snapshot_id="t1"))
    meta = read_meta(spark, out)
    path = sorted(glob.glob(f"{out}/blocks/bucket=*/*.parquet"))[0]

    md = pq.ParquetFile(path).metadata
    col_idx = md.schema.to_arrow_schema().get_field_index("col")
    rg_col = {rg: md.row_group(rg).column(col_idx).statistics.min
              for rg in range(md.num_row_groups)}
    assert set(rg_col.values()) >= {"html", "text", "lang"}  # layout sanity

    read_rgs: list[int] = []
    orig = pq.ParquetFile.read_row_group

    def spy(self, rg, *a, **kw):
        read_rgs.append(rg)
        return orig(self, rg, *a, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", spy)
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])
    rows = sum(b.num_rows for b in _decode_file(path, meta["logical"], ["lang"], [], gd))
    assert rows > 0
    touched = {rg_col[rg] for rg in read_rgs}
    assert "html" not in touched and "text" not in touched, touched
    assert touched <= {"lang"}


def test_datasource_columns_option(spark, encoded):
    """.option('columns', ...) restricts the data source schema and the
    physical read; unknown names fail at planning."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out, df, _ = encoded
    got = (spark.read.format(FORMAT_NAME).option("columns", "lang,url").load(out))
    assert got.columns == ["lang", "url"]
    assert got.count() == df.count()
    assert (got.filter("lang = 'en'").count()
            == df.filter("lang = 'en'").count())
    with pytest.raises(Exception, match="unknown column"):
        spark.read.format(FORMAT_NAME).option("columns", "nope").load(out).count()


def test_predicate_tree_or_not(spark, encoded):
    """Or/Not trees match the DataFrame oracle, including NULL semantics."""
    from parquet_main_spark.operators.decode import And, Not, Or

    out, df, _ = encoded
    cases = [
        (Or([Predicate("lang", "=", "de"), Predicate("url", ">=", "https://host8")]),
         "lang = 'de' OR url >= 'https://host8'"),
        (Not(Predicate("lang", "isin", ["en", "de"])),
         "NOT (lang IN ('en', 'de'))"),
        (And([Or([Predicate("lang", "=", "de"), Predicate("lang", "=", "fr")]),
              Not(Predicate("url", "<", "https://host3"))]),
         "(lang = 'de' OR lang = 'fr') AND NOT (url < 'https://host3')"),
        (Predicate("url", "startswith", "https://host12"),
         "url LIKE 'https://host12%'"),
    ]
    for expr, sql in cases:
        got = scan(spark, out, columns=["url", "lang"], predicate=expr)
        want = df.filter(sql).select("url", "lang")
        g, w = _sorted_pdf(got), _sorted_pdf(want)
        pd.testing.assert_frame_equal(g.reset_index(drop=True), w.reset_index(drop=True)), sql


def test_predicate_tree_null_semantics(spark, tmp_path):
    """NOT over a column with NULLs: NOT(NULL) is NULL, the row is dropped —
    the Kleene mask must not complement unknowns into matches."""
    from parquet_main_spark.operators.decode import Not, Or

    df = spark.sql(
        "SELECT CONCAT('k', id) AS k, "
        "CASE WHEN id % 5 = 0 THEN NULL ELSE CAST(id % 10 AS INT) END AS v "
        "FROM range(500)"
    )
    out = str(tmp_path / "treenull")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=64, snapshot_id="t1"))
    cases = [
        (Not(Predicate("v", "=", 3)), "NOT (v = 3)"),
        (Not(Not(Predicate("v", ">", 6))), "NOT (NOT (v > 6))"),
        (Or([Predicate("v", "isnull", None), Not(Predicate("v", "<=", 4))]),
         "v IS NULL OR NOT (v <= 4)"),
    ]
    for expr, sql in cases:
        assert scan(spark, out, predicate=expr).count() == df.filter(sql).count(), sql


def test_pruning_report_or_partial(spark, encoded):
    """An OR report shows partial pruning: the union of the children's
    surviving sets still prunes blocks neither child can reach."""
    from parquet_main_spark.operators.decode import Or

    out, _, _ = encoded
    rep = pruning_report(spark, out, Or([
        Predicate("url", ">=", "https://host995"),
        Predicate("url", "<", "https://host1001"),
    ]))
    assert 0 < rep["kept_blocks"] < rep["total_blocks"]


def test_datasource_not_and_startswith_pushdown(spark, encoded):
    """Catalyst Not / StringStartsWith / EqualNullSafe filters push down and
    stay exact."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out, df, _ = encoded
    got = spark.read.format(FORMAT_NAME).load(out)
    for cond in ("NOT (lang = 'en')", "url LIKE 'https://host12%'",
                 "NOT (lang IN ('en', 'de'))", "lang <=> 'fr'",
                 "NOT (lang <=> 'fr')"):
        assert got.filter(cond).count() == df.filter(cond).count(), cond


def test_stats_sampling_stratified(spark, tmp_path):
    """A clustered (sorted) input yields the same codec plan as its shuffled
    copy: the stats sample is spread across the partition index space, not
    taken from the head, so clustering must not skew codec selection."""
    base = spark.sql(
        "SELECT id, CONCAT('u', id) AS k, "
        "CONCAT('g', CAST(id DIV 1000 AS STRING)) AS grp "  # 32 values, 1000-runs
        "FROM range(32000)"
    )
    clustered = base.repartitionByRange(32, "id").drop("id")
    shuffled = base.repartition(32).drop("id")
    plans = []
    for i, df in enumerate((clustered, shuffled)):
        out = str(tmp_path / f"strat{i}")
        res = encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k",
                                                   buckets=2, block_size=4096,
                                                   snapshot_id="t1"))
        plans.append(res.plan)
    assert plans[0] == plans[1]


def test_scan_count_matches_oracle(spark, encoded):
    """scan_count answers COUNT(*) exactly for every predicate form,
    including trees and no predicate at all."""
    from parquet_main_spark.operators.decode import Not, Or, scan_count

    out, df, _ = encoded
    cases = [
        (None, "1=1"),
        (Predicate("lang", "=", "en"), "lang = 'en'"),
        (Predicate("url", "between", ("https://host3", "https://host6")),
         "url BETWEEN 'https://host3' AND 'https://host6'"),
        (Not(Predicate("lang", "isin", ["en", "de"])), "NOT (lang IN ('en','de'))"),
        (Or([Predicate("lang", "=", "fr"), Predicate("url", ">=", "https://host9")]),
         "lang = 'fr' OR url >= 'https://host9'"),
        (Predicate("url", "startswith", "https://host1"), "url LIKE 'https://host1%'"),
        (Predicate("lang", "=", "zz"), "lang = 'zz'"),
    ]
    for expr, sql in cases:
        assert scan_count(spark, out, expr) == df.filter(sql).count(), sql
        # distributed path (max_driver_files=0 forces the per-file job)
        assert scan_count(spark, out, expr,
                          max_driver_files=0) == df.filter(sql).count(), sql


def test_scan_count_with_nulls(spark, tmp_path):
    from parquet_main_spark.operators.decode import Not, scan_count

    df = spark.sql(
        "SELECT CONCAT('k', id) AS k, "
        "CASE WHEN id % 4 = 0 THEN NULL ELSE CAST(id % 100 AS INT) END AS v "
        "FROM range(2000)"
    )
    out = str(tmp_path / "cntnull")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=128, snapshot_id="t1"))
    for expr, sql in [
        (Predicate("v", "isnull", None), "v IS NULL"),
        (Predicate("v", "notnull", None), "v IS NOT NULL"),
        (Not(Predicate("v", "<", 50)), "NOT (v < 50)"),
        (Predicate("v", ">=", 0), "v >= 0"),
    ]:
        assert scan_count(spark, out, expr) == df.filter(sql).count(), sql


def test_not_predicate_prunes_blocks(spark, tmp_path, monkeypatch):
    """Definite-match classification gives Not real pruning power: blocks
    whose range lies entirely inside a NOT-ed between are dropped undecoded
    (De Morgan over the zone map), and an all-match count reads NO data row
    groups at all."""
    import glob

    import pyarrow.parquet as pq

    from parquet_main_spark.operators.decode import Not, _count_file, _decode_file
    from parquet_main_spark.operators.encode import read_meta

    df = spark.sql("SELECT CONCAT('k', LPAD(CAST(id AS STRING), 6, '0')) AS k, id AS v "
                   "FROM range(4000)")
    out = str(tmp_path / "notprune")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=1,
                                         block_size=256, order_by=["k"],
                                         snapshot_id="t1"))
    meta = read_meta(spark, out)
    path = sorted(glob.glob(f"{out}/blocks/bucket=*/*.parquet"))[0]

    read_rgs: list[int] = []
    orig = pq.ParquetFile.read_row_group

    def spy(self, rg, *a, **kw):
        read_rgs.append(rg)
        return orig(self, rg, *a, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", spy)

    # NOT(v BETWEEN 500 AND 3500): interior blocks all-match the between and
    # must be pruned; only the two boundary-range blocks decode
    expr = Not(Predicate("v", "between", (500, 3500)))
    rows = sum(b.num_rows for b in _decode_file(path, meta["logical"], ["v"], expr, {}))
    assert rows == df.filter("NOT (v BETWEEN 500 AND 3500)").count()
    n_blocks = 4000 // 256 + 1
    assert 0 < len(read_rgs) < n_blocks  # pruned: far fewer rgs than blocks

    # all-match count: v >= 0 holds everywhere -> stats-only, zero rg reads
    read_rgs.clear()
    assert _count_file(path, meta["logical"], Predicate("v", ">=", 0), {}) == 4000
    assert read_rgs == []


def test_decimal128_roundtrip_and_pushdown(spark, tmp_path):
    """decimal(p>18) rides the binary codec family as 16-byte
    order-preserving keys: exact round-trip, range/equality pushdown through
    scan() AND the data source, and scan_count — closing the reference's
    FIXED_LEN_BYTE_ARRAY-decimal type-matrix gap."""
    from parquet_main_spark.operators.decode import scan_count
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = spark.sql(
        "SELECT id AS k, "
        "CAST(id AS DECIMAL(38,4)) * CAST(1234567890123456.789 AS DECIMAL(38,4)) "
        "  - CAST(3e18 AS DECIMAL(38,4)) AS big, "
        "CASE WHEN id % 9 = 0 THEN NULL ELSE "
        "  CAST(id - 300 AS DECIMAL(25,0)) END AS signed "
        "FROM range(600)"
    )
    out = str(tmp_path / "dec128")
    res = encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                               block_size=64, snapshot_id="t1"))
    assert res.plan  # encoded at all
    got = _sorted_pdf(scan(spark, out), order="k")
    want = _sorted_pdf(df, order="k")[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)

    # predicate values are unscaled ints (scale 4 / scale 0)
    n = scan(spark, out, columns=["k"],
             predicate=Predicate("signed", "between", (-100, 50))).count()
    assert n == df.filter("signed BETWEEN -100 AND 50").count() > 0
    assert (scan_count(spark, out, Predicate("signed", "<", 0))
            == df.filter("signed < 0").count())

    # data-source pushdown converts DECIMAL literals to keys
    ds = spark.read.format(FORMAT_NAME).load(out)
    for cond in ("signed >= -250 AND signed < -100",
                 "big = CAST(1234567890123456.789 AS DECIMAL(38,4)) * 7 "
                 "      - CAST(3e18 AS DECIMAL(38,4))"):
        assert ds.filter(cond).count() == df.filter(cond).count(), cond


def test_vector_column_roundtrip_and_predicates(spark, tmp_path):
    """array<float>/array<double> columns (embeddings) ride the var-len
    BINARY codec family as raw element bytes: exact round-trip incl. NULL
    rows and ragged lengths, null-aware predicates, and exact-vector
    equality/isin keys (a float list normalizes to its byte key) — the
    multimodal/embedding analog of the reference's BYTE_ARRAY paths."""
    import numpy as np

    from parquet_main_spark.operators.decode import scan_count

    df = spark.sql(
        "SELECT id AS k, "
        "CASE WHEN id % 7 = 0 THEN NULL ELSE "
        "  transform(sequence(0, CAST(id % 5 AS INT) + 2), "
        "            i -> CAST(i * 0.5 + id AS FLOAT)) END AS emb32, "
        "transform(sequence(0, 3), i -> CAST(i + id * 0.25 AS DOUBLE)) AS emb64 "
        "FROM range(500)"
    )
    out = str(tmp_path / "vec")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=64, snapshot_id="t1"))
    got = _sorted_pdf(scan(spark, out), order="k")
    want = _sorted_pdf(df, order="k")[got.columns.tolist()]
    assert len(got) == len(want)
    for c in ("emb32", "emb64"):
        for a, b in zip(got[c], want[c]):
            if b is None or (isinstance(b, float) and pd.isna(b)):
                assert a is None or (isinstance(a, float) and pd.isna(a))
            else:
                assert np.array_equal(np.asarray(a), np.asarray(b)), c

    # null-aware predicates answered from the validity bitmap
    assert scan_count(spark, out, Predicate("emb32", "isnull", None)) == \
        df.filter("emb32 IS NULL").count()
    # exact-vector equality: the float list is normalized to its byte key
    # (k=43: not a multiple of 7, so the row is non-NULL)
    probe = [i * 0.5 + 43 for i in range(0, (43 % 5) + 3)]
    assert scan_count(spark, out, Predicate("emb32", "=", probe)) == 1
    assert scan_count(spark, out, Predicate("emb32", "isin",
                                            [probe, [1.0, 2.0]])) == 1


def test_datasource_reads_vector_columns(spark, tmp_path):
    """spark.read.format('pms_encoded') reinflates vector columns to
    array<float> and still pushes scalar filters down around them."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = spark.sql(
        "SELECT id AS k, transform(sequence(0, 3), i -> CAST(i + id AS FLOAT)) AS v "
        "FROM range(300)"
    )
    out = str(tmp_path / "dsvec")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=64, snapshot_id="t1"))
    ds = spark.read.format(FORMAT_NAME).load(out)
    assert ds.schema["v"].dataType.simpleString() == "array<float>"
    assert ds.filter("k BETWEEN 10 AND 19").count() == 10
    got = ds.filter("k = 42").select("v").collect()[0][0]
    assert [float(x) for x in got] == [42.0, 43.0, 44.0, 45.0]


def test_resume_vector_table_byte_identity(spark, tmp_path):
    """Resume determinism extends to vector columns: a partial run (2 of 4
    buckets) resumed with the full input produces lineage content SHAs
    identical to an uninterrupted run — the element-bytes blobs and their
    canonical digests are pure numpy/Arrow, no iteration-order hazards."""
    df = spark.sql(
        "SELECT id AS k, transform(sequence(0, 7), i -> CAST(i * 0.25 + id AS FLOAT)) AS v "
        "FROM range(800)"
    )
    cfg_kw = dict(bucket_key="k", buckets=4, block_size=128, snapshot_id="t1")
    out = str(tmp_path / "vres")
    partial = df.filter(F.pmod(F.xxhash64("k"), F.lit(4)).isin(0, 1))
    encode_table(spark, partial, EncodeConfig(out_dir=out, **cfg_kw))
    res = encode_table(spark, df, EncodeConfig(out_dir=out, **cfg_kw))
    assert res.resumed_buckets == 2 and res.encoded_buckets == 2
    ref = str(tmp_path / "vref")
    encode_table(spark, df, EncodeConfig(out_dir=ref, **cfg_kw))
    l1 = {r["bucket"]: r["content_sha"]
          for r in spark.read.parquet(f"{out}/lineage").collect()}
    l2 = {r["bucket"]: r["content_sha"]
          for r in spark.read.parquet(f"{ref}/lineage").collect()}
    assert l1 == l2


def test_sub_bucket_split_scan(spark, tmp_path):
    """A deliberately SINGLE-bucket table (one giant file — e.g. a table
    someone else encoded with too few buckets) must scan with MANY tasks
    when split_bytes is small: _scan_units fans the file into row-group
    ranges cut at block-group boundaries, and the split scan is
    byte-identical to the unsplit one — with and without predicates and
    column pruning."""
    from parquet_main_spark.operators.decode import (
        _list_block_files, _rg_ranges, _scan_units, scan_count,
    )

    df = webpages(spark, 1500, partitions=4)
    out = str(tmp_path / "onebucket")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=1, block_size=128,
                                         snapshot_id="s1"))
    files = _list_block_files(out)
    assert len(files) == 1 and files[0][1] > 0
    path = files[0][0]

    split = 64 * 1024  # force many ranges on a ~MB file
    units = _scan_units(files, split)
    assert len(units) > 1 and all(u[0] == path for u in units)

    # ranges tile the data row groups exactly once, cut at block boundaries
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    bid_idx = md.schema.to_arrow_schema().get_field_index("block_id")
    rg_bid = [int(md.row_group(rg).column(bid_idx).statistics.min)
              for rg in range(md.num_row_groups)]
    data_rgs = [rg for rg, b in enumerate(rg_bid) if b >= 0]
    covered = sorted(rg for _, lo, hi in units for rg in range(lo, hi)
                     if rg_bid[rg] >= 0)
    assert covered == data_rgs  # every data rg in exactly one unit
    for _, lo, hi in units:
        inside = {rg_bid[rg] for rg in range(lo, hi) if rg_bid[rg] >= 0}
        for _, lo2, hi2 in units:
            if (lo2, hi2) == (lo, hi):
                continue
            other = {rg_bid[rg] for rg in range(lo2, hi2) if rg_bid[rg] >= 0}
            assert not (inside & other)  # no block group straddles units

    ranges = _rg_ranges(path, split)
    assert ranges == [(lo, hi) for _, lo, hi in units]

    full = _sorted_pdf(scan(spark, out, split_bytes=None))
    got = _sorted_pdf(scan(spark, out, split_bytes=split))
    full["html"] = full["html"].map(bytes)
    got["html"] = got["html"].map(bytes)
    pd.testing.assert_frame_equal(got, full)

    # predicate + column pruning through the split path
    pred = Predicate("lang", "=", "en")
    a = _sorted_pdf(scan(spark, out, columns=["url", "lang"], predicate=pred,
                         split_bytes=split))
    b = _sorted_pdf(scan(spark, out, columns=["url", "lang"], predicate=pred,
                         split_bytes=None))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == df.filter("lang = 'en'").count()
    assert scan_count(spark, out, pred) == len(a)


def test_datasource_splits_oversized_buckets(spark, tmp_path, monkeypatch):
    """The pms_encoded data source fans oversized bucket files into
    row-group-range partitions too (its planner has no JVM, so the split
    happens in pure Python) and still reads the exact table."""
    from parquet_main_spark.operators import decode as dec
    from parquet_main_spark.sources.datasource import EncodedTableReader

    df = webpages(spark, 900, partitions=4)
    out = str(tmp_path / "ds_split")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=1, block_size=128,
                                         snapshot_id="d1"))
    monkeypatch.setattr(dec, "DEFAULT_SPLIT_BYTES", 64 * 1024)
    # datasource.partitions imports the module attr at call time
    import parquet_main_spark.sources.datasource as ds_mod  # noqa: F401

    reader = EncodedTableReader(out)
    parts = reader.partitions()
    assert len(parts) > 1
    rows = []
    for p in parts:
        for batch in reader.read(p):
            rows.append(batch.to_pandas())
    got = (pd.concat(rows).sort_values("url").reset_index(drop=True)
           [["url", "lang"]])
    want = _sorted_pdf(df)[["url", "lang"]]
    pd.testing.assert_frame_equal(got, want)


def test_remote_uri_listing_via_pyarrow_fs(spark, tmp_path, monkeypatch):
    """URI listing without a JVM: when the path is a filesystem URI and no
    SparkSession is passed (the Python data source planner), the listing
    goes through pyarrow.fs and returns reopenable URIs + sizes. Driven with
    file:// (the one URI scheme the sandbox can serve) by treating it as
    remote for the duration of the test."""
    import os

    from parquet_main_spark.operators import encode as enc
    from parquet_main_spark.operators.decode import _list_block_files

    df = webpages(spark, 400, partitions=2)
    out = str(tmp_path / "remote")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=2, block_size=128,
                                         snapshot_id="r1"))
    local = _list_block_files(out)
    assert len(local) == 2

    real = enc.is_remote_path
    monkeypatch.setattr(enc, "is_remote_path",
                        lambda p: p.startswith("file:") or real(p))
    uris = _list_block_files(f"file://{out}")
    assert [(u.replace("file://", ""), s) for u, s in uris] == local
    assert all(u.startswith("file:///") for u, _ in uris)
    assert all(s == os.path.getsize(u[7:]) for u, s in uris)
    # a missing table still raises loudly through the pyarrow.fs path
    with pytest.raises(FileNotFoundError):
        _list_block_files(f"file://{out}_nope")


def test_datasource_writer_roundtrip(spark, tmp_path):
    """Write-side data source: df.write.format('pms_encoded') -> encoded
    table readable by BOTH spark.read.format('pms_encoded') and scan(),
    bit-identical. Each input partition becomes bucket file(s); append
    offsets bucket ids past the existing ones; overwrite replaces."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out = str(tmp_path / "wds")
    df = webpages(spark, 1000, partitions=4)
    (df.write.format(FORMAT_NAME).mode("overwrite")
       .option("block_size", "128").save(out))

    back = spark.read.format(FORMAT_NAME).load(out)
    got = _sorted_pdf(back)[["url", "warc_ts", "html", "text", "lang"]]
    want = _sorted_pdf(df)[["url", "warc_ts", "html", "text", "lang"]]
    got["html"] = got["html"].map(bytes)
    want["html"] = want["html"].map(bytes)
    pd.testing.assert_frame_equal(got, want)

    # the library scan() reads writer output with pushdown intact
    n = scan(spark, out, columns=["url"],
             predicate=Predicate("lang", "=", "en")).count()
    assert n == df.filter("lang = 'en'").count()

    # append: disjoint bucket ids, union visible
    webpages(spark, 500, partitions=2).write.format(FORMAT_NAME) \
        .mode("append").option("block_size", "128").save(out)
    assert spark.read.format(FORMAT_NAME).load(out).count() == 1500

    # overwrite replaces everything
    (df.write.format(FORMAT_NAME).mode("overwrite")
       .option("block_size", "128").save(out))
    assert spark.read.format(FORMAT_NAME).load(out).count() == 1000

    # lineage + meta written by commit: resume-compatible table layout
    meta = read_meta(spark, out)
    assert meta["config"]["writer"] == "datasource"
    assert set(meta["logical"]) == {"url", "warc_ts", "html", "text", "lang"}
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.count() == lin.select("bucket").distinct().count() > 0


def test_datasource_writer_chunking_and_schema_guard(spark, tmp_path):
    """bucket_rows bounds writer-task memory: a partition larger than the
    threshold flushes MULTIPLE bucket files (ids stay collision-free), and
    an append with a different schema fails loudly instead of corrupting
    the table."""
    import glob

    import pytest as _pytest

    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out = str(tmp_path / "wchunk")
    df = webpages(spark, 900, partitions=1)
    (df.write.format(FORMAT_NAME).mode("overwrite")
       .option("block_size", "64").option("bucket_rows", "256").save(out))
    buckets = glob.glob(f"{out}/blocks/bucket=*")
    assert len(buckets) == 4  # ceil(900 / 256)
    assert spark.read.format(FORMAT_NAME).load(out).count() == 900

    bad = df.select("url", "lang")  # schema mismatch
    with _pytest.raises(Exception, match="schema mismatch"):
        (bad.write.format(FORMAT_NAME).mode("append")
            .option("block_size", "64").save(out))


@pytest.fixture(scope="module")
def single_bucket_file(spark, tmp_path_factory):
    """One deliberately-unsplit bucket file + its full decode, shared by the
    split-property tests (encode once, fuzz split_bytes cheaply)."""
    out = str(tmp_path_factory.mktemp("splitprop"))
    df = webpages(spark, 1200, partitions=4)
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=1, block_size=96,
                                         snapshot_id="sp"))
    from parquet_main_spark.operators.decode import _list_block_files

    (path, size), = _list_block_files(out)
    meta = read_meta(spark, out)
    return out, path, size, meta


def test_split_ranges_property(spark, single_bucket_file):
    """For ANY split_bytes, _rg_ranges must tile the data row groups exactly
    once, cut only where block_id changes, and the concatenated decode of
    the units must equal the whole-file decode (hypothesis fuzz — pure
    pyarrow per example, the Spark encode runs once in the fixture)."""
    import pyarrow.parquet as pq

    from hypothesis import given, settings, strategies as st

    from parquet_main_spark.operators.decode import _decode_file, _rg_ranges
    from parquet_main_spark.operators.encode import gdicts_from_json

    out, path, size, meta = single_bucket_file
    md = pq.ParquetFile(path).metadata
    bid_idx = md.schema.to_arrow_schema().get_field_index("block_id")
    rg_bid = [int(md.row_group(rg).column(bid_idx).statistics.min)
              for rg in range(md.num_row_groups)]
    data_rgs = [rg for rg, b in enumerate(rg_bid) if b >= 0]
    gd = gdicts_from_json(meta.get("gdicts", {}), meta["logical"])

    def decode_units(ranges):
        import pyarrow as pa

        batches = []
        for lo, hi in ranges:
            batches.extend(_decode_file(path, meta["logical"], ["url", "lang"],
                                        [], gd, rg_range=(lo, hi)))
        t = pa.Table.from_batches(batches)
        return t.sort_by([("url", "ascending")])

    whole = decode_units([(0, md.num_row_groups)])

    @settings(max_examples=25, deadline=None)
    @given(split=st.integers(min_value=1, max_value=size * 2))
    def check(split):
        ranges = _rg_ranges(path, split)
        covered = sorted(rg for lo, hi in ranges for rg in range(lo, hi)
                         if rg_bid[rg] >= 0)
        assert covered == data_rgs
        # a block's row groups never straddle two ranges
        for lo, hi in ranges:
            if lo > 0 and rg_bid[lo] >= 0 and rg_bid[lo - 1] >= 0:
                assert rg_bid[lo] != rg_bid[lo - 1]
        assert decode_units(ranges).equals(whole)

    check()


def test_datasource_writer_deterministic(spark, tmp_path):
    """Same input + same partitioning -> byte-identical bucket files from
    the DS writer (the engine's determinism invariant, FIXTURES.md 3,
    extended to the write-side data source)."""
    import glob
    import hashlib

    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    df = webpages(spark, 600, partitions=3)

    def shas(out):
        (df.write.format(FORMAT_NAME).mode("overwrite")
           .option("block_size", "128").option("bucket_rows", "200").save(out))
        return {
            p.split("blocks/")[1]: hashlib.sha256(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{out}/blocks/bucket=*/*.parquet")
        }

    a = shas(str(tmp_path / "w1"))
    b = shas(str(tmp_path / "w2"))
    assert a == b and len(a) >= 3


def test_datasource_split_bytes_option(spark, tmp_path):
    """.option("split_bytes", n) fans an oversized bucket into multiple
    input partitions through the real spark.read path, with identical
    results."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out = str(tmp_path / "dsopt")
    df = webpages(spark, 800, partitions=4)
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=1, block_size=128,
                                         snapshot_id="o1"))
    rd = (spark.read.format(FORMAT_NAME).option("split_bytes", str(64 * 1024))
          .load(out))
    assert rd.rdd.getNumPartitions() > 1
    got = _sorted_pdf(rd.select("url", "lang"))
    want = _sorted_pdf(df)[["url", "lang"]]
    pd.testing.assert_frame_equal(got, want)


def test_rebucket_repairs_single_bucket_table(spark, tmp_path):
    """rebucket(): a 1-bucket table re-encodes to N buckets with identical
    content (the repair for someone else's under-bucketed table); the
    source reads split-parallel so the one giant bucket is not a single
    task."""
    from parquet_main_spark.operators.encode import rebucket

    src = str(tmp_path / "rb_src")
    dst = str(tmp_path / "rb_dst")
    df = webpages(spark, 900, partitions=3)
    encode_table(spark, df, EncodeConfig(out_dir=src, buckets=1, block_size=128,
                                         snapshot_id="r1"))
    res = rebucket(spark, src, EncodeConfig(out_dir=dst, buckets=8, block_size=128,
                                            snapshot_id="r2"),
                   split_bytes=64 * 1024)
    assert res.encoded_buckets == 8
    a = _sorted_pdf(scan(spark, dst))
    b = _sorted_pdf(scan(spark, src))
    a["html"] = a["html"].map(bytes)
    b["html"] = b["html"].map(bytes)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

    with pytest.raises(ValueError, match="fresh out_dir"):
        rebucket(spark, src, EncodeConfig(out_dir=src, buckets=4,
                                          snapshot_id="r3"))


def _as_remote(monkeypatch):
    """Treat file:// URIs as remote for the duration of a test — the one
    URI scheme the sandbox can serve through pyarrow.fs (the
    test_remote_uri_listing pattern)."""
    from parquet_main_spark.operators import encode as enc

    real = enc.is_remote_path
    monkeypatch.setattr(enc, "is_remote_path",
                        lambda p: p.startswith("file:") or real(p))


def test_datasource_remote_read_roundtrip(spark, tmp_path, monkeypatch):
    """The DS read path works on remote URIs end-to-end: _read_meta and the
    reader planner go through pyarrow.fs (not local glob), so
    spark.read.format('pms_encoded').load('hdfs://...') plans without a
    local filesystem — driven with file:// treated as remote."""
    from parquet_main_spark.sources.datasource import (
        EncodedTableReader, _read_meta,
    )

    df = webpages(spark, 600, partitions=2)
    out = str(tmp_path / "remote_read")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=2, block_size=128,
                                         snapshot_id="rr"))
    _as_remote(monkeypatch)
    uri = f"file://{out}"
    meta = _read_meta(uri)
    assert set(meta["logical"]) == {"url", "warc_ts", "html", "text", "lang"}

    reader = EncodedTableReader(uri)
    rows = []
    for p in reader.partitions():
        for batch in reader.read(p):
            rows.append(batch.to_pandas())
    got = (pd.concat(rows).sort_values("url").reset_index(drop=True)
           [["url", "lang", "text"]])
    want = _sorted_pdf(df)[["url", "lang", "text"]]
    pd.testing.assert_frame_equal(got, want)


def test_datasource_remote_stream_reader_offsets(spark, tmp_path, monkeypatch):
    """_ready_batches + the streaming reader plan remote ingest roots via
    pyarrow.fs: completed batch=N dirs (lineage present) are offsets, a
    half-written batch is not."""
    import os

    from parquet_main_spark.sources.datasource import (
        EncodedBatchesStreamReader, _ready_batches,
    )

    root = str(tmp_path / "remote_stream")
    df = webpages(spark, 300, partitions=2)
    encode_table(spark, df, EncodeConfig(out_dir=f"{root}/batch=0", buckets=2,
                                         block_size=128, snapshot_id="b0"))
    os.makedirs(f"{root}/batch=1/blocks", exist_ok=True)  # no lineage yet

    _as_remote(monkeypatch)
    uri = f"file://{root}"
    assert _ready_batches(uri) == [0]
    rd = EncodedBatchesStreamReader(uri)
    assert rd.latestOffset() == {"next": 1}
    parts = rd.partitions({"next": 0}, {"next": 1})
    n = sum(b.num_rows for p in parts for b in rd.read(p))
    assert n == 300


def test_datasource_append_preserves_gdicts_and_merges_meta(spark, tmp_path):
    """ADVICE r4 (high): appending via the DS writer must carry forward the
    table's global dictionaries — meta is their only copy, so dropping them
    leaves gdict-coded blocks undecodable — and meta must stay cumulative
    (buckets count + majority-vote plan over ALL lineage, not just the
    appended batch)."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    out = str(tmp_path / "gdict_append")
    df = webpages(spark, 1200, partitions=4)
    res = encode_table(spark, df, EncodeConfig(
        out_dir=out, buckets=4, block_size=128, snapshot_id="g1"))
    before = read_meta(spark, out)
    assert before["gdicts"], "fixture must actually produce global dicts"
    assert res.plan["lang"] == "gdict"

    extra = webpages(spark, 400, partitions=2)
    (extra.write.format(FORMAT_NAME).mode("append")
        .option("block_size", "128").save(out))

    after = read_meta(spark, out)
    assert after["gdicts"] == before["gdicts"]
    # appended chunks KEEP gdict-coding the table's global-dict columns
    import json as _json

    lin = spark.read.parquet(f"{out}/lineage").collect()
    appended = [r for r in lin if r["snapshot_id"] != "g1"]
    assert appended
    for r in appended:
        codecs = {i["col"]: i["codec"] for i in _json.loads(r["codec_json"])}
        assert codecs["lang"] == "gdict", codecs
    assert after["config"]["buckets"] > before["config"]["buckets"]
    assert after["config"]["bucket_key"] == before["config"]["bucket_key"]
    # majority plan still reflects the (larger) original table
    assert after["plan"]["lang"] == "gdict"

    # the old gdict-coded blocks decode fine after the append
    got = scan(spark, out)
    assert got.count() == 1600
    assert (got.filter(F.col("lang") == "en").count()
            == df.filter("lang = 'en'").count()
            + extra.filter("lang = 'en'").count())


def test_datasource_writer_remote_abort_cleanup(spark, tmp_path, monkeypatch):
    """ADVICE r4 (medium): abort must delete completed tasks' bucket dirs on
    REMOTE tables too — readers list bucket files, not lineage, so leftovers
    would surface as phantom rows and shift the next bucket_offset."""
    import os

    from parquet_main_spark.sources.datasource import (
        EncodedTableWriter, _WriteResult,
    )

    _as_remote(monkeypatch)
    out = str(tmp_path / "abort_remote")
    uri = f"file://{out}"
    df = webpages(spark, 10, partitions=1)
    w = EncodedTableWriter(uri, df.schema, overwrite=True, options={})
    for b in (0, 1):
        os.makedirs(f"{out}/blocks/bucket={b}", exist_ok=True)
        with open(f"{out}/blocks/bucket={b}/part-0.parquet", "wb") as f:
            f.write(b"x")
    w.abort([_WriteResult([{"bucket": 0}, {"bucket": 1}]), None])
    assert not os.path.exists(f"{out}/blocks/bucket=0")
    assert not os.path.exists(f"{out}/blocks/bucket=1")


def test_timestamp_predicate_uses_session_timezone(spark, encoded):
    """ADVICE r4: naive datetime literals on an instant-typed (timestamp)
    column resolve in spark.sql.session.timeZone, matching Spark's own
    literal semantics — not a silent UTC assumption."""
    import datetime

    from parquet_main_spark.operators.decode import _normalize_expr

    out, df, _ = encoded
    lit = datetime.datetime(2025, 1, 1, 6, 30, 0)
    logical = {"warc_ts": "timestamp"}
    utc_micros = _normalize_expr(Predicate("warc_ts", "<", lit), logical).value

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny_micros = _normalize_expr(Predicate("warc_ts", "<", lit), logical).value
        assert ny_micros - utc_micros == 5 * 3600 * 1_000_000  # EST offset
        # end-to-end: engine count == Spark's own filter under the same zone
        n_engine = scan(spark, out, columns=["url"],
                        predicate=Predicate("warc_ts", "<", lit)).count()
        assert n_engine == df.filter(F.col("warc_ts") < lit).count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # tz-aware values stay exact regardless of session zone
    aware = lit.replace(tzinfo=datetime.timezone.utc)
    assert _normalize_expr(Predicate("warc_ts", "<", aware), logical).value \
        == utc_micros


def test_pruning_report_matches_scan_for_not(spark, tmp_path):
    """r4 brief item 4: pruning_report must report the block sets the scan
    ACTUALLY prunes — including under Not, where the old report kept every
    block. Oracle computed by hand from the known block layout: sorted v in
    0..3999, block_size 400 -> 10 blocks; NOT(v BETWEEN 700 AND 3100)
    all-matches blocks fully inside [700, 3100] (blocks 2..6 = 800..3199?
    no: blocks [800,1199]..[2800,3199] -> 2..5 inside, boundary 1 and 7),
    so kept = universe - all_match(child)."""
    from parquet_main_spark.operators.decode import Not

    df = spark.sql(
        "SELECT CONCAT('k', LPAD(CAST(id AS STRING), 6, '0')) AS k, id AS v "
        "FROM range(4000)")
    out = str(tmp_path / "notreport")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=1,
                                         block_size=400, order_by=["k"],
                                         snapshot_id="t1"))
    # blocks are [400*i, 400*i+399]; child BETWEEN 700 AND 3100 all-matches
    # blocks fully inside: [800..1199], [1200..1599], ..., [2800..2999]? ->
    # i in 2..6 iff 400*i >= 700 and 400*i+399 <= 3100 -> i in {2,..,6}:
    # i=6 is [2400..2799] ok, i=7 = [2800..3199] crosses 3100 -> boundary
    expected_pruned = len([i for i in range(10)
                           if 400 * i >= 700 and 400 * i + 399 <= 3100])
    rep = pruning_report(spark, out, Not(Predicate("v", "between", (700, 3100))))
    assert rep["total_blocks"] == 10
    assert rep["pruned_blocks"] == expected_pruned
    assert rep["kept_blocks"] == 10 - expected_pruned
    # and the scan under the same predicate stays exact
    n = scan(spark, out, columns=["v"],
             predicate=Not(Predicate("v", "between", (700, 3100)))).count()
    assert n == df.filter("NOT (v BETWEEN 700 AND 3100)").count()

    # all_match_blocks: v >= 0 holds everywhere
    rep2 = pruning_report(spark, out, Predicate("v", ">=", 0))
    assert rep2["all_match_blocks"] == 10 and rep2["pruned_blocks"] == 0


def test_gdict_from_sample_with_unseen_value_fallback(spark, tmp_path):
    """Round 5: global dictionaries come from the stats sample (no separate
    distinct-agg job). A value the sample never saw (here: only in rows past
    the 8192-row sample prefix of the single partition) must NOT corrupt
    anything — blocks containing it fall back to a local dictionary and the
    table round-trips exactly."""
    from parquet_main_spark.operators.decode import scan_count

    # the sample takes the first Arrow batches (>= 8192 rows, i.e. one
    # default 10000-row batch) of the single partition: 'rare' lives
    # strictly after row 25000, far outside it
    df = spark.sql(
        "SELECT id AS k, CASE WHEN id < 25000 THEN concat('v', id % 5) "
        "ELSE 'rare' END AS tag FROM range(30000)"
    ).coalesce(1)
    out = str(tmp_path / "gdict_sample")
    encode_table(spark, df, EncodeConfig(out_dir=out, bucket_key="k", buckets=2,
                                         block_size=512, order_by=["k"],
                                         snapshot_id="gs"))
    meta = read_meta(spark, out)
    assert meta["plan"].get("tag") == "gdict"
    assert "rare" not in set(meta["gdicts"]["tag"])  # sample missed it

    got = _sorted_pdf(scan(spark, out), order="k")
    want = _sorted_pdf(df, order="k")
    pd.testing.assert_frame_equal(got[["k", "tag"]], want[["k", "tag"]])
    # predicates on the gdict column stay exact across fallback blocks
    assert scan_count(spark, out, Predicate("tag", "=", "rare")) == 5000
    assert scan_count(spark, out, Predicate("tag", "=", "v3")) \
        == df.filter("tag = 'v3'").count()


def test_stream_writer_remote_commit_moves_staged_buckets(spark, tmp_path,
                                                          monkeypatch):
    """The streaming writer's REMOTE commit branch (pyarrow.fs file moves +
    staging cleanup) produces the same batch=N layout as the local branch:
    staged bucket files land under batch=N/blocks, meta + lineage are
    written last, staging dirs disappear, and the batch scans back exactly.
    Driven by invoking commit() directly on manually staged dirs (the
    streaming engine runs commit in its own process, out of monkeypatch
    reach)."""
    import glob
    import os

    from parquet_main_spark.operators.decode import scan
    from parquet_main_spark.sources.datasource import (
        EncodedTableStreamWriter, _StreamWriteResult, _read_meta,
    )

    # stage real encoded buckets by encoding a table and relocating its
    # bucket dirs into two fake task staging dirs
    df = webpages(spark, 300, partitions=2)
    enc_dir = str(tmp_path / "src_enc")
    encode_table(spark, df, EncodeConfig(out_dir=enc_dir, buckets=2,
                                         block_size=128, snapshot_id="s0",
                                         global_dict_max_card=0))
    out_root = str(tmp_path / "remote_stream_out")
    os.makedirs(out_root)
    lineage = spark.read.parquet(f"{enc_dir}/lineage").collect()
    messages = []
    for i, bdir in enumerate(sorted(glob.glob(f"{enc_dir}/blocks/bucket=*"))):
        staging = f"{out_root}/_staging/task{i}"
        os.makedirs(f"{staging}/bucket={i}")
        for p in glob.glob(f"{bdir}/*.parquet"):
            os.rename(p, f"{staging}/bucket={i}/{os.path.basename(p)}")
        row = [r.asDict() for r in lineage if r["bucket"] == int(
            os.path.basename(bdir).split("=")[1])][0]
        row["bucket"] = i
        messages.append(_StreamWriteResult(f"file://{staging}", [row]))

    _as_remote(monkeypatch)
    w = EncodedTableStreamWriter(f"file://{out_root}", df.schema,
                                 options={"snapshot_id": "sw"})
    w.commit(messages, batchId=0)

    assert os.path.isdir(f"{out_root}/batch=0/blocks/bucket=0")
    assert os.path.isdir(f"{out_root}/batch=0/blocks/bucket=1")
    assert glob.glob(f"{out_root}/batch=0/lineage/*.parquet")
    assert not glob.glob(f"{out_root}/_staging/task*/bucket=*")
    meta = _read_meta(f"file://{out_root}/batch=0")
    assert set(meta["logical"]) == {"url", "warc_ts", "html", "text", "lang"}
    got = _sorted_pdf(scan(spark, f"{out_root}/batch=0"))
    want = _sorted_pdf(df)[got.columns.tolist()]
    got["html"] = got["html"].map(bytes)
    want["html"] = want["html"].map(bytes)
    pd.testing.assert_frame_equal(got, want)


def test_completed_buckets_tolerates_mixed_lineage_schemas(spark, tmp_path):
    """Resume must survive a lineage dir whose files mix column widths
    (tables written by the pre-round-5 engine carried int32 bucket ids;
    appends add int64 files next to them). A whole-directory Spark read
    fails schema reconciliation there — the per-file pyarrow read keeps
    the resume set intact instead of silently re-encoding everything."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_main_spark.operators.encode import completed_buckets

    lin = tmp_path / "mixed" / "lineage"
    lin.mkdir(parents=True)

    def lineage_file(name, bucket_type, buckets):
        pq.write_table(pa.table({
            "bucket": pa.array(buckets, bucket_type),
            "n_rows": pa.array([1] * len(buckets), pa.int64()),
            "snapshot_id": pa.array(["s1"] * len(buckets), pa.string()),
            "status": pa.array(["done"] * len(buckets), pa.string()),
        }), str(lin / name))

    lineage_file("part-old.parquet", pa.int32(), [0, 1])   # pre-r5 width
    lineage_file("part-new.parquet", pa.int64(), [2, 3])

    assert completed_buckets(spark, str(tmp_path / "mixed"), "s1") == {0, 1, 2, 3}
    assert completed_buckets(spark, str(tmp_path / "mixed"), "other") == set()
    assert completed_buckets(spark, str(tmp_path / "nonexistent"), "s1") == set()


def test_verify_table_detects_corruption(spark, tmp_path):
    """verify_table: clean table verifies ok; a tampered block payload is
    pinpointed to its (bucket, col, block_id); a deleted bucket file is
    reported missing against lineage."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_main_spark.operators.verify import verify_table

    df = webpages(spark, 600, partitions=2)
    out = str(tmp_path / "verify_me")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=3, block_size=128,
                                         snapshot_id="v1"))
    rep = verify_table(spark, out)
    assert rep["ok"], rep
    assert rep["buckets"] == 3 and rep["cells"] > 0

    # tamper: flip bytes inside one data blob of one block row
    victim = sorted(glob.glob(f"{out}/blocks/bucket=*/*.parquet"))[0]
    tbl = pq.read_table(victim)
    data = tbl.column("data").to_pylist()
    bids = tbl.column("block_id").to_pylist()
    idx = next(i for i in range(len(data))
               if bids[i] >= 0 and data[i] and len(data[i]) > 64)
    # flip a byte deep in the payload (headers can carry scratch-sizing
    # fields that do not affect decoded values; tail bytes are value data)
    j = len(data[idx]) - 5
    data[idx] = data[idx][:j] + bytes([data[idx][j] ^ 0xFF]) + data[idx][j + 1:]
    tbl = tbl.set_column(tbl.column_names.index("data"), "data",
                         pa.array(data, type=pa.binary()))
    pq.write_table(tbl, victim)

    rep = verify_table(spark, out)
    assert not rep["ok"]
    assert rep["corrupt"], rep
    assert rep["corrupt"][0]["col"] == tbl.column("col")[idx].as_py()
    assert rep["corrupt"][0]["block_id"] == bids[idx]
    assert rep["unlinked_buckets"]  # bucket digest no longer matches lineage

    # lost bucket file: reported missing, not silently ignored
    shutil.rmtree(glob.glob(f"{out}/blocks/bucket=*")[1])
    rep = verify_table(spark, out)
    assert rep["missing_buckets"], rep


def test_scoped_verify_and_repair(spark, tmp_path):
    """The 100-TB patrol loop: a 3-batch (3-snapshot) table, one bucket
    corrupted — scoped verify finds exactly it without re-decoding the
    world, repair_buckets re-encodes ONLY it from source via the resume
    machinery, and the healed table verifies ok with the SAME content_sha
    lineage (byte-identical by the determinism invariant)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_main_spark.operators.verify import repair_buckets, verify_table
    from parquet_main_spark.sources.datasource import _read_parquet_rows

    df = webpages(spark, 900, partitions=3)
    dirs, cfgs, srcs = [], [], []
    for k in range(3):
        src = df.filter(F.crc32(F.col("url")) % 3 == k)
        out = str(tmp_path / f"batch{k}")
        cfg = EncodeConfig(out_dir=out, buckets=4, block_size=128,
                           snapshot_id=f"s{k}")
        encode_table(spark, src, cfg)
        dirs.append(out), cfgs.append(cfg), srcs.append(src)

    # scope controls: explicit buckets, snapshot attribution, sampling
    rep = verify_table(spark, dirs[1], buckets=[0, 2])
    assert rep["ok"] and rep["scope_buckets"] == 2 and rep["buckets"] == 2
    assert verify_table(spark, dirs[1], snapshots="s1")["ok"]
    assert verify_table(spark, dirs[1], snapshots=["nope"])["scope_buckets"] == 0
    full = verify_table(spark, dirs[1], sample=1.0)
    assert full["ok"] and full["scope_buckets"] == 4
    half = verify_table(spark, dirs[1], sample=0.5)
    assert half["ok"] and 0 < half["scope_buckets"] < 4
    assert (verify_table(spark, dirs[1], sample=0.5)["scope_buckets"]
            == half["scope_buckets"])  # deterministic tiling

    before = {int(r["bucket"]): r["content_sha"]
              for r in _read_parquet_rows(f"{dirs[1]}/lineage")}

    # corrupt one block payload in one bucket of batch 1
    victim = sorted(glob.glob(f"{dirs[1]}/blocks/bucket=*/*.parquet"))[0]
    vbucket = int(victim.split("bucket=")[1].split("/")[0])
    tbl = pq.read_table(victim)
    data = tbl.column("data").to_pylist()
    bids = tbl.column("block_id").to_pylist()
    idx = next(i for i in range(len(data))
               if bids[i] >= 0 and data[i] and len(data[i]) > 64)
    j = len(data[idx]) - 5
    data[idx] = data[idx][:j] + bytes([data[idx][j] ^ 0xFF]) + data[idx][j + 1:]
    pq.write_table(tbl.set_column(tbl.column_names.index("data"), "data",
                                  pa.array(data, type=pa.binary())), victim)

    # scoped verify over just the victim bucket pinpoints it; a scope that
    # excludes it stays green (the point of scoping)
    rep = verify_table(spark, dirs[1], buckets=[vbucket])
    assert not rep["ok"] and rep["corrupt"][0]["bucket"] == vbucket
    others = [b for b in range(4) if b != vbucket]
    assert verify_table(spark, dirs[1], buckets=others)["ok"]

    # repair re-encodes exactly the victim; the table heals byte-identical
    res = repair_buckets(spark, srcs[1], cfgs[1], [vbucket])
    assert res.encoded_buckets == 1 and res.resumed_buckets == 3
    healed = verify_table(spark, dirs[1])
    assert healed["ok"], healed
    after = {int(r["bucket"]): r["content_sha"]
             for r in _read_parquet_rows(f"{dirs[1]}/lineage")}
    assert after == before

    # wrong-config guard: a different snapshot_id must refuse, not wipe
    with pytest.raises(ValueError, match="snapshot_id"):
        repair_buckets(spark, srcs[1],
                       EncodeConfig(out_dir=dirs[1], buckets=4, block_size=128,
                                    snapshot_id="other"), [vbucket])

    # the other two batch dirs were untouched throughout
    assert verify_table(spark, dirs[0])["ok"]
    assert verify_table(spark, dirs[2])["ok"]


def test_xxh64_matches_spark(spark):
    """The pure-Python xxhash64 must equal F.xxhash64 bit-for-bit across
    every type in HASHABLE_KEY_TYPES and every bytes tail length — it is
    what lets the driver name a point lookup's bucket file without a job."""
    import datetime
    import random
    import string as _string

    from parquet_main_spark.functions.xxh64 import spark_xxhash64

    rng = random.Random(0xBEEF)
    strs = ["", "a", "é☃"] + ["".join(rng.choices(_string.ascii_letters, k=k))
                              for k in range(1, 41)]
    df = spark.createDataFrame([(s,) for s in strs], "v string")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "string") == r["h"]

    longs = [0, 1, -1, 2**62, -(2**62)] + [rng.randint(-2**63, 2**63 - 1)
                                           for _ in range(10)]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "int64") == r["h"]

    ints = [0, -1, 2**30, -(2**30)] + [rng.randint(-2**31, 2**31 - 1)
                                       for _ in range(10)]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "int32") == r["h"]

    # int8/int16 are in HASHABLE_KEY_TYPES (they gate driver-side bucket
    # pruning): prove Spark hashes byte/short through the same 32-bit mix
    # the port assumes (ADVICE r6)
    tins = [0, 1, -1, 127, -128] + [rng.randint(-128, 127) for _ in range(8)]
    df = spark.createDataFrame([(v,) for v in tins], "v tinyint")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "int8") == r["h"]

    smalls = [0, 1, -1, 32767, -32768] + [rng.randint(-2**15, 2**15 - 1)
                                          for _ in range(8)]
    df = spark.createDataFrame([(v,) for v in smalls], "v smallint")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "int16") == r["h"]

    bins = [b"", b"\x00", b"abc", bytes(rng.getrandbits(8) for _ in range(37))]
    df = spark.createDataFrame([(v,) for v in bins], "v binary")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(bytes(r["v"]), "binary") == r["h"]

    df = spark.createDataFrame(
        [(datetime.date(2024, 5, 17),), (datetime.date(1970, 1, 1),)], "v date")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "date32") == r["h"]

    df = spark.createDataFrame([(True,), (False,)], "v boolean")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(r["v"], "bool") == r["h"]


def test_point_lookup_bucket_pruning(spark, encoded):
    """Equality/isin on the bucket key restricts the scan's FILE list via
    the bucket hash — a point lookup opens one bucket file, not all of them
    (the hash-scattered key makes per-file zone maps useless for this)."""
    from parquet_main_spark.operators.decode import (
        And, Not, Or, _bucket_candidates, _list_block_files,
        _prune_files_by_bucket, pruning_report, read_meta, scan,
    )

    out, df, _ = encoded
    meta = read_meta(spark, out)
    urls = [r["url"] for r in df.select("url").distinct().limit(3).collect()]
    files = _list_block_files(out, spark)
    assert len(files) == BUCKETS

    # single equality -> exactly one candidate bucket, one file
    cand = _bucket_candidates(Predicate("url", "=", urls[0]), meta)
    assert cand is not None and len(cand) == 1
    assert len(_prune_files_by_bucket(files, cand)) == 1
    rep = pruning_report(spark, out, Predicate("url", "=", urls[0]))
    assert rep["total_files"] == BUCKETS and rep["kept_files"] == 1

    # the pruned scan still finds every matching row (hash must equal
    # encode's assignment exactly, or the row's bucket would be pruned)
    for u in urls:
        got = scan(spark, out, predicate=Predicate("url", "=", u)).collect()
        assert [r["url"] for r in got] == [u]

    # isin unions candidates; And intersects with unrestricted children;
    # Or of key equalities unions; Not restricts nothing
    cand = _bucket_candidates(Predicate("url", "isin", urls), meta)
    assert cand is not None and 1 <= len(cand) <= len(urls)
    got = scan(spark, out, predicate=Predicate("url", "isin", urls)).collect()
    assert sorted(r["url"] for r in got) == sorted(urls)
    a = _bucket_candidates(
        And([Predicate("url", "=", urls[0]), Predicate("lang", "=", "en")]), meta)
    assert a == _bucket_candidates(Predicate("url", "=", urls[0]), meta)
    o = _bucket_candidates(
        Or([Predicate("url", "=", urls[0]), Predicate("url", "=", urls[1])]), meta)
    assert o is not None and len(o) <= 2
    assert _bucket_candidates(Not(Predicate("url", "=", urls[0])), meta) is None
    assert _bucket_candidates(Predicate("lang", "=", "en"), meta) is None
    assert _bucket_candidates(Predicate("url", ">", urls[0]), meta) is None

    # non-hashable literal for the key type: conservatively unrestricted
    assert _bucket_candidates(Predicate("url", "=", 7), meta) is None


def test_point_lookup_salted_table(spark, tmp_path):
    """On a salted table the lookup expands to every salt variant of the
    encode expression: <= salt files open, and the row is still found."""
    from parquet_main_spark.operators.decode import (
        Predicate, _bucket_candidates, _list_block_files,
        _prune_files_by_bucket, read_meta, scan,
    )

    df = webpages(spark, 400, partitions=2)
    out = str(tmp_path / "salted")
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=8, block_size=128,
                                         snapshot_id="s", salt=4, salt_col="text"))
    meta = read_meta(spark, out)
    urls = [r["url"] for r in df.select("url").distinct().limit(3).collect()]
    files = _list_block_files(out, spark)
    cand = _bucket_candidates(Predicate("url", "=", urls[0]), meta)
    assert cand is not None and 1 <= len(cand) <= 4
    assert len(_prune_files_by_bucket(files, cand)) <= 4 < len(files)
    for u in urls:
        got = scan(spark, out, predicate=Predicate("url", "=", u)).collect()
        assert [r["url"] for r in got] == [u]


def test_point_lookup_datasource_partitions(spark, encoded):
    """The Python data source planner prunes its partition list the same
    way from a pushed EqualTo on the bucket key (no JVM in that planner —
    this is exactly why the hash is pure Python)."""
    from pyspark.sql.datasource import EqualTo

    from parquet_main_spark.sources.datasource import EncodedTableReader, register

    register(spark)
    out, df, _ = encoded
    url = df.select("url").head()["url"]
    r = EncodedTableReader(out)
    leftover = list(r.pushFilters([EqualTo(("url",), url)]))
    assert leftover == []
    parts = r.partitions()
    paths = {p for part in parts for (p, _lo, _hi) in (part.value or ())}
    assert len(paths) == 1
    # and the full DS read through Spark still returns the row
    got = (spark.read.format("pms_encoded").load(out)
           .filter(F.col("url") == url).collect())
    assert [x["url"] for x in got] == [url]


def test_verify_table_bdict_column_and_mixed_lineage(spark, tmp_path):
    """A table with per-bucket dictionary columns (block_id=-1 rows) must
    verify clean: the recomputed bucket content_sha includes dict rows
    exactly as _lineage_row (encode.py) does — before the round-6 fix every
    bdict table landed wholesale in unlinked_buckets. Also: verification
    reads lineage per-file (pyarrow), so a legacy int32-bucket lineage file
    next to int64 ones doesn't break it the way a whole-dir Spark read does."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_main_spark.operators.verify import verify_table

    df = webpages(spark, 600, partitions=2)
    out = str(tmp_path / "verify_bdict")
    # global dictionaries disabled: the selector's "dict" plan lands on the
    # per-bucket (block_id=-1) dictionary form for mid-cardinality columns
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=3, block_size=128,
                                         snapshot_id="vb", global_dict_max_card=0))
    blocks = spark.read.parquet(f"{out}/blocks")
    assert blocks.filter("block_id = -1").count() > 0  # bdict rows present
    rep = verify_table(spark, out)
    assert rep["ok"], rep

    # legacy-width lineage file alongside (pre-round-5 engines wrote int32
    # bucket ids): per-file read tolerates it; the bogus sha for an existing
    # bucket is just an extra candidate, not a mismatch
    pq.write_table(pa.table({
        "bucket": pa.array([0], pa.int32()),
        "status": pa.array(["done"], pa.string()),
        "content_sha": pa.array(["bogus"], pa.string()),
    }), f"{out}/lineage/part-legacy.parquet")
    assert glob.glob(f"{out}/lineage/*.parquet")
    rep = verify_table(spark, out)
    assert rep["ok"], rep


def test_bucket_stats_fold_conservative():
    """_bucket_stats_json: min-of-mins / max-of-maxes, None poisoning from
    unknown block bounds, all-null blocks contribute counts but no bounds."""
    import json

    import pyarrow as pa

    from parquet_main_spark.operators.encode import _bucket_stats_json

    tbl = pa.table({
        "block_id": pa.array([-1, 0, 0, 1, 1, 2], pa.int32()),
        "col": ["a", "a", "b", "a", "b", "b"],
        "n": pa.array([3, 10, 10, 10, 10, 10], pa.int64()),
        "null_count": pa.array([0, 0, 2, 1, 10, 0], pa.int64()),
        "min_int": pa.array([None, 5, None, -3, None, None], pa.int64()),
        "max_int": pa.array([None, 9, None, 7, None, None], pa.int64()),
        "min_num": pa.array([None] * 6, pa.float64()),
        "max_num": pa.array([None] * 6, pa.float64()),
        "min_str": pa.array([None, None, "aa", None, None, "bb"], pa.string()),
        "max_str": pa.array([None, None, "zz", None, None, None], pa.string()),
    })
    got = json.loads(_bucket_stats_json(tbl))
    # dict row (block_id=-1) ignored entirely
    assert got["a"]["n"] == 20 and got["a"]["null_count"] == 1
    assert got["a"]["min_int"] == -3 and got["a"]["max_int"] == 9
    # col b: block 1 is ALL-null -> contributes counts only, so bounds come
    # from blocks 0 and 2; block 2's unknown max_str poisons the max
    assert got["b"]["n"] == 30 and got["b"]["null_count"] == 12
    assert got["b"]["min_str"] == "aa" and got["b"]["max_str"] is None


def test_lineage_file_pruning_time_sliced_batches(spark, tmp_path, monkeypatch):
    """VERDICT r5 #5: a streaming-style table of N batch dirs answers a
    narrow ts-range scan WITHOUT opening files of off-range batches — the
    per-bucket min/max that encode folds into lineage prunes the file list
    driver-side, before any task exists to open a footer."""
    import datetime

    from parquet_main_spark.operators import decode as dec
    from parquet_main_spark.streaming.ingest import scan_batches

    out_root = str(tmp_path / "root")
    n_batches, rows_per = 6, 150
    for i in range(n_batches):
        df = webpages(spark, rows_per, partitions=2).withColumn(
            "warc_ts", F.lit(f"2026-02-{i + 1:02d} 12:00:00").cast("timestamp"))
        encode_table(spark, df, EncodeConfig(
            out_dir=f"{out_root}/batch={i}", buckets=3, block_size=64,
            snapshot_id=f"b{i}"))

    opened: list[str] = []
    orig = dec._scan_units

    def spy(files, split_bytes):
        opened.extend(p for p, _ in files)
        return orig(files, split_bytes)

    monkeypatch.setattr(dec, "_scan_units", spy)
    lo = datetime.datetime(2026, 2, 4)
    hi = datetime.datetime(2026, 2, 5)
    got = scan_batches(spark, out_root, columns=["url", "warc_ts"],
                       predicate=[Predicate("warc_ts", ">=", lo),
                                  Predicate("warc_ts", "<", hi)])
    assert got.count() == rows_per  # exactly batch=3 (Feb 4)
    assert opened, "scan planned no files"
    assert all("batch=3/" in p for p in opened), opened
    assert len(opened) == 3  # that batch's buckets only

    # a fully out-of-range predicate schedules ZERO files
    opened.clear()
    n = scan_batches(spark, out_root, columns=["url"],
                     predicate=Predicate("warc_ts", ">=",
                                         datetime.datetime(2027, 1, 1))).count()
    assert n == 0 and opened == []


def test_lineage_pruning_tolerates_legacy_lineage(spark, tmp_path):
    """Lineage files without stats_json (pre-round-6 tables) disable the
    file-level prune for those buckets but never drop them or crash."""
    import glob

    import pyarrow.parquet as pq

    from parquet_main_spark.operators import decode as dec

    out = str(tmp_path / "t")
    df = webpages(spark, 400, partitions=2)
    encode_table(spark, df, EncodeConfig(out_dir=out, buckets=4,
                                         block_size=64, snapshot_id="v"))
    # strip stats_json from every lineage file, simulating an old writer
    for f in glob.glob(f"{out}/lineage/*.parquet"):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["stats_json"]), f)
    meta = read_meta(spark, out)
    files = dec._list_block_files(out, spark)
    expr = dec._normalize_expr(Predicate("lang", "=", "en"), meta["logical"])
    assert dec._prune_files_by_lineage(files, out, expr, meta["logical"]) == files
    got = scan(spark, out, columns=["url"],
               predicate=Predicate("lang", "=", "en"))
    assert got.count() == df.filter("lang = 'en'").count()


def test_point_lookup_not_applied_to_chunk_bucketed_tables(spark, tmp_path):
    """Regression (round 6): pms_encoded-writer tables have CHUNK-derived
    bucket ids, so hashing a bucket-key literal against them prunes the
    wrong file — 15/20 point lookups silently returned zero rows. The
    candidates fn must decline unless config says ids are really the hash."""
    from parquet_main_spark.operators.decode import (
        _bucket_candidates, read_meta,
    )
    from parquet_main_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path / "t")
    df = webpages(spark, 600, partitions=4)
    (df.write.format("pms_encoded").mode("overwrite")
       .option("bucket_rows", 100).option("block_size", 64).save(out))
    meta = read_meta(spark, out)
    assert meta["config"]["writer"] == "datasource"
    assert _bucket_candidates(Predicate("url", "=", "x"), meta) is None
    urls = [r["url"] for r in df.select("url").limit(10).collect()]
    for u in urls:
        got = scan(spark, out, columns=["url"],
                   predicate=Predicate("url", "=", u)).collect()
        assert [r["url"] for r in got] == [u]


def test_datasource_bucketed_write_matches_encode_hash(spark, tmp_path):
    """VERDICT r5 #6 (salting half): the writer's hash-bucketed mode —
    bucket_col computed by encode.bucket_expr, repartition+sort JVM-side —
    yields a table whose ids match encode_table's assignment, so point
    lookups hash-prune to one file; a salted table expands to <= salt."""
    from parquet_main_spark.operators.decode import (
        _bucket_candidates, _list_block_files, _prune_files_by_bucket,
        read_meta,
    )
    from parquet_main_spark.operators.encode import bucket_expr
    from parquet_main_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path / "t")
    df = webpages(spark, 500, partitions=4)
    B = 8
    (df.withColumn("_b", bucket_expr("url", B))
       .repartition(B, "_b").sortWithinPartitions("_b", "url")
       .write.format("pms_encoded").mode("overwrite")
       .option("bucket_col", "_b").option("bucket_key", "url")
       .option("buckets", B).option("block_size", 64).save(out))
    meta = read_meta(spark, out)
    assert meta["config"]["hash_bucketed"] and meta["config"]["buckets"] == B
    files = _list_block_files(out, spark)
    urls = [r["url"] for r in df.select("url").limit(5).collect()]
    cand = _bucket_candidates(Predicate("url", "=", urls[0]), meta)
    assert cand is not None and len(_prune_files_by_bucket(files, cand)) == 1
    for u in urls:
        got = scan(spark, out, predicate=Predicate("url", "=", u)).collect()
        assert [r["url"] for r in got] == [u]
    got = _sorted_pdf(scan(spark, out))
    want = _sorted_pdf(df)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)

    # salted: each key expands over `salt` buckets; lookups expand the same
    out2 = str(tmp_path / "salted")
    B2, S = 8, 3
    (df.withColumn("_b", bucket_expr("lang", B2, S, "url"))
       .repartition(B2, "_b").sortWithinPartitions("_b", "url")
       .write.format("pms_encoded").mode("overwrite")
       .option("bucket_col", "_b").option("bucket_key", "lang")
       .option("buckets", B2).option("salt", S).option("salt_col", "url")
       .option("block_size", 64).save(out2))
    meta2 = read_meta(spark, out2)
    cand2 = _bucket_candidates(Predicate("lang", "=", "en"), meta2)
    assert cand2 is not None and len(cand2) <= S
    got = scan(spark, out2, columns=["url"],
               predicate=Predicate("lang", "=", "en"))
    assert got.count() == df.filter("lang = 'en'").count()

    # a bucket_col NOT built by bucket_expr fails the task-side spot-check
    with pytest.raises(Exception, match="bucket_expr"):
        (df.withColumn("_b", (F.length("url") % B).cast("int"))
           .repartition(B, "_b").sortWithinPartitions("_b")
           .write.format("pms_encoded").mode("overwrite")
           .option("bucket_col", "_b").option("bucket_key", "url")
           .option("buckets", B).save(str(tmp_path / "bad")))


def test_datasource_resume_replay_and_orphan_sweep(spark, tmp_path):
    """VERDICT r5 #6 (resume half): resume=true makes a replayed write a
    no-op (no duplicate buckets) and sweeps bucket files a killed run left
    without lineage, so phantom rows disappear instead of shifting ids."""
    import glob
    import os
    import shutil

    from parquet_main_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path / "t")
    df = webpages(spark, 400, partitions=4)
    w = (df.write.format("pms_encoded")
         .option("bucket_rows", 100).option("block_size", 64)
         .option("snapshot_id", "s1").option("resume", "true"))
    w.mode("append").save(out)
    assert scan(spark, out).count() == 400
    w.mode("append").save(out)  # at-least-once replay
    assert scan(spark, out).count() == 400
    # killed-run leftovers: a bucket dir with no lineage row
    src = glob.glob(f"{out}/blocks/bucket=*")[0]
    shutil.copytree(src, f"{out}/blocks/bucket=990001")
    assert scan(spark, out).count() > 400  # phantom rows (the hazard)
    w.mode("append").save(out)
    assert scan(spark, out).count() == 400
    assert not os.path.isdir(f"{out}/blocks/bucket=990001")


def test_datasource_bucketed_append_guards(spark, tmp_path):
    """Bucketed appends must keep the exact bucketing config, and a
    non-resume re-write of the same keys fails loudly at commit instead of
    silently rewriting history."""
    from parquet_main_spark.operators.encode import bucket_expr
    from parquet_main_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path / "t")
    df = webpages(spark, 300, partitions=2)
    B = 4

    def bucketed_write(data, mode, **opts):
        wr = (data.withColumn("_b", bucket_expr("url", B))
              .repartition(B, "_b").sortWithinPartitions("_b", "url")
              .write.format("pms_encoded").mode(mode)
              .option("bucket_col", "_b").option("bucket_key", "url")
              .option("buckets", B).option("block_size", 64))
        for k, v in opts.items():
            wr = wr.option(k, v)
        wr.save(out)

    bucketed_write(df, "overwrite", snapshot_id="s1")
    # config mismatch (different buckets) refused
    with pytest.raises(Exception, match="bucketing mismatch"):
        (df.withColumn("_b", bucket_expr("url", 2))
           .repartition(2, "_b").sortWithinPartitions("_b", "url")
           .write.format("pms_encoded").mode("append")
           .option("bucket_col", "_b").option("bucket_key", "url")
           .option("buckets", 2).save(out))
    # chunked append onto a hash-bucketed table refused
    with pytest.raises(Exception, match="bucketing mismatch"):
        df.write.format("pms_encoded").mode("append").save(out)
    # re-append without resume = silent history rewrite -> refused UP FRONT
    # (before any task could clobber a committed bucket file)
    with pytest.raises(Exception, match="resume=true"):
        bucketed_write(df, "append", snapshot_id="s2")
    assert scan(spark, out).count() == 300  # table untouched
    # resume under a NEW snapshot still cannot rewrite another snapshot's
    # buckets — tasks refuse before touching the file
    with pytest.raises(Exception, match="rewrite history"):
        bucketed_write(df, "append", snapshot_id="s2", resume="true")
    assert scan(spark, out).count() == 300
    # but an idempotent replay with resume=true is a clean no-op
    bucketed_write(df, "append", snapshot_id="s1", resume="true")
    assert scan(spark, out).count() == 300


def test_overlapped_stats_encode_byte_identical(spark, tmp_path):
    """overlap_stats=True submits the encode job before the plan exists
    (reduce tasks wait for meta; the map stage overlaps the stats job) —
    the output must be byte-identical to the sequential submission."""
    df = webpages(spark, 600, partitions=8)

    def lineage_of(out, flag):
        cfg = EncodeConfig(out_dir=out, buckets=8, block_size=64,
                           snapshot_id="ov", overlap_stats=flag)
        res = encode_table(spark, df, cfg)
        rows = (spark.read.parquet(f"{out}/lineage")
                .select("bucket", "enc_bytes", "content_sha")
                .orderBy("bucket").collect())
        return res.plan, [(r["bucket"], r["enc_bytes"], r["content_sha"])
                          for r in rows]

    plan_s, seq = lineage_of(str(tmp_path / "seq"), False)
    plan_o, ovl = lineage_of(str(tmp_path / "ovl"), True)
    assert plan_s == plan_o
    assert seq == ovl
    got = _sorted_pdf(scan(spark, str(tmp_path / "ovl")))
    want = _sorted_pdf(df)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)


def test_overlapped_stats_failure_cancels_encode(spark, tmp_path, monkeypatch):
    """If the stats pass dies, the overlapped encode job must be cancelled
    (not left polling for a meta file that will never appear) and no
    partial table may remain."""
    import os

    import parquet_main_spark.operators.encode as enc

    def boom(df, cfg):
        raise RuntimeError("stats pass died")

    monkeypatch.setattr(enc, "sample_plan", boom)
    out = str(tmp_path / "t")
    df = webpages(spark, 200, partitions=4)
    with pytest.raises(RuntimeError, match="stats pass died"):
        encode_table(spark, df, EncodeConfig(
            out_dir=out, buckets=4, block_size=64, snapshot_id="s",
            overlap_stats=True))
    # no meta for this snapshot => no bucket file can have been written
    assert not os.path.isdir(f"{out}/meta")
    blocks = f"{out}/blocks"
    assert not os.path.isdir(blocks) or not any(
        name.startswith("bucket=") for name in os.listdir(blocks))


def test_bucketed_write_null_keys_and_type_gate(spark, tmp_path):
    """Code-review r6: a NULL bucket-key row (legal — bucket_expr hashes
    NULL as the seed) must not crash the task-side spot-check even when the
    sort puts it FIRST in its bucket, and an out-of-matrix bucket_key type
    fails at plan time with the crafted error, not per-task."""
    from parquet_main_spark.operators.encode import bucket_expr
    from parquet_main_spark.sources.datasource import register

    register(spark)
    B = 4
    df = webpages(spark, 120, partitions=2).select("url", "lang", "warc_ts")
    # null out a few urls: their rows hash to pmod(xxhash64(NULL)=42, B)
    df = df.withColumn(
        "url", F.when(F.col("url").endswith("0"), None)
               .otherwise(F.col("url")))
    n_null = df.filter("url is null").count()
    assert n_null > 0
    out = str(tmp_path / "nullkeys")
    (df.withColumn("_b", bucket_expr("url", B))
       .repartition(B, "_b").sortWithinPartitions("_b", "url")
       .write.format("pms_encoded").mode("overwrite")
       .option("bucket_col", "_b").option("bucket_key", "url")
       .option("buckets", B).option("block_size", 64).save(out))
    got = scan(spark, out)
    assert got.count() == 120
    assert got.filter("url is null").count() == n_null
    # a point lookup still prunes and never loses the null rows' bucket
    u = df.filter("url is not null").select("url").first()["url"]
    hit = scan(spark, out, predicate=Predicate("url", "=", u)).collect()
    assert [r["url"] for r in hit] == [u]

    # timestamp bucket_key: outside HASHABLE_KEY_TYPES -> plan-time error
    with pytest.raises(Exception, match="hash-bucketed writes support"):
        (df.withColumn("_b", bucket_expr("warc_ts", B))
           .repartition(B, "_b").sortWithinPartitions("_b")
           .write.format("pms_encoded").mode("overwrite")
           .option("bucket_col", "_b").option("bucket_key", "warc_ts")
           .option("buckets", B).save(str(tmp_path / "bad_ts")))


def test_lineage_cache_invalidates_on_table_change(spark, tmp_path):
    """Code-review r6: the driver-side lineage cache must never serve
    stale rows — an append (new content-derived lineage file) or a repair
    (atomic in-place replace, new mtime) changes the dir fingerprint."""
    from parquet_main_spark.operators.decode import _lineage_rows
    from parquet_main_spark.operators.encode import (
        EncodeConfig, encode_table,
    )

    out = str(tmp_path / "t")
    df = webpages(spark, 200, partitions=2)
    cfg = EncodeConfig(out_dir=out, buckets=4, block_size=64,
                       snapshot_id="s1")
    encode_table(spark, df.filter("length(url) % 2 = 0"), cfg)
    first = _lineage_rows(out)
    assert _lineage_rows(out) is first  # cache hit on unchanged dir
    # append more rows under a new snapshot: lineage dir gains a file
    encode_table(spark, df, EncodeConfig(
        out_dir=out, buckets=4, block_size=64, snapshot_id="s2"))
    second = _lineage_rows(out)
    assert second is not first and len(second) >= len(first)


def test_lookup_driver_fast_path(spark, encoded):
    """lookup(): selective predicates decode driver-side with NO Spark job
    (monkeypatched scan proves the fast path never schedules one); results
    match the distributed scan exactly; the fallback kicks in when the
    pruned list exceeds the bounds and returns the same rows."""
    import pyarrow as pa

    from parquet_main_spark.operators import decode as dec

    out, df, _res = encoded
    url = df.select("url").first()["url"]
    pred = dec.Predicate("url", "=", url)
    want = scan(spark, out, predicate=pred).toPandas().sort_index(axis=1)

    real_scan = dec.scan
    def boom(*a, **kw):
        raise AssertionError("fast path must not schedule a scan job")
    dec.scan = boom
    try:
        got = dec.lookup(spark, out, pred)
    finally:
        dec.scan = real_scan
    assert isinstance(got, pa.Table)
    gp = got.to_pandas().sort_index(axis=1)
    pd.testing.assert_frame_equal(
        gp.sort_values("url").reset_index(drop=True),
        want.sort_values("url").reset_index(drop=True), check_dtype=False)

    # no matching bucket at all -> empty table, right schema, still no job
    dec.scan = boom
    try:
        empty = dec.lookup(spark, out, dec.Predicate("url", "=", "absent!"))
    finally:
        dec.scan = real_scan
    assert empty.num_rows == 0
    assert set(empty.schema.names) == set(df.columns)

    # forced fallback (max_files=0) routes through the distributed scan
    wide = dec.lookup(spark, out, pred, max_files=0)
    pd.testing.assert_frame_equal(
        wide.to_pandas().sort_index(axis=1).sort_values("url")
            .reset_index(drop=True),
        want.sort_values("url").reset_index(drop=True), check_dtype=False)

    # a broad range predicate (no bucket candidates) with small bounds may
    # still run driver-side — rows must equal the scan's
    rpred = dec.Predicate("warc_ts", "notnull", None)
    a = dec.lookup(spark, out, rpred).num_rows
    assert a == scan(spark, out, predicate=rpred).count()


def test_lookup_many_batch_dirs(spark, tmp_path):
    """lookup() over a LIST of batch dirs (streaming layout): per-dir
    pruning, one concatenated driver-side result equal to scan_many; the
    broad fallback routes through ONE scan_many job."""
    from parquet_main_spark.operators.decode import (
        Predicate, lookup, scan_many,
    )
    from parquet_main_spark.operators.encode import (
        EncodeConfig, encode_table,
    )

    df = webpages(spark, 400, partitions=4)
    dirs = []
    for i, cond in enumerate(("length(url) % 2 = 0", "length(url) % 2 = 1")):
        d = str(tmp_path / f"batch={i}")
        encode_table(spark, df.filter(cond), EncodeConfig(
            out_dir=d, buckets=4, block_size=64, snapshot_id=f"b{i}"))
        dirs.append(d)
    u = df.select("url").first()["url"]
    t = lookup(spark, dirs, Predicate("url", "=", u))
    assert t.num_rows == 1 and t.column("url").to_pylist() == [u]
    # broad predicate exceeding max_files -> scan_many fallback, same rows
    broad = lookup(spark, dirs, Predicate("url", "notnull", None), max_files=1)
    assert broad.num_rows == 400
    assert (sorted(broad.column("url").to_pylist())
            == sorted(r["url"] for r in
                      scan_many(spark, dirs, columns=["url"]).collect()))
