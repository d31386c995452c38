"""Incremental ingestion: Structured Streaming micro-batches -> per-batch
encoded directories, exactly-once via encode_table's lineage resume, union
scan with predicate pushdown across batches."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from parquet_main_spark.operators.decode import Predicate
from parquet_main_spark.operators.encode import EncodeConfig
from parquet_main_spark.sources.webpages import webpages
from parquet_main_spark.streaming.ingest import encode_stream, list_batches, scan_batches


def _sorted(df):
    return df.toPandas().sort_values("url").reset_index(drop=True)


def test_streaming_ingest_two_waves(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out_root = str(tmp_path / "enc_root")
    ckpt = str(tmp_path / "ckpt")

    full = webpages(spark, 1200, partitions=4)
    wave1 = full.filter(F.col("url") < "https://host5")
    wave2 = full.filter(F.col("url") >= "https://host5")
    wave1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(full.schema).parquet(src)
    cfg = EncodeConfig(out_dir="ignored", buckets=4, block_size=128, snapshot_id="s")
    encode_stream(spark, stream, out_root, cfg, ckpt)
    first_batches = list_batches(out_root)
    assert first_batches, "first wave produced no batch dirs"
    assert scan_batches(spark, out_root, columns=["url"]).count() == wave1.count()

    # second wave of files -> new micro-batch(es), old ones untouched
    wave2.write.mode("append").parquet(src)
    encode_stream(spark, stream, out_root, cfg, ckpt)
    assert len(list_batches(out_root)) > len(first_batches)

    got = _sorted(scan_batches(spark, out_root, columns=["url", "lang", "text"]))
    want = _sorted(full.select("url", "lang", "text"))
    pd.testing.assert_frame_equal(got, want)

    # pushdown works per batch dir
    n = scan_batches(spark, out_root, columns=["url"],
                     predicate=Predicate("lang", "isin", ["de", "fr"])).count()
    assert n == full.filter("lang in ('de','fr')").count() > 0

    # draining again with NO new input is a no-op (exactly-once)
    encode_stream(spark, stream, out_root, cfg, ckpt)
    assert scan_batches(spark, out_root, columns=["url"]).count() == 1200


def test_scan_many_plans_one_job(spark, tmp_path):
    """scan_batches over many batch dirs builds ONE mapInArrow stage (a
    single task list), not a union tree of per-dir scans."""
    from parquet_main_spark.operators.encode import encode_table
    from parquet_main_spark.streaming.ingest import _batch_dir

    full = webpages(spark, 1000, partitions=4)
    out_root = str(tmp_path / "many")
    n_dirs = 12
    for b in range(n_dirs):
        part = full.filter(F.pmod(F.xxhash64("url"), F.lit(n_dirs)) == b)
        encode_table(spark, part, EncodeConfig(out_dir=_batch_dir(out_root, b),
                                               buckets=2, block_size=128,
                                               snapshot_id=f"s-b{b}",
                                               global_dict_max_card=0))
    df = scan_batches(spark, out_root, columns=["url", "lang"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan
    assert "Union" not in plan, plan
    assert df.count() == full.count()
    # predicate pushdown still applies per bucket file
    n = scan_batches(spark, out_root, columns=["url"],
                     predicate=Predicate("lang", "=", "en")).count()
    assert n == full.filter("lang = 'en'").count()


def test_compact_batches_roundtrip(spark, tmp_path):
    """Compaction merges batch dirs into one table with identical content
    (xxhash64 content digest) and is idempotent: re-running the same
    compaction resumes to a no-op via the lineage checkpoint."""
    from parquet_main_spark.operators.decode import scan
    from parquet_main_spark.operators.encode import encode_table
    from parquet_main_spark.streaming.ingest import _batch_dir, compact_batches

    full = webpages(spark, 900, partitions=4)
    out_root = str(tmp_path / "croot")
    for b in range(3):
        part = full.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == b)
        encode_table(spark, part, EncodeConfig(out_dir=_batch_dir(out_root, b),
                                               buckets=2, block_size=128,
                                               snapshot_id=f"s-b{b}",
                                               global_dict_max_card=0))
    dest = str(tmp_path / "compacted")
    cfg = EncodeConfig(out_dir="ignored", buckets=4, block_size=128,
                       snapshot_id="ignored", global_dict_max_card=0)
    res1 = compact_batches(spark, out_root, dest, cfg)
    assert res1.encoded_buckets == 4

    def digest(df):
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
        row = df.select(F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h")).agg(
            F.expr("bit_xor(h)").alias("s"), F.count("*").alias("n")).collect()[0]
        return row["s"], row["n"]

    assert digest(scan(spark, dest)) == digest(scan_batches(spark, out_root))
    # idempotent re-run: same batch set -> same snapshot id -> all resumed
    res2 = compact_batches(spark, out_root, dest, cfg)
    assert res2.encoded_buckets == 0 and res2.resumed_buckets == 4


def test_streaming_cross_batch_dedup(spark, tmp_path):
    """dedup_keys drops rows whose key already landed in an EARLIER
    micro-batch (first occurrence wins): wave 2 re-delivers half of wave 1's
    urls plus new ones; only the new ones are encoded."""
    src = str(tmp_path / "dupsrc")
    out_root = str(tmp_path / "dup_root")
    ckpt = str(tmp_path / "dup_ckpt")

    full = webpages(spark, 800, partitions=2)
    wave1 = full.filter(F.col("url") < "https://host5")
    dupes = wave1.limit(0).unionByName(wave1.filter(F.col("url") < "https://host3"))
    wave2 = full.filter(F.col("url") >= "https://host5").unionByName(dupes)

    cfg = EncodeConfig(out_dir="ignored", buckets=2, block_size=128, snapshot_id="d")
    from parquet_main_spark.streaming.ingest import encode_stream as es

    wave1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(full.schema).parquet(src)
    es(spark, stream, out_root, cfg, ckpt, dedup_keys=["url"])
    n1 = scan_batches(spark, out_root, columns=["url"]).count()
    assert n1 == wave1.count()

    wave2.write.mode("append").parquet(src)
    es(spark, stream, out_root, cfg, ckpt, dedup_keys=["url"])
    got = scan_batches(spark, out_root, columns=["url"])
    # every url exactly once, despite the re-delivered duplicates
    assert got.count() == full.count()
    assert got.distinct().count() == full.count()
