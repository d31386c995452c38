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
