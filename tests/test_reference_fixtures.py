"""Bit-identity + compressed-size gates vs pre-generated reference fixtures
(FIXTURES.md invariants 1-2; BASELINE.md decode-correctness and
compressed-size rows).

The fixture records (a) per-column SHA-256 of the source columns in
canonical url order — since parquet round-trips are lossless these ARE the
reference round-trip digests — and (b) the reference-equivalent parquet
encoding sizes (dictionary on, UNCOMPRESSED — the reference's writer
config). The engine's decode must reproduce the digests exactly, and its
per-column encoded bytes must not exceed the reference tallies.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from parquet_main_spark.functions.arrow import arrow_to_dense, canonical_sha
from parquet_main_spark.operators.decode import scan
from parquet_main_spark.operators.encode import EncodeConfig, encode_table
from parquet_main_spark.sources.webpages import webpages

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
ROWS_LIST = [1000] + ([100_000] if os.environ.get("PMS_FULL_FIXTURES") else [])


@pytest.mark.parametrize("rows", ROWS_LIST)
def test_engine_matches_reference_fixture(spark, tmp_path, rows):
    with open(os.path.join(FIXDIR, f"digests_{rows}.json")) as f:
        fx = json.load(f)
    df = webpages(spark, rows, partitions=8)
    out = str(tmp_path / f"fx{rows}")
    # tiny inputs use few buckets: the reference writes ONE dictionary per
    # column chunk (single file, single thread), so at 1000 rows per-bucket
    # dictionary duplication would dominate; at real scale it is noise.
    buckets = 2 if rows <= 1000 else 8
    cfg = EncodeConfig(out_dir=out, buckets=buckets, block_size=4096, snapshot_id="fx")
    encode_table(spark, df, cfg)

    # 1. decode bit-identity: digests in canonical url order
    import pyarrow as pa

    tbl = scan(spark, out).toArrow()
    tbl = tbl.take(pa.compute.sort_indices(tbl.column("url")))
    logical = {"url": "string", "warc_ts": "timestamp", "html": "binary",
               "text": "string", "lang": "string"}
    for col, lt in logical.items():
        vals, mask = arrow_to_dense(tbl.column(col), lt)
        assert canonical_sha(vals, mask, lt) == fx["digests"][col], f"digest mismatch: {col}"

    # 2. compressed size <= reference-equivalent encoding, per column
    enc = {
        r["col"]: r["enc"]
        for r in spark.read.parquet(f"{out}/blocks")
        .groupBy("col").agg(F.sum("enc_bytes").alias("enc")).collect()
    }
    for col, ref in fx["reference_compressed_bytes"].items():
        assert enc[col] <= ref, f"{col}: ours {enc[col]} > reference {ref}"
