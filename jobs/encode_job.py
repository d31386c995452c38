#!/usr/bin/env python3
"""spark-submit entry point for the encode job (north rule packaging).

Usage (cluster)::

    zip -r pms.zip parquet_main_spark
    spark-submit --py-files pms.zip jobs/encode_job.py \
        --input /data/webpages --output /data/encoded \
        --bucket-key url --buckets 65536 --block-size 65536 \
        --snapshot-id snap-2026-08-16

The session comes from spark-submit's conf (master/executors set there);
re-running with the same --output/--snapshot-id RESUMES: completed buckets
are skipped via the lineage checkpoint table (SURVEY.md §7 step 7).
Reads Iceberg tables when the runtime has the Iceberg catalog configured
(``--input-format iceberg``), plain parquet otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--bucket-key", default="url")
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--block-size", type=int, default=65536)
    ap.add_argument("--snapshot-id", default="snap-0")
    ap.add_argument("--order-by", default=None, help="comma-separated sort keys within bucket")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from parquet_main_spark.operators.encode import EncodeConfig, encode_table

    spark = SparkSession.builder.appName("pms-encode").getOrCreate()
    if args.input_format == "iceberg":
        df = spark.read.format("iceberg").load(args.input)
    else:
        df = spark.read.parquet(args.input)

    cfg = EncodeConfig(
        out_dir=args.output,
        bucket_key=args.bucket_key,
        buckets=args.buckets,
        block_size=args.block_size,
        snapshot_id=args.snapshot_id,
        order_by=args.order_by.split(",") if args.order_by else None,
    )
    t0 = time.perf_counter()
    res = encode_table(spark, df, cfg)
    print(json.dumps({
        "wall_sec": round(time.perf_counter() - t0, 2),
        "plan": res.plan,
        "encoded_buckets": res.encoded_buckets,
        "resumed_buckets": res.resumed_buckets,
        "blocks_path": res.blocks_path,
        "lineage_path": res.lineage_path,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
