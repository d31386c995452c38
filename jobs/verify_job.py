#!/usr/bin/env python3
"""spark-submit entry point for the table-integrity check.

Usage (cluster)::

    zip -r pms.zip parquet_main_spark
    spark-submit --py-files pms.zip jobs/verify_job.py --input /data/encoded

Re-decodes every (block, column) cell in parallel (one task per bucket
file), recomputes the canonical digests against those stored at encode
time and against lineage, and prints one JSON report line. Exit code 1
when the table fails verification — pipeline-friendly (run it after a
large encode, or on a schedule as bit-rot patrol).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="encoded table dir")
    ap.add_argument("--cores", default="*", help="local[N] cores (default *)")
    ap.add_argument("--buckets", default=None,
                    help="comma-separated bucket ids to verify (scoped patrol)")
    ap.add_argument("--snapshots", default=None,
                    help="comma-separated snapshot ids whose buckets to verify")
    ap.add_argument("--sample", type=float, default=None,
                    help="deterministic fraction (0,1] of buckets to verify")
    args = ap.parse_args()

    from parquet_main_spark.operators.verify import verify_table
    from parquet_main_spark.session import get_spark

    spark = get_spark(args.cores, "pms-verify")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()
    rep = verify_table(
        spark, args.input,
        buckets=([int(b) for b in args.buckets.split(",")]
                 if args.buckets else None),
        snapshots=args.snapshots.split(",") if args.snapshots else None,
        sample=args.sample,
    )
    rep["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
