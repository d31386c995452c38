#!/usr/bin/env python3
"""spark-submit entry point for the scan/export job (encode_job's inverse).

Usage (cluster)::

    zip -r pms.zip parquet_main_spark
    spark-submit --py-files pms.zip jobs/scan_job.py \
        --input /data/encoded --output /data/decoded.parquet \
        --columns url,lang --predicate 'lang=en'

Predicates: ``col=value`` / ``col>=value`` / ``col<=value`` / ``col<value``
/ ``col>value`` (value auto-typed from the encoded schema: int/float/
timestamp-micros/string); repeat --predicate for a conjunction. Omitting
--output prints the row count (count-only converter sink, the
NonePrimitiveConverter analog).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_PRED_RE = re.compile(r"^(\w+)\s*(<=|>=|=|<|>)\s*(.*)$")


def _parse_pred(expr: str, logical: dict[str, str]):
    from parquet_main_spark.functions.arrow import codec_type
    from parquet_main_spark.operators.decode import Predicate

    m = _PRED_RE.match(expr)
    if not m:
        raise SystemExit(f"bad --predicate {expr!r} (want col<op>value)")
    col, op, raw = m.group(1), m.group(2), m.group(3)
    if col not in logical:
        raise SystemExit(f"unknown column {col!r}; have {sorted(logical)}")
    ct = codec_type(logical[col])
    if ct in ("int8", "int16", "int32", "int64", "timestamp", "timestamp_ntz", "date32"):
        value = int(raw)
    elif ct in ("float32", "float64"):
        value = float(raw)
    elif ct == "bool":
        value = raw.lower() in ("1", "true", "t")
    elif ct == "binary":
        value = raw.encode()
    else:
        value = raw
    return Predicate(col, op, value)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="encoded out_dir")
    ap.add_argument("--output", default=None, help="parquet output path (omit for count-only)")
    ap.add_argument("--columns", default=None, help="comma-separated projection")
    ap.add_argument("--predicate", action="append", default=[],
                    help="col<op>value conjunct (repeatable)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from parquet_main_spark.operators.decode import scan
    from parquet_main_spark.operators.encode import read_meta

    spark = SparkSession.builder.appName("pms-scan").getOrCreate()
    meta = read_meta(spark, args.input)
    preds = [_parse_pred(e, meta["logical"]) for e in args.predicate]
    columns = args.columns.split(",") if args.columns else None

    t0 = time.perf_counter()
    df = scan(spark, args.input, columns=columns, predicate=preds or None)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = df.count()
    print(json.dumps({
        "wall_sec": round(time.perf_counter() - t0, 2),
        "rows": n,
        "columns": columns or list(meta["logical"]),
        "predicates": args.predicate,
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
