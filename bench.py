#!/usr/bin/env python3
"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the engine's own encode job over the synthetic Common-Crawl-style
webpages table (GB/s + docs/s + compression ratio — the north-rule metric),
its decode/in-situ-scan paths, and a spread of relational + training-data
queries from the driver contract.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def ensure_webpages_parquet(spark, rows: int, partitions: int) -> str:
    """Generate (once) the deterministic synthetic input; generation is NOT
    part of the timed encode."""
    path = os.path.join(tempfile.gettempdir(), "pms_bench", f"webpages_{rows}.parquet")
    if not os.path.exists(path):
        from parquet_main_spark.sources.webpages import webpages

        webpages(spark, rows, partitions=partitions).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1

    from pyspark.sql import functions as F

    from parquet_main_spark.operators.decode import Predicate, scan
    from parquet_main_spark.operators.encode import EncodeConfig, encode_table
    from parquet_main_spark.session import get_spark

    spark = get_spark(cpus, "bench", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # -- 1. the encode job (north-rule headline) ---------------------------
    rows = max(20_000, int(1_000_000 * sf))
    src_path = ensure_webpages_parquet(spark, rows, partitions=max(cpus, 32))
    src = spark.read.parquet(src_path)
    raw_bytes = src.select(
        F.sum(
            F.octet_length("url") + F.lit(8) + F.octet_length("html")
            + F.octet_length("text") + F.octet_length("lang")
        ).alias("b")
    ).collect()[0]["b"]

    # warm-up: a small throwaway encode spins up Python workers, the Arrow
    # JVM<->Python pipe, and JIT/codegen paths. The timed number is
    # steady-state throughput — what a long-lived cluster actually sustains
    # (worker spin-up amortizes over a 100 TB job, not per 0.3 GB).
    warm = tempfile.mkdtemp(prefix="pms_bench_warm_")
    shutil.rmtree(warm, ignore_errors=True)
    encode_table(spark, src.limit(5000),
                 EncodeConfig(out_dir=warm, buckets=cpus, block_size=65536,
                              snapshot_id="warmup"))
    shutil.rmtree(warm, ignore_errors=True)

    # min of 3 timed runs: this VM shows 2-4x run-to-run wall variance (two
    # consecutive 19s draws were observed around a 12.7s quiet-window best),
    # so even min-of-2 can misreport the headline by ~1.5x
    out = tempfile.mkdtemp(prefix="pms_bench_enc_")
    t_enc = None
    for attempt in range(3):
        shutil.rmtree(out, ignore_errors=True)
        cfg = EncodeConfig(out_dir=out, buckets=max(2 * cpus, 64), block_size=65536,
                           snapshot_id=f"bench-{rows}-{attempt}")
        t0 = time.perf_counter()
        encode_table(spark, src, cfg)
        dt = time.perf_counter() - t0
        t_enc = dt if t_enc is None else min(t_enc, dt)
    queries["encode_webpages"] = round(t_enc, 3)
    lineage = spark.read.parquet(f"{out}/lineage").agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    extra["encode_gb_per_sec"] = round(raw_bytes / t_enc / 1e9, 4)
    extra["encode_docs_per_sec"] = round(rows / t_enc, 1)
    extra["compression_ratio"] = round(lineage["enc"] / lineage["raw"], 4)
    extra["input_gb"] = round(raw_bytes / 1e9, 4)

    # -- 2. decode + in-situ scan paths ------------------------------------
    t_dec = None
    for _ in range(3):
        t0 = time.perf_counter()
        n_full = scan(spark, out).count()
        dt = time.perf_counter() - t0
        t_dec = dt if t_dec is None else min(t_dec, dt)
    queries["decode_full_scan"] = round(t_dec, 3)
    assert n_full == rows, (n_full, rows)

    for qname, kw in (
        ("insitu_dict_filter", dict(columns=["url", "lang"], predicate=Predicate("lang", "=", "en"))),
        ("zonemap_url_range", dict(columns=["url"], predicate=Predicate("url", ">=", "https://host99"))),
        # physical column pruning: the html/text blob row groups are never
        # read (one block-row per row group + col stats)
        ("narrow_scan_lang", dict(columns=["lang"])),
    ):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            scan(spark, out, **kw).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[qname] = round(best, 3)

    # point lookup on the bucket key (r6): the driver-side bucket-hash file
    # prune means ONE bucket file opens; reported as an extra so the
    # headline total stays comparable with earlier rounds
    probe_url = src.select("url").head()["url"]
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        scan(spark, out, columns=["url", "lang"],
             predicate=Predicate("url", "=", probe_url)).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    extra["point_lookup_url_sec"] = round(best, 3)

    # in-situ aggregate pushdowns (r6): MIN/MAX of the timestamp column from
    # block statistics alone + DISTINCT langs from dictionary blobs alone —
    # both metadata reads, no data pages
    from parquet_main_spark.operators.aggregates import scan_distinct, scan_minmax

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        scan_minmax(spark, out, ["warc_ts", "lang"]).collect()
        scan_distinct(spark, out, "lang").count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    extra["agg_pushdown_sec"] = round(best, 3)

    # top-k pushdown (r6): ORDER BY warc_ts DESC LIMIT 20 decodes ~one
    # block per bucket file (stats-guided selection), not the table
    from parquet_main_spark.operators.aggregates import scan_topk

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        scan_topk(spark, out, "warc_ts", 20, columns=["url", "warc_ts"]).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    extra["topk_sec"] = round(best, 3)

    # -- 3. relational + training-data queries from the contract -----------
    from parquet_main_spark.queries import BENCH_ONLY, QUERIES

    QUERIES = {**QUERIES, **BENCH_ONLY}  # q_events_by_type stays benched

    for name in (
        "q01_pricing_summary",
        "q03_top_orders",
        "q05_region_revenue",
        "q_top_customers_per_segment",
        "q_events_by_type",
        "ops_dedup_exact",
        "ops_minhash_bands",
        "ops_cosine_topk",
        "ops_simhash",
    ):
        best = None
        for _ in range(3):  # min-of-3: single-query host noise reaches 4x
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    # -- 4. round-3 surfaces, reported as EXTRAS (not in the headline total,
    # which stays comparable with BENCH_r1/r2): vector-column engine scan
    # and multimodal frame sampling
    for name in ("eng_vector_scan", "ops_frame_sample"):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        extra[f"{name}_sec"] = round(best, 3)

    shutil.rmtree(out, ignore_errors=True)
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        **extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
