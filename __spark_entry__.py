"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``parquet_main_spark`` (see SURVEY.md §2 for the
operator inventory this covers).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: encode the documents table with
    the engine (sampled-stats codec selection -> bucketed Arrow encode),
    then answer a group-by from the dictionary-encoded blocks."""
    from parquet_main_spark.queries import eng_lang_counts

    return eng_lang_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from parquet_main_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — EVERY registered query has one
    (round 5: ops_image_pipeline's pixels became BIGINT arithmetic so its
    decode -> resize -> brightness pipeline is SQL-recomputable exactly;
    its per-stage math is additionally numpy-oracled in
    tests/test_multimodal.py)."""
    from parquet_main_spark.queries import ORACLES

    return dict(ORACLES)
