"""Python Data Source: transparent ``spark.read`` of engine-encoded tables.

The reference's encoded files are readable by any stock parquet reader
(ParquetFileReader.java:703-776); this gives our block format the same
one-import ergonomics on the Spark side:

    from parquet_main_spark.sources.datasource import register
    register(spark)
    df = spark.read.format("pms_encoded").load(out_dir)

Catalyst integration: supported filters are CONSUMED by ``pushFilters``
(Spark 4.1 Python Data Source filter pushdown) and become engine
:class:`~parquet_main_spark.operators.decode.Predicate` objects, so the
zone-map prune + in-situ dictionary translation run inside each partition
read exactly as they do in ``scan()`` — a ``.filter("lang = 'en'")`` on the
DataFrame prunes encoded blocks before their blobs are fetched. One input
partition per bucket file (same parallelism story as ``scan()``).

``scan()`` remains the power path (column pruning, compound predicates with
explicit control); this wrapper trades that for stock ``spark.read``
ergonomics — column pruning happens in Spark after decode.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)

FORMAT_NAME = "pms_encoded"


def _read_meta_local(out_dir: str) -> dict:
    """Meta table via pyarrow (planning runs on the driver without needing a
    SparkSession; the meta dir is a single tiny parquet file)."""
    import glob

    import pyarrow.parquet as pq

    from ..operators.encode import _local_path

    files = sorted(glob.glob(f"{_local_path(out_dir)}/meta/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no meta table under {out_dir}/meta")
    row = pq.read_table(files).to_pylist()[0]
    return {
        "snapshot_id": row["snapshot_id"],
        "logical": json.loads(row["logical_json"]),
        "plan": json.loads(row["plan_json"]),
        "config": json.loads(row["config_json"]),
        "gdicts": json.loads(row.get("gdict_json") or "{}"),
    }


def _filter_to_predicate(f: Filter, logical: dict[str, str]):
    """Map a Catalyst filter to an engine Predicate (None = unsupported,
    Spark keeps evaluating it post-scan)."""
    from ..operators.decode import Predicate

    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
        In: "isin",
        IsNull: "isnull",
        IsNotNull: "notnull",
    }
    op = ops.get(type(f))
    if op is None:
        return None
    attr = f.attribute
    col = attr[0] if isinstance(attr, (tuple, list)) else str(attr)
    if isinstance(attr, (tuple, list)) and len(attr) != 1:
        return None  # nested paths don't exist in our flat schema
    lt = logical.get(col)
    if lt is None:
        return None

    def conv(v):
        if lt.startswith("decimal64("):
            import decimal

            from ..functions.arrow import decimal_params

            _, s = decimal_params(lt)
            return int(decimal.Decimal(v).scaleb(s))
        if lt in ("timestamp", "timestamp_ntz"):
            import datetime

            if isinstance(v, datetime.datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=datetime.timezone.utc)
                return int(v.timestamp() * 1_000_000)
            return int(v)
        if lt == "date32":
            import datetime

            if isinstance(v, datetime.date):
                return (v - datetime.date(1970, 1, 1)).days
            return int(v)
        if lt == "binary" and isinstance(v, (bytearray, memoryview)):
            return bytes(v)
        return v

    if op in ("isnull", "notnull"):
        return Predicate(col, op, None)
    if op == "isin":
        return Predicate(col, "isin", [conv(v) for v in f.value])
    return Predicate(col, op, conv(f.value))


class EncodedTableReader(DataSourceReader):
    def __init__(self, out_dir: str):
        from ..operators.encode import gdicts_from_json

        self.out_dir = out_dir
        meta = _read_meta_local(out_dir)
        self.logical: dict[str, str] = meta["logical"]
        self.gdicts = gdicts_from_json(meta.get("gdicts", {}), self.logical)
        self.preds: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            p = _filter_to_predicate(f, self.logical)
            if p is None:
                yield f  # Spark evaluates it after the scan
            else:
                # fully consumed: the decode applies an exact row mask, not
                # just block pruning, so Spark need not re-evaluate
                self.preds.append(p)

    def partitions(self) -> list[InputPartition]:
        from ..operators.decode import _list_block_files

        files = _list_block_files(self.out_dir)
        return [InputPartition(p) for p in files] or [InputPartition(None)]

    def read(self, partition: InputPartition):
        from ..operators.decode import _decode_file

        if partition.value is None:
            return
        yield from _decode_file(
            partition.value, self.logical, list(self.logical), self.preds, self.gdicts
        )


class EncodedTableDataSource(DataSource):
    """``spark.read.format("pms_encoded").load(out_dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        from ..functions.arrow import spark_type

        meta = _read_meta_local(self.options["path"])
        return ", ".join(
            f"`{c}` {spark_type(lt)}" for c, lt in meta["logical"].items()
        )

    def reader(self, schema) -> EncodedTableReader:
        return EncodedTableReader(self.options["path"])


def register(spark) -> None:
    # Python-data-source filter pushdown is off by default in Spark 4.1;
    # without it a reader implementing pushFilters is rejected at planning
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EncodedTableDataSource)
