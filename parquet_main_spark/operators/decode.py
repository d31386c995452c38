"""Scan path: block pruning, in-situ dictionary predicates, vectorized decode.

The read side of the engine — the Spark-native re-expression of the
reference's skipping scan (SURVEY.md §3.3):

- page/zone-map skipping (SkippingColumnReaderImpl.java:735-771, pages failing
  the stats predicate dropped undecompressed) -> a DataFrame filter on the
  block-stats columns BEFORE any block blob is decoded; surviving
  (bucket, block_id) pairs semi-join the other columns' blocks;
- dictionary predicate translation / in-situ query
  (column/Dictionary.java:107-132; order-preserving range ids
  OnePassOrderPreservingDictionary.java:82-98) -> predicates on dict-coded
  blocks are evaluated once against the tiny sorted dictionary via
  np.searchsorted and become integer comparisons on the decoded ids,
  never materializing the strings;
- record skipping (ForwardIterator, SkippingColumnReaderImpl.java:684-708) ->
  a boolean selection mask applied to all columns of the block.

Scale design: pruning is a metadata-only DataFrame op (the blocks table's
stats columns are a zone map); only surviving blobs cross into the decode
UDF. Column pruning = not reading the other cols' block rows at all
(parquet scan of the blocks table pushes the ``col IN (...)`` filter down).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codecs import decode_block, params_loads
from ..codecs import dict_codec, rle
from ..functions.arrow import SPARK_FROM_LOGICAL, dense_to_arrow, unpack_validity
from .encode import read_meta

_OPS = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
        "<=": operator.le, ">": operator.gt, ">=": operator.ge}


@dataclass
class Predicate:
    """Single-column comparison pushed into the scan.

    op in {=, !=, <, <=, >, >=, between, isin}; value is a scalar,
    (lo, hi) for between, or a list for isin. Timestamps: int micros.
    """

    col: str
    op: str
    value: Any


def read_blocks(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/blocks")


def _stat_cols(lt: str) -> tuple[str, str]:
    if lt in ("int32", "int64", "timestamp", "timestamp_ntz", "bool"):
        return "min_int", "max_int"
    if lt in ("float32", "float64"):
        return "min_num", "max_num"
    return "min_str", "max_str"


def prune_filter(pred: Predicate, lt: str):
    """Zone-map retention condition for blocks of pred.col (conservative:
    True = block may contain matches). NULL stat bounds mean "unknown"
    (binary prefix overflow, NaN floats, truncated long-string max — see
    _block_stats) and retain the block unless it is all-null; all-null blocks
    never match comparison predicates (SQL null semantics)."""
    lo, hi = [F.col(c) for c in _stat_cols(lt)]
    # binary bounds are stored hex-encoded (order-preserving); compare the
    # literal in the same space
    enc = (lambda x: bytes(x).hex()) if lt == "binary" else (lambda x: x)
    v = pred.value
    if pred.op == "=":
        cond = (lo <= F.lit(enc(v))) & (hi >= F.lit(enc(v)))
    elif pred.op == "<":
        cond = lo < F.lit(enc(v))
    elif pred.op == "<=":
        cond = lo <= F.lit(enc(v))
    elif pred.op == ">":
        cond = hi > F.lit(enc(v))
    elif pred.op == ">=":
        cond = hi >= F.lit(enc(v))
    elif pred.op == "between":
        a, b = v
        cond = (hi >= F.lit(enc(a))) & (lo <= F.lit(enc(b)))
    elif pred.op == "isin":
        if not len(v):
            return F.lit(False)  # empty set matches nothing anywhere
        cond = None
        for x in v:
            c = (lo <= F.lit(enc(x))) & (hi >= F.lit(enc(x)))
            cond = c if cond is None else (cond | c)
    elif pred.op == "!=":
        cond = ~((lo == F.lit(enc(v))) & (hi == F.lit(enc(v))))
    else:
        raise ValueError(f"unknown predicate op {pred.op!r}")
    return F.coalesce(cond, F.col("null_count") < F.col("n"))


def _mask_from_ids(ids: np.ndarray, sorted_dict: np.ndarray, pred: Predicate) -> np.ndarray:
    """In-situ predicate: compare integer ids only (Q5/Q6 analog)."""
    if pred.op == "isin":
        return np.isin(ids, dict_codec.translate_isin(sorted_dict, pred.value))
    if pred.op == "=":
        a, b = dict_codec.translate_range(sorted_dict, pred.value, pred.value)
        return (ids >= a) & (ids < b)
    if pred.op == "!=":
        a, b = dict_codec.translate_range(sorted_dict, pred.value, pred.value)
        return ~((ids >= a) & (ids < b))
    if pred.op == "between":
        a, b = dict_codec.translate_range(sorted_dict, pred.value[0], pred.value[1])
        return (ids >= a) & (ids < b)
    if pred.op == "<":
        a, _ = dict_codec.translate_range(sorted_dict, pred.value, None)
        return ids < a
    if pred.op == "<=":
        _, b = dict_codec.translate_range(sorted_dict, None, pred.value)
        return ids < b
    if pred.op == ">":
        _, b = dict_codec.translate_range(sorted_dict, None, pred.value)
        return ids >= b
    if pred.op == ">=":
        a, _ = dict_codec.translate_range(sorted_dict, pred.value, None)
        return ids >= a
    raise ValueError(pred.op)


def _mask_from_values(vals: np.ndarray, pred: Predicate) -> np.ndarray:
    if pred.op == "isin":
        if not len(pred.value):
            return np.zeros(len(vals), dtype=bool)
        # object dtype (string/binary) must stay object: np.asarray on bytes
        # would coerce to fixed-width 'S' and strip trailing NULs
        want = np.asarray(pred.value, dtype=object if vals.dtype == object else None)
        return np.isin(vals, want)
    if pred.op == "between":
        return (vals >= pred.value[0]) & (vals <= pred.value[1])
    return _OPS[pred.op](vals, pred.value)


def _decode_partition(
    logical: dict[str, str],
    columns: list[str],
    preds: list[Predicate],
    gdicts: dict,
    it,
):
    """mapInArrow partition decoder: blocks arrive hash-partitioned by
    bucket, so (bucket, block_id) groups are whole here; grouping in Arrow
    avoids Spark's grouped-map overhead (same rationale as the encoder)."""
    batches = list(it)
    if not batches:
        return
    tbl = pa.Table.from_batches(batches)
    if tbl.num_rows == 0:
        return
    b = tbl.column("bucket").to_numpy()
    blk = tbl.column("block_id").to_numpy()
    keys = b.astype(np.int64) << 32 | blk.astype(np.int64)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    starts = np.flatnonzero(np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1])))
    bounds = np.append(starts, len(sorted_keys))
    for i in range(len(starts)):
        idx = order[bounds[i] : bounds[i + 1]]
        group = tbl.take(pa.array(idx))
        out = _decode_group(logical, columns, preds, False, None, group, gdicts)
        if out.num_rows:
            yield from out.to_batches()


def _pred_mask(logical, gdicts, by_col, tbl: pa.Table, n: int, pred: Predicate) -> np.ndarray:
    """Full-length row mask (nulls never match) for one predicate over one
    block — the record-skipping analog, evaluated in-situ on dictionary ids
    where the block is dict/gdict-coded."""
    i = by_col[pred.col]
    row = {name: tbl.column(name)[i].as_py() for name in
           ("codec", "params", "validity", "data", "dict")}
    lt = logical[pred.col]
    validity = unpack_validity(row["validity"], n)
    if row["codec"] == "dict":
        ids = dict_codec.decode_ids(row["data"])
        sorted_dict = dict_codec.load_dict(row["dict"])
        dense_mask = _mask_from_ids(ids, sorted_dict, pred)
    elif row["codec"] == "gdict":
        # global-dictionary block: same in-situ translation, dictionary
        # comes from the meta table (E5 analog)
        ids = rle.decode(row["data"]).astype(np.int64)
        dense_mask = _mask_from_ids(ids, gdicts[pred.col], pred)
    else:
        vals = decode_block(row["data"], row["dict"], lt, row["codec"], params_loads(row["params"]))
        if lt == "string":
            vals = vals.astype(object) if vals.dtype != object else vals
        dense_mask = _mask_from_values(vals, pred)
    if validity is None:
        return dense_mask
    mask = np.zeros(n, dtype=bool)
    mask[validity] = dense_mask  # nulls never match
    return mask


def _decode_group(
    logical: dict[str, str],
    columns: list[str],
    preds: list[Predicate],
    count_only: bool,
    key,
    tbl: pa.Table,
    gdicts: dict | None = None,
) -> pa.Table:
    gdicts = gdicts or {}
    by_col = {tbl.column("col")[i].as_py(): i for i in range(tbl.num_rows)}
    n = tbl.column("n")[0].as_py()

    mask = None  # conjunction of per-predicate row masks (reference composes
    # pageFilter AND rowFilter per scan, SkippingColumnReaderImpl.java:430-437)
    for pred in preds:
        m = _pred_mask(logical, gdicts, by_col, tbl, n, pred)
        mask = m if mask is None else (mask & m)
        if not mask.any():
            return pa.table({c: pa.array([], type=_pa_type(logical[c])) for c in columns})

    arrays = {}
    for col in columns:
        i = by_col[col]
        lt = logical[col]
        codec = tbl.column("codec")[i].as_py()
        data = tbl.column("data")[i].as_py()
        dict_blob = tbl.column("dict")[i].as_py()
        params = params_loads(tbl.column("params")[i].as_py())
        validity = unpack_validity(tbl.column("validity")[i].as_py(), n)
        if codec == "gdict":
            ids = rle.decode(data).astype(np.int64)
            vals = gdicts[col][ids]
            if lt == "int32":
                vals = vals.astype(np.int32)
            elif lt == "float32":
                vals = vals.astype(np.float32)
        else:
            vals = decode_block(data, dict_blob, lt, codec, params)
        arr = dense_to_arrow(vals, validity, lt)
        if mask is not None:
            arr = arr.filter(pa.array(mask))
        arrays[col] = arr
    return pa.table(arrays)


def _pa_type(lt: str):
    from ..functions.arrow import _PA_FROM_LOGICAL

    return _PA_FROM_LOGICAL[lt]


def _as_pred_list(predicate: Predicate | list[Predicate] | None) -> list[Predicate]:
    if predicate is None:
        return []
    if isinstance(predicate, Predicate):
        return [predicate]
    return list(predicate)


def scan(
    spark: SparkSession,
    out_dir: str,
    columns: list[str] | None = None,
    predicate: Predicate | list[Predicate] | None = None,
) -> DataFrame:
    """Decode the encoded table back to rows, with block pruning + pushed
    predicates (a list is a conjunction: zone-map conditions intersect, row
    masks AND — the reference's pageFilter+rowFilter composition,
    SkippingColumnReaderImpl.java:430-437). Row order is not defined."""
    meta = read_meta(spark, out_dir)
    logical: dict[str, str] = meta["logical"]
    from .encode import gdicts_from_json

    gdicts = gdicts_from_json(meta.get("gdicts", {}), logical)
    preds = _as_pred_list(predicate)
    if columns is None:
        columns = list(logical)
    blocks = read_blocks(spark, out_dir)

    needed = set(columns) | {p.col for p in preds}
    blocks = blocks.filter(F.col("col").isin(*needed))  # column pruning, pushed to parquet

    surviving = None
    for pred in preds:
        lt = logical[pred.col]
        surv_p = (
            blocks.filter(F.col("col") == pred.col)
            .filter(prune_filter(pred, lt))
            .select("bucket", "block_id")
        )
        surviving = surv_p if surviving is None else surviving.join(
            surv_p, ["bucket", "block_id"], "left_semi"
        )
    if surviving is not None:
        blocks = blocks.join(surviving, ["bucket", "block_id"], "left_semi")

    out_schema = ", ".join(f"`{c}` {SPARK_FROM_LOGICAL[logical[c]]}" for c in columns)
    nparts = max(1, spark.sparkContext.defaultParallelism)
    return blocks.repartition(nparts, "bucket").mapInArrow(
        partial(_decode_partition, logical, list(columns), preds, gdicts), out_schema
    )


def pruning_report(spark: SparkSession, out_dir: str, predicate: Predicate) -> dict[str, int]:
    """How many blocks the zone map eliminated (page-skip observability,
    the reference's skipped-page accounting analog)."""
    meta = read_meta(spark, out_dir)
    lt = meta["logical"][predicate.col]
    col_blocks = read_blocks(spark, out_dir).filter(F.col("col") == predicate.col)
    total = col_blocks.count()
    kept = col_blocks.filter(prune_filter(predicate, lt)).count()
    return {"total_blocks": total, "kept_blocks": kept, "pruned_blocks": total - kept}
