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
import pyarrow.compute as pc

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codecs import decode_block, params_loads
from ..codecs import dict_codec, rle
from ..functions.arrow import (
    codec_type,
    dense_to_arrow,
    pa_type as _arrow_pa_type,
    spark_type,
    unpack_validity,
)
from .encode import read_meta

_OPS = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
        "<=": operator.le, ">": operator.gt, ">=": operator.ge}


@dataclass
class Predicate:
    """Single-column comparison pushed into the scan.

    op in {=, !=, <, <=, >, >=, between, isin, isnull, notnull, startswith};
    value is a scalar, (lo, hi) for between, a list for isin, ignored for the
    null tests, a string prefix for startswith (string columns only).
    Timestamps: int micros; decimals: unscaled ints.
    """

    col: str
    op: str
    value: Any


@dataclass
class And:
    """Conjunction of predicate expressions (Predicate / And / Or / Not)."""

    children: list

    def __init__(self, children):
        self.children = list(children)


@dataclass
class Or:
    """Disjunction of predicate expressions — the reference's filter surface
    is an arbitrary ``Predicate<Statistics<?>>`` (SkippingColumnReaderImpl
    .java:430-437), which trivially expresses OR; zone-map survival unions
    the children's surviving block sets, row masks use Kleene three-valued
    logic so NULLs behave exactly as SQL."""

    children: list

    def __init__(self, children):
        self.children = list(children)


@dataclass
class Not:
    """Negation. Zone maps keep every block (conservatively — refuting
    "may contain a match" would need definitely-all-match bounds analysis);
    the row mask is exact: NOT(NULL) stays NULL and the row is not returned."""

    child: Any


def _expr_leaves(expr) -> list[Predicate]:
    if expr is None:
        return []
    if isinstance(expr, Predicate):
        return [expr]
    if isinstance(expr, Not):
        return _expr_leaves(expr.child)
    if isinstance(expr, (And, Or)):
        out = []
        for c in expr.children:
            out.extend(_expr_leaves(c))
        return out
    raise TypeError(f"not a predicate expression: {expr!r}")


def read_blocks(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/blocks")


def _stat_cols(lt: str) -> tuple[str, str]:
    from ..codecs import INT_TYPES

    lt = codec_type(lt)
    if lt in INT_TYPES or lt == "bool":
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
    if pred.op == "isnull":
        return F.col("null_count") > 0
    if pred.op == "notnull":
        return F.col("null_count") < F.col("n")
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


def _three_valued_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _three_valued_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _block_survives(pred: Predicate, lt: str, lo, hi, null_count: int, n: int) -> bool:
    """Python mirror of :func:`prune_filter` for the in-task zone-map prune
    (same three-valued semantics: None bounds = unknown -> keep unless the
    block is all-null)."""
    if pred.op == "isnull":
        return null_count > 0
    if pred.op == "notnull":
        return null_count < n
    enc = (lambda x: bytes(x).hex()) if lt == "binary" else (lambda x: x)

    def ge(a, b):
        return None if a is None else a >= b

    def le(a, b):
        return None if a is None else a <= b

    op, v = pred.op, pred.value
    if op == "=":
        cond = _three_valued_and(le(lo, enc(v)), ge(hi, enc(v)))
    elif op == "<":
        cond = None if lo is None else lo < enc(v)
    elif op == "<=":
        cond = le(lo, enc(v))
    elif op == ">":
        cond = None if hi is None else hi > enc(v)
    elif op == ">=":
        cond = ge(hi, enc(v))
    elif op == "between":
        cond = _three_valued_and(ge(hi, enc(v[0])), le(lo, enc(v[1])))
    elif op == "isin":
        if not len(v):
            return False
        cond = False
        for x in v:
            cond = _three_valued_or(cond, _three_valued_and(le(lo, enc(x)), ge(hi, enc(x))))
    elif op == "!=":
        eq = _three_valued_and(
            None if lo is None else lo == enc(v), None if hi is None else hi == enc(v)
        )
        cond = None if eq is None else not eq
    else:
        raise ValueError(f"unknown predicate op {pred.op!r}")
    if cond is None:
        return null_count < n
    return cond


_STATS_COLS = ["block_id", "col", "n", "null_count",
               "min_int", "max_int", "min_num", "max_num", "min_str", "max_str"]
_DATA_COLS = ["block_id", "col", "codec", "params", "n", "null_count",
              "validity", "data", "dict"]


def _surviving_blocks(stats: pa.Table, preds: list[Predicate], logical: dict[str, str]):
    """Set of block_ids passing ALL predicates' zone maps (None = no
    predicates -> read everything)."""
    if not preds:
        return None
    cols = stats.column("col").to_pylist()
    bids = stats.column("block_id").to_pylist()
    out = None
    for pred in preds:
        lt = logical[pred.col]
        lo_name, hi_name = _stat_cols(lt)
        los = stats.column(lo_name).to_pylist()
        his = stats.column(hi_name).to_pylist()
        ncs = stats.column("null_count").to_pylist()
        ns = stats.column("n").to_pylist()
        keep = {
            bids[i]
            for i in range(len(cols))
            if cols[i] == pred.col
            and _block_survives(pred, lt, los[i], his[i], ncs[i], ns[i])
        }
        out = keep if out is None else (out & keep)
    return out


def _decode_file(path: str, logical: dict[str, str], columns: list[str],
                 preds: list[Predicate], gdicts: dict):
    """Decode one bucket file: zone-map prune from a stats-only columnar read
    (block blobs are never fetched for pruned blocks — the lazy-page analog,
    CompressedDataPageV1.java:30-45), then STREAM the surviving blocks row
    group by row group; at most one incomplete block group is buffered across
    a row-group boundary, never the whole file."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    needed = list(dict.fromkeys(list(columns) + [p.col for p in preds]))
    surviving = None
    if preds:
        stats = f.read(columns=_STATS_COLS)
        surviving = _surviving_blocks(stats, preds, logical)
        if not surviving:
            return
    md = f.metadata
    arrow_schema = md.schema.to_arrow_schema()
    bid_idx = arrow_schema.get_field_index("block_id")
    col_idx = arrow_schema.get_field_index("col")
    needed_set = set(needed)
    # per-bucket dictionaries (block_id = -1 rows, written first in the
    # file) overlay the global ones for this file's blocks
    dicts = dict(gdicts)
    pending: dict[int, list[pa.Table]] = {}
    pending_rows: dict[int, int] = {}
    for rg in range(md.num_row_groups):
        rgmd = md.row_group(rg)
        # column-chunk skip: the writer emits one row per row group, so the
        # `col` stats pin each row group to a single column — row groups of
        # columns this scan doesn't need are never read (the reference's
        # readNextRowGroup(ColumnChunkMetaData[]) chunk selection,
        # ParquetFileReader.java:709-719)
        cst = rgmd.column(col_idx).statistics
        if (cst is not None and cst.has_min_max
                and cst.min == cst.max and cst.min not in needed_set):
            continue
        if surviving is not None:
            st = rgmd.column(bid_idx).statistics
            if st is not None and st.has_min_max and st.min >= 0:
                if not any(st.min <= b <= st.max for b in surviving):
                    continue  # row-group skip: no surviving block inside
        tbl = f.read_row_group(rg, columns=_DATA_COLS)
        keep = pc.is_in(tbl.column("col"), value_set=pa.array(needed))
        if surviving is not None:
            keep = pc.and_(
                keep,
                pc.or_(
                    pc.is_in(
                        tbl.column("block_id"), value_set=pa.array(sorted(surviving), pa.int32())
                    ),
                    pc.equal(tbl.column("block_id"), pa.scalar(-1, pa.int32())),
                ),
            )
        tbl = tbl.filter(keep)
        if tbl.num_rows == 0:
            continue
        neg = pc.equal(tbl.column("block_id"), pa.scalar(-1, pa.int32()))
        if pc.any(neg).as_py():
            dpart = tbl.filter(neg)
            for i in range(dpart.num_rows):
                dicts[dpart.column("col")[i].as_py()] = dict_codec.load_dict(
                    dpart.column("dict")[i].as_py()
                )
            tbl = tbl.filter(pc.invert(neg))
            if tbl.num_rows == 0:
                continue
        bids = tbl.column("block_id").to_numpy()
        for bid in np.unique(bids).tolist():
            part = tbl.filter(pc.equal(tbl.column("block_id"), pa.scalar(int(bid), pa.int32())))
            pending.setdefault(bid, []).append(part)
            pending_rows[bid] = pending_rows.get(bid, 0) + part.num_rows
        # flush complete groups (a block contributes exactly one row per
        # requested column); only boundary-straddling groups stay buffered
        for bid in [b for b, c in pending_rows.items() if c >= len(needed)]:
            group = pa.concat_tables(pending.pop(bid))
            del pending_rows[bid]
            out = _decode_group(logical, columns, preds, False, None, group, dicts)
            if out.num_rows:
                yield from out.to_batches()
    for bid in sorted(pending):  # defensive: flush any leftovers
        group = pa.concat_tables(pending[bid])
        have = set(group.column("col").to_pylist())
        missing = [c for c in needed if c not in have]
        if missing:
            # complete groups were flushed in the main loop, so a leftover is
            # corruption (or a file written under a different schema) — name
            # it instead of KeyError-ing deep inside _decode_group
            raise RuntimeError(
                f"corrupt encoded file {path}: block {bid} has no row for "
                f"column(s) {missing} (present: {sorted(have)})"
            )
        out = _decode_group(logical, columns, preds, False, None, group, dicts)
        if out.num_rows:
            yield from out.to_batches()


def _decode_tasks(logical: dict[str, str], columns: list[str],
                  preds: list[Predicate], gdicts: dict, it):
    """mapInArrow over (path) task rows — each task decodes whole bucket
    files, so (block, column) groups are never split across tasks and no
    block blob ever crosses a shuffle."""
    for batch in it:
        for path in batch.column("path").to_pylist():
            yield from _decode_file(path, logical, columns, preds, gdicts)


def _pred_mask(logical, gdicts, by_col, tbl: pa.Table, n: int, pred: Predicate) -> np.ndarray:
    """Full-length row mask (nulls never match) for one predicate over one
    block — the record-skipping analog, evaluated in-situ on dictionary ids
    where the block is dict/gdict-coded."""
    i = by_col[pred.col]
    row = {name: tbl.column(name)[i].as_py() for name in
           ("codec", "params", "validity", "data", "dict")}
    lt = logical[pred.col]
    validity = unpack_validity(row["validity"], n)
    if pred.op in ("isnull", "notnull"):
        # answered from the validity bitmap alone — the payload is never
        # decoded (null-aware skip, the skipWithCount analog)
        if validity is None:
            full = np.ones(n, dtype=bool)
        else:
            full = validity.copy()
        return ~full if pred.op == "isnull" else full
    if row["codec"] == "dict":
        ids = dict_codec.decode_ids(row["data"])
        sorted_dict = dict_codec.load_dict(row["dict"])
        dense_mask = _mask_from_ids(ids, sorted_dict, pred)
    elif row["codec"] in ("gdict", "bdict"):
        # global / bucket-shared dictionary block: same in-situ translation,
        # dictionary comes from meta (E5) or the bucket's dict row
        ids = rle.decode(row["data"]).astype(np.int64)
        dense_mask = _mask_from_ids(ids, gdicts[pred.col], pred)
    else:
        vals = decode_block(row["data"], row["dict"], codec_type(lt), row["codec"], params_loads(row["params"]))
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

    from ..codecs import VAR_TYPES, fsst as _fsst, plain as _plain, prefix as _prefix
    from ..codecs.strutil import lb_to_arrow

    arrays = {}
    for col in columns:
        i = by_col[col]
        lt = logical[col]
        codec = tbl.column("codec")[i].as_py()
        data = tbl.column("data")[i].as_py()
        dict_blob = tbl.column("dict")[i].as_py()
        params = params_loads(tbl.column("params")[i].as_py())
        validity = unpack_validity(tbl.column("validity")[i].as_py(), n)
        if codec in ("fsst", "plain", "prefix") and lt in VAR_TYPES:
            # var-len fast path: rebuild the Arrow array straight from
            # (lengths, blob) — zero per-value Python objects
            lengths, blob = {"fsst": _fsst.decode_lb, "plain": _plain.decode_var_lb,
                             "prefix": _prefix.decode_lb}[codec](data)
            arr = lb_to_arrow(lengths, blob, validity, binary=lt == "binary")
        else:
            if codec in ("gdict", "bdict"):
                from ..codecs import NARROW_INT

                ids = rle.decode(data).astype(np.int64)
                vals = gdicts[col][ids]
                if codec_type(lt) in NARROW_INT:
                    vals = vals.astype(NARROW_INT[codec_type(lt)])
                elif lt == "float32":
                    vals = vals.astype(np.float32)
            else:
                vals = decode_block(data, dict_blob, codec_type(lt), codec, params)
            arr = dense_to_arrow(vals, validity, lt)
        if mask is not None:
            arr = arr.filter(pa.array(mask))
        arrays[col] = arr
    return pa.table(arrays)


def _pa_type(lt: str):
    return _arrow_pa_type(lt)


def _as_pred_list(predicate: Predicate | list[Predicate] | None) -> list[Predicate]:
    if predicate is None:
        return []
    if isinstance(predicate, Predicate):
        return [predicate]
    return list(predicate)


def _list_block_files(out_dir: str, spark: SparkSession | None = None) -> list[str]:
    """Bucket files under out_dir/blocks. Posix paths list via glob; Hadoop
    FS URIs (hdfs://, s3a://, ...) list via the JVM FileSystem (one
    globStatus — the same driver-side cost Spark's own file index pays) and
    require a SparkSession. A missing blocks directory raises instead of
    silently yielding an empty table."""
    import glob
    import os

    from .encode import _local_path, is_remote_path

    path = f"{out_dir}/blocks"
    if is_remote_path(path):
        if spark is None:
            raise NotImplementedError(
                "remote filesystems need a SparkSession for listing — "
                "use scan(); the pms_encoded data source is local-path only"
            )
        jvm = spark._jvm
        gp = jvm.org.apache.hadoop.fs.Path(f"{path}/bucket=*/*.parquet")
        fs = gp.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(path)):
            raise FileNotFoundError(f"no blocks directory under {out_dir}")
        st = fs.globStatus(gp)
        return sorted(str(s.getPath()) for s in st) if st is not None else []
    root = _local_path(path)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no blocks directory under {out_dir}")
    return sorted(glob.glob(f"{root}/bucket=*/*.parquet"))


def scan(
    spark: SparkSession,
    out_dir: str,
    columns: list[str] | None = None,
    predicate: Predicate | list[Predicate] | None = None,
) -> DataFrame:
    """Decode the encoded table back to rows, with block pruning + pushed
    predicates (a list is a conjunction: zone-map conditions intersect, row
    masks AND — the reference's pageFilter+rowFilter composition,
    SkippingColumnReaderImpl.java:430-437). Row order is not defined.

    Scale design: one task per bucket file, decoded in place with pyarrow —
    no Exchange ever touches a block blob (round 1 repartitioned every
    surviving blob across the cluster). Zone-map pruning runs INSIDE each
    task from a stats-only columnar read, so pruned blobs are never fetched
    from disk and the prune itself is distributed. Parallelism = number of
    buckets; at scale you raise EncodeConfig.buckets (same knob that sizes
    encode tasks), keeping #files >> cores.
    """
    meta = read_meta(spark, out_dir)
    logical: dict[str, str] = meta["logical"]
    from .encode import gdicts_from_json

    gdicts = gdicts_from_json(meta.get("gdicts", {}), logical)
    preds = _as_pred_list(predicate)
    if columns is None:
        columns = list(logical)
    files = _list_block_files(out_dir, spark)
    out_schema = ", ".join(f"`{c}` {spark_type(logical[c])}" for c in columns)
    if not files:
        return spark.createDataFrame([], out_schema)
    tasks = spark.createDataFrame([(p,) for p in files], "path string").repartition(len(files))
    return tasks.mapInArrow(
        partial(_decode_tasks, logical, list(columns), preds, gdicts), out_schema
    )


def pruning_report(spark: SparkSession, out_dir: str,
                   predicate: Predicate | list[Predicate]) -> dict[str, int]:
    """How many blocks the zone map eliminated (page-skip observability,
    the reference's skipped-page accounting analog). A list reports the
    conjunction (a block survives only if every predicate retains it)."""
    meta = read_meta(spark, out_dir)
    preds = _as_pred_list(predicate)
    if not preds:
        raise ValueError("pruning_report needs at least one predicate")
    anchor = preds[0].col
    blocks = read_blocks(spark, out_dir).filter(F.col("block_id") >= 0)
    total = blocks.filter(F.col("col") == anchor).count()
    surviving = None
    for pred in preds:
        lt = meta["logical"][pred.col]
        surv = (
            blocks.filter(F.col("col") == pred.col)
            .filter(prune_filter(pred, lt))
            .select("bucket", "block_id")
        )
        surviving = surv if surviving is None else surviving.join(
            surv, ["bucket", "block_id"], "left_semi"
        )
    kept = surviving.distinct().count()
    return {"total_blocks": total, "kept_blocks": kept, "pruned_blocks": total - kept}
