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
    lb_to_vector as _lb_to_vector,
    pa_type as _arrow_pa_type,
    spark_type,
    unpack_validity,
    vector_params as _vector_params,
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
    """Negation. Zone maps prune genuinely: may(NOT c) = universe − all(c)
    via the definite-all-match classification (_classify_blocks De Morgan),
    so blocks where the child certainly holds everywhere are dropped
    undecoded; the row mask is exact: NOT(NULL) stays NULL and the row is
    not returned."""

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


def _stat_cols(lt: str) -> tuple[str, str]:
    from ..codecs import INT_TYPES

    lt = codec_type(lt)
    if lt in INT_TYPES or lt == "bool":
        return "min_int", "max_int"
    if lt in ("float32", "float64"):
        return "min_num", "max_num"
    return "min_str", "max_str"


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
    if pred.op == "startswith":
        # evaluated once on the tiny sorted dictionary, then an id lookup
        dmask = np.array([s.startswith(pred.value) for s in sorted_dict], dtype=bool)
        return dmask[ids] if len(sorted_dict) else np.zeros(len(ids), dtype=bool)
    raise ValueError(pred.op)


def _scalar_for(vals: np.ndarray, v):
    """Comparison scalar matched to the array dtype. A RAW bytes scalar
    against an object array goes through numpy's 'S' coercion, which strips
    trailing NULs — b'' == b'\\x00' came back True (found by the predicate
    fuzzer); a 0-d object array compares element-wise with Python
    semantics."""
    if vals.dtype == object and isinstance(v, (bytes, bytearray)):
        return np.array(bytes(v), dtype=object)
    return v


def _mask_from_values(vals: np.ndarray, pred: Predicate) -> np.ndarray:
    if pred.op == "isin":
        if not len(pred.value):
            return np.zeros(len(vals), dtype=bool)
        # object dtype (string/binary) must stay object: np.asarray on bytes
        # would coerce to fixed-width 'S' and strip trailing NULs
        want = np.asarray(pred.value, dtype=object if vals.dtype == object else None)
        return np.isin(vals, want)
    if pred.op == "between":
        return ((vals >= _scalar_for(vals, pred.value[0]))
                & (vals <= _scalar_for(vals, pred.value[1])))
    if pred.op == "startswith":
        import pyarrow.compute as _pc

        arr = pa.array(vals, type=pa.string())
        return _pc.starts_with(arr, pred.value).to_numpy(zero_copy_only=False)
    return _OPS[pred.op](vals, _scalar_for(vals, pred.value))


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
    """In-task zone-map retention test (conservative: True = block may
    contain matches). Three-valued: None bounds = unknown -> keep unless
    the block is all-null; all-null blocks never match comparison
    predicates (SQL null semantics). The ONLY prune implementation — scan,
    COUNT pushdown and pruning_report all classify through it (via
    _classify_blocks), so observability always reports what the engine
    actually skipped."""
    if pred.op == "isnull":
        return null_count > 0
    if pred.op == "notnull":
        return null_count < n
    enc = (lambda x: bytes(x).hex()) if codec_type(lt) == "binary" else (lambda x: x)

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
    elif op == "startswith":
        cond = _three_valued_and(
            None if hi is None else hi >= v,
            None if lo is None else lo[: len(v)] <= v,
        )
    else:
        raise ValueError(f"unknown predicate op {pred.op!r}")
    if cond is None:
        return null_count < n
    return cond


def _block_all_match(pred: Predicate, lt: str, lo, hi, null_count: int, n: int) -> bool:
    """True only when EVERY row of the block satisfies the predicate (the
    definite-match side of the zone map — the dual of _block_survives).
    Unknown (None) bounds or any NULL row (which never matches a value
    predicate) make this False; the answer must be certain."""
    if n == 0:
        return True
    if pred.op == "isnull":
        return null_count == n
    if pred.op == "notnull":
        return null_count == 0
    if null_count > 0 or lo is None or hi is None:
        return False
    enc = (lambda x: bytes(x).hex()) if codec_type(lt) == "binary" else (lambda x: x)
    op, v = pred.op, pred.value
    if op == "=":
        return lo == enc(v) and hi == enc(v)
    if op == "!=":
        return hi < enc(v) or lo > enc(v)
    if op == "<":
        return hi < enc(v)
    if op == "<=":
        return hi <= enc(v)
    if op == ">":
        return lo > enc(v)
    if op == ">=":
        return lo >= enc(v)
    if op == "between":
        return lo >= enc(v[0]) and hi <= enc(v[1])
    if op == "isin":
        return bool(len(v)) and lo == hi and any(lo == enc(x) for x in v)
    if op == "startswith":
        # a shared prefix of the (possibly truncated) bounds covers every
        # value in [lo, hi]: stored lo <= real min <= real max <= stored hi
        return lo[: len(v)] == v and hi[: len(v)] == v and len(lo) >= len(v)
    raise ValueError(f"unknown predicate op {pred.op!r}")


_STATS_COLS = ["block_id", "col", "n", "null_count",
               "min_int", "max_int", "min_num", "max_num", "min_str", "max_str"]
_DATA_COLS = ["block_id", "col", "codec", "params", "n", "null_count",
              "validity", "data", "dict"]


def _classify_blocks(stats: pa.Table, expr, logical: dict[str, str]):
    """Per-block three-valued zone-map classification of ``expr``:
    returns (may, all) — the block_ids that MAY contain a match and the
    block_ids where EVERY row definitely matches. Conjunctions intersect,
    disjunctions union, and Not swaps via De Morgan:
    may(NOT c) = universe − all(c) — so negations genuinely prune (blocks
    where the child definitely all-matches are dropped undecoded) instead
    of keeping everything. The all side of Not additionally intersects the
    child's DEFINITENESS set (blocks whose rows all evaluate the child to
    a non-NULL verdict): a NULL row makes the child unknown, and
    NOT(unknown) is unknown — never a match — so ``universe − may(c)``
    alone would over-count blocks containing NULLs (caught by the
    tests/test_predicate_property.py fuzzer against the COUNT pushdown)."""
    bids_all = stats.column("block_id").to_pylist()
    universe = {b for b in bids_all if b >= 0}
    # one Arrow filter per referenced column (cached): the Python classifier
    # loop then walks that column's BLOCKS, not blocks x columns — the
    # difference between O(blocks) and O(stats rows) per predicate leaf
    # when block_size shrinks (VERDICT r3 watch item)
    per_col: dict[str, dict[str, list]] = {}

    def col_rows(col: str) -> dict[str, list]:
        got = per_col.get(col)
        if got is None:
            sub = stats.filter(pc.and_(
                pc.equal(stats.column("col"), pa.scalar(col)),
                pc.greater_equal(stats.column("block_id"), pa.scalar(0, pa.int32())),
            ))
            got = per_col[col] = {
                name: sub.column(name).to_pylist()
                for name in ("block_id", "n", "null_count", "min_int",
                             "max_int", "min_num", "max_num",
                             "min_str", "max_str")
            }
        return got

    def walk(e):
        """(may, all, det): may/all as documented; det = blocks where the
        expression is DEFINITE (non-NULL) for every row — conservative
        (intersection across children), exact at leaves."""
        if isinstance(e, Predicate):
            lt = logical[e.col]
            lo_name, hi_name = _stat_cols(lt)
            may, allm, det = set(), set(), set()
            null_test = e.op in ("isnull", "notnull")
            d = col_rows(e.col)
            for i in range(len(d["block_id"])):
                args = (e, lt, d[lo_name][i], d[hi_name][i],
                        d["null_count"][i], d["n"][i])
                if null_test or d["null_count"][i] == 0:
                    det.add(d["block_id"][i])  # null tests are always definite
                if _block_survives(*args):
                    may.add(d["block_id"][i])
                    if _block_all_match(*args):
                        allm.add(d["block_id"][i])
            return may, allm, det
        if isinstance(e, And):
            may, allm, det = set(universe), set(universe), set(universe)
            for c in e.children:
                cm, ca, cd = walk(c)
                may &= cm
                allm &= ca
                det &= cd
            return may, allm, det
        if isinstance(e, Or):
            may, allm, det = set(), set(), set(universe)
            for c in e.children:
                cm, ca, cd = walk(c)
                may |= cm
                allm |= ca
                det &= cd
            return may, allm, det
        if isinstance(e, Not):
            cm, ca, cd = walk(e.child)
            # NOT(unknown) = unknown: only definite blocks can all-match
            return universe - ca, cd - cm, cd
        raise TypeError(f"not a predicate expression: {e!r}")

    return walk(expr)[:2]


def _surviving_blocks(stats: pa.Table, expr, logical: dict[str, str]):
    """Set of block_ids the zone maps cannot rule out for ``expr``
    (None = no predicate -> read everything)."""
    if expr is None:
        return None
    return _classify_blocks(stats, expr, logical)[0]


def _open_parquet(path: str):
    """Open an encoded bucket file for reading, local or remote: posix /
    file: paths open directly; URI paths (hdfs://, s3://, ...) open through
    pyarrow.fs — the same any-Hadoop-FS reach as the reference's
    ParquetFileReader (ParquetFileReader.java:703-776), without needing a
    JVM in the worker."""
    import pyarrow.parquet as pq

    from .encode import _local_path, is_remote_path

    if is_remote_path(path):
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(path)
        return pq.ParquetFile(fs.open_input_file(p))
    return pq.ParquetFile(_local_path(path))


def _decode_file(path: str, logical: dict[str, str], columns: list[str],
                 expr, gdicts: dict, restrict_blocks: set | None = None,
                 rg_range: tuple[int, int] | None = None):
    """Decode one bucket file: zone-map prune from a stats-only columnar read
    (block blobs are never fetched for pruned blocks — the lazy-page analog,
    CompressedDataPageV1.java:30-45), then STREAM the surviving blocks row
    group by row group; at most one incomplete block group is buffered across
    a row-group boundary, never the whole file. ``restrict_blocks`` further
    limits decoding to the given block_ids (the count-only boundary path).

    ``rg_range=(lo, hi)`` restricts DATA row groups to [lo, hi) — the
    sub-bucket split path (_scan_units): a giant bucket file decodes as
    several independent tasks, each still reading the leading dictionary
    row groups (block_id=-1) so local dicts resolve. Ranges are cut at
    block-group boundaries, so no (block, column) group ever straddles two
    tasks. Analog: the reference iterates row groups independently,
    ParquetFileReader.java:727-776."""
    expr = _as_expr(expr)
    f = _open_parquet(path)
    needed = list(dict.fromkeys(list(columns) + [p.col for p in _expr_leaves(expr)]))
    surviving = None
    if expr is not None:
        stats = f.read(columns=_STATS_COLS)
        surviving = _surviving_blocks(stats, expr, logical)
    if restrict_blocks is not None:
        surviving = restrict_blocks if surviving is None else (surviving & restrict_blocks)
    if surviving is not None and not surviving:
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
        if rg_range is not None:
            # dict row groups (block_id = -1, written first) are read by
            # every split task; data row groups only inside [lo, hi)
            bst = rgmd.column(bid_idx).statistics
            is_dict_rg = bst is not None and bst.has_min_max and bst.max < 0
            if not is_dict_rg and not (rg_range[0] <= rg < rg_range[1]):
                continue
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
            out = _decode_group(logical, columns, expr, False, None, group, dicts)
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
        out = _decode_group(logical, columns, expr, False, None, group, dicts)
        if out.num_rows:
            yield from out.to_batches()


def _decode_tasks(logical: dict[str, str], columns: list[str],
                  expr, gdicts: dict, it):
    """mapInArrow over (path, rg_lo, rg_hi) task rows — each task decodes a
    whole bucket file (rg_lo = -1) or one row-group range of it, cut at
    block-group boundaries, so (block, column) groups are never split
    across tasks and no block blob ever crosses a shuffle."""
    for batch in it:
        paths = batch.column("path").to_pylist()
        los = batch.column("rg_lo").to_pylist()
        his = batch.column("rg_hi").to_pylist()
        for path, lo, hi in zip(paths, los, his):
            rng = None if lo < 0 else (lo, hi)
            yield from _decode_file(path, logical, columns, expr, gdicts,
                                    rg_range=rng)


def _pred_mask(logical, gdicts, by_col, tbl: pa.Table, n: int, pred: Predicate):
    """Three-valued row masks ``(true, false)`` for one predicate over one
    block (rows in neither are NULL/unknown — Kleene logic, so Not/Or compose
    with exact SQL semantics). Evaluated in-situ on dictionary ids where the
    block is dict/gdict-coded — the record-skipping analog."""
    i = by_col[pred.col]
    row = {name: tbl.column(name)[i].as_py() for name in
           ("codec", "params", "validity", "data", "dict")}
    lt = logical[pred.col]
    validity = unpack_validity(row["validity"], n)
    if pred.op in ("isnull", "notnull"):
        # answered from the validity bitmap alone — the payload is never
        # decoded (null-aware skip, the skipWithCount analog); always known
        if validity is None:
            full = np.ones(n, dtype=bool)
        else:
            full = validity.copy()
        t = ~full if pred.op == "isnull" else full
        return t, ~t
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
        return dense_mask, ~dense_mask
    t = np.zeros(n, dtype=bool)
    t[validity] = dense_mask  # nulls match nothing...
    f = np.zeros(n, dtype=bool)
    f[validity] = ~dense_mask  # ...but they are UNKNOWN, not false
    return t, f


def _expr_mask(expr, logical, gdicts, by_col, tbl: pa.Table, n: int):
    """Kleene-evaluate a predicate tree to ``(true, false)`` row masks:
    and/or are the three-valued connectives, not swaps the pair. The caller
    keeps rows where ``true`` holds (SQL WHERE drops unknowns)."""
    if isinstance(expr, Predicate):
        return _pred_mask(logical, gdicts, by_col, tbl, n, expr)
    if isinstance(expr, And):
        t = np.ones(n, dtype=bool)
        f = np.zeros(n, dtype=bool)
        for c in expr.children:
            ct, cf = _expr_mask(c, logical, gdicts, by_col, tbl, n)
            t &= ct
            f |= cf
        return t, f
    if isinstance(expr, Or):
        t = np.zeros(n, dtype=bool)
        f = np.ones(n, dtype=bool)
        for c in expr.children:
            ct, cf = _expr_mask(c, logical, gdicts, by_col, tbl, n)
            t |= ct
            f &= cf
        return t, f
    if isinstance(expr, Not):
        ct, cf = _expr_mask(expr.child, logical, gdicts, by_col, tbl, n)
        return cf, ct
    raise TypeError(f"not a predicate expression: {expr!r}")


def _decode_group(
    logical: dict[str, str],
    columns: list[str],
    expr,
    count_only: bool,
    key,
    tbl: pa.Table,
    gdicts: dict | None = None,
) -> pa.Table:
    gdicts = gdicts or {}
    by_col = {tbl.column("col")[i].as_py(): i for i in range(tbl.num_rows)}
    n = tbl.column("n")[0].as_py()

    mask = None  # exact row mask from the predicate tree (reference composes
    # pageFilter AND rowFilter per scan, SkippingColumnReaderImpl.java:430-437)
    if expr is not None:
        mask, _ = _expr_mask(expr, logical, gdicts, by_col, tbl, n)
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
        vp = _vector_params(lt)
        if codec in ("fsst", "plain", "prefix") and (lt in VAR_TYPES or vp):
            # var-len fast path: rebuild the Arrow array straight from
            # (lengths, blob) — zero per-value Python objects; vectors
            # reinflate to list<float> from the same decomposition
            lengths, blob = {"fsst": _fsst.decode_lb, "plain": _plain.decode_var_lb,
                             "prefix": _prefix.decode_lb}[codec](data)
            if vp:
                arr = _lb_to_vector(lengths, blob, validity, lt)
            else:
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


def _as_expr(predicate):
    """Normalize the public predicate argument: None, a single Predicate, a
    LIST (= conjunction, the historical API), or an And/Or/Not tree."""
    if predicate is None:
        return None
    if isinstance(predicate, (list, tuple)):
        exprs = list(predicate)
        if not exprs:
            return None
        return exprs[0] if len(exprs) == 1 else And(exprs)
    if isinstance(predicate, (Predicate, And, Or, Not)):
        return predicate
    raise TypeError(f"not a predicate expression: {predicate!r}")


def _session_zone():
    """tzinfo of spark.sql.session.timeZone (predicate normalization runs on
    the driver, so the active session is available). LookupError when it
    cannot be resolved — callers then decline the pushdown / fall back to
    UTC instead of guessing a wrong zone silently."""
    import datetime

    sess = SparkSession.getActiveSession()
    if sess is None:
        raise LookupError("no active SparkSession")
    name = sess.conf.get("spark.sql.session.timeZone")
    if name in ("UTC", "Z", "GMT", "+00:00"):
        return datetime.timezone.utc
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(name)
    except Exception as exc:  # unknown zone id / fixed offsets like GMT+8
        raise LookupError(f"cannot resolve session timezone {name!r}") from exc


def _normalize_expr(expr, logical: dict[str, str]):
    """Convert leaf values to what the codec path compares: decimal128
    unscaled ints (or decimal.Decimal) -> 16-byte order-preserving keys;
    vector float lists/arrays -> their raw element bytes (exact-vector
    equality/isin, e.g. embedding dedup probes); datetime -> epoch micros
    (naive datetimes resolve in the SESSION timezone for ``timestamp``
    columns — matching Spark's own timestamp-literal semantics — and as
    wall-clock/UTC for ``timestamp_ntz``; pass tz-aware values or int
    micros to be explicit); date -> epoch days. Idempotent: ints/bytes pass
    through untouched."""
    import datetime
    import decimal

    from ..functions.arrow import dec128_key, decimal128_params, vector_params

    def conv_one(col: str, v):
        if v is None or isinstance(v, (bytes, bytearray)):
            return bytes(v) if isinstance(v, (bytes, bytearray)) else v
        lt = logical.get(col, "")
        if isinstance(v, datetime.datetime):
            if lt in ("timestamp", "timestamp_ntz"):
                if v.tzinfo is None and lt == "timestamp":
                    # instant-typed column: a naive literal means the session
                    # timezone, exactly as Spark resolves its own timestamp
                    # literals (timestamp_ntz stays wall-clock == UTC micros)
                    try:
                        v = v.replace(tzinfo=_session_zone())
                    except LookupError as exc:
                        # the data source path declines the pushdown here and
                        # lets Spark resolve the zone; scan() has no such
                        # fallback, so guessing UTC silently could return
                        # different rows than the DS reader — refuse instead
                        raise ValueError(
                            "naive timestamp literal but the session timezone "
                            "cannot be resolved; pass a tz-aware datetime or "
                            "integer epoch micros"
                        ) from exc
                if v.tzinfo is not None:
                    v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
                d = v - datetime.datetime(1970, 1, 1)
                # exact integer micros (float .timestamp() loses precision)
                return (d.days * 86_400_000_000 + d.seconds * 1_000_000
                        + d.microseconds)
            return v
        if isinstance(v, datetime.date):
            if lt == "date32":
                return (v - datetime.date(1970, 1, 1)).days
            return v
        vp = vector_params(lt)
        if vp is not None and isinstance(v, (list, tuple, np.ndarray)):
            return np.asarray(v, dtype=vp[0]).tobytes()
        dp = decimal128_params(lt)
        if dp is None:
            return v
        if isinstance(v, decimal.Decimal):
            v = int(v.scaleb(dp[1]))
        return dec128_key(int(v))

    def walk(e):
        if e is None:
            return None
        if isinstance(e, Predicate):
            if e.op in ("isnull", "notnull"):
                return e
            if e.op == "between":
                return Predicate(e.col, e.op, (conv_one(e.col, e.value[0]),
                                               conv_one(e.col, e.value[1])))
            if e.op == "isin":
                return Predicate(e.col, e.op, [conv_one(e.col, x) for x in e.value])
            return Predicate(e.col, e.op, conv_one(e.col, e.value))
        if isinstance(e, And):
            return And([walk(c) for c in e.children])
        if isinstance(e, Or):
            return Or([walk(c) for c in e.children])
        if isinstance(e, Not):
            return Not(walk(e.child))
        raise TypeError(f"not a predicate expression: {e!r}")

    return walk(expr)


import re as _re

_BUCKET_PAT = _re.compile(r"/bucket=(\d+)/")


def bucket_id_of_path(path: str) -> "int | None":
    """Bucket id encoded in a block-file path (``.../bucket=N/...``), or
    None for paths outside the layout. THE single parser of the bucket-dir
    convention — pruning, the DS planner, resume, verify and reporting all
    route through here so a layout change cannot make them disagree about
    which files belong to which bucket."""
    m = _BUCKET_PAT.search(path)
    return int(m.group(1)) if m else None


#: driver-side lineage cache: out_dir -> (listing fingerprint, parsed rows).
#: Point-lookup workloads scan the same table repeatedly; re-reading and
#: json-parsing ~`buckets` lineage rows per scan is pure fixed cost. The
#: fingerprint is the lineage dir's (name, size, mtime_ns) listing — any
#: append/repair/compact changes it (file names are content-derived, and
#: in-place repair rewrites bump mtime via atomic replace) and invalidates.
_LINEAGE_CACHE: dict[str, tuple[tuple, list]] = {}
_LINEAGE_CACHE_MAX = 32


def _lineage_rows(out_dir: str) -> list:
    """Parsed lineage rows of a table, cached for local dirs (remote URIs
    read through every time — listing + stat round-trips there cost as much
    as the read itself). Raises FileNotFoundError like the raw reader."""
    from ..sources.datasource import _read_parquet_rows
    from .encode import is_remote_path

    path = f"{out_dir}/lineage"
    if is_remote_path(path):
        return _read_parquet_rows(path)
    import os

    with os.scandir(path) as it:  # FileNotFoundError propagates
        fp = tuple(sorted(
            (e.name, e.stat().st_size, e.stat().st_mtime_ns)
            for e in it if e.name.endswith(".parquet")))
    hit = _LINEAGE_CACHE.get(out_dir)
    if hit is not None and hit[0] == fp:
        return hit[1]
    rows = _read_parquet_rows(path)
    if len(_LINEAGE_CACHE) >= _LINEAGE_CACHE_MAX:
        _LINEAGE_CACHE.pop(next(iter(_LINEAGE_CACHE)))
    _LINEAGE_CACHE[out_dir] = (fp, rows)
    return rows


def _bucket_candidates(expr, meta: dict) -> "set[int] | None":
    """Driver-side bucket-hash pruning: when the RAW predicate tree (before
    value normalization) confines the bucket key to equality/isin, the hash
    names the only bucket files that can hold matching rows — at 2^16
    buckets a ``url = 'x'`` lookup opens ONE file instead of scheduling 65k
    tasks whose url zone maps prune nothing (the key is hash-scattered, so
    per-file min/max never excludes a point). The reference's analog is
    row-group selection before any page IO (ParquetFileReader.java:709-719).

    Returns the set of possible bucket ids, or None = no restriction.
    Conservative by construction: And intersects, Or unions (any
    unrestricted child kills the restriction), Not and non-equality leaves
    restrict nothing, and literals outside the verified hash matrix
    (HASHABLE_KEY_TYPES) restrict nothing. Salted tables expand each value
    to all ``salt`` variants of the encode expression."""
    from ..functions.xxh64 import HASHABLE_KEY_TYPES, bucket_of

    cfg = meta.get("config") or {}
    key = cfg.get("bucket_key")
    buckets = int(cfg.get("buckets") or 0)
    lt = (meta.get("logical") or {}).get(key, "")
    if cfg.get("writer") == "datasource" and not cfg.get("hash_bucketed"):
        # pms_encoded-writer tables: bucket ids are CHUNK-derived
        # (offset + pid*spread + seq), not pmod(xxhash64(key), buckets) —
        # hashing a literal against that id space prunes the wrong files
        # and silently loses rows (caught round 6; the writer's bucketed
        # mode sets hash_bucketed when ids really are the hash)
        return None
    if not key or buckets <= 0 or expr is None or lt not in HASHABLE_KEY_TYPES:
        return None
    salt = int(cfg.get("salt") or 1)
    salt_col = cfg.get("salt_col")

    def walk(e) -> "set[int] | None":
        if isinstance(e, Predicate):
            if e.col != key:
                return None
            if e.op == "=":
                vals = [e.value]
            elif e.op == "isin":
                vals = list(e.value)
            else:
                return None
            out: set[int] = set()
            for v in vals:
                try:
                    out |= bucket_of(v, lt, buckets, salt, salt_col)
                except TypeError:
                    return None  # unverified literal type: don't guess
            return out
        if isinstance(e, And):
            sets = [s for s in (walk(c) for c in e.children) if s is not None]
            if not sets:
                return None
            out = sets[0]
            for s in sets[1:]:
                out &= s
            return out
        if isinstance(e, Or):
            out = set()
            for c in e.children:
                s = walk(c)
                if s is None:
                    return None
                out |= s
            return out
        return None  # Not (or unknown node): no restriction

    return walk(expr)


def _prune_files_by_bucket(files: list, cand: "set[int] | None") -> list:
    """Restrict a (path, size) or path list to the candidate bucket dirs.
    A file whose path lacks the ``bucket=N`` component is KEPT — the same
    conservative direction as _prune_files_by_lineage; dropping it would
    turn any future layout drift into silent row loss on point lookups."""
    if cand is None:
        return files

    def _path(f):
        return f[0] if isinstance(f, tuple) else f

    return [f for f in files
            if (b := bucket_id_of_path(_path(f))) is None or b in cand]


def _lineage_stats_table(out_dir: str, cols: "set[str]") -> "pa.Table | None":
    """Bucket-granularity zone-map stats reconstructed from lineage
    ``stats_json`` (see encode._bucket_stats_json): one synthetic stats row
    per (bucket, col) with block_id = bucket, typed exactly like the
    per-file stats table so ``_classify_blocks`` replays unchanged at
    bucket granularity. Only buckets whose stats cover EVERY column in
    ``cols`` (the predicate's leaves) are included — a bucket absent from
    the result must be KEPT by the caller (legacy pre-round-6 lineage has
    no stats_json). Reads lineage per-file with pyarrow driver-side (the
    same tiny-table argument as completed_buckets; at 2^16 buckets this is
    ~65k rows). None = no usable stats at all."""
    try:
        rows = _lineage_rows(out_dir)
    except FileNotFoundError:
        return None
    import json

    synth: dict[int, dict] = {}  # bucket -> per-col stats (last row wins)
    for r in rows:
        sj = r.get("stats_json")
        if r.get("status") != "done" or not sj:
            continue
        stats = json.loads(sj)
        if all(c in stats for c in cols):
            synth[int(r["bucket"])] = stats
    if not synth:
        return None
    out = {k: [] for k in ("block_id", "col", "n", "null_count", "min_int",
                           "max_int", "min_num", "max_num", "min_str",
                           "max_str")}
    for b, stats in synth.items():
        for c in cols:
            s = stats[c]
            out["block_id"].append(b)
            out["col"].append(c)
            out["n"].append(int(s["n"]))
            out["null_count"].append(int(s["null_count"]))
            for k in ("min_int", "max_int"):
                v = s.get(k)
                out[k].append(None if v is None else int(v))
            for k in ("min_num", "max_num"):
                v = s.get(k)
                out[k].append(None if v is None else float(v))
            for k in ("min_str", "max_str"):
                out[k].append(s.get(k))
    return pa.table({
        "block_id": pa.array(out["block_id"], pa.int64()),
        "col": pa.array(out["col"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "null_count": pa.array(out["null_count"], pa.int64()),
        "min_int": pa.array(out["min_int"], pa.int64()),
        "max_int": pa.array(out["max_int"], pa.int64()),
        "min_num": pa.array(out["min_num"], pa.float64()),
        "max_num": pa.array(out["max_num"], pa.float64()),
        "min_str": pa.array(out["min_str"], pa.string()),
        "max_str": pa.array(out["max_str"], pa.string()),
    })


def _prune_files_by_lineage(files: list, out_dir: str, expr,
                            logical: dict[str, str]) -> list:
    """Driver-side FILE-list pruning from the per-bucket min/max that
    encode folds into every lineage row — the manifest-level analog of the
    in-task zone-map prune: buckets the bucket-granularity classifier rules
    out are dropped before any task is scheduled, so a narrow ts-range scan
    over a long-lived streaming/append table never opens the footers of
    off-range batch dirs. Buckets without stats (legacy lineage, non-done
    rows) are always kept; any lineage read failure degrades to no
    pruning. ``expr`` must be the NORMALIZED predicate tree (the same form
    the in-task classifier sees)."""
    if expr is None or not files:
        return files
    cols = {p.col for p in _expr_leaves(expr) if p.col in logical}
    if not cols:
        return files
    try:
        synth = _lineage_stats_table(out_dir, cols)
    except Exception:
        return files  # unreadable lineage: keep every file
    if synth is None:
        return files
    may, _ = _classify_blocks(synth, expr, logical)
    known = set(synth.column("block_id").to_pylist())

    def _keep(f) -> bool:
        p = f[0] if isinstance(f, tuple) else f
        b = bucket_id_of_path(p)
        return b is None or b not in known or b in may

    return [f for f in files if _keep(f)]


def _list_block_files(out_dir: str, spark: SparkSession | None = None,
                      ) -> list[tuple[str, int]]:
    """Bucket files under out_dir/blocks as (path, size) pairs. Posix paths
    list via glob; Hadoop FS URIs (hdfs://, s3a://, ...) list via the JVM
    FileSystem when a SparkSession is given (one globStatus — the same
    driver-side cost Spark's own file index pays), else via pyarrow.fs — so
    the pms_encoded data source (which has no JVM handle in its Python
    planner) reads remote tables too. A missing blocks directory raises
    instead of silently yielding an empty table."""
    import glob
    import os

    from .encode import _local_path, is_remote_path

    path = f"{out_dir}/blocks"
    if is_remote_path(path):
        if spark is not None:
            jvm = spark._jvm
            gp = jvm.org.apache.hadoop.fs.Path(f"{path}/bucket=*/*.parquet")
            fs = gp.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jvm.org.apache.hadoop.fs.Path(path)):
                raise FileNotFoundError(f"no blocks directory under {out_dir}")
            st = fs.globStatus(gp)
            if st is None:
                return []
            return sorted((str(s.getPath()), int(s.getLen())) for s in st)
        # no JVM (Python data source planner): list through pyarrow.fs and
        # re-prefix the scheme so workers can reopen the same URIs
        import re
        from urllib.parse import urlparse

        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(path)
        u = urlparse(path)
        # from_uri strips "scheme://" and, for host-carrying schemes
        # (hdfs://nn:port/...), moves the authority into the fs object —
        # reattach whatever prefix turns fs-relative paths back into URIs
        stripped = path[len(f"{u.scheme}://"):]
        prefix = f"{u.scheme}://{stripped[: len(stripped) - len(root)]}"
        try:
            infos = fs.get_file_info(pafs.FileSelector(root, recursive=True))
        except FileNotFoundError:
            raise FileNotFoundError(f"no blocks directory under {out_dir}")
        pat = re.compile(r"/bucket=\d+/[^/]+\.parquet$")
        return sorted(
            (f"{prefix}{i.path}", int(i.size))
            for i in infos
            if i.type == pafs.FileType.File and pat.search(i.path)
        )
    root = _local_path(path)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no blocks directory under {out_dir}")
    return sorted((p, os.path.getsize(p))
                  for p in glob.glob(f"{root}/bucket=*/*.parquet"))


#: Files larger than this split into row-group-range tasks (Spark's own
#: files.maxPartitionBytes default). Encoded blobs are already compressed,
#: so ~this many bytes per task is also ~the decode working set.
DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024


def _rg_ranges(path: str, split_bytes: int) -> list[tuple[int, int]]:
    """Row-group ranges [(lo, hi), ...] covering one oversized bucket file,
    each ~split_bytes of encoded data, cut ONLY where block_id changes (a
    (block, column) group spans consecutive row groups and must stay whole).
    Leading dictionary row groups (block_id = -1) belong to no range — every
    split task re-reads them. One footer read, driver-side, only for files
    already past the split threshold."""
    md = _open_parquet(path).metadata
    bid_idx = md.schema.to_arrow_schema().get_field_index("block_id")
    ranges: list[tuple[int, int]] = []
    lo = None
    acc = 0
    prev_bid = None
    for rg in range(md.num_row_groups):
        rgmd = md.row_group(rg)
        st = rgmd.column(bid_idx).statistics
        bid = int(st.min) if st is not None and st.has_min_max else None
        if bid is not None and bid < 0:
            continue  # dict row group: shared by all ranges
        if lo is None:
            lo = rg
        elif bid != prev_bid and acc >= split_bytes:
            ranges.append((lo, rg))
            lo, acc = rg, 0
        acc += rgmd.total_byte_size
        prev_bid = bid
    if lo is not None:
        ranges.append((lo, md.num_row_groups))
    return ranges or [(0, md.num_row_groups)]


def _scan_units(files: list[tuple[str, int]], split_bytes: int | None,
                ) -> list[tuple[str, int, int]]:
    """Task units (path, rg_lo, rg_hi) for a sized file list; (-1, -1) means
    the whole file. Files above split_bytes fan out into row-group ranges so
    one skewed giant bucket decodes with many tasks instead of one —
    a reader of someone else's table can't re-bucket, but it can split."""
    units: list[tuple[str, int, int]] = []
    for path, size in files:
        if split_bytes is not None and size > split_bytes:
            units.extend((path, lo, hi) for lo, hi in _rg_ranges(path, split_bytes))
        else:
            units.append((path, -1, -1))
    return units


def _pack_parallelism(n_units: int, total_bytes: int,
                      split_bytes: int | None, floor: int) -> int:
    """Task count for a unit list — Spark's own file-partition sizing logic:
    ~split_bytes of encoded data per task, floored at the cluster's default
    parallelism (small tables still use every core) and capped at one task
    per unit. Packing several small bucket files into one task saves the
    per-task dispatch + Python worker round-trip (measured 14% on a
    64-file / 32-core full scan)."""
    if split_bytes is None:
        return n_units
    by_bytes = -(-total_bytes // max(1, split_bytes))  # ceil
    return max(1, min(n_units, max(max(1, floor), by_bytes)))


def _scan_parallelism(spark: SparkSession, units: list, total_bytes: int,
                      split_bytes: int | None) -> int:
    return _pack_parallelism(len(units), total_bytes, split_bytes,
                             spark.sparkContext.defaultParallelism)


def _tasks_df(spark: SparkSession, units: list[tuple], nparts: int,
              schema: str = "path string, rg_lo int, rg_hi int") -> DataFrame:
    """Task-list DataFrame already split into ``nparts`` partitions
    DRIVER-side (sc.parallelize slices the list locally): the previous
    ``createDataFrame(...).repartition(n)`` ran a 1-task map stage plus a
    round-robin Exchange before any decode task could start — a whole extra
    stage of pure fixed cost per scan (guide §2.4: remove shuffles
    outright; the task list is metadata, there is nothing to shuffle).
    Shared by every task-fan-out surface (scan, scan_many, scan_count,
    pruning_report, the aggregate pushdowns, verify).

    When units are PACKED (nparts < len(units)) the list is round-robin
    interleaved first: parallelize slices CONTIGUOUSLY, and consecutive
    units are correlated — the row-group ranges of one split giant file
    are adjacent in the list, so contiguous slicing would hand one
    partition several ranges of the same skewed file to decode serially
    (exactly the skew the splitting exists to parallelize; the old
    round-robin Exchange spread them for free)."""
    nparts = max(1, nparts)
    if nparts < len(units):
        units = [u for p in range(nparts) for u in units[p::nparts]]
    rdd = spark.sparkContext.parallelize(units, nparts)
    return spark.createDataFrame(rdd, schema)


def scan(
    spark: SparkSession,
    out_dir: str,
    columns: list[str] | None = None,
    predicate: "Predicate | And | Or | Not | list | None" = None,
    split_bytes: int | None = DEFAULT_SPLIT_BYTES,
) -> DataFrame:
    """Decode the encoded table back to rows, with block pruning + pushed
    predicates. ``predicate`` is a single Predicate, a list (= conjunction,
    the historical API), or an arbitrary And/Or/Not tree (the reference's
    filter surface is an arbitrary Predicate<Statistics<?>>,
    SkippingColumnReaderImpl.java:430-437): zone-map survival intersects
    conjunctions and unions disjunctions; row masks evaluate the tree with
    Kleene three-valued logic so NULL semantics match SQL exactly. Row order
    is not defined.

    Scale design: one task per bucket file, decoded in place with pyarrow —
    no Exchange ever touches a block blob (round 1 repartitioned every
    surviving blob across the cluster). Zone-map pruning runs INSIDE each
    task from a stats-only columnar read, so pruned blobs are never fetched
    from disk and the prune itself is distributed. Parallelism = number of
    buckets; at scale you raise EncodeConfig.buckets (same knob that sizes
    encode tasks), keeping #files >> cores — and files above ``split_bytes``
    additionally fan out into row-group-range tasks, so one skewed giant
    bucket (or a table someone else encoded with too few buckets) still
    decodes in parallel. ``split_bytes=None`` disables splitting.
    """
    meta = read_meta(spark, out_dir)
    logical: dict[str, str] = meta["logical"]
    from .encode import gdicts_from_json

    gdicts = gdicts_from_json(meta.get("gdicts", {}), logical)
    raw = _as_expr(predicate)
    expr = _normalize_expr(raw, logical)
    if columns is None:
        columns = list(logical)
    files = _prune_files_by_bucket(_list_block_files(out_dir, spark),
                                   _bucket_candidates(raw, meta))
    files = _prune_files_by_lineage(files, out_dir, expr, logical)
    units = _scan_units(files, split_bytes)
    out_schema = ", ".join(f"`{c}` {spark_type(logical[c])}" for c in columns)
    if not units:
        return spark.createDataFrame([], out_schema)
    nparts = _scan_parallelism(spark, units, sum(s for _, s in files), split_bytes)
    tasks = _tasks_df(spark, units, nparts)
    return tasks.mapInArrow(
        partial(_decode_tasks, logical, list(columns), expr, gdicts), out_schema
    )



def _dirs_and_metas(spark: SparkSession, out_dir):
    """Normalize a str-or-list table argument into (dirs, metas, logical)
    with the shared schema checked — the common preamble of every
    multi-directory surface (lookup, scan_many, the aggregate pushdowns)."""
    dirs = [out_dir] if isinstance(out_dir, str) else list(out_dir)
    if not dirs:
        raise ValueError("need at least one directory")
    metas = [read_meta(spark, d) for d in dirs]
    logical = metas[0]["logical"]
    for d, m in zip(dirs[1:], metas[1:]):
        if m["logical"] != logical:
            raise ValueError(f"schema mismatch: {d} has {m['logical']}, "
                             f"{dirs[0]} has {logical}")
    return dirs, metas, logical

def lookup(
    spark: SparkSession,
    out_dir: "str | list[str]",
    predicate: "Predicate | And | Or | Not | list",
    columns: list[str] | None = None,
    max_bytes: int = 64 << 20,
    max_files: int = 16,
) -> pa.Table:
    """Point-lookup fast path: when the two driver-side pruning layers
    (bucket-hash candidates + lineage min/max) narrow the file list to a
    handful of small files, decode them ON THE DRIVER with the same
    internal reader the scan tasks use and return a pyarrow Table — no
    Spark job at all. A ``url = 'x'`` get against a 2^16-bucket table is
    one footer + a few row groups: scheduling a distributed job for it
    costs ~100x the read (measured ~0.7 s job vs ~10 ms driver read at
    sf0.1). The metadata-only-read analog of Iceberg manifests / an
    HBase-style get on a warehouse layout.

    Falls back to the distributed ``scan`` (collected via Arrow) whenever
    the pruned file list is still large — ``max_bytes`` bounds driver
    memory/IO, ``max_files`` bounds footer round-trips — so callers can use
    it for ANY predicate without a scale trap: selective ones stay on the
    driver, broad ones run as jobs. Row order is not defined.

    ``out_dir`` may be a LIST of directories (a streaming table's batch
    dirs — the scan_many analog): each dir prunes independently, the
    bounds apply to the union, and a too-broad union falls back to ONE
    distributed scan_many job, never a per-dir job loop."""
    from .encode import gdicts_from_json

    dirs, metas, logical = _dirs_and_metas(spark, out_dir)
    raw = _as_expr(predicate)
    if raw is None:
        raise ValueError("lookup needs a predicate; use scan for full reads")
    expr = _normalize_expr(raw, logical)
    if columns is None:
        columns = list(logical)
    per_dir: list[list] = []
    for d, m in zip(dirs, metas):
        files = _prune_files_by_bucket(_list_block_files(d, spark),
                                       _bucket_candidates(raw, m))
        per_dir.append(_prune_files_by_lineage(files, d, expr, logical))
    schema = pa.schema([(c, _pa_type(logical[c])) for c in columns])
    n_files = sum(len(f) for f in per_dir)
    if n_files == 0:
        return schema.empty_table()
    if (n_files > max_files
            or sum(s for f in per_dir for _, s in f) > max_bytes):
        if len(dirs) == 1:
            return scan(spark, dirs[0], list(columns), predicate).toArrow()
        return scan_many(spark, dirs, list(columns), predicate).toArrow()
    batches = []
    for m, files in zip(metas, per_dir):
        gdicts = gdicts_from_json(m.get("gdicts", {}), logical)
        batches.extend(
            b for path, _ in files
            for b in _decode_file(path, logical, list(columns), expr, gdicts))
    if not batches:
        return schema.empty_table()
    return pa.Table.from_batches(batches).cast(schema)


def _count_file(path: str, logical: dict[str, str], expr, gdicts: dict) -> int:
    """COUNT(*) over one bucket file with a pushed predicate, reading as
    little as possible: blocks the zone map classifies as definite-all-match
    are counted FROM STATS ALONE (their rows never leave disk — the
    reference's count-only converter sink, SURVEY §2.5 Q7, taken to its
    logical end); definite-no-match blocks are skipped; only boundary blocks
    decode — and only their PREDICATE columns, never the payload."""
    expr = _as_expr(expr)
    f = _open_parquet(path)
    stats = f.read(columns=_STATS_COLS)
    if expr is None:
        bids = stats.column("block_id").to_pylist()
        ns = stats.column("n").to_pylist()
        cols = stats.column("col").to_pylist()
        anchor = next(iter(logical))
        return sum(n for c, b, n in zip(cols, bids, ns) if c == anchor and b >= 0)
    may, allm = _classify_blocks(stats, expr, logical)
    total = 0
    if allm:
        seen = set()
        bids = stats.column("block_id").to_pylist()
        ns = stats.column("n").to_pylist()
        for b, n in zip(bids, ns):
            if b in allm and b not in seen:
                seen.add(b)
                total += n
    boundary = may - allm
    if not boundary:
        return total
    # boundary blocks: decode ONLY the predicate columns and count the rows
    # the exact Kleene mask keeps
    pred_cols = list(dict.fromkeys(p.col for p in _expr_leaves(expr)))
    total += sum(
        b.num_rows
        for b in _decode_file(path, logical, pred_cols, expr, gdicts,
                              restrict_blocks=boundary)
    )
    return total


def _decode_tasks_multi(logical: dict[str, str], columns: list[str], expr,
                        gdicts_list: list[dict], it):
    """Multi-directory variant of _decode_tasks: each task row carries the
    directory index so the right global dictionaries overlay the file's
    bucket dictionaries."""
    for batch in it:
        paths = batch.column("path").to_pylist()
        dirs = batch.column("dir_id").to_pylist()
        los = batch.column("rg_lo").to_pylist()
        his = batch.column("rg_hi").to_pylist()
        for path, di, lo, hi in zip(paths, dirs, los, his):
            rng = None if lo < 0 else (lo, hi)
            yield from _decode_file(path, logical, columns, expr,
                                    gdicts_list[di], rg_range=rng)


def scan_many(
    spark: SparkSession,
    out_dirs: list[str],
    columns: list[str] | None = None,
    predicate: "Predicate | And | Or | Not | list | None" = None,
    split_bytes: int | None = DEFAULT_SPLIT_BYTES,
) -> DataFrame:
    """Scan MANY encoded directories as one table in ONE job: a single
    file-task list spanning every directory feeds one mapInArrow, so a
    thousand micro-batch directories plan one stage with one task per bucket
    file (round 2's scan_batches unioned per-directory scans in a Python
    loop — thousands-node plans and a driver planning stall). All
    directories must share the logical schema; per-directory global
    dictionaries are carried per task row."""
    from .encode import gdicts_from_json

    out_dirs, metas, logical = _dirs_and_metas(spark, out_dirs)
    gdicts_list = [gdicts_from_json(m.get("gdicts", {}), logical) for m in metas]
    raw = _as_expr(predicate)
    expr = _normalize_expr(raw, logical)
    if columns is None:
        columns = list(logical)
    units = []
    total_bytes = 0
    for i, d in enumerate(out_dirs):
        files = _prune_files_by_bucket(_list_block_files(d, spark),
                                       _bucket_candidates(raw, metas[i]))
        files = _prune_files_by_lineage(files, d, expr, logical)
        total_bytes += sum(s for _, s in files)
        units.extend((p, i, lo, hi)
                     for p, lo, hi in _scan_units(files, split_bytes))
    out_schema = ", ".join(f"`{c}` {spark_type(logical[c])}" for c in columns)
    if not units:
        return spark.createDataFrame([], out_schema)
    nparts = _scan_parallelism(spark, units, total_bytes, split_bytes)
    tasks = _tasks_df(spark, units, nparts,
                      "path string, dir_id int, rg_lo int, rg_hi int")
    return tasks.mapInArrow(
        partial(_decode_tasks_multi, logical, list(columns), expr, gdicts_list),
        out_schema,
    )


def scan_count(spark: SparkSession, out_dir: str, predicate=None,
               max_driver_files: int = 64) -> int:
    """COUNT(*) with a pushed predicate, reading the minimum possible:
    definite-all-match blocks (three-valued zone-map classification,
    incl. under Not/Or trees) are counted from statistics alone — their
    data never leaves disk; definite-no-match blocks are skipped; only
    boundary blocks decode, and only their predicate columns. The
    reference's count-only converter sink (SURVEY §2.5 Q7) taken to its
    logical end: a selective COUNT at 100 TB touches a few boundary
    blocks' predicate columns, not the table. When pruning leaves at most
    ``max_driver_files`` files the per-file counts run on the driver (the
    ``lookup`` rationale: a stats read is ~ms per file, a distributed job
    ~100x that)."""
    meta = read_meta(spark, out_dir)
    logical: dict[str, str] = meta["logical"]
    from .encode import gdicts_from_json

    gdicts = gdicts_from_json(meta.get("gdicts", {}), logical)
    raw = _as_expr(predicate)
    expr = _normalize_expr(raw, logical)
    files = _prune_files_by_bucket([p for p, _ in _list_block_files(out_dir, spark)],
                                   _bucket_candidates(raw, meta))
    files = _prune_files_by_lineage(files, out_dir, expr, logical)
    if not files:
        return 0
    if len(files) <= max_driver_files:
        return sum(_count_file(p, logical, expr, gdicts) for p in files)

    def count_tasks(it):
        for batch in it:
            for path in batch.column("path").to_pylist():
                yield pa.RecordBatch.from_pylist(
                    [{"c": _count_file(path, logical, expr, gdicts)}],
                    schema=pa.schema([("c", pa.int64())]),
                )

    tasks = _tasks_df(spark, [(p,) for p in files], len(files), "path string")
    rows = tasks.mapInArrow(count_tasks, "c long").agg(F.sum("c").alias("n")).collect()
    return int(rows[0]["n"] or 0)


def pruning_report(spark: SparkSession, out_dir: str, predicate) -> dict[str, int]:
    """How many blocks the zone map eliminated (page-skip observability,
    the reference's skipped-page accounting analog). Accepts the same
    predicate forms as scan(), and reports EXACTLY what the scan does:
    each task runs the scan's own ``_classify_blocks`` on its file's stats,
    so And/Or/Not all count the block sets the engine actually prunes
    (r4 verdict: the old Spark-SQL reimplementation kept every block under
    Not while the scan pruned via definite-match De Morgan).
    ``all_match_blocks`` additionally reports blocks whose every row
    definitely matches (the stats-only COUNT fast path)."""
    meta = read_meta(spark, out_dir)
    logical: dict[str, str] = meta["logical"]
    raw = _as_expr(predicate)
    expr = _normalize_expr(raw, logical)
    if expr is None:
        raise ValueError("pruning_report needs at least one predicate")
    all_files = [p for p, _ in _list_block_files(out_dir, spark)]
    cand_files = _prune_files_by_bucket(all_files, _bucket_candidates(raw, meta))
    files = _prune_files_by_lineage(cand_files, out_dir, expr, logical)
    # files the lineage min/max dropped never open, but their block counts
    # are already in their lineage rows — fold them into the block totals so
    # the report stays truthful about how much the engine skipped
    lineage_pruned_files = len(cand_files) - len(files)
    lineage_pruned_blocks = 0
    if lineage_pruned_files:
        # cached parse — _prune_files_by_lineage just read the same rows
        nb = {int(r["bucket"]): int(r["n_blocks"])
              for r in _lineage_rows(out_dir)
              if r.get("status") == "done"}
        dropped = set(cand_files) - set(files)
        lineage_pruned_blocks = sum(
            nb.get(b, 0) for p in dropped
            if (b := bucket_id_of_path(p)) is not None)
    if not files:
        return {"total_blocks": lineage_pruned_blocks, "kept_blocks": 0,
                "pruned_blocks": lineage_pruned_blocks,
                "all_match_blocks": 0, "total_files": len(all_files),
                "kept_files": 0,
                "lineage_pruned_files": lineage_pruned_files}

    def report_tasks(it):
        for batch in it:
            for path in batch.column("path").to_pylist():
                stats = _open_parquet(path).read(columns=_STATS_COLS)
                bids = {b for b in stats.column("block_id").to_pylist()
                        if b >= 0}
                may, allm = _classify_blocks(stats, expr, logical)
                yield pa.RecordBatch.from_pylist(
                    [{"total": len(bids), "kept": len(may),
                      "allm": len(allm)}],
                    schema=pa.schema([("total", pa.int64()),
                                      ("kept", pa.int64()),
                                      ("allm", pa.int64())]),
                )

    tasks = _tasks_df(spark, [(p,) for p in files], len(files), "path string")
    row = (tasks.mapInArrow(report_tasks, "total long, kept long, allm long")
           .agg(F.sum("total").alias("t"), F.sum("kept").alias("k"),
                F.sum("allm").alias("a")).collect()[0])
    total = int(row["t"] or 0) + lineage_pruned_blocks
    kept = int(row["k"] or 0)
    return {"total_blocks": total, "kept_blocks": kept,
            "pruned_blocks": total - kept,
            "all_match_blocks": int(row["a"] or 0),
            # file-level prunes: bucket-hash (equality/isin on the bucket
            # key) and lineage min/max — files whose stats rows were never
            # even opened
            "total_files": len(all_files), "kept_files": len(files),
            "lineage_pruned_files": lineage_pruned_files}
