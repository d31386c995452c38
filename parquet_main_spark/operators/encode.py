"""Partition-parallel encode job: DataFrame -> encoded block tables.

The write path of the engine — the Spark-native re-expression of the
reference's encode lifecycle (SURVEY.md §3.1): stats pre-scan
(ParquetWriterHelper.java:60-100) becomes a sampled mapInArrow stats job;
the ThreadLocal EncContext decision channel (EncContext.java:30-43) becomes
an explicit broadcast plan; ColumnWriterV1's page flush + per-page stats
(ColumnWriterV1.java:89-159) become fixed-size blocks emitted by a
groupBy(bucket).applyInArrow encode UDF; footer extrameta persistence
(StringWriteSupport.java:111-122) becomes the lineage/checkpoint table.

Scale design: buckets are url-hash ranges (north rule), so the only shuffle
is the single hash-repartition by bucket; encode itself is embarrassingly
parallel per bucket AND single-pass — each task writes its bucket's parquet
file directly (deterministic content + atomic rename = idempotent under
retry/speculation) and returns only lineage rows, so no Spark write stage
re-shuffles encoded blobs and no second pass re-reads blocks for lineage.
Bucket files carry one block-row per row group with col/block_id statistics,
making every (block, column) cell an independently skippable chunk for the
scan side. Lineage rows let an interrupted run resume by anti-joining
completed buckets. At 10^12 docs you raise ``buckets`` (e.g. 2**16) so each
bucket fits an executor; nothing else changes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import partial
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codecs import APPLICABLE, INT_TYPES, encode_block, params_dumps
from ..codecs.bitpack import bit_width
from ..functions.arrow import (
    arrow_to_dense,
    canonical_sha,
    codec_type,
    logical_types,
    pack_validity,
)
from ..plans.selector import choose_codec, column_sample_stats

#: logical schema of the blocks table as `spark.read.parquet(<dir>/blocks)`
#: exposes it (the `bucket` column comes from the bucket=K directory; the
#: remaining columns live in the per-bucket parquet files the encode tasks
#: write directly — one row per row group, see _write_bucket_file)
BLOCKS_SCHEMA = (
    "bucket bigint, block_id int, col string, codec string, params string, "
    "n bigint, null_count bigint, validity binary, data binary, dict binary, "
    "min_int bigint, max_int bigint, min_num double, max_num double, "
    "min_str string, max_str string, raw_bytes bigint, enc_bytes bigint, sha256 string"
)

#: what each encode task yields: one lineage row per bucket it wrote (the
#: bucket parquet file itself is written by the task, so lineage needs no
#: second pass over the blocks)
LINEAGE_TASK_SCHEMA = (
    "bucket bigint, n_rows bigint, n_blocks bigint, raw_bytes bigint, "
    "enc_bytes bigint, codec_json string, content_sha string, stats_json string"
)

STATS_SCHEMA = "col string, stats string"


@dataclass
class EncodeConfig:
    out_dir: str
    bucket_key: str = "url"
    buckets: int = 32
    block_size: int = 65536
    order_by: list[str] | None = None  # intra-bucket deterministic sort keys
    snapshot_id: str = "snap-0"
    plan_override: dict[str, str] = field(default_factory=dict)
    # skew handling (north rule): when bucket_key is low-cardinality/skewed
    # (e.g. lang or host), salt > 1 spreads each hot key over `salt` buckets
    # using salt_col (a unique-ish column) for the intra-key split.
    salt: int = 1
    salt_col: str | None = None
    # overlap the stats job with the encode job's shuffle map stage: the map
    # side never needs the plan (tasks load plan/gdicts from the meta file,
    # which the driver writes the moment stats complete), so the two run
    # concurrently — at cluster scale the sample wave hides entirely inside
    # the (much longer) shuffle write. False restores the sequential
    # stats -> encode submission.
    overlap_stats: bool = True
    # global (external) dictionary: columns the selector sent to "dict" whose
    # exact cardinality is at most this get ONE table-wide sorted dictionary
    # (E5 analog) instead of per-block copies; 0 disables.
    global_dict_max_card: int = 4096


@dataclass
class EncodeResult:
    blocks_path: str
    lineage_path: str
    plan: dict[str, str]
    encoded_buckets: int
    resumed_buckets: int


# ---------------------------------------------------------------- stats pass

def _stats_fn(logical: dict[str, str], sorted_cols: frozenset[str],
              chosen: frozenset[int] | None, delta_guard_bits: int,
              uniq_cap: int,
              it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    # stratified sample: only the `chosen` partitions contribute (evenly
    # spread over the partition index space, so a time-partitioned corpus is
    # sampled across its whole span, not just the oldest slice); within a
    # chosen partition the first ~8192 rows are taken and the iterator is
    # abandoned so the rest is never decoded (cheap stats pass; the
    # reference pre-scans the whole input, ParquetWriterHelper.java:60-79 —
    # sampling is our scale move). Non-chosen tasks return without touching
    # their input.
    if chosen is not None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() not in chosen:
            return
    batches = []
    for batch in it:
        batches.append(batch)
        if sum(b.num_rows for b in batches) >= 8192:
            break
    if not batches:
        return
    tbl = pa.Table.from_batches(batches)
    if tbl.num_rows == 0:
        return
    rows_col, rows_js = [], []
    for col, lt in logical.items():
        if col not in tbl.column_names:
            continue
        vals, _ = arrow_to_dense(tbl.column(col), lt)
        # global-dict candidates ship their sample distincts with the stats
        # (one job instead of stats + a separate distinct agg); binary and
        # decimal key spaces never get table-wide dictionaries
        cap = (uniq_cap if codec_type(lt) != "binary"
               and not lt.startswith("decimal") else 0)
        st = column_sample_stats(vals, codec_type(lt), assume_sorted=col in sorted_cols,
                                 delta_guard_bits=delta_guard_bits, uniq_cap=cap)
        rows_col.append(col)
        rows_js.append(json.dumps(st))
    yield pa.RecordBatch.from_pydict({"col": rows_col, "stats": rows_js})


def _merge_stats(parts: list[dict]) -> dict:
    """Merge per-partition sample stats (weighted by sample size); union
    cardinality from the mergeable KMV sketches."""
    from ..plans.selector import kmv_estimate

    tot = sum(p["n"] for p in parts)
    if tot == 0:
        return parts[0]
    out = dict(parts[0])
    out["n"] = tot
    out["card"] = min(tot, kmv_estimate([p.get("kmv", []) for p in parts]))
    out["raw_bytes"] = sum(p.get("raw_bytes", 0) for p in parts)
    if any("uniq" in p for p in parts):
        # union of sample distincts; None (a partition over its cap) poisons
        # the union — the column stays on per-block dictionaries
        if any(p.get("uniq") is None for p in parts):
            out["uniq"] = None
        else:
            seen: dict = {}
            for p in parts:
                for v in p.get("uniq", []):
                    seen[v] = True
            out["uniq"] = list(seen)
    for k in ("avg_run", "sorted_frac", "fsst_ratio", "avg_len", "avg_uniq_len"):
        vals = [(p[k], p["n"]) for p in parts if k in p]
        if vals:
            out[k] = sum(v * w for v, w in vals) / sum(w for _, w in vals)
    if "avg_uniq_len" in out:
        out["dict_bytes"] = out["avg_uniq_len"] * out["card"]
    for k in ("span_bits", "delta_bits"):
        vals = [p[k] for p in parts if k in p]
        if vals:
            out[k] = max(vals)
    return out


def sample_plan(df: DataFrame, cfg: EncodeConfig) -> tuple[dict[str, str], dict[str, dict]]:
    """Sampled-statistics codec selection (north rule): one vectorized Arrow
    pass over a per-partition prefix sample, merged on the driver, ruled by
    the selector. Returns (plan, merged sample stats per column) — the stats
    gate downstream decisions (e.g. global-dict candidacy) without rescanning."""
    logical = logical_types(df.schema)
    # a CONSTANT number of partitions contributes to the sample: more samples
    # add no information, they add per-task overhead, and the per-task work
    # (fsst ratio measurement) is memory-bandwidth-bound, so wide fan-out
    # thrashes the shared bus (measured: 32 concurrent stats tasks 59s vs
    # 8 tasks 8.4s on the same input at 32 pinned cores). The contributing
    # partitions are EVENLY SPREAD over the partition index space with a
    # seeded offset (round 2 coalesced the head: on a time-partitioned crawl
    # the sample saw only the oldest slice and the selector could mispick);
    # non-chosen tasks no-op without consuming their input.
    nparts = df.rdd.getNumPartitions()
    sorted_cols = frozenset(cfg.order_by or [cfg.bucket_key])
    chosen: frozenset[int] | None = None
    if nparts > 8:
        rng = np.random.default_rng(0xC0FFEE)  # fixed seed: plans stay
        # deterministic for a given partition count (resume reuses the
        # persisted plan regardless)
        offset = int(rng.integers(0, nparts))
        chosen = frozenset((offset + (i * nparts) // 8) % nparts for i in range(8))
    stats_df = df.mapInArrow(
        partial(_stats_fn, logical, sorted_cols, chosen,
                bit_width(max(cfg.buckets - 1, 1)),
                cfg.global_dict_max_card), STATS_SCHEMA
    )
    by_col: dict[str, list[dict]] = {}
    for row in stats_df.collect():
        by_col.setdefault(row["col"], []).append(json.loads(row["stats"]))
    merged = {col: _merge_stats(parts) for col, parts in by_col.items()}
    plan = {}
    for col, lt in logical.items():
        if col in cfg.plan_override:
            plan[col] = cfg.plan_override[col]
        elif col in merged:
            plan[col] = choose_codec(merged[col])
        else:
            plan[col] = "plain"
    return plan, merged


# --------------------------------------------------------------- encode pass

def _encode_gdict(vals: np.ndarray, lt: str, gdict: np.ndarray):
    """Global (external) dictionary encode: ids are ranks in a table-wide
    sorted dictionary shared by every block (the ExternalDictionaryValuesWriter
    analog, ExternalDictionaryValuesWriter.java:20-93 — but instead of
    erroring on unseen keys, the caller falls back to a local dictionary)."""
    from ..codecs import rle
    from ..codecs.bitpack import bit_width

    if lt in INT_TYPES:
        v: np.ndarray = np.ascontiguousarray(vals, dtype=np.int64)
    elif lt in ("float32", "float64"):
        v = np.ascontiguousarray(vals, dtype=np.float64)
    else:
        v = vals
    ids = np.searchsorted(gdict, v)
    ids = np.minimum(ids, len(gdict) - 1)
    if len(v) and not (gdict[ids] == v).all():
        return None  # unseen key -> caller falls back
    return rle.encode(ids.astype(np.uint64), bit_width(len(gdict) - 1))


def _encode_with_fallback(vals: np.ndarray, lt: str, preferred: str, raw_bytes: int,
                          gdict: np.ndarray | None = None, forced: bool = False):
    """Try the planned codec; on error or non-compressing output walk the
    APPLICABLE chain (dictionary fallback-to-plain analog,
    DictionaryValuesWriter.java:119-142). ``forced`` = the column's codec was
    pinned via plan_override (the reference's forced per-column encoding,
    ParquetWriterHelper.java:129-293): use it even when it doesn't compress,
    and surface errors instead of silently switching."""
    if forced and preferred != "gdict":
        data, dict_blob, params = encode_block(vals, lt, preferred)
        enc = len(data) + (len(dict_blob) if dict_blob else 0)
        return preferred, data, dict_blob, params, enc
    if preferred == "bdict":
        # bucket-shared dictionary: same rank-id mechanics as gdict, but the
        # dictionary lives in this bucket's block_id=-1 row, not in meta
        if gdict is not None and len(vals):
            data = _encode_gdict(vals, lt, gdict)
            if data is not None:
                return "bdict", data, None, {}, len(data)
        preferred = "dict"
    if preferred == "gdict":
        if gdict is not None and len(vals):
            data = _encode_gdict(vals, lt, gdict)
            if data is not None:
                return "gdict", data, None, {}, len(data)
        preferred = "dict"
    chain = [preferred] + [c for c in APPLICABLE[lt] if c != preferred]
    last = None
    for codec in chain:
        try:
            data, dict_blob, params = encode_block(vals, lt, codec)
        except Exception:
            continue
        enc = len(data) + (len(dict_blob) if dict_blob else 0)
        last = (codec, data, dict_blob, params, enc)
        if codec == "plain" or enc < raw_bytes:
            return last
    if last is None:
        raise RuntimeError(f"no codec could encode type {lt}")
    return last


#: bytes of a binary bound / chars of a string bound kept in the zone map —
#: long values (html blobs, full documents) must not bloat the stats table
STAT_PREFIX_BYTES = 16
STAT_PREFIX_CHARS = 64


def _inc_bytes(b: bytes) -> bytes | None:
    """Smallest byte string > every string having prefix ``b`` (None if all
    0xFF — no finite bound). The parquet truncate-and-increment stats trick."""
    arr = bytearray(b)
    for i in reversed(range(len(arr))):
        if arr[i] != 0xFF:
            arr[i] += 1
            return bytes(arr[: i + 1])
    return None


def _block_stats(vals: np.ndarray, lt: str):
    """Typed per-block min/max (the per-page Statistics analog,
    ColumnWriterV1.java:113-139) -> (min_int, max_int, min_num, max_num, min_str, max_str).

    Conservative-by-construction bounds: a None bound means "unknown" and
    the zone-map classifier retains the block (unless all-null). None cases:
    float blocks containing NaN (NaN ordering differs between numpy/Spark/SQL,
    so no finite bounds are safe), over-long string max (truncation would
    understate it), binary max whose 16-byte prefix is all 0xFF.
    Binary bounds are hex-encoded (hex preserves byte order lexicographically)
    so they fit the string stats columns.
    """
    mi = ma = mn = mx = ms = xs = None
    if len(vals):
        if lt in INT_TYPES:
            mi, ma = int(vals.min()), int(vals.max())
        elif lt in ("float32", "float64"):
            if not np.isnan(vals).any():
                mn, mx = float(vals.min()), float(vals.max())
        elif lt == "bool":
            mi, ma = int(vals.min()), int(vals.max())
        elif lt in ("string", "binary"):
            ms, xs = _var_bounds(min(vals), max(vals), lt)
    return mi, ma, mn, mx, ms, xs


def _var_bounds(lo, hi, lt: str) -> tuple[str | None, str | None]:
    """Truncated conservative (min, max) bounds from exact var-len min/max."""
    if lt == "string":
        lo, hi = str(lo), str(hi)
        ms = lo if len(lo) <= STAT_PREFIX_CHARS else lo[:STAT_PREFIX_CHARS]
        xs = hi if len(hi) <= STAT_PREFIX_CHARS else None
        return ms, xs
    lo, hi = bytes(lo), bytes(hi)
    ms = lo[:STAT_PREFIX_BYTES].hex()
    if len(hi) <= STAT_PREFIX_BYTES:
        xs = hi.hex()
    else:
        bound = _inc_bytes(hi[:STAT_PREFIX_BYTES])
        xs = bound.hex() if bound is not None else None
    return ms, xs


def _write_bucket_file(blocks_path: str, bucket: int, tbl: pa.Table) -> None:
    """Write one bucket's block table as ONE parquet file with ONE ROW PER
    ROW GROUP — every (block, column) cell becomes an independently-skippable
    chunk, the moral equivalent of the reference's per-column-chunk reads
    (ParquetFileReader.java:709-719): a scan that needs only `lang` never
    touches the row groups holding `html` blobs. Parquet statistics are kept
    only for the routing columns (col, block_id); blob columns carry none.

    Idempotent under retry/speculation: content is deterministic and the file
    lands via write-to-temp + atomic rename (posix) or a direct last-writer-
    wins put (object stores); stray files from older layouts are removed."""
    import pyarrow.parquet as pq

    tbl = tbl.drop_columns(["bucket"])  # the bucket=K directory carries it
    final_name = "part-00000.parquet"
    kw = dict(compression="none", write_statistics=["col", "block_id"])
    if is_remote_path(blocks_path):
        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(f"{blocks_path}/bucket={bucket}")
        fs.create_dir(root, recursive=True)
        with pq.ParquetWriter(f"{root}/{final_name}", tbl.schema, filesystem=fs, **kw) as w:
            w.write_table(tbl, row_group_size=1)
        return
    import glob
    import os

    d = f"{_local_path(blocks_path)}/bucket={bucket}"
    os.makedirs(d, exist_ok=True)
    tmp = f"{d}/.{final_name}.inprogress"
    with pq.ParquetWriter(tmp, tbl.schema, **kw) as w:
        w.write_table(tbl, row_group_size=1)
    for stale in glob.glob(f"{d}/*.parquet"):
        if os.path.basename(stale) != final_name:
            os.remove(stale)  # files from an interrupted older-layout run
    os.replace(tmp, f"{d}/{final_name}")


#: lineage stats_json keys, in the block-stats column order they fold from
_BUCKET_STAT_KEYS = ("min_int", "max_int", "min_num", "max_num",
                     "min_str", "max_str")


def _bucket_stats_json(tbl: pa.Table) -> str:
    """Fold the per-block zone-map stats of one bucket into per-COLUMN
    bucket-level bounds for the lineage row: min of block mins, max of block
    maxes, summed n/null_count. Conservative-by-construction like the block
    stats themselves: an unknown (None) block bound — NaN floats, truncated
    string max — poisons the bucket bound to None (= keep on scan), and
    all-null blocks contribute counts but no bounds. scan() replays these
    rows through the block classifier at bucket granularity to drop whole
    FILES driver-side (the analog of Iceberg's manifest-level min/max
    pruning) — a narrow ts-range scan over a long-lived streaming table
    never even opens the footers of off-range batches."""
    bids = tbl.column("block_id").to_pylist()
    cols = tbl.column("col").to_pylist()
    ns = tbl.column("n").to_pylist()
    ncs = tbl.column("null_count").to_pylist()
    stat_vals = {k: tbl.column(k).to_pylist() for k in _BUCKET_STAT_KEYS}
    agg: dict[str, dict] = {}
    for i, (c, b) in enumerate(zip(cols, bids)):
        if b < 0:
            continue  # dictionary rows carry no zone-map stats
        a = agg.get(c)
        if a is None:
            a = agg[c] = {"n": 0, "null_count": 0}
        a["n"] += ns[i]
        a["null_count"] += ncs[i]
        if ncs[i] == ns[i]:
            continue  # all-null block: no bounds to fold
        for k in _BUCKET_STAT_KEYS:
            v = stat_vals[k][i]
            lo = k.startswith("min")
            if k in a:  # seen a non-all-null block before
                cur = a[k]
                if cur is None or v is None:
                    a[k] = None
                else:
                    a[k] = (min if lo else max)(cur, v)
            else:
                a[k] = v
    for a in agg.values():
        for k in _BUCKET_STAT_KEYS:
            a.setdefault(k, None)
    return json.dumps(agg, separators=(",", ":"), sort_keys=True)


def _lineage_row(anchor: str, bucket: int, tbl: pa.Table) -> dict:
    """Per-bucket lineage record computed from the block table the task just
    wrote (formulas mirror the previous Spark aggregation so content_sha
    stays comparable across resumed/uninterrupted runs)."""
    import hashlib

    cols = tbl.column("col").to_pylist()
    bids = tbl.column("block_id").to_pylist()
    ns = tbl.column("n").to_pylist()
    codecs = tbl.column("codec").to_pylist()
    shas = tbl.column("sha256").to_pylist()
    parts = sorted(f"{c}:{b}:{s}" for c, b, s in zip(cols, bids, shas))
    return {
        "stats_json": _bucket_stats_json(tbl),
        "bucket": bucket,
        "n_rows": sum(n for c, n in zip(cols, ns) if c == anchor),
        "n_blocks": len({b for b in bids if b >= 0}),
        "raw_bytes": int(sum(tbl.column("raw_bytes").to_pylist())),
        "enc_bytes": int(sum(tbl.column("enc_bytes").to_pylist())),
        "codec_json": json.dumps(
            [{"col": c, "codec": k} for c, k in sorted(set(zip(cols, codecs)))],
            separators=(",", ":"),
        ),
        "content_sha": hashlib.sha256(",".join(parts).encode()).hexdigest(),
    }


def _encode_partition(
    logical: dict[str, str],
    plan: dict[str, str],
    block_size: int,
    order_by: list[str],
    gdicts: dict[str, np.ndarray] | None,
    forced: frozenset[str],
    blocks_path: str,
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """mapInArrow partition encoder: hash-partitioning on _bucket keeps every
    bucket whole within one partition, and the JVM-side sortWithinPartitions
    (spillable Tungsten sort) delivers rows bucket-contiguous — so this
    STREAMS one bucket at a time, never materializing the whole partition
    (round 1 held list(it): GBs of html per task at corpus scale). Grouping
    in Arrow beats Spark's grouped-map path, which adds a per-group Arrow
    conversion — measured ~6s overhead on a no-op at 0.6 GB.

    Each bucket's parquet file is written HERE (single-pass encode: no
    shuffle of encoded blobs into a Spark write stage, no re-read to build
    lineage); the task yields only the tiny per-bucket lineage rows."""
    anchor = next(iter(logical))
    cur_bucket: int | None = None
    buf: list[pa.RecordBatch] = []

    def flush() -> dict | None:
        if cur_bucket is None or not buf:
            return None
        tbl = _encode_group(
            logical, plan, block_size, order_by, cur_bucket,
            pa.Table.from_batches(buf), gdicts, forced,
        )
        _write_bucket_file(blocks_path, cur_bucket, tbl)
        return _lineage_row(anchor, cur_bucket, tbl)

    lineage: list[dict] = []
    for batch in it:
        if batch.num_rows == 0:
            continue
        b = batch.column("_bucket").to_numpy()
        change = np.flatnonzero(b[1:] != b[:-1]) + 1
        bounds = np.concatenate(([0], change, [len(b)]))
        for k in range(len(bounds) - 1):
            s, e = int(bounds[k]), int(bounds[k + 1])
            bucket = int(b[s])
            if bucket != cur_bucket:
                row = flush()
                if row is not None:
                    lineage.append(row)
                buf = []
                cur_bucket = bucket
            buf.append(batch.slice(s, e - s))
    row = flush()
    if row is not None:
        lineage.append(row)
    if lineage:
        yield pa.RecordBatch.from_pylist(lineage, schema=pa.schema([
            ("bucket", pa.int64()), ("n_rows", pa.int64()), ("n_blocks", pa.int64()),
            ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64()),
            ("codec_json", pa.string()), ("content_sha", pa.string()),
            ("stats_json", pa.string()),
        ]))


def _await_meta(out_dir: str, snapshot_id: str, timeout_s: float = 300.0) -> dict:
    """Task-side wait for the driver's meta write (the overlapped-stats
    handshake): the encode job is submitted before the plan exists, and its
    REDUCE tasks — the only ones that need the plan — poll for the meta
    file carrying this run's ``snapshot_id``. The map stage (shuffle write)
    runs meanwhile, overlapping with the stats job. A read error or a stale
    snapshot's meta (mid-overwrite) counts as not-ready; the timeout turns
    a lost driver into a loud task failure instead of a silent hang."""
    import time as _time

    from ..sources.datasource import _read_parquet_rows

    _, _, meta_path = _paths(out_dir)
    deadline = _time.monotonic() + timeout_s
    while True:
        try:
            rows = _read_parquet_rows(meta_path)
        except Exception:
            rows = []
        if rows and rows[0].get("snapshot_id") == snapshot_id:
            d = rows[0]
            logical = json.loads(d["logical_json"])
            return {
                "logical": logical,
                "plan": json.loads(d["plan_json"]),
                "config": json.loads(d["config_json"]),
                "gdicts": gdicts_from_json(
                    json.loads(d.get("gdict_json") or "{}"), logical),
            }
        if _time.monotonic() > deadline:
            raise RuntimeError(
                f"encode task waited {timeout_s:.0f}s for meta of snapshot "
                f"{snapshot_id!r} at {meta_path} — the driver's stats pass "
                "likely died; re-run, or set EncodeConfig.overlap_stats="
                "False to submit stats and encode sequentially")
        _time.sleep(0.05)


def _encode_partition_meta(
    out_dir: str, blocks_path: str, snapshot_id: str,
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """_encode_partition variant for the overlapped-stats path: everything
    the captured-closure form receives up front (plan, gdicts, order_by,
    forced, block_size) is loaded from the meta file once it appears."""
    meta = _await_meta(out_dir, snapshot_id)
    c = meta["config"]
    yield from _encode_partition(
        meta["logical"], meta["plan"], c["block_size"], c["order_by"],
        meta["gdicts"], frozenset(c["forced"]), blocks_path, it)


def _encode_group(
    logical: dict[str, str],
    plan: dict[str, str],
    block_size: int,
    order_by: list[str],
    bucket: int,
    tbl: pa.Table,
    gdicts: dict[str, np.ndarray] | None = None,
    forced: frozenset[str] = frozenset(),
) -> pa.Table:
    from ..codecs import _DICT_KIND, FLOAT_TYPES
    from ..functions.arrow import vector_params, vector_to_binary

    # vector columns (array<float>) enter as Arrow lists; store them as their
    # raw element bytes riding the var-len BINARY codec family — ONE flatten
    # per bucket, then the whole encode path below sees a plain binary column
    vec_cols = [c for c in tbl.column_names
                if vector_params(logical.get(c, "")) and c != "_bucket"]
    if vec_cols:
        logical = dict(logical)
        for c in vec_cols:
            tbl = tbl.set_column(tbl.column_names.index(c), c,
                                 vector_to_binary(tbl.column(c), logical[c]))
            logical[c] = "binary"
    from ..codecs import dict_codec as _dc

    tbl = tbl.sort_by([(c, "ascending") for c in order_by])
    cols = [c for c in tbl.column_names if c != "_bucket"]
    n_rows = tbl.num_rows
    out: dict[str, list] = {k: [] for k in (
        "bucket block_id col codec params n null_count validity data dict "
        "min_int max_int min_num max_num min_str max_str raw_bytes enc_bytes sha256".split()
    )}

    # bucket-shared dictionary (the reference keeps ONE dict page per column
    # chunk, sectioned — OnePassOrderPreservingDictionaryValuesWriter.java:59-80):
    # columns the selector sent to local "dict" store their sorted dictionary
    # ONCE per bucket in a block_id=-1 row; every block carries only rank ids.
    # Round 1 re-stored the dictionary per block, inflating enc_bytes for
    # mid-cardinality columns. Forced-"dict" columns keep the per-block form
    # (that IS the forced codec).
    bucket_dicts: dict[str, np.ndarray] = {}
    bctx: dict[str, dict] = {}  # per-column bucket encode context: rank ids
    # for the WHOLE bucket (np.unique return_inverse), computed once — blocks
    # slice them instead of re-materializing values + searchsorted per block
    from ..codecs import VAR_TYPES as _VT, _NP_DTYPE, rle as _rle
    from ..codecs.bitpack import bit_width as _bw
    from ..codecs.strutil import arrow_to_lb as _a2lb

    for col in cols:
        if plan.get(col) != "dict" or col in forced:
            continue
        lt = logical[col]
        ct = codec_type(lt)
        arr_all = tbl.column(col)
        if isinstance(arr_all, pa.ChunkedArray):
            arr_all = arr_all.combine_chunks()
        vals_all, mask_all = arrow_to_dense(arr_all, lt)
        if len(vals_all) == 0:
            continue
        if ct in FLOAT_TYPES and np.isnan(np.asarray(vals_all, dtype=np.float64)).any():
            continue  # NaN has no rank; per-block dict handles it
        if ct in ("string", "binary"):
            conv = vals_all
        elif ct in FLOAT_TYPES:
            conv = np.ascontiguousarray(vals_all, dtype=np.float64)
        else:
            conv = np.ascontiguousarray(vals_all, dtype=np.int64)
        uniq, inverse = np.unique(conv, return_inverse=True)
        bucket_dicts[col] = uniq
        ctx: dict = {"ids": inverse.astype(np.int64), "uniq": uniq,
                     "mask": mask_all, "width": _bw(len(uniq) - 1)}
        if mask_all is not None:
            dc = np.zeros(len(mask_all) + 1, dtype=np.int64)
            np.cumsum(mask_all, out=dc[1:])
            ctx["dense_cum"] = dc
        if lt in _VT:
            # decimal128 (ct binary, object bytes) has no var-len Arrow
            # buffers — it takes the fixed path below via its 16-byte keys
            arr_nn = arr_all.drop_null() if arr_all.null_count else arr_all
            lengths_all, blob_all = _a2lb(arr_nn)
            off = np.zeros(len(lengths_all) + 1, dtype=np.int64)
            np.cumsum(lengths_all, out=off[1:])
            ctx.update(lengths=lengths_all, blob=blob_all, off=off)
        bctx[col] = ctx
        blob = _dc.pack_dict(uniq, _DICT_KIND[ct])
        out["bucket"].append(bucket)
        out["block_id"].append(-1)
        out["col"].append(col)
        out["codec"].append("bdict")
        out["params"].append(params_dumps({}))
        out["n"].append(0)
        out["null_count"].append(0)
        out["validity"].append(None)
        out["data"].append(b"")
        out["dict"].append(blob)
        for k in ("min_int", "max_int", "min_num", "max_num", "min_str", "max_str"):
            out[k].append(None)
        out["raw_bytes"].append(0)
        out["enc_bytes"].append(len(blob))
        out["sha256"].append("")

    from ..codecs import VAR_TYPES, fsst as _fsst, plain as _plain, prefix as _prefix
    from ..codecs.strutil import arrow_to_lb
    from ..functions.arrow import canonical_sha_lb

    for block_id, start in enumerate(range(0, n_rows, block_size)):
        chunk = tbl.slice(start, block_size)
        end = min(start + block_size, n_rows)
        for col in cols:
            lt = logical[col]

            if col in bctx:
                # bucket-dict column: slice the precomputed rank ids — no
                # per-block value materialization, no searchsorted
                c = bctx[col]
                ct = codec_type(lt)
                if c["mask"] is None:
                    mask = None
                    ds, de = start, end
                else:
                    mask = c["mask"][start:end]
                    ds, de = int(c["dense_cum"][start]), int(c["dense_cum"][end])
                ids_blk = c["ids"][ds:de]
                data = _rle.encode(ids_blk.astype(np.uint64), c["width"])
                mi = ma = mn = mx = ms = xs = None
                if len(ids_blk):
                    lo_v = c["uniq"][int(ids_blk.min())]
                    hi_v = c["uniq"][int(ids_blk.max())]
                    if ct in _VT:
                        ms, xs = _var_bounds(lo_v, hi_v, ct)
                    elif ct in FLOAT_TYPES:
                        mn, mx = float(lo_v), float(hi_v)
                    else:
                        mi, ma = int(lo_v), int(hi_v)
                if lt in _VT:
                    lens = c["lengths"][ds:de]
                    raw = int(lens.sum()) + 4 * len(lens)
                    blob_s = c["blob"][c["off"][ds] : c["off"][de]]
                    sha = canonical_sha_lb(lens, blob_s, mask)
                elif ct in _VT:
                    # keyed var-len without Arrow buffers (decimal128 keys)
                    vals_blk = c["uniq"][ids_blk]
                    raw = sum(len(x) for x in vals_blk) + 4 * len(vals_blk)
                    sha = canonical_sha(vals_blk, mask, ct)
                else:
                    vals_blk = c["uniq"][ids_blk].astype(_NP_DTYPE[ct], copy=False)
                    raw = int(vals_blk.nbytes)
                    sha = canonical_sha(vals_blk, mask, ct)
                out["bucket"].append(bucket)
                out["block_id"].append(block_id)
                out["col"].append(col)
                out["codec"].append("bdict")
                out["params"].append(params_dumps({}))
                out["n"].append(end - start)
                out["null_count"].append((end - start) - len(ids_blk))
                out["validity"].append(pack_validity(mask))
                out["data"].append(data)
                out["dict"].append(None)
                out["min_int"].append(mi)
                out["max_int"].append(ma)
                out["min_num"].append(mn)
                out["max_num"].append(mx)
                out["min_str"].append(ms)
                out["max_str"].append(xs)
                out["raw_bytes"].append(raw)
                out["enc_bytes"].append(len(data))
                out["sha256"].append(sha)
                continue

            arr = chunk.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            pref = plan.get(col, "plain")

            # var-len fast path: fsst/plain feed straight from the Arrow
            # (offsets, data) buffers — ZERO per-value Python objects for
            # the html/text columns that dominate the bytes (the object
            # round-trip was the encode UDF's hot spot)
            if lt in VAR_TYPES and pref in ("fsst", "plain", "prefix"):
                mask = np.asarray(arr.is_valid()) if arr.null_count else None
                arr_nn = arr.drop_null() if arr.null_count else arr
                lengths, blob = arrow_to_lb(arr_nn)
                raw = int(lengths.sum()) + 4 * len(lengths)
                try:
                    data = {"fsst": _fsst.encode_lb, "plain": _plain.encode_var_lb,
                            "prefix": _prefix.encode_lb}[pref](lengths, blob)
                except ValueError:
                    data = None  # e.g. prefix MAXLEN overflow -> generic chain
                enc = len(data) if data is not None else raw + 1
                if data is not None and (col in forced or pref == "plain" or enc < raw):
                    ms = xs = None
                    if len(lengths):
                        mm = pc.min_max(arr_nn)
                        ms, xs = _var_bounds(mm["min"].as_py(), mm["max"].as_py(), lt)
                    out["bucket"].append(bucket)
                    out["block_id"].append(block_id)
                    out["col"].append(col)
                    out["codec"].append(pref)
                    out["params"].append(params_dumps({}))
                    out["n"].append(chunk.num_rows)
                    out["null_count"].append(chunk.num_rows - len(lengths))
                    out["validity"].append(pack_validity(mask))
                    out["data"].append(data)
                    out["dict"].append(None)
                    out["min_int"].append(None)
                    out["max_int"].append(None)
                    out["min_num"].append(None)
                    out["max_num"].append(None)
                    out["min_str"].append(ms)
                    out["max_str"].append(xs)
                    out["raw_bytes"].append(raw)
                    out["enc_bytes"].append(enc)
                    out["sha256"].append(canonical_sha_lb(lengths, blob, mask))
                    continue
                # preferred codec didn't compress: rare — fall through to the
                # generic fallback chain on materialized values

            ct = codec_type(lt)
            vals, mask = arrow_to_dense(arr, lt)
            if lt in ("string", "binary"):
                nbytes = pc.sum(pc.binary_length(arr)).as_py() or 0
                raw = int(nbytes) + 4 * len(vals)
            elif ct in _VT:
                # keyed var-len (decimal128 16-byte keys): object bytes —
                # pointer nbytes would under-report raw ~2.5x and skew the
                # enc<raw acceptance toward rejecting real compression
                raw = int(sum(len(x) for x in vals)) + 4 * len(vals)
            else:
                raw = int(np.ascontiguousarray(vals).nbytes)
            bdict = bucket_dicts.get(col)
            codec, data, dict_blob, params, enc = _encode_with_fallback(
                vals, ct,
                "bdict" if bdict is not None else plan.get(col, "plain"), raw,
                gdict=bdict if bdict is not None else (gdicts or {}).get(col),
                forced=col in forced,
            )
            mi, ma, mn, mx, ms, xs = _block_stats(vals, ct)
            out["bucket"].append(bucket)
            out["block_id"].append(block_id)
            out["col"].append(col)
            out["codec"].append(codec)
            out["params"].append(params_dumps(params))
            out["n"].append(chunk.num_rows)
            out["null_count"].append(chunk.num_rows - len(vals))
            out["validity"].append(pack_validity(mask))
            out["data"].append(data)
            out["dict"].append(dict_blob)
            out["min_int"].append(mi)
            out["max_int"].append(ma)
            out["min_num"].append(mn)
            out["max_num"].append(mx)
            out["min_str"].append(ms)
            out["max_str"].append(xs)
            out["raw_bytes"].append(raw)
            out["enc_bytes"].append(enc)
            out["sha256"].append(canonical_sha(vals, mask, ct))
    return pa.table(
        out,
        schema=pa.schema(
            [
                # int64 bucket: appends via the DS writer advance ids by
                # pid-spread jumps, so long-lived tables outgrow int32
                ("bucket", pa.int64()),
                ("block_id", pa.int32()),
                ("col", pa.string()),
                ("codec", pa.string()),
                ("params", pa.string()),
                ("n", pa.int64()),
                ("null_count", pa.int64()),
                ("validity", pa.binary()),
                ("data", pa.binary()),
                ("dict", pa.binary()),
                ("min_int", pa.int64()),
                ("max_int", pa.int64()),
                ("min_num", pa.float64()),
                ("max_num", pa.float64()),
                ("min_str", pa.string()),
                ("max_str", pa.string()),
                ("raw_bytes", pa.int64()),
                ("enc_bytes", pa.int64()),
                ("sha256", pa.string()),
            ]
        ),
    )


# ------------------------------------------------------------------ lineage

def _paths(out_dir: str) -> tuple[str, str, str]:
    return f"{out_dir}/blocks", f"{out_dir}/lineage", f"{out_dir}/meta"


def _local_path(p: str) -> str:
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p


def is_remote_path(p: str) -> bool:
    return "://" in p and not p.startswith("file:")


def _rm_tree(spark: SparkSession, path: str) -> None:
    """Recursive delete that works for both posix paths and Hadoop FS URIs
    (hdfs://, s3a://, ...) — shutil alone would silently no-op on the
    latter, leaving the stale partitions it is supposed to clear."""
    if is_remote_path(path):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(p, True)
    else:
        import shutil

        shutil.rmtree(_local_path(path), ignore_errors=True)


def _pa_write_dir(tbl: pa.Table, dir_path: str, filename: str,
                  clear: bool = False) -> None:
    """Driver-side parquet write of a tiny table (meta / lineage): a Spark
    write job costs a scheduler round-trip + committer setup (~1-2 s each,
    measured) that never shrinks with executors — pure fixed cost against
    the N->4N scaling criterion. pyarrow writes the same layout Spark's
    reader consumes, for posix paths and FS URIs alike."""
    import pyarrow.parquet as pq

    if is_remote_path(dir_path):
        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(dir_path)
        if clear:
            fs.delete_dir_contents(root, missing_dir_ok=True)
        fs.create_dir(root, recursive=True)
        pq.write_table(tbl, f"{root}/{filename}", filesystem=fs)
        return
    import os
    import shutil

    root = _local_path(dir_path)
    if clear:
        shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    tmp = f"{root}/.{filename}.inprogress"
    pq.write_table(tbl, tmp)
    os.replace(tmp, f"{root}/{filename}")


def bucket_expr(bucket_key: str, buckets: int, salt: int = 1,
                salt_col: str | None = None):
    """THE bucket-assignment expression (JVM-side, whole-stage codegen):
    ``pmod(xxhash64(key), buckets)``, salted variant spreads each hot key
    over ``salt`` buckets via a second hash on ``salt_col``. Shared by
    encode_table, the pms_encoded writer's bucketed mode (callers compute
    it with this helper before ``df.write``), and — inverted through the
    pure-Python xxh64 port — the driver-side point-lookup file prune
    (decode._bucket_candidates), which is why there must be exactly one
    definition of it."""
    if salt > 1 and salt_col:
        e = F.pmod(
            F.xxhash64(F.col(bucket_key))
            + F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt)),
            F.lit(buckets),
        )
    else:
        e = F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(buckets))
    return e.cast("int")


def completed_buckets(spark: SparkSession, out_dir: str, snapshot_id: str) -> set[int]:
    """Buckets already done for ``snapshot_id`` — the resume anti-join set.

    Read per-FILE with pyarrow (driver-side, the lineage table is tiny), not
    as one Spark parquet read: lineage files append across runs, so a table
    written by an older engine version may mix column widths (bucket was
    int32 before round 5) — a whole-directory read would fail schema
    reconciliation and a blanket fallback to set() silently re-encoded
    every bucket. Per-file reads + int() tolerate any mix."""
    _, lineage_path, _ = _paths(out_dir)
    from ..sources.datasource import _read_parquet_rows

    try:
        rows = _read_parquet_rows(lineage_path)
    except FileNotFoundError:
        return set()
    return {
        int(r["bucket"]) for r in rows
        if r.get("snapshot_id") == snapshot_id and r.get("status") == "done"
    }


def _resolve_plan(df: DataFrame, cfg: EncodeConfig,
                  logical: dict[str, str], plan: dict[str, str] | None,
                  gdicts: dict[str, np.ndarray], forced: frozenset[str],
                  on_stats_start=None):
    """Resolve the codec plan + global dictionaries when no plan was given
    or resumed: run the sampled stats job and promote low-cardinality dict
    columns to a table-wide sorted dictionary (E5 analog). The dictionary
    is built from the STATS SAMPLE's distinct values (they ride back with
    the stats rows — zero extra jobs; r4 ran a separate collect_set
    aggregation, a second scan of the candidate columns plus a whole job of
    fixed cost against the N->4N scaling criterion). A value the sample
    missed is handled at encode time: _encode_with_fallback drops that
    block to a local dictionary, so correctness never depends on sample
    coverage, and for genuinely low-cardinality columns (the only gdict
    candidates) a ~64K-row stratified sample sees every value in practice.
    Candidacy stays KMV-gated so high-card columns never ship uniqs.
    ``on_stats_start`` (overlapped-stats handshake) fires just before the
    stats job is submitted."""
    if plan is not None:
        return plan, gdicts, forced
    if on_stats_start is not None:
        on_stats_start()
    plan, stats = sample_plan(df, cfg)
    if cfg.global_dict_max_card > 0:
        cands = [
            c for c, codec in plan.items()
            if codec == "dict" and codec_type(logical[c]) != "binary" and c not in forced
            and not logical[c].startswith("decimal")  # unscaled/keyed space is bdict's job
            and stats.get(c, {}).get("card", 1 << 62) <= 4 * cfg.global_dict_max_card
        ]
        for c in cands:
            vals = stats.get(c, {}).get("uniq")
            if not vals or len(vals) > cfg.global_dict_max_card:
                continue  # over budget / a partition over cap: per-block dict
            lt = logical[c]
            if lt in INT_TYPES:
                arr = np.array(vals, dtype=np.int64)
            elif lt in ("float32", "float64"):
                arr = np.array(vals, dtype=np.float64)
                if np.isnan(arr).any():
                    continue  # NaN has no sort rank; keep local dict
            else:
                arr = np.array(vals, dtype=object)
            gdicts[c] = np.sort(arr)
            plan[c] = "gdict"
    return plan, gdicts, forced


def _lineage_job_df(df: DataFrame, cfg: EncodeConfig, done: set[int],
                    task_fn) -> DataFrame:
    """The encode job's DataFrame: bucket-hash repartition (the single
    shuffle), bucket-contiguous sort, and the per-partition encode task."""
    bucketed = df.withColumn(
        "_bucket",
        bucket_expr(cfg.bucket_key, cfg.buckets, cfg.salt, cfg.salt_col))
    if done:
        bucketed = bucketed.filter(
            ~F.col("_bucket").isin(*[int(b) for b in done]))
    return (
        bucketed.repartition(cfg.buckets, "_bucket")
        .sortWithinPartitions("_bucket")
        .mapInArrow(task_fn, LINEAGE_TASK_SCHEMA)
    )


def encode_table(spark: SparkSession, df: DataFrame, cfg: EncodeConfig,
                 plan: dict[str, str] | None = None) -> EncodeResult:
    """Run (or resume) the encode job. Deterministic: same input + config
    -> byte-identical blocks and lineage (FIXTURES.md invariant 3)."""
    logical = logical_types(df.schema)
    if cfg.bucket_key not in logical:
        raise ValueError(f"bucket_key {cfg.bucket_key!r} not in schema")
    blocks_path, lineage_path, meta_path = _paths(out_dir := cfg.out_dir)

    prev_meta = None
    try:
        prev_meta = read_meta(spark, cfg.out_dir)
    except Exception:
        pass
    if prev_meta is not None and prev_meta["snapshot_id"] != cfg.snapshot_id:
        # reused out_dir, NEW snapshot: dynamic partition overwrite only
        # replaces buckets this run produces — stale bucket partitions from
        # the prior snapshot would otherwise survive and leak phantom rows
        # into lineage and scan(); drop them up front
        for p in (blocks_path, lineage_path):
            _rm_tree(spark, p)
        prev_meta = None

    gdicts: dict[str, np.ndarray] = {}
    forced = frozenset(cfg.plan_override)
    if plan is None and prev_meta is not None:
        # a resumed run must reuse the original plan AND global dictionaries
        # so its blocks are byte-identical to an uninterrupted run
        # (FIXTURES.md invariant 4)
        plan = prev_meta["plan"]
        gdicts = gdicts_from_json(prev_meta.get("gdicts", {}), logical)
        forced = frozenset(prev_meta["config"].get("forced", []))

    enc_thread = None
    enc_box: dict = {}
    done: set[int] = set()
    overlap = plan is None and cfg.overlap_stats
    if overlap:
        # Submit the encode job BEFORE the plan exists: its reduce tasks
        # wait for this run's meta (_await_meta) while the shuffle MAP
        # stage — which never needs the plan — overlaps with the stats job
        # below. At cluster scale the constant-size sample wave hides
        # entirely inside the (data-proportional) shuffle write; on the
        # bench it removes most of the stats pass from the critical path.
        # Ordering matters on a FIFO scheduler: the stats job must hold
        # task slots before the encode REDUCE stage can fill every slot
        # with meta-waiting tasks, so the worker thread defers submission
        # until the driver has entered the stats job (deadline tied to the
        # _await_meta timeout — see _run_encode).
        import threading
        import time as _time

        from pyspark import InheritableThread

        if not is_remote_path(blocks_path):
            import os

            os.makedirs(_local_path(blocks_path), exist_ok=True)
        done = completed_buckets(spark, out_dir, cfg.snapshot_id)
        lineage_df = _lineage_job_df(
            df, cfg, done,
            partial(_encode_partition_meta, out_dir, blocks_path,
                    cfg.snapshot_id))
        group = f"pms-encode-{cfg.snapshot_id}"
        stats_started = threading.Event()
        meta_written = threading.Event()
        aborted = threading.Event()
        sc = spark.sparkContext

        def _run_encode():
            # Submission waits until the stats job actually HOLDS task slots
            # (or the meta is already written): on a FIFO scheduler an
            # encode job submitted first would fill every slot with
            # meta-polling reduce tasks and starve the stats job until the
            # _await_meta timeout failed the run. The deadline is therefore
            # tied to that timeout (not a short grace period that could
            # expire during slow driver-side sample prep) — a dead stats
            # pass sets `aborted` long before it matters.
            deadline = _time.monotonic() + 240
            while (_time.monotonic() < deadline
                   and not meta_written.is_set()
                   and not aborted.is_set()
                   and not (stats_started.is_set()
                            and sc.statusTracker().getActiveJobsIds())):
                _time.sleep(0.01)
            if aborted.is_set():
                # stats died while we were still waiting: never submit — a
                # cancelJobGroup from the caller can only cancel jobs that
                # already RUN, so submitting here would leave an orphan job
                # whose reduce tasks poll _await_meta to their timeout
                return
            sc.setJobGroup(group, "pms encode (overlapped with stats)", True)
            try:
                enc_box["rows"] = lineage_df.collect()
            except BaseException as exc:  # re-raised on join in the caller
                enc_box["err"] = exc

        enc_thread = InheritableThread(target=_run_encode)
        enc_thread.start()

    order_by = cfg.order_by or [cfg.bucket_key]
    try:
        plan, gdicts, forced = _resolve_plan(
            df, cfg, logical, plan, gdicts, forced,
            stats_started.set if overlap else None)

        # persist the plan FIRST so an interrupted run resumes with the
        # same one (and, on the overlapped path, so the waiting encode
        # reduce tasks can proceed). Driver-side pyarrow write: a one-row
        # table through a Spark write job is pure fixed cost (scheduler +
        # committer), hostile to the N->4N scaling criterion.
        _pa_write_dir(
            pa.table({
                "snapshot_id": [cfg.snapshot_id],
                "logical_json": [json.dumps(logical)],
                "plan_json": [json.dumps(plan, sort_keys=True)],
                "config_json": [json.dumps({
                    "bucket_key": cfg.bucket_key,
                    "buckets": cfg.buckets,
                    "block_size": cfg.block_size,
                    "order_by": order_by,
                    "salt": cfg.salt,
                    "salt_col": cfg.salt_col,
                    "forced": sorted(forced),
                })],
                "gdict_json": [json.dumps(gdicts_to_json(gdicts), sort_keys=True)],
            }),
            meta_path, "part-00000.parquet", clear=True,
        )
    except BaseException:
        # a dead stats pass (or meta write) must not leave the overlapped
        # encode job's reduce tasks polling until their timeout. aborted
        # stops a still-waiting worker from submitting at all; for a job
        # already (or about to be) submitted, cancelJobGroup only reaches
        # RUNNING jobs — so keep cancelling until the thread exits (bounded)
        if enc_thread is not None:
            aborted.set()
            for _ in range(60):
                spark.sparkContext.cancelJobGroup(group)
                enc_thread.join(timeout=0.5)
                if not enc_thread.is_alive():
                    break
        raise
    if overlap:
        meta_written.set()

    if not is_remote_path(blocks_path):
        import os

        os.makedirs(_local_path(blocks_path), exist_ok=True)  # empty input => empty table

    # ONE job end to end: the encode tasks write their bucket parquet files
    # directly (atomic rename, deterministic content => idempotent under
    # retry/speculation) and return only per-bucket lineage rows, which the
    # driver appends to the checkpoint table. No Spark write stage touches an
    # encoded blob and no second pass re-reads the blocks for lineage.
    if enc_thread is not None:
        enc_thread.join()
        if "err" in enc_box:
            raise enc_box["err"]
        collected = enc_box["rows"]
    else:
        done = completed_buckets(spark, out_dir, cfg.snapshot_id)
        lineage_df = _lineage_job_df(
            df, cfg, done,
            partial(_encode_partition, logical, plan, cfg.block_size,
                    order_by, gdicts, forced, blocks_path))
        collected = lineage_df.collect()
    lineage_rows = [
        {**r.asDict(), "snapshot_id": cfg.snapshot_id, "status": "done"}
        for r in collected
    ]
    if lineage_rows:
        # append one file per run, driver-side (same fixed-cost argument as
        # the meta write above); the name is content-derived so a retried
        # driver appends idempotently instead of duplicating rows
        import hashlib

        bucket_ids = sorted(r["bucket"] for r in lineage_rows)
        tag = hashlib.sha1(
            f"{cfg.snapshot_id}:{bucket_ids}".encode()
        ).hexdigest()[:12]
        _pa_write_dir(
            pa.table({
                "bucket": pa.array([r["bucket"] for r in lineage_rows], pa.int64()),
                "n_rows": pa.array([r["n_rows"] for r in lineage_rows], pa.int64()),
                "n_blocks": pa.array([r["n_blocks"] for r in lineage_rows], pa.int64()),
                "raw_bytes": pa.array([r["raw_bytes"] for r in lineage_rows], pa.int64()),
                "enc_bytes": pa.array([r["enc_bytes"] for r in lineage_rows], pa.int64()),
                "codec_json": pa.array([r["codec_json"] for r in lineage_rows], pa.string()),
                "content_sha": pa.array([r["content_sha"] for r in lineage_rows], pa.string()),
                "stats_json": pa.array([r.get("stats_json") for r in lineage_rows], pa.string()),
                "snapshot_id": pa.array([cfg.snapshot_id] * len(lineage_rows), pa.string()),
                "status": pa.array(["done"] * len(lineage_rows), pa.string()),
            }),
            lineage_path, f"part-{tag}.parquet",
        )

    new_buckets = {r["bucket"] for r in lineage_rows}
    return EncodeResult(blocks_path, lineage_path, plan, len(new_buckets), len(done))


def rebucket(spark: SparkSession, src_dir: str, cfg: EncodeConfig,
             split_bytes: int | None = None) -> EncodeResult:
    """Re-encode an existing encoded table under a new bucketing config —
    the repair path for a table written with too few buckets or a skewed
    bucket key (e.g. by another team's writer). The source reads through
    scan(), whose sub-bucket split keeps even ONE giant bucket parallel
    (``split_bytes`` forwards to it), and the target is a fresh
    encode_table run: stats-sampled plan, global dicts, lineage — the full
    surface, not a file copy. src_dir and cfg.out_dir must differ."""
    from .decode import DEFAULT_SPLIT_BYTES, scan

    if src_dir.rstrip("/") == cfg.out_dir.rstrip("/"):
        raise ValueError("rebucket needs a fresh out_dir (src would be "
                         "clobbered mid-read)")
    sb = DEFAULT_SPLIT_BYTES if split_bytes is None else split_bytes
    return encode_table(spark, scan(spark, src_dir, split_bytes=sb), cfg)


def gdicts_to_json(gdicts: dict[str, np.ndarray]) -> dict[str, list]:
    return {col: arr.tolist() for col, arr in gdicts.items()}


def gdicts_from_json(d: dict[str, list], logical: dict[str, str]) -> dict[str, np.ndarray]:
    out = {}
    for col, vals in d.items():
        lt = logical.get(col, "string")
        if lt in INT_TYPES:
            out[col] = np.array(vals, dtype=np.int64)
        elif lt in ("float32", "float64"):
            out[col] = np.array(vals, dtype=np.float64)
        else:
            out[col] = np.array(vals, dtype=object)
    return out


def read_meta(spark: SparkSession, out_dir: str) -> dict:
    """Meta table read driver-side with pyarrow (one tiny file, local or
    FS-URI): the previous ``spark.read.parquet(...).collect()`` scheduled a
    whole Spark job — footer read, schema inference, one task — as pure
    fixed cost on EVERY scan/lookup/aggregate call (~0.2 s each on the
    bench, guide §5 "the driver should do almost no data work" cuts both
    ways: metadata THIS small belongs on the driver, not in a job). The
    ``spark`` argument stays for API compatibility; planning no longer
    needs it."""
    from ..sources.datasource import _read_meta

    return _read_meta(out_dir)
