"""Python Data Source: transparent ``spark.read``/``df.write`` of
engine-encoded tables.

The reference's encoded files are readable by any stock parquet reader
(ParquetFileReader.java:703-776); this gives our block format the same
one-import ergonomics on the Spark side:

    from parquet_main_spark.sources.datasource import register
    register(spark)
    df = spark.read.format("pms_encoded").load(out_dir)
    df.write.format("pms_encoded").mode("overwrite").save(out_dir)

Catalyst integration: supported filters are CONSUMED by ``pushFilters``
(Spark 4.1 Python Data Source filter pushdown) and become engine
:class:`~parquet_main_spark.operators.decode.Predicate` objects, so the
zone-map prune + in-situ dictionary translation run inside each partition
read exactly as they do in ``scan()`` — a ``.filter("lang = 'en'")`` on the
DataFrame prunes encoded blocks before their blobs are fetched. One input
partition per bucket file (same parallelism story as ``scan()``).

Column pruning: pass ``.option("columns", "lang,n_chars")`` to restrict the
schema AND the physical read — unrequested columns' row groups are never
fetched (the writer lays out one block-row per row group, so each (block,
column) cell is an independently skippable chunk, the reference's
``readNextRowGroup(ColumnChunkMetaData[])`` analog,
ParquetFileReader.java:709-719). Until Spark exposes required-column
pushdown to Python data sources, a bare ``.select()`` without the option
still decodes every column; ``scan()`` always prunes from its ``columns=``
argument.

TODO(upstream): the Python Data Source API (SPIP: SPARK-44076) ships
``pushFilters`` in Spark 4.1 but no column-pruning hook; when a
``pruneColumns``-style method lands on ``DataSourceReader``, implement it
on :class:`EncodedTableReader` (one-line: intersect with ``self.columns``)
and retire the ``columns`` option.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualNullSafe,
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
    Not as DSNot,
    StringStartsWith,
    WriterCommitMessage,
)

FORMAT_NAME = "pms_encoded"


def _meta_files(dir_path: str) -> list:
    """Parquet files of a tiny driver-read dir (meta / lineage), local or
    remote. Posix paths glob; FS URIs (hdfs://, s3://, ...) list through
    pyarrow.fs — planning runs on the driver without a SparkSession, the
    same no-JVM reach as _list_block_files (decode.py). Returns plain paths
    for local dirs and (path, filesystem) pairs for remote ones."""
    import glob

    from ..operators.encode import _local_path, is_remote_path

    if is_remote_path(dir_path):
        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(dir_path)
        sel = pafs.FileSelector(root, allow_not_found=True)
        return sorted(
            ((i.path, fs) for i in fs.get_file_info(sel)
             if i.type == pafs.FileType.File and i.path.endswith(".parquet")),
            key=lambda t: t[0],
        )
    return sorted(glob.glob(f"{_local_path(dir_path)}/*.parquet"))


def _read_parquet_rows(dir_path: str) -> list[dict]:
    """All rows of the parquet files under one tiny dir, local or remote."""
    import pyarrow.parquet as pq

    rows: list[dict] = []
    for f in _meta_files(dir_path):
        if isinstance(f, tuple):
            rows.extend(pq.read_table(f[0], filesystem=f[1]).to_pylist())
        else:
            rows.extend(pq.read_table(f).to_pylist())
    return rows


def _read_meta(out_dir: str) -> dict:
    """Meta table via pyarrow (planning runs on the driver without needing a
    SparkSession; the meta dir is a single tiny parquet file). Local paths
    and FS URIs both work — the data source reads remote tables end-to-end
    (the reference reads through any Hadoop FS, ParquetFileReader.java:703)."""
    rows = _read_parquet_rows(f"{out_dir}/meta")
    if not rows:
        raise FileNotFoundError(f"no meta table under {out_dir}/meta")
    row = rows[0]
    return {
        "snapshot_id": row["snapshot_id"],
        "logical": json.loads(row["logical_json"]),
        "plan": json.loads(row["plan_json"]),
        "config": json.loads(row["config_json"]),
        "gdicts": json.loads(row.get("gdict_json") or "{}"),
    }


def _session_zone():
    """tzinfo of spark.sql.session.timeZone — shared with the scan path's
    predicate normalization (decode._session_zone). LookupError when it
    cannot be resolved — the caller then declines the pushdown instead of
    guessing."""
    from ..operators.decode import _session_zone as sz

    return sz()


def _filter_to_predicate(f: Filter, logical: dict[str, str], strict_null: bool = False):
    """Map a Catalyst filter to an engine predicate expression (None =
    unsupported, Spark keeps evaluating it post-scan). ``strict_null`` is set
    under a Not wrapper, where NULL-lenient simplifications (dropping NULL
    elements from In) would flip unknowns into matches."""
    from ..operators.decode import And, Not, Predicate

    if isinstance(f, DSNot):
        child = _filter_to_predicate(f.child, logical, strict_null=True)
        return None if child is None else Not(child)
    if isinstance(f, EqualNullSafe):
        attr = f.attribute
        col = attr[0] if isinstance(attr, (tuple, list)) else str(attr)
        if isinstance(attr, (tuple, list)) and len(attr) != 1:
            return None
        if col not in logical:
            return None
        if f.value is None:
            return Predicate(col, "isnull", None)
        # v <=> x  ==  (v = x AND v IS NOT NULL): known-false for NULL v, so
        # it stays exact under Not (plain "=" would leave NULLs unknown)
        eq = _filter_to_predicate(EqualTo(f.attribute, f.value), logical, strict_null)
        return None if eq is None else And([eq, Predicate(col, "notnull", None)])
    if isinstance(f, StringStartsWith):
        attr = f.attribute
        col = attr[0] if isinstance(attr, (tuple, list)) else str(attr)
        if isinstance(attr, (tuple, list)) and len(attr) != 1:
            return None
        if logical.get(col) != "string" or f.value is None:
            return None
        return Predicate(col, "startswith", str(f.value))

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
    if lt.startswith("vector(") and op not in ("isnull", "notnull"):
        return None  # Catalyst array literals aren't comparable keys here

    def conv(v):
        if lt.startswith("decimal64("):
            import decimal

            from ..functions.arrow import decimal_params

            _, s = decimal_params(lt)
            return int(decimal.Decimal(v).scaleb(s))
        if lt.startswith("decimal128("):
            import decimal

            from ..functions.arrow import dec128_key, decimal128_params

            _, s = decimal128_params(lt)
            return dec128_key(int(decimal.Decimal(v).scaleb(s)))
        if lt in ("timestamp", "timestamp_ntz"):
            import datetime

            if isinstance(v, datetime.datetime):
                if v.tzinfo is None:
                    # Spark hands naive datetimes rendered in the SESSION
                    # timezone. timestamp_ntz stores wall-clock micros, so
                    # treating the naive value as UTC yields exactly those;
                    # timestamp stores instant micros and must be localized
                    # with the session zone first.
                    if lt == "timestamp":
                        v = v.replace(tzinfo=_session_zone())
                    else:
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
    try:
        if op == "isin":
            if strict_null and any(v is None for v in f.value):
                # under NOT, IN's NULL element must stay NULL-producing:
                # NOT(2 IN (1, NULL)) is NULL (row dropped), but stripping
                # the NULL would yield TRUE — decline the pushdown instead
                return None
            # at top level NULL elements never match, so dropping them keeps
            # the pushed filter exact (and conv never sees None)
            return Predicate(col, "isin", [conv(v) for v in f.value if v is not None])
        if f.value is None:
            return None  # comparison to NULL matches nothing; don't consume
        return Predicate(col, op, conv(f.value))
    except LookupError:
        return None  # unresolvable session timezone: let Spark evaluate it


def _columns_option(options, logical: dict[str, str]) -> list[str]:
    """Parse the ``columns`` load option (comma-separated) — the column
    pruning channel until Spark exposes required-column pushdown to Python
    data sources. Unknown names fail at planning, not in an executor."""
    raw = options.get("columns")
    if not raw:
        return list(logical)
    cols = [c.strip() for c in str(raw).split(",") if c.strip()]
    unknown = [c for c in cols if c not in logical]
    if unknown:
        raise ValueError(
            f"columns option names unknown column(s) {unknown}; "
            f"table has {list(logical)}"
        )
    return cols


class EncodedTableReader(DataSourceReader):
    def __init__(self, out_dir: str, columns: list[str] | None = None,
                 split_bytes: int | None = None):
        from ..operators.encode import gdicts_from_json

        self.out_dir = out_dir
        meta = _read_meta(out_dir)
        self.logical: dict[str, str] = meta["logical"]
        self.config: dict = meta.get("config", {})
        self.columns = list(columns) if columns is not None else list(self.logical)
        self.split_bytes = split_bytes
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
        from ..operators.decode import (
            DEFAULT_SPLIT_BYTES, _as_expr, _bucket_candidates,
            _list_block_files, _pack_parallelism, _prune_files_by_bucket,
            _scan_units,
        )

        split = (self.split_bytes if self.split_bytes is not None
                 else DEFAULT_SPLIT_BYTES)
        # bucket-hash point-lookup pruning: pushed equality/isin on the
        # bucket key names the only bucket files worth planning (pure-Python
        # xxhash64 — no JVM needed, which this planner doesn't have)
        files = _prune_files_by_bucket(
            _list_block_files(self.out_dir),
            _bucket_candidates(_as_expr(self.preds),
                               {"config": self.config, "logical": self.logical}),
        )
        units = _scan_units(files, split)
        if not units:
            return [InputPartition(None)]
        # pack small units / split big ones exactly like scan(): the DS
        # planner runs on the driver, so the active session supplies the
        # parallelism floor; without one, fall back to unit-per-partition
        floor = 0
        try:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            if sess is not None:
                floor = sess.sparkContext.defaultParallelism
        except Exception:
            pass
        n = (_pack_parallelism(len(units), sum(s for _, s in files),
                               split, floor)
             if floor else len(units))
        groups = [units[i::n] for i in range(n)]
        return [InputPartition(tuple(g)) for g in groups if g]

    def read(self, partition: InputPartition):
        from ..operators.decode import _decode_file

        if partition.value is None:
            return
        from ..operators.decode import _as_expr

        for path, rg_lo, rg_hi in partition.value:
            # column pruning reaches the physical layer: _decode_file skips
            # the row groups of unrequested columns entirely (one block-row
            # per row group + col statistics), so selecting a narrow column
            # never reads the html/text blobs; oversized bucket files arrive
            # as row-group ranges (sub-bucket split) so a skewed bucket
            # still parallelizes
            yield from _decode_file(
                path, self.logical, self.columns, _as_expr(self.preds),
                self.gdicts, rg_range=None if rg_lo < 0 else (rg_lo, rg_hi),
            )


def _ready_batches(out_root: str) -> list[int]:
    """Batch dirs safe to consume: encode_table writes lineage LAST, so a
    batch is complete exactly when its lineage dir holds parquet files.
    Local dirs list via os; FS URIs via pyarrow.fs (same driver-side no-JVM
    planning path as _read_meta)."""
    import glob
    import os

    from ..operators.encode import _local_path, is_remote_path

    out = []
    if is_remote_path(out_root):
        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(out_root)
        sel = pafs.FileSelector(root, allow_not_found=True)
        names = [os.path.basename(i.path) for i in fs.get_file_info(sel)
                 if i.type == pafs.FileType.Directory]
        for name in names:
            if not name.startswith("batch="):
                continue
            if _meta_files(f"{out_root}/{name}/lineage"):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)
    lroot = _local_path(out_root)
    for name in os.listdir(lroot) if os.path.isdir(lroot) else []:
        if not name.startswith("batch="):
            continue
        b = int(name.split("=", 1)[1])
        if glob.glob(f"{lroot}/{name}/lineage/*.parquet"):
            out.append(b)
    return sorted(out)


class EncodedBatchesStreamReader(DataSourceStreamReader):
    """Streaming source over an ``encode_stream``/``rollup_stream`` output
    root: every COMPLETED ``batch=N`` directory becomes (part of) one
    micro-batch downstream, partitioned per bucket file exactly like the
    batch reader. Offset = {"next": first-unconsumed batch id}; batches are
    immutable once their lineage lands, so replay between committed offsets
    is deterministic (Spark's exactly-once contract for sources)."""

    def __init__(self, out_root: str, columns: list[str] | None = None):
        from ..operators.encode import gdicts_from_json

        self.out_root = out_root
        ready = _ready_batches(out_root)
        if not ready:
            raise ValueError(
                f"no completed batch= dirs under {out_root}; the streaming "
                "reader needs at least one encoded batch for its schema"
            )
        meta = _read_meta(f"{out_root}/batch={ready[0]}")
        self.logical: dict[str, str] = meta["logical"]
        self.columns = list(columns) if columns is not None else list(self.logical)
        self.gdicts = gdicts_from_json(meta.get("gdicts", {}), self.logical)

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        ready = _ready_batches(self.out_root)
        # consume only the ready PREFIX: a gap (batch 3 done, batch 2 still
        # writing) must not skip the laggard
        nxt = 0
        for b in ready:
            if b != nxt:
                break
            nxt += 1
        return {"next": nxt}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from ..operators.decode import _list_block_files

        parts = []
        for b in range(int(start["next"]), int(end["next"])):
            for p, _size in _list_block_files(f"{self.out_root}/batch={b}"):
                parts.append(InputPartition(p))
        return parts or [InputPartition(None)]

    def read(self, partition: InputPartition):
        from ..operators.decode import _decode_file

        if partition.value is None:
            return
        yield from _decode_file(
            partition.value, self.logical, self.columns, None, self.gdicts
        )

    def commit(self, end: dict) -> None:
        pass  # batch dirs are the durable log; nothing to acknowledge


class _WriteResult(WriterCommitMessage):
    """Per-task commit message: the lineage rows of the buckets this task
    wrote (tiny — the bucket parquet files themselves are written by the
    task, the reference-writer pattern shared with encode_table)."""

    def __init__(self, lineage: list[dict]):
        self.lineage = lineage


#: Max chunks one writer task may flush; bucket id = offset + pid * spread
#: + seq keeps ids collision-free across tasks. Each append advances the
#: offset by up to max(pid)*spread, so ids burn faster than buckets exist —
#: the bucket column is int64 everywhere (lineage + block rows), which
#: leaves ~2^51 appends of 4096 tasks before exhaustion.
_WRITER_SPREAD = 4096


class EncodedTableWriter(DataSourceArrowWriter):
    """``df.write.format("pms_encoded")`` — the write-path ergonomics of the
    reference's writer builder (ParquetWriterBuilder.java:38-107) on the
    stock Spark writer surface.

    Spark's Python data source writer hands each input partition to one
    task; there is no shuffle hook, so EACH PARTITION BECOMES ONE OR MORE
    BUCKETS (bucket = partition-derived id). Co-location is therefore the
    caller's move — ``df.repartition(n, key)`` before the write is the
    bucket_key analog — and codec auto-selection runs per chunk from the
    same sampled statistics + selector the encode job uses. For the full
    engine surface (global dictionaries, salting, resume-from-lineage) use
    ``encode_table``; this writer targets the drop-in
    ``spark.read``/``df.write`` round trip. Memory per task is bounded by
    ``bucket_rows`` (chunk flush threshold), not the partition size.

    Options: ``block_size`` (rows per block), ``bucket_rows`` (rows per
    bucket file chunk), ``order_by`` (comma-separated intra-bucket sort
    keys; defaults to the first column), ``snapshot_id``, ``plan`` (JSON
    ``{col: codec}`` forcing, the plan_override analog).

    HASH-BUCKETED MODE (round 6): pass ``bucket_col`` naming a precomputed
    int column built with :func:`operators.encode.bucket_expr` plus the
    ``bucket_key``/``buckets`` (and optional ``salt``/``salt_col``) that
    built it — the caller repartitions + sorts on that column JVM-side
    (the shuffle the Python writer protocol cannot express), the writer
    groups rows by its value, drops it from storage, and records
    ``hash_bucketed`` in meta so point lookups on ``bucket_key`` prune to
    one file, exactly like encode_table layouts::

        b = bucket_expr("url", 64)
        (df.withColumn("_b", b).repartition(64, "_b")
           .sortWithinPartitions("_b", "url")
           .write.format("pms_encoded").mode(...)
           .option("bucket_col", "_b").option("bucket_key", "url")
           .option("buckets", 64).save(path))

    Each task spot-checks one row per bucket against the pure-Python hash,
    so a bucket_col that was NOT built by bucket_expr fails fast instead
    of silently producing a table whose point lookups miss.

    RESUME MODE: ``resume=true`` makes a re-run of the same write
    idempotent — bucket ids are reallocated from COMMITTED lineage (not
    from leftover files), orphan bucket files of a killed run are swept at
    prepare time, and buckets already committed under this snapshot_id are
    skipped task-side (the foreachBatch at-least-once replay case)."""

    def __init__(self, path: str, schema, overwrite: bool, options):
        self._init_common(path, schema, options)
        self._prepare(overwrite)

    def _init_common(self, path: str, schema, options) -> None:
        from ..functions.arrow import logical_types

        self.path = path
        self.logical = logical_types(schema)
        self.block_size = int(options.get("block_size", 65536))
        self.bucket_rows = int(options.get("bucket_rows", 1 << 20))
        self.snapshot_id = options.get("snapshot_id", "write-0")
        self.resume = str(options.get("resume", "")).lower() == "true"
        self._done: set[int] = set()  # resume: committed buckets to skip
        self._prior_buckets: set[int] = set()  # all committed buckets
        # hash-bucketed mode: bucket_col is computed by encode.bucket_expr
        # from (bucket_key, buckets, salt, salt_col) and never stored
        self.bucket_col = options.get("bucket_col")
        self.bucket_key = options.get("bucket_key")
        self.buckets = int(options.get("buckets") or 0)
        self.salt = int(options.get("salt") or 1)
        self.salt_col = options.get("salt_col")
        if self.bucket_col is not None:
            if self.bucket_col not in self.logical:
                raise ValueError(f"bucket_col {self.bucket_col!r} not in schema")
            if not (self.bucket_key and self.buckets > 0):
                raise ValueError(
                    "bucket_col needs bucket_key and buckets options (the "
                    "inputs of the bucket_expr that computed it)")
            del self.logical[self.bucket_col]  # routing only, never stored
            if self.bucket_key not in self.logical:
                raise ValueError(f"bucket_key {self.bucket_key!r} not in schema")
            from ..functions.xxh64 import HASHABLE_KEY_TYPES

            if self.logical[self.bucket_key] not in HASHABLE_KEY_TYPES:
                # bucket_expr would compute fine JVM-side, but the task-side
                # spot check and every read-side point-lookup prune go
                # through the pure-Python port, which only covers the
                # verified type matrix — fail at plan time, not per task
                raise ValueError(
                    f"bucket_key {self.bucket_key!r} has type "
                    f"{self.logical[self.bucket_key]!r}; hash-bucketed "
                    f"writes support {sorted(HASHABLE_KEY_TYPES)}")
        ob = options.get("order_by")
        self.order_by = ([c.strip() for c in ob.split(",")] if ob
                         else [next(iter(self.logical))])
        for c in self.order_by:
            if c not in self.logical:
                raise ValueError(f"order_by column {c!r} not in schema")
        self.plan_override: dict[str, str] = json.loads(options.get("plan", "{}"))
        self.bucket_offset = 0
        # append state: the prior table's meta (commit merges it so meta
        # stays cumulative and gdicts survive — meta is the ONLY copy of
        # global dictionaries, losing them on append would leave gdict-coded
        # blocks undecodable); prior LINEAGE is read lazily at commit time
        self._prior_meta: dict | None = None
        self._gdicts: dict | None = None  # appends: prior table's global dicts

    # -- driver-side -------------------------------------------------------

    def _prepare(self, overwrite: bool) -> None:
        import os
        import shutil

        from ..operators.encode import _local_path, is_remote_path

        if is_remote_path(self.path):
            import pyarrow.fs as pafs

            fs, root = pafs.FileSystem.from_uri(self.path)
            info = fs.get_file_info(f"{root}/meta")
            exists = info.type != pafs.FileType.NotFound
            if exists and overwrite:
                fs.delete_dir_contents(root, missing_dir_ok=True)
                exists = False
            if exists:
                self._load_prior()
            fs.create_dir(f"{root}/blocks", recursive=True)
            if self.resume and not overwrite:
                self._apply_resume()
            return
        root = _local_path(self.path)
        exists = os.path.isdir(f"{root}/meta")
        if exists and overwrite:
            for sub in ("blocks", "lineage", "meta"):
                shutil.rmtree(f"{root}/{sub}", ignore_errors=True)
            exists = False
        os.makedirs(f"{root}/blocks", exist_ok=True)
        if exists:
            self._load_prior()
        if self.resume and not overwrite:
            self._apply_resume()

    def _load_prior(self) -> None:
        """Append path: capture the existing table's meta + lineage so
        commit() can merge instead of clobbering (meta is the only copy of
        the gdicts; config.buckets / the plan must stay cumulative), and
        load the gdicts themselves so appended chunks KEEP gdict-coding
        the table's global-dictionary columns (values outside a dictionary
        fall back per block, same as encode_table)."""
        from ..operators.encode import gdicts_from_json

        self._prior_meta = _read_meta(self.path)
        self._check_append(self._prior_meta)
        self._gdicts = gdicts_from_json(self._prior_meta.get("gdicts", {}),
                                        self.logical)
        self.bucket_offset = self._max_bucket() + 1

    def _check_append(self, meta: dict | None) -> None:
        if meta is None:
            return
        if meta["logical"] != self.logical:
            raise ValueError(
                f"append schema mismatch: table has {meta['logical']}, "
                f"write has {self.logical}"
            )
        cfg = meta.get("config") or {}
        if bool(cfg.get("hash_bucketed")) != (self.bucket_col is not None):
            raise ValueError(
                "append bucketing mismatch: table hash_bucketed="
                f"{bool(cfg.get('hash_bucketed'))}, write bucketed="
                f"{self.bucket_col is not None}")
        if self.bucket_col is not None:
            mine = (self.bucket_key, self.buckets, self.salt, self.salt_col)
            theirs = (cfg.get("bucket_key"), int(cfg.get("buckets") or 0),
                      int(cfg.get("salt") or 1), cfg.get("salt_col"))
            if mine != theirs:
                raise ValueError(
                    f"append bucketing mismatch: table uses {theirs}, "
                    f"write uses {mine} (bucket_key, buckets, salt, salt_col)")
            if not self.resume:
                # one file per hash bucket: any same-bucket rows would
                # CLOBBER committed data, and which buckets arrive is
                # unknowable until tasks run — so only the idempotent
                # replay (resume=true, same snapshot_id) is appendable
                raise ValueError(
                    "bucketed append requires resume=true (idempotent "
                    "replay of the same snapshot); new data needs a fresh "
                    "table/batch dir or encode_table")

    def _max_bucket(self) -> int:
        from ..operators.decode import _list_block_files, bucket_id_of_path

        try:
            files = _list_block_files(self.path)
        except FileNotFoundError:
            return -1
        ids = [b for p, _ in files
               if (b := bucket_id_of_path(p)) is not None]
        return max(ids, default=-1)

    def _apply_resume(self) -> None:
        """Make a re-run of the same write idempotent (the encode_table
        (out_dir, snapshot_id) resume contract on the writer surface):

        1. COMMITTED state is what lineage says, so bucket_offset comes
           from the max lineage bucket — leftover files of a killed run
           must not shift the retry's ids;
        2. bucket files with NO lineage row are exactly those leftovers
           (commit is atomic-last) — swept here so a changed input can't
           leave stale phantom rows behind;
        3. a snapshot_id that already has committed lineage rows committed
           ATOMICALLY (lineage lands in one file at commit), so in chunked
           mode the whole replayed write is a no-op — chunk ids are
           offset-relative and a shifted offset would defeat a per-bucket
           comparison; in hash-bucketed mode ids are content-derived, so
           the skip is exact per bucket (self._done)."""
        import shutil

        from ..operators.decode import _list_block_files, bucket_id_of_path
        from ..operators.encode import _local_path, is_remote_path

        try:
            rows = _read_parquet_rows(f"{self.path}/lineage")
        except FileNotFoundError:
            rows = []
        committed = {int(r["bucket"]) for r in rows if r.get("status") == "done"}
        self._prior_buckets = committed
        self._done = {int(r["bucket"]) for r in rows
                      if r.get("status") == "done"
                      and r.get("snapshot_id") == self.snapshot_id}
        try:
            files = _list_block_files(self.path)
        except FileNotFoundError:
            files = []
        remote = is_remote_path(self.path)
        if remote:
            import pyarrow.fs as pafs

            fs, _root = pafs.FileSystem.from_uri(self.path)
        for p, _sz in files:
            b = bucket_id_of_path(p)
            if b is None or b in committed:
                continue
            if remote:
                import os

                _, fpath = pafs.FileSystem.from_uri(p)
                try:
                    fs.delete_dir(os.path.dirname(fpath))
                except FileNotFoundError:
                    pass
            else:
                import os

                shutil.rmtree(os.path.dirname(_local_path(p)),
                              ignore_errors=True)
        self.bucket_offset = max(committed, default=-1) + 1

    # -- executor-side -----------------------------------------------------

    def _chunk_plan(self, tbl) -> dict[str, str]:
        """Sampled-stats codec selection for one chunk — the same
        column_sample_stats + choose_codec pair the encode job's stats pass
        uses, on this chunk's own leading sample (a writer task sees only
        its partition, so the plan is per-chunk by construction; the codec
        is self-describing per block row, so readers don't care)."""
        import numpy as np  # noqa: F401  (selector dependency)

        from ..functions.arrow import arrow_to_dense, codec_type
        from ..plans.selector import choose_codec, column_sample_stats

        sample = tbl.slice(0, 8192)
        plan: dict[str, str] = {}
        for col, lt in self.logical.items():
            if col in self.plan_override:
                plan[col] = self.plan_override[col]
                continue
            if self._gdicts and col in self._gdicts:
                # append to a gdict table: keep coding against the table's
                # global dictionary (per-block fallback covers new values)
                plan[col] = "gdict"
                continue
            vals, _ = arrow_to_dense(sample.column(col), lt)
            plan[col] = choose_codec(column_sample_stats(vals, codec_type(lt)))
        return plan

    def _encode_partition_chunks(self, iterator, blocks_path: str,
                                 bucket_offset: int) -> list[dict]:
        """Shared chunk loop for the batch and streaming writers: slice the
        incoming Arrow batches into bucket_rows-bounded chunks, encode each
        as one bucket file under blocks_path, return the lineage rows."""
        import pyarrow as pa

        from pyspark import TaskContext

        from ..operators.encode import (
            _encode_group, _lineage_row, _write_bucket_file,
        )

        pid = TaskContext.get().partitionId()
        anchor = next(iter(self.logical))
        forced = frozenset(self.plan_override)
        lineage: list[dict] = []
        buf: list = []
        rows = 0
        seq = 0

        def flush():
            nonlocal buf, rows, seq
            if not buf:
                return
            if seq >= _WRITER_SPREAD:
                raise RuntimeError(
                    f"partition {pid} exceeds {_WRITER_SPREAD} bucket chunks; "
                    "raise bucket_rows or repartition the input"
                )
            tbl = pa.Table.from_batches(buf)
            bucket = bucket_offset + pid * _WRITER_SPREAD + seq
            enc = _encode_group(self.logical, self._chunk_plan(tbl),
                                self.block_size, self.order_by, bucket, tbl,
                                self._gdicts, forced)
            _write_bucket_file(blocks_path, bucket, enc)
            lineage.append(_lineage_row(anchor, bucket, enc))
            buf, rows = [], 0
            seq += 1

        for batch in iterator:
            # slice at the chunk boundary so one oversized Arrow batch
            # still honors bucket_rows (Spark may deliver a whole partition
            # as a single batch)
            while batch.num_rows > 0:
                take = min(batch.num_rows, self.bucket_rows - rows)
                buf.append(batch.slice(0, take))
                rows += take
                batch = batch.slice(take)
                if rows >= self.bucket_rows:
                    flush()
        flush()
        return lineage

    def _encode_bucketed_partition(self, iterator, blocks_path: str) -> list[dict]:
        """Hash-bucketed write loop: rows arrive repartitioned + sorted on
        ``bucket_col`` (the caller's JVM-side shuffle), so each bucket is a
        contiguous run — the same stream-one-bucket-at-a-time shape as
        encode_table's _encode_partition. The routing column is dropped
        before encoding; one spot-check per bucket proves the column really
        is bucket_expr(bucket_key, buckets, ...) of this row's key, so a
        mislabeled column fails the write instead of poisoning every future
        point lookup on the table."""
        import numpy as np
        import pyarrow as pa

        from ..functions.xxh64 import bucket_of
        from ..operators.encode import (
            _encode_group, _lineage_row, _write_bucket_file,
        )

        anchor = next(iter(self.logical))
        forced = frozenset(self.plan_override)
        key_lt = self.logical[self.bucket_key]
        lineage: list[dict] = []
        closed: set[int] = set()
        buf: list = []
        cur: int | None = None

        def flush():
            nonlocal buf, cur
            if cur is None or not buf:
                return
            if cur in closed:
                raise RuntimeError(
                    f"bucket {cur} arrived non-contiguously; "
                    f"sortWithinPartitions({self.bucket_col!r}, ...) the "
                    "input before a bucketed write")
            closed.add(cur)
            if cur not in self._done:
                if cur in self._prior_buckets:
                    # resume under a NEW snapshot hit a bucket some prior
                    # snapshot owns — refuse BEFORE touching the file
                    raise RuntimeError(
                        f"bucket {cur} already committed by another "
                        "snapshot; bucketed writes cannot rewrite history "
                        "— use a fresh table/batch dir")
                tbl = pa.Table.from_batches(buf).drop_columns([self.bucket_col])
                # spot-check one NON-NULL key against the pure-Python hash
                # (xxhash64(NULL) is just the seed, which the port doesn't
                # model; the caller's sort puts NULLs first, so an all-null
                # or null-leading bucket is legal and skips the check)
                keys = tbl.column(self.bucket_key)
                key0 = None
                for v in keys.drop_null()[:1]:
                    key0 = v.as_py()
                if key0 is not None:
                    want = bucket_of(key0, key_lt, self.buckets,
                                     self.salt, self.salt_col)
                    if cur not in want:
                        raise ValueError(
                            f"bucket_col says {cur} but bucket_expr"
                            f"({self.bucket_key!r}, {self.buckets}) maps "
                            f"{key0!r} to {sorted(want)} — was the column "
                            "built with operators.encode.bucket_expr and "
                            "the same options passed here?")
                enc = _encode_group(self.logical, self._chunk_plan(tbl),
                                    self.block_size, self.order_by, cur, tbl,
                                    self._gdicts, forced)
                _write_bucket_file(blocks_path, cur, enc)
                lineage.append(_lineage_row(anchor, cur, enc))
            buf = []

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            b = batch.column(self.bucket_col).to_numpy()
            change = np.flatnonzero(b[1:] != b[:-1]) + 1
            bounds = np.concatenate(([0], change, [len(b)]))
            for k in range(len(bounds) - 1):
                s, e = int(bounds[k]), int(bounds[k + 1])
                bk = int(b[s])
                if bk != cur:
                    flush()
                    cur = bk
                buf.append(batch.slice(s, e - s))
        flush()
        return lineage

    def write(self, iterator):
        from ..operators.encode import _paths

        blocks_path, _, _ = _paths(self.path)
        if self.bucket_col is not None:
            return _WriteResult(
                self._encode_bucketed_partition(iterator, blocks_path))
        if self._done:
            # chunked-mode resume: this snapshot_id already committed
            # (atomically), so the replayed write is a whole-run no-op
            return _WriteResult([])
        return _WriteResult(
            self._encode_partition_chunks(iterator, blocks_path,
                                          self.bucket_offset)
        )

    # -- driver-side commit ------------------------------------------------

    def _write_meta_lineage(self, table_dir: str, rows: list[dict],
                            suffix: str) -> None:
        """Driver-side meta + lineage for one committed table dir (the
        batch writer's out_dir, or one batch=N dir of the stream writer).
        Lineage is written LAST — its presence is the readiness signal the
        streaming reader and _ready_batches key on."""
        import pyarrow as pa

        from ..operators.encode import _pa_write_dir

        # majority-vote plan across buckets (informational: blocks are
        # codec-self-describing; meta.plan mirrors encode_table's report).
        # Appends vote over the PRIOR lineage too, so meta reflects the
        # whole table, not just the latest write. The prior lineage is read
        # HERE (commit time, before this write's own lineage file lands) —
        # one dict per existing bucket is commit-only state that must not
        # ride the pickled writer into every executor task.
        prior_lineage: list[dict] = (
            _read_parquet_rows(f"{self.path}/lineage")
            if self._prior_meta is not None else []
        )
        votes: dict[str, dict[str, int]] = {}
        for r in prior_lineage + rows:
            for item in json.loads(r["codec_json"]):
                v = votes.setdefault(item["col"], {})
                v[item["codec"]] = v.get(item["codec"], 0) + 1
        plan = {c: max(v.items(), key=lambda kv: (kv[1], kv[0]))[0]
                for c, v in votes.items()}
        for c in self.logical:
            plan.setdefault(c, self.plan_override.get(c, "plain"))

        if self._prior_meta is not None:
            # cumulative config + CARRIED-FORWARD gdicts: meta is the only
            # copy of the global dictionaries — an append that dropped them
            # would leave the table's gdict-coded blocks undecodable
            n_buckets = len({r["bucket"] for r in prior_lineage}
                            | {r["bucket"] for r in rows})
            config = dict(self._prior_meta["config"])
            if not config.get("hash_bucketed"):
                # hash-bucketed tables keep buckets = the hash MODULUS;
                # chunked tables track the bucket-dir count
                config.update(buckets=n_buckets)
            config.update(writer="datasource")
            gdict_json = json.dumps(self._prior_meta["gdicts"])
        else:
            config = {
                "bucket_key": self.bucket_key or self.order_by[0],
                "buckets": self.buckets if self.bucket_col else len(rows),
                "block_size": self.block_size,
                "order_by": self.order_by,
                "salt": self.salt, "salt_col": self.salt_col,
                "forced": sorted(self.plan_override),
                "writer": "datasource",
                # bucket ids really are pmod(xxhash64(key), buckets) (task-
                # side spot-check enforced) => point lookups may hash-prune
                "hash_bucketed": self.bucket_col is not None,
            }
            gdict_json = json.dumps({})
        meta_tbl = pa.table({
            "snapshot_id": [self.snapshot_id],
            "logical_json": [json.dumps(self.logical)],
            "plan_json": [json.dumps(plan, sort_keys=True)],
            "config_json": [json.dumps(config)],
            "gdict_json": [gdict_json],
        })
        lin_tbl = pa.table({
            "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
            "n_blocks": pa.array([r["n_blocks"] for r in rows], pa.int64()),
            "raw_bytes": pa.array([r["raw_bytes"] for r in rows], pa.int64()),
            "enc_bytes": pa.array([r["enc_bytes"] for r in rows], pa.int64()),
            "codec_json": pa.array([r["codec_json"] for r in rows], pa.string()),
            "content_sha": pa.array([r["content_sha"] for r in rows], pa.string()),
            "stats_json": pa.array([r.get("stats_json") for r in rows], pa.string()),
            "snapshot_id": pa.array([self.snapshot_id] * len(rows), pa.string()),
            "status": pa.array(["done"] * len(rows), pa.string()),
        })
        # meta is overwrite-last (append refreshes buckets count), lineage
        # appends one file per write with a collision-free suffix
        _pa_write_dir(meta_tbl, f"{table_dir}/meta", "part-00000.parquet")
        _pa_write_dir(lin_tbl, f"{table_dir}/lineage", f"part-{suffix}.parquet")

    def commit(self, messages):
        rows = [r for m in messages if m is not None for r in m.lineage]
        if self.bucket_col is not None and self._prior_meta is not None:
            # bucketed append: deterministic ids collide with prior data's —
            # the write already clobbered those files, so fail loudly here
            # rather than commit a table whose history is silently lost
            # (resume=true skips committed buckets task-side and so never
            # produces an overlapping row)
            prior = {int(r["bucket"])
                     for r in _read_parquet_rows(f"{self.path}/lineage")
                     if r.get("status") == "done"}
            clash = sorted({int(r["bucket"]) for r in rows} & prior)
            if clash:
                raise RuntimeError(
                    f"bucketed append rewrote existing buckets {clash[:8]}"
                    f"{'...' if len(clash) > 8 else ''}; same-key re-writes "
                    "need resume=true (idempotent replay) or a fresh "
                    "table/batch dir")
        self._write_meta_lineage(self.path, rows,
                                 f"{self.snapshot_id}-{self.bucket_offset}")

    def abort(self, messages):
        """Cleanup of bucket files from completed tasks (failed tasks'
        partial files are invisible: _write_bucket_file lands via atomic
        rename). Remote tables clean up too — readers list bucket files,
        not lineage, so leftover buckets from an aborted append would
        surface as phantom rows and shift the next retry's bucket_offset."""
        import os
        import shutil

        from ..operators.encode import _local_path, is_remote_path

        if is_remote_path(self.path):
            import pyarrow.fs as pafs

            fs, root = pafs.FileSystem.from_uri(self.path)
            for m in messages:
                if m is None:
                    continue
                for r in m.lineage:
                    try:
                        fs.delete_dir(f"{root}/blocks/bucket={r['bucket']}")
                    except FileNotFoundError:
                        pass
            return
        root = _local_path(self.path)
        for m in messages:
            if m is None:
                continue
            for r in m.lineage:
                shutil.rmtree(f"{root}/blocks/bucket={r['bucket']}",
                              ignore_errors=True)
        if self.bucket_offset == 0 and os.path.isdir(f"{root}/blocks"):
            try:
                os.rmdir(f"{root}/blocks")  # only if now empty
            except OSError:
                pass


class _StreamWriteResult(WriterCommitMessage):
    """Per-task stream commit message: where the task staged its bucket
    files plus their lineage rows — commit() moves them into the batch dir
    once the micro-batch's tasks all succeed."""

    def __init__(self, staging: str, lineage: list[dict]):
        self.staging = staging
        self.lineage = lineage


class EncodedTableStreamWriter(EncodedTableWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("pms_encoded").start(out_root)`` — each
    micro-batch lands as a self-contained encoded table under
    ``out_root/batch=N``, the exact layout encode_stream produces, so
    scan_batches / compact_batches / the pms_encoded STREAM READER all
    consume it unchanged (write a stream in, read the same stream back out
    through one format name).

    Tasks cannot know the batch id (the Python stream-writer protocol only
    passes it to commit), so each task encodes its chunks into a unique
    staging dir and returns the location; commit(batchId) moves the staged
    bucket dirs into ``batch=N/blocks`` (pure renames on posix) and writes
    meta + lineage LAST — lineage presence is the readiness signal the
    stream reader keys on, so a half-moved batch is never consumed. A
    retried batch replaces the whole batch dir (idempotent); an aborted one
    deletes its staging dirs. Options are those of the batch writer."""

    def __init__(self, path: str, schema, options):
        self._init_common(path, schema, options)
        if self.bucket_col is not None:
            raise ValueError(
                "bucket_col is batch-only: each micro-batch dir is its own "
                "small table (use encode_stream/scan_batches semantics); "
                "hash-bucket the compacted table via compact_batches")

    def write(self, iterator):
        import uuid

        staging = f"{self.path}/_staging/{uuid.uuid4().hex}"
        lineage = self._encode_partition_chunks(iterator, staging, 0)
        return _StreamWriteResult(staging, lineage)

    def commit(self, messages, batchId: int):
        import glob
        import os
        import shutil

        from ..operators.encode import _local_path, is_remote_path

        batch_dir = f"{self.path}/batch={batchId}"
        rows: list[dict] = []
        if is_remote_path(self.path):
            import pyarrow.fs as pafs

            fs, broot = pafs.FileSystem.from_uri(batch_dir)
            fs.delete_dir_contents(broot, missing_dir_ok=True)
            fs.create_dir(f"{broot}/blocks", recursive=True)
            for m in messages:
                if m is None:
                    continue
                rows.extend(m.lineage)
                _, sroot = pafs.FileSystem.from_uri(m.staging)
                sel = pafs.FileSelector(sroot, recursive=True,
                                        allow_not_found=True)
                for info in fs.get_file_info(sel):
                    if info.type == pafs.FileType.File:
                        rel = info.path[len(sroot):].lstrip("/")
                        dst = f"{broot}/blocks/{rel}"
                        fs.create_dir(os.path.dirname(dst), recursive=True)
                        fs.move(info.path, dst)
                fs.delete_dir(sroot)
        else:
            lroot = _local_path(batch_dir)
            shutil.rmtree(lroot, ignore_errors=True)  # batch retry replaces
            os.makedirs(f"{lroot}/blocks", exist_ok=True)
            for m in messages:
                if m is None:
                    continue
                rows.extend(m.lineage)
                sroot = _local_path(m.staging)
                for p in glob.glob(f"{sroot}/bucket=*/*.parquet"):
                    b = os.path.basename(os.path.dirname(p))
                    os.makedirs(f"{lroot}/blocks/{b}", exist_ok=True)
                    os.replace(p, f"{lroot}/blocks/{b}/{os.path.basename(p)}")
                shutil.rmtree(sroot, ignore_errors=True)
        self._write_meta_lineage(batch_dir, rows, f"b{batchId}")

    def abort(self, messages, batchId: int):
        import shutil

        from ..operators.encode import _local_path, is_remote_path

        for m in messages:
            if m is None:
                continue
            if is_remote_path(self.path):
                import pyarrow.fs as pafs

                fs, sroot = pafs.FileSystem.from_uri(m.staging)
                try:
                    fs.delete_dir(sroot)
                except FileNotFoundError:
                    pass
            else:
                shutil.rmtree(_local_path(m.staging), ignore_errors=True)


class EncodedTableDataSource(DataSource):
    """``spark.read.format("pms_encoded").load(out_dir)`` — and
    ``spark.readStream.format("pms_encoded").load(out_root)`` over an
    ingest root of ``batch=N`` dirs (each completed batch dir becomes a
    micro-batch; schema/plan pinned by batch 0, the ingest invariant)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        from ..functions.arrow import spark_type

        path = self.options["path"]
        ready = _ready_batches(path)
        meta = _read_meta(f"{path}/batch={ready[0]}" if ready else path)
        cols = _columns_option(self.options, meta["logical"])
        return ", ".join(f"`{c}` {spark_type(meta['logical'][c])}" for c in cols)

    def reader(self, schema) -> EncodedTableReader:
        meta = _read_meta(self.options["path"])
        sb = self.options.get("split_bytes")
        return EncodedTableReader(
            self.options["path"], _columns_option(self.options, meta["logical"]),
            split_bytes=int(sb) if sb is not None else None,
        )

    def writer(self, schema, overwrite: bool) -> EncodedTableWriter:
        return EncodedTableWriter(self.options["path"], schema, overwrite,
                                  self.options)

    def streamWriter(self, schema, overwrite: bool) -> "EncodedTableStreamWriter":
        if overwrite:
            raise ValueError(
                "pms_encoded stream sink is append-only (batch=N dirs); "
                "complete/update output modes are not supported"
            )
        return EncodedTableStreamWriter(self.options["path"], schema,
                                        self.options)

    def streamReader(self, schema) -> EncodedBatchesStreamReader:
        path = self.options["path"]
        ready = _ready_batches(path)
        meta = _read_meta(f"{path}/batch={ready[0]}" if ready else path)
        return EncodedBatchesStreamReader(
            path, _columns_option(self.options, meta["logical"])
        )


def register(spark) -> None:
    # Python-data-source filter pushdown is off by default in Spark 4.1;
    # without it a reader implementing pushFilters is rejected at planning
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EncodedTableDataSource)
