"""Distributed table verification: re-decode every block and recompute its
canonical digest against the one stored at encode time.

The operational tool a 100 TB table needs: lineage carries per-bucket
``content_sha`` and every block row carries the SHA-256 of its canonical
dense serialization (FIXTURES.md invariant 1), but those digests sit NEXT
TO the data — they prove what the encoder produced, not what the storage
still holds. ``verify_table`` re-runs the decoders over every (block,
column) cell, recomputes the digests from the DECODED values, and compares
three ways:

1. block level: decoded values -> canonical SHA == stored ``sha256``
   (catches payload corruption AND any decoder regression);
2. bucket level: recomputed ``content_sha`` over the re-derived block
   digests == some lineage row for that bucket (catches missing/extra
   blocks, truncated files);
3. table level: every lineage ``done`` bucket has a bucket file and vice
   versa (catches lost/orphaned buckets).

Scale shape: one task per bucket file via the same mapInArrow pattern as
``scan_count`` — verification is embarrassingly parallel, no shuffle, and
each task returns a handful of summary rows. The reference's integrity
story is parquet's page CRCs; ours is end-to-end (decode included), which
is what actually guards a custom codec stack.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from pyspark.sql import SparkSession

from ..functions.arrow import canonical_sha, canonical_sha_lb, codec_type
from .decode import _list_block_files, _open_parquet
from .encode import read_meta


def _verify_file(path: str, logical: dict[str, str], gdicts: dict) -> dict:
    """Re-decode one bucket file; returns block counts + mismatched cells +
    the recomputed bucket content_sha."""
    from ..codecs import NARROW_INT, VAR_TYPES, decode_block, params_loads, rle
    from ..codecs import fsst as _fsst, plain as _plain, prefix as _prefix
    from ..functions.arrow import unpack_validity, vector_params
    from .decode import _DATA_COLS

    f = _open_parquet(path)
    cols = sorted(set(_DATA_COLS + ["sha256"]))
    bad: list[dict] = []
    parts: list[str] = []
    n_cells = 0
    # per-bucket dictionaries (block_id = -1 rows) overlay the global ones
    dicts = dict(gdicts)
    from ..codecs import dict_codec

    # stream ROW GROUP at a time (the writer emits one block-row per row
    # group): task memory is bounded by one block's blobs, not the bucket
    # file size — a multi-GB skewed bucket verifies in constant memory
    for rg in range(f.metadata.num_row_groups):
        tbl = f.read_row_group(rg, columns=cols)
        for i in range(tbl.num_rows):
            col = tbl.column("col")[i].as_py()
            bid = tbl.column("block_id")[i].as_py()
            if bid < 0:
                dicts[col] = dict_codec.load_dict(tbl.column("dict")[i].as_py())
                # dict rows participate in the bucket content_sha exactly as
                # _lineage_row includes every block-table row (encode.py:401);
                # their stored sha256 ("" — no canonical value digest) goes in
                # verbatim, else any bdict-column table fails bucket matching
                parts.append(f"{col}:{bid}:{tbl.column('sha256')[i].as_py()}")
                continue
            lt = logical[col]
            ct = codec_type(lt)
            codec = tbl.column("codec")[i].as_py()
            data = tbl.column("data")[i].as_py()
            n = tbl.column("n")[i].as_py()
            stored = tbl.column("sha256")[i].as_py()
            mask = unpack_validity(tbl.column("validity")[i].as_py(), n)
            n_cells += 1
            try:
                if codec in ("fsst", "plain", "prefix") and (
                    ct in VAR_TYPES or vector_params(lt)
                ):
                    lengths, blob = {
                        "fsst": _fsst.decode_lb,
                        "plain": _plain.decode_var_lb,
                        "prefix": _prefix.decode_lb,
                    }[codec](data)
                    got = canonical_sha_lb(lengths, blob, mask)
                elif codec in ("gdict", "bdict"):
                    ids = rle.decode(data).astype(np.int64)
                    vals = dicts[col][ids]
                    if ct in NARROW_INT:
                        vals = vals.astype(NARROW_INT[ct])
                    elif ct == "float32":
                        vals = vals.astype(np.float32)
                    got = canonical_sha(vals, mask, ct)
                else:
                    vals = decode_block(
                        data, tbl.column("dict")[i].as_py(), ct, codec,
                        params_loads(tbl.column("params")[i].as_py()),
                    )
                    got = canonical_sha(vals, mask, ct)
            except Exception as exc:  # decoder refused: that IS corruption here
                bad.append({"col": col, "block_id": bid,
                            "error": f"decode failed: {exc!r}"})
                continue
            if got != stored:
                bad.append({"col": col, "block_id": bid,
                            "error": "digest mismatch"})
            parts.append(f"{col}:{bid}:{got}")
    return {
        "path": path,
        "n_cells": n_cells,
        "bad": bad,
        "content_sha": hashlib.sha256(
            ",".join(sorted(parts)).encode()).hexdigest(),
    }


def verify_table(spark: SparkSession, out_dir: str,
                 buckets: "list[int] | None" = None,
                 snapshots: "str | list[str] | None" = None,
                 sample: "float | None" = None) -> dict:
    """Integrity check (see module docstring). Returns::

        {"ok": bool, "buckets": N, "cells": M,
         "corrupt": [{"bucket", "col", "block_id", "error"}, ...],
         "unlinked_buckets": [...],   # bucket file without a lineage match
         "missing_buckets": [...],    # done lineage without a bucket file
         "scope_buckets": K}          # buckets this invocation covered

    Scope controls — at 100 TB the operational pattern is "verify what
    changed" or "sample 1%", not re-decode the world on every patrol:

    - ``buckets``: only these bucket ids.
    - ``snapshots``: only buckets some ``done`` lineage row attributes to
      one of these snapshot ids (an explicit set, not "since X": lineage
      has no global snapshot ordering, and the caller — who named the
      snapshots — knows their sequence).
    - ``sample``: fraction (0, 1] of buckets, chosen DETERMINISTICALLY by
      bucket-id hash so repeated patrols at the same rate re-check the
      same buckets and N patrols at rate 1/N tile the table.

    Scopes compose by intersection. Missing-bucket detection stays exact
    within the scope (the scope is computed over lineage ∪ files, so a
    bucket whose file vanished is still in scope via its lineage row).
    """
    from .encode import gdicts_from_json

    meta = read_meta(spark, out_dir)
    logical: dict[str, str] = meta["logical"]
    gdicts = gdicts_from_json(meta.get("gdicts", {}), logical)
    files = [p for p, _ in _list_block_files(out_dir, spark)]

    from .decode import bucket_id_of_path

    # per-file pyarrow read (not spark.read.parquet over the dir): lineage
    # dirs can mix int32/int64 bucket widths across engine versions, which
    # breaks Spark's directory-level schema reconciliation — same tolerance
    # completed_buckets (encode.py:829) already has
    from ..sources.datasource import _read_parquet_rows

    lin_shas: dict[int, set] = {}
    lin_snaps: dict[int, set] = {}
    for r in _read_parquet_rows(f"{out_dir}/lineage"):
        if r.get("status") == "done":
            b = int(r["bucket"])
            lin_shas.setdefault(b, set()).add(r["content_sha"])
            lin_snaps.setdefault(b, set()).add(r.get("snapshot_id"))

    scope = ({b for p in files if (b := bucket_id_of_path(p)) is not None}
             | set(lin_shas))
    if buckets is not None:
        scope &= {int(b) for b in buckets}
    if snapshots is not None:
        want = {snapshots} if isinstance(snapshots, str) else set(snapshots)
        scope &= {b for b, ss in lin_snaps.items() if ss & want}
    if sample is not None:
        if not (0 < sample <= 1):
            raise ValueError(f"sample must be in (0, 1]: {sample}")
        from ..functions.xxh64 import hash_long

        scope = {b for b in scope
                 if hash_long(b) % 1_000_000 < int(sample * 1_000_000)}
    files = [p for p in files if bucket_id_of_path(p) in scope]
    lin_shas = {b: s for b, s in lin_shas.items() if b in scope}

    def tasks(it):
        for batch in it:
            for path in batch.column("path").to_pylist():
                r = _verify_file(path, logical, gdicts)
                yield pa.RecordBatch.from_pylist(
                    [{"path": r["path"], "n_cells": r["n_cells"],
                      "content_sha": r["content_sha"],
                      "bad_json": json.dumps(r["bad"])}],
                    schema=pa.schema([
                        ("path", pa.string()), ("n_cells", pa.int64()),
                        ("content_sha", pa.string()),
                        ("bad_json", pa.string()),
                    ]),
                )

    if files:
        from .decode import _tasks_df

        rows = (_tasks_df(spark, [(p,) for p in files], len(files),
                          "path string")
                .mapInArrow(tasks,
                            "path string, n_cells long, content_sha string, "
                            "bad_json string")
                .collect())
    else:
        rows = []

    corrupt: list[dict] = []
    unlinked: list[int] = []
    seen_buckets: set[int] = set()
    cells = 0
    for r in rows:
        bucket = bucket_id_of_path(r["path"])
        seen_buckets.add(bucket)
        cells += r["n_cells"]
        for b in json.loads(r["bad_json"]):
            corrupt.append({"bucket": bucket, **b})
        if r["content_sha"] not in lin_shas.get(bucket, set()):
            unlinked.append(bucket)
    missing = sorted(set(lin_shas) - seen_buckets)
    return {
        "ok": not corrupt and not unlinked and not missing,
        "buckets": len(seen_buckets),
        "cells": cells,
        "corrupt": corrupt,
        "unlinked_buckets": sorted(set(unlinked)),
        "missing_buckets": missing,
        "scope_buckets": len(scope),
    }


def repair_buckets(spark: SparkSession, df, cfg, buckets: "list[int]"):
    """Surgical repair: drop the named corrupt buckets (their files AND
    their lineage rows), then re-run the encode — the resume machinery
    (completed_buckets anti-join, encode.py) sees exactly those buckets as
    not-done and re-encodes ONLY them from source, byte-identical to the
    originals by the determinism invariant (same input + config + persisted
    plan/gdicts => same bytes, FIXTURES.md invariants 3-4).

    The closing half of the patrol loop: ``verify_table`` names a bucket →
    ``repair_buckets`` restores it → a re-verify returns ok with the SAME
    content_sha. ``df`` must be the table's source data (the engine stores
    encoded blocks, not a second copy to heal from); ``cfg`` the original
    EncodeConfig (same out_dir/snapshot_id/buckets/...)."""
    import pyarrow.parquet as pq

    from ..sources.datasource import _meta_files
    from .encode import _paths, _rm_tree, encode_table

    meta = read_meta(spark, cfg.out_dir)
    if meta["snapshot_id"] != cfg.snapshot_id:
        # encode_table treats a NEW snapshot id on an existing dir as a
        # rewrite and clears blocks+lineage — precisely not a repair
        raise ValueError(
            f"repair snapshot_id {cfg.snapshot_id!r} != table's "
            f"{meta['snapshot_id']!r}; pass the config of the run that "
            "wrote this directory"
        )
    bad = {int(b) for b in buckets}
    blocks_path, lineage_path, _ = _paths(cfg.out_dir)
    for b in sorted(bad):
        _rm_tree(spark, f"{blocks_path}/bucket={b}")
    # rewrite lineage files minus the victims (per-file pyarrow — tolerates
    # mixed-width legacy files the same way completed_buckets does).
    # Write-then-replace, never in place: a crash mid-overwrite of the
    # shared lineage file would corrupt the checkpoint rows of every
    # HEALTHY bucket too (the same reason _pa_write_dir stages through
    # .inprogress). pyarrow FS `move` gives the remote equivalent.
    for f in _meta_files(lineage_path):
        path, fs = f if isinstance(f, tuple) else (f, None)
        tbl = pq.read_table(path, filesystem=fs)
        keep = [i for i, v in enumerate(tbl.column("bucket").to_pylist())
                if int(v) not in bad]
        if len(keep) == tbl.num_rows:
            continue
        import os

        d, name = os.path.split(path)
        tmp = f"{d}/.{name}.inprogress"
        pq.write_table(tbl.take(keep), tmp, filesystem=fs)
        if fs is None:
            os.replace(tmp, path)
        else:
            fs.move(tmp, path)
    return encode_table(spark, df, cfg)
