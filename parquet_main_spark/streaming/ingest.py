"""Incremental (Structured Streaming) ingestion into the encoded format.

The reference is strictly batch (SURVEY.md §2.6) and the north rule asks for
resumable batch jobs — this module is the additive scale path for a
continuously-crawled corpus: new files land, each micro-batch is encoded
into its OWN batch directory ``out_root/batch=N`` via the ordinary
:func:`~parquet_main_spark.operators.encode.encode_table`, and readers union
the batch directories.

Exactly-once without new machinery: foreachBatch delivers at-least-once, but
``encode_table`` is already idempotent per (out_dir, snapshot_id) — a
replayed micro-batch resumes its batch directory and skips completed buckets
(the lineage checkpoint), so duplicates cannot land. The codec plan is
decided by the FIRST batch and pinned for all later ones (meta of batch 0),
keeping id spaces and layouts uniform across the stream; dictionaries are
bucket-local (bdict) per batch directory, so no cross-batch global state
exists to go stale.
"""

from __future__ import annotations

import os
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from ..operators.decode import Predicate, scan, scan_many
from ..operators.encode import EncodeConfig, _local_path, encode_table, read_meta


def _batch_dir(out_root: str, batch_id: int) -> str:
    return f"{out_root}/batch={batch_id}"


def list_batches(out_root: str) -> list[int]:
    root = _local_path(out_root)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("batch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _seen_keys_dir(out_root: str) -> str:
    return f"{out_root}/_seen_keys"


def batch_encoder(spark: SparkSession, out_root: str, cfg: EncodeConfig):
    """Shared foreachBatch encode core (used by encode_stream and
    rollup_stream): pins the codec plan from the FIRST batch — including
    across restarts, via batch-0's meta — and encodes each micro-batch into
    its own ``out_root/batch=N`` dir with bucket-local dictionaries."""
    state: dict[str, object] = {"plan": None}
    batches = list_batches(out_root)
    if batches:
        try:
            state["plan"] = read_meta(spark, _batch_dir(out_root, batches[0]))["plan"]
        except Exception:
            pass  # unreadable prior meta: first successful batch re-pins

    def encode_batch(batch_df: DataFrame, batch_id: int):
        bcfg = replace(
            cfg,
            out_dir=_batch_dir(out_root, batch_id),
            snapshot_id=f"{cfg.snapshot_id}-b{batch_id}",
            global_dict_max_card=0,  # batch dirs stay self-contained
        )
        res = encode_table(batch_df.sparkSession, batch_df, bcfg, plan=state["plan"])
        if state["plan"] is None:
            state["plan"] = res.plan
        return res

    return encode_batch


def run_stream(writer, available_now: bool):
    """Start a foreachBatch writer; with available_now, drain and block."""
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()


def encode_stream(spark: SparkSession, stream_df: DataFrame, out_root: str,
                  cfg: EncodeConfig, checkpoint_dir: str, available_now: bool = True,
                  dedup_keys: list[str] | None = None):
    """Start (and by default drain) a streaming encode.

    ``cfg.out_dir`` is ignored; each micro-batch writes
    ``out_root/batch=<id>``. With ``available_now`` the call blocks until all
    currently-available input is encoded (the batch-job-like trigger);
    otherwise the running query is returned for the caller to manage.

    ``dedup_keys``: CROSS-BATCH exact dedup for a continuously-crawled
    corpus — rows whose key(s) already landed in an earlier micro-batch are
    dropped before encoding (first occurrence wins; within a batch,
    dropDuplicates keeps one row per key). State is a compact parquet table
    of 128-bit key digests (TWO independent xxhash64 lanes — a single
    64-bit hash collides at birthday scale ~10^9 keys, exactly the corpus
    size this targets) under ``out_root/_seen_keys``, partitioned by batch:
    a broadcast-or-shuffle ANTI-JOIN per batch — no driver-side set, no
    growth limit beyond the key count itself. Exactly-once: the seen-keys
    partition for batch N is written AFTER batch N encodes, and a replayed
    batch anti-joins only the PRIOR batches' keys (its own partition is
    idempotently overwritten)."""
    encode_batch = batch_encoder(spark, out_root, cfg)

    def _keys(df: DataFrame):
        from pyspark.sql import functions as F

        # two independent 64-bit lanes => effectively 128-bit digests
        cols = [F.col(c) for c in dedup_keys]
        return (F.xxhash64(*cols).alias("k1"),
                F.xxhash64(F.lit("pms-dedup-lane2"), *cols).alias("k2"))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if dedup_keys:
            from pyspark.sql import functions as F
            from pyspark.errors import AnalysisException

            batch_df = batch_df.dropDuplicates(dedup_keys)
            seen_root = _seen_keys_dir(out_root)
            try:
                # batch=N partition dirs; exclude our own (replay idempotence)
                seen = (sess.read.parquet(seen_root)
                        .filter(F.col("batch") != batch_id).select("k1", "k2"))
            except AnalysisException:
                # path-not-found = genuine first batch; anything else must
                # SURFACE — silently skipping the anti-join would re-encode
                # every previously-seen key as a duplicate
                seen = None
            if seen is not None:
                k1, k2 = _keys(batch_df)
                batch_df = (
                    batch_df.withColumns({"k1": k1, "k2": k2})
                    .join(seen, ["k1", "k2"], "left_anti")
                    .drop("k1", "k2")
                )
        encode_batch(batch_df, batch_id)
        if dedup_keys:
            # persist this batch's keys AFTER its encode committed (replay
            # overwrites the same partition -> idempotent)
            (batch_df.select(*_keys(batch_df))
             .distinct()
             .write.mode("overwrite")
             .parquet(f"{_seen_keys_dir(out_root)}/batch={batch_id}"))

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    return run_stream(writer, available_now)


def scan_batches(spark: SparkSession, out_root: str,
                 columns: list[str] | None = None,
                 predicate: Predicate | list[Predicate] | None = None) -> DataFrame:
    """Scan every ingested batch directory as one table in ONE job (same
    pushdown and pruning per bucket file as :func:`scan`). A thousand
    micro-batch directories plan a single mapInArrow stage — round 2 unioned
    per-batch scans in a Python loop, which built thousand-node plans and
    stalled the driver at high batch counts."""
    batches = list_batches(out_root)
    if not batches:
        raise FileNotFoundError(f"no batch directories under {out_root}")
    return scan_many(spark, [_batch_dir(out_root, b) for b in batches],
                     columns=columns, predicate=predicate)


def compact_batches(spark: SparkSession, out_root: str, dest_dir: str,
                    cfg: EncodeConfig, plan: dict[str, str] | None = None):
    """Merge every batch directory into ONE encoded table at ``dest_dir`` —
    the antidote to micro-batch dir proliferation (thousands of small dirs =
    thousands of tiny bucket files per scan). One job reads all batches
    (scan_batches), one encode job writes the compacted table; idempotent:
    the snapshot id is derived from the exact batch set, so a re-run of the
    same compaction resumes/no-ops via the lineage checkpoint, and content
    is deterministic (same rows -> byte-identical buckets) regardless of
    which batch files they came from."""
    import hashlib

    batches = list_batches(out_root)
    if not batches:
        raise FileNotFoundError(f"no batch directories under {out_root}")
    sig = hashlib.sha256(",".join(map(str, batches)).encode()).hexdigest()[:16]
    if plan is None:
        # keep the stream's pinned plan so the compacted table encodes
        # identically to what a single big batch would have produced
        plan = read_meta(spark, _batch_dir(out_root, batches[0]))["plan"]
    ccfg = replace(cfg, out_dir=dest_dir, snapshot_id=f"compact-{sig}")
    df = scan_batches(spark, out_root)
    return encode_table(spark, df, ccfg, plan=plan)
