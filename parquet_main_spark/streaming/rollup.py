"""Watermarked streaming window rollups encoded into the columnar format.

The hypertable-rollup analog for a continuously-ingested event stream: a
Structured Streaming query aggregates tumbling event-time windows, the
watermark finalizes windows once late data can no longer arrive, and each
micro-batch of FINALIZED windows is encoded into its own
``out_root/batch=N`` directory through the ordinary
:func:`~parquet_main_spark.operators.encode.encode_table` — so rollups get
the same zone maps, dictionaries, resume-idempotence and `scan_batches`
read path as raw ingests (streaming/ingest.py).

Scale shape: the windowed aggregation is Spark's own stateful operator
(partial aggregation map-side, state store keyed by (window, groups) —
no collect, no custom Python state); the encode stage adds one bucket
shuffle per micro-batch. Append output mode means each window is emitted
EXACTLY once, after the watermark passes its end — batch dirs never need
in-place updates, which is what makes the columnar sink viable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators.encode import EncodeConfig
from .ingest import batch_encoder, run_stream


def rollup_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    out_root: str,
    cfg: EncodeConfig,
    checkpoint_dir: str,
    *,
    ts_col: str,
    window_duration: str | None = None,
    watermark_delay: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    session_gap: str | None = None,
    available_now: bool = True,
):
    """Run (and by default drain) a watermarked event-time window rollup.

    Exactly one of ``window_duration`` (tumbling windows) or ``session_gap``
    (session windows: a session closes after ``gap`` of per-key inactivity;
    emitted ``window_end`` = last event + gap — Spark's native
    ``session_window`` stateful operator, no custom state code) must be set.

    ``aggs`` maps output column name -> aggregate Column (built from
    pyspark.sql.functions, e.g. ``{"n": F.count("*")}``). The encoded rollup
    table has columns ``window_start, window_end, *group_cols, *aggs`` —
    ``cfg.bucket_key`` must name one of them (window_start is the natural
    time-partitioned choice). Windows are appended only once final (append
    output mode + watermark), so replays of a micro-batch hit
    ``encode_table``'s idempotent resume exactly like raw ingestion."""
    if (window_duration is None) == (session_gap is None):
        raise ValueError("set exactly one of window_duration or session_gap")
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    win_expr = (F.session_window(F.col(ts_col), session_gap) if session_gap
                else F.window(F.col(ts_col), window_duration))
    win = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(win_expr.alias("window"), *group_cols)
        .agg(*agg_cols)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            *aggs.keys(),
        )
    )

    encode_batch = batch_encoder(spark, out_root, cfg)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # no window finalized this batch: nothing to encode
        encode_batch(batch_df, batch_id)

    writer = (
        win.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    return run_stream(writer, available_now)
