"""Incremental ingestion: Structured Streaming micro-batches -> per-batch
encoded directories, exactly-once via encode_table's lineage resume, union
scan with predicate pushdown across batches."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from parquet_main_spark.operators.decode import Predicate
from parquet_main_spark.operators.encode import EncodeConfig
from parquet_main_spark.sources.webpages import webpages
from parquet_main_spark.streaming.ingest import encode_stream, list_batches, scan_batches


def _sorted(df):
    return df.toPandas().sort_values("url").reset_index(drop=True)


def test_streaming_ingest_two_waves(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out_root = str(tmp_path / "enc_root")
    ckpt = str(tmp_path / "ckpt")

    full = webpages(spark, 1200, partitions=4)
    wave1 = full.filter(F.col("url") < "https://host5")
    wave2 = full.filter(F.col("url") >= "https://host5")
    wave1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(full.schema).parquet(src)
    cfg = EncodeConfig(out_dir="ignored", buckets=4, block_size=128, snapshot_id="s")
    encode_stream(spark, stream, out_root, cfg, ckpt)
    first_batches = list_batches(out_root)
    assert first_batches, "first wave produced no batch dirs"
    assert scan_batches(spark, out_root, columns=["url"]).count() == wave1.count()

    # second wave of files -> new micro-batch(es), old ones untouched
    wave2.write.mode("append").parquet(src)
    encode_stream(spark, stream, out_root, cfg, ckpt)
    assert len(list_batches(out_root)) > len(first_batches)

    got = _sorted(scan_batches(spark, out_root, columns=["url", "lang", "text"]))
    want = _sorted(full.select("url", "lang", "text"))
    pd.testing.assert_frame_equal(got, want)

    # pushdown works per batch dir
    n = scan_batches(spark, out_root, columns=["url"],
                     predicate=Predicate("lang", "isin", ["de", "fr"])).count()
    assert n == full.filter("lang in ('de','fr')").count() > 0

    # draining again with NO new input is a no-op (exactly-once)
    encode_stream(spark, stream, out_root, cfg, ckpt)
    assert scan_batches(spark, out_root, columns=["url"]).count() == 1200


def test_scan_many_plans_one_job(spark, tmp_path):
    """scan_batches over many batch dirs builds ONE mapInArrow stage (a
    single task list), not a union tree of per-dir scans."""
    from parquet_main_spark.operators.encode import encode_table
    from parquet_main_spark.streaming.ingest import _batch_dir

    full = webpages(spark, 1000, partitions=4)
    out_root = str(tmp_path / "many")
    n_dirs = 12
    for b in range(n_dirs):
        part = full.filter(F.pmod(F.xxhash64("url"), F.lit(n_dirs)) == b)
        encode_table(spark, part, EncodeConfig(out_dir=_batch_dir(out_root, b),
                                               buckets=2, block_size=128,
                                               snapshot_id=f"s-b{b}",
                                               global_dict_max_card=0))
    df = scan_batches(spark, out_root, columns=["url", "lang"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan
    assert "Union" not in plan, plan
    assert df.count() == full.count()
    # predicate pushdown still applies per bucket file
    n = scan_batches(spark, out_root, columns=["url"],
                     predicate=Predicate("lang", "=", "en")).count()
    assert n == full.filter("lang = 'en'").count()


def test_compact_batches_roundtrip(spark, tmp_path):
    """Compaction merges batch dirs into one table with identical content
    (xxhash64 content digest) and is idempotent: re-running the same
    compaction resumes to a no-op via the lineage checkpoint."""
    from parquet_main_spark.operators.decode import scan
    from parquet_main_spark.operators.encode import encode_table
    from parquet_main_spark.streaming.ingest import _batch_dir, compact_batches

    full = webpages(spark, 900, partitions=4)
    out_root = str(tmp_path / "croot")
    for b in range(3):
        part = full.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == b)
        encode_table(spark, part, EncodeConfig(out_dir=_batch_dir(out_root, b),
                                               buckets=2, block_size=128,
                                               snapshot_id=f"s-b{b}",
                                               global_dict_max_card=0))
    dest = str(tmp_path / "compacted")
    cfg = EncodeConfig(out_dir="ignored", buckets=4, block_size=128,
                       snapshot_id="ignored", global_dict_max_card=0)
    res1 = compact_batches(spark, out_root, dest, cfg)
    assert res1.encoded_buckets == 4

    def digest(df):
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
        row = df.select(F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h")).agg(
            F.expr("bit_xor(h)").alias("s"), F.count("*").alias("n")).collect()[0]
        return row["s"], row["n"]

    assert digest(scan(spark, dest)) == digest(scan_batches(spark, out_root))
    # idempotent re-run: same batch set -> same snapshot id -> all resumed
    res2 = compact_batches(spark, out_root, dest, cfg)
    assert res2.encoded_buckets == 0 and res2.resumed_buckets == 4


def test_streaming_cross_batch_dedup(spark, tmp_path):
    """dedup_keys drops rows whose key already landed in an EARLIER
    micro-batch (first occurrence wins): wave 2 re-delivers half of wave 1's
    urls plus new ones; only the new ones are encoded."""
    src = str(tmp_path / "dupsrc")
    out_root = str(tmp_path / "dup_root")
    ckpt = str(tmp_path / "dup_ckpt")

    full = webpages(spark, 800, partitions=2)
    wave1 = full.filter(F.col("url") < "https://host5")
    dupes = wave1.limit(0).unionByName(wave1.filter(F.col("url") < "https://host3"))
    wave2 = full.filter(F.col("url") >= "https://host5").unionByName(dupes)

    cfg = EncodeConfig(out_dir="ignored", buckets=2, block_size=128, snapshot_id="d")
    from parquet_main_spark.streaming.ingest import encode_stream as es

    wave1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(full.schema).parquet(src)
    es(spark, stream, out_root, cfg, ckpt, dedup_keys=["url"])
    n1 = scan_batches(spark, out_root, columns=["url"]).count()
    assert n1 == wave1.count()

    wave2.write.mode("append").parquet(src)
    es(spark, stream, out_root, cfg, ckpt, dedup_keys=["url"])
    got = scan_batches(spark, out_root, columns=["url"])
    # every url exactly once, despite the re-delivered duplicates
    assert got.count() == full.count()
    assert got.distinct().count() == full.count()


def test_windowed_rollup_stream(spark, tmp_path):
    """Watermarked tumbling-window rollup -> encoded batch dirs: wave 1
    finalizes only windows older than (max_ts - watermark); wave 2 advances
    the watermark and emits the rest. Every emitted window's aggregates
    match the batch groupBy oracle, and no window is emitted twice."""
    from parquet_main_spark.streaming.rollup import rollup_stream

    src = str(tmp_path / "ev_src")
    out_root = str(tmp_path / "roll_root")
    ckpt = str(tmp_path / "roll_ckpt")

    # 600 events over 10 minutes, 2 event types
    ev = spark.sql(
        "SELECT timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts, "
        "CASE WHEN id % 3 = 0 THEN 'click' ELSE 'view' END AS etype, "
        "CAST(id % 7 AS DOUBLE) AS amount FROM range(600)"
    )
    wave1 = ev.filter("ts < timestamp'2024-03-01 00:06:00'")
    wave2 = ev.filter("ts >= timestamp'2024-03-01 00:06:00'")

    cfg = EncodeConfig(out_dir="ignored", bucket_key="etype", buckets=2,
                       block_size=64, snapshot_id="r")
    kw = dict(ts_col="ts", window_duration="1 minute", watermark_delay="2 minutes",
              group_cols=["etype"],
              aggs={"n": F.count("*"), "total": F.sum("amount")})

    wave1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    rollup_stream(spark, stream, out_root, cfg, ckpt, **kw)
    got1 = scan_batches(spark, out_root).toPandas()
    # wave-1 watermark = 00:05:59 - 2min -> windows ending <= 00:03:59 final
    assert set(got1["window_end"].map(lambda t: t.minute)) == {1, 2, 3}

    wave2.write.mode("append").parquet(src)
    rollup_stream(spark, stream, out_root, cfg, ckpt, **kw)
    got = scan_batches(spark, out_root).toPandas()

    # final watermark = 00:09:59 - 2min = 00:07:59: a window is final once
    # the watermark passes its END, so ends 00:01..00:07 are emitted and
    # [00:07:00, 00:08:00) is still open
    want = (
        ev.groupBy(F.window("ts", "1 minute"), "etype")
        .agg(F.count("*").alias("n"), F.sum("amount").alias("total"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"), "etype", "n", "total")
        .filter(F.col("window_end") < F.lit("2024-03-01 00:08:00").cast("timestamp"))
        .toPandas()
    )
    key = ["window_start", "etype"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)[got.columns.tolist()]
    pd.testing.assert_frame_equal(g, w)
    assert not g.duplicated(subset=key).any()  # exactly-once per window

    # drain again with NO new data: nothing re-emits, batch set unchanged
    from parquet_main_spark.streaming.ingest import list_batches

    before = list_batches(out_root)
    rollup_stream(spark, stream, out_root, cfg, ckpt, **kw)
    assert list_batches(out_root) == before
    assert scan_batches(spark, out_root).count() == len(g)


def test_threshold_crossings_stateful(spark, tmp_path):
    """Custom arbitrary-state operator (applyInPandasWithState): emit ONE
    row per user at their Nth event. Two time-ordered waves force the state
    to carry counts ACROSS micro-batches: users who reach N only after
    wave 2 must emit with the exact Nth event's timestamp."""
    from parquet_main_spark.streaming.state import threshold_crossings

    src = str(tmp_path / "tc_src")
    ckpt = str(tmp_path / "tc_ckpt")
    sink = str(tmp_path / "tc_sink")

    ev = spark.sql(
        "SELECT CAST(id % 37 AS BIGINT) AS user_id, "
        "timestamp'2024-05-01' + make_interval(0,0,0,0,0,0,id) AS ts, "
        "id AS event_id FROM range(300)"
    )
    wave1 = ev.filter("event_id < 150")
    wave2 = ev.filter("event_id >= 150")

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = threshold_crossings(stream, key_col="user_id", ts_col="ts",
                                  order_cols=["ts", "event_id"], threshold=6)
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    wave1.write.mode("append").parquet(src)
    drain()
    wave2.write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(sink).toPandas().sort_values("user_id").reset_index(drop=True)
    # oracle: the 6th event per user, in (ts, event_id) order
    want = spark.sql(
        "SELECT user_id, ts AS crossed_at FROM ("
        "  SELECT CAST(id % 37 AS BIGINT) AS user_id, "
        "  timestamp'2024-05-01' + make_interval(0,0,0,0,0,0,id) AS ts, "
        "  row_number() OVER (PARTITION BY id % 37 ORDER BY id) AS rn "
        "  FROM range(300)) WHERE rn = 6"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["crossed_at"].tolist() == want["crossed_at"].tolist()
    assert (got["n_at_crossing"] == 6).all()
    # 300 events over 37 users: every user reaches 6 (300/37 ≈ 8.1), and
    # some only in wave 2 — cross-batch state proven by count parity
    assert len(got) == 37


def test_streaming_read_of_encoded_batches(spark, tmp_path):
    """spark.readStream.format('pms_encoded') consumes an ingest root:
    completed batch dirs become micro-batches (offset = next batch id), new
    batch dirs are picked up incrementally, and nothing is re-emitted."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register
    from parquet_main_spark.streaming.ingest import _batch_dir
    from parquet_main_spark.operators.encode import encode_table

    register(spark)
    full = webpages(spark, 600, partitions=2)
    out_root = str(tmp_path / "sr_root")
    w1 = full.filter(F.col("url") < "https://host5")
    w2 = full.filter(F.col("url") >= "https://host5")
    cfg = lambda b: EncodeConfig(out_dir=_batch_dir(out_root, b), buckets=2,  # noqa: E731
                                 block_size=128, snapshot_id=f"s-b{b}",
                                 global_dict_max_card=0)
    encode_table(spark, w1, cfg(0))

    sink = str(tmp_path / "sr_sink")
    ckpt = str(tmp_path / "sr_ckpt")

    def drain():
        s = (spark.readStream.format(FORMAT_NAME)
             .option("columns", "url,lang").load(out_root))
        q = (s.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    got1 = spark.read.parquet(sink)
    assert got1.count() == w1.count()
    assert set(got1.columns) == {"url", "lang"}

    encode_table(spark, w2, cfg(1))
    drain()
    got = spark.read.parquet(sink)
    assert got.count() == full.count()          # batch 1 consumed once
    assert got.select("url").distinct().count() == full.count()

    drain()                                      # no new batches: no-op
    assert spark.read.parquet(sink).count() == full.count()


def test_stream_reader_ready_prefix_only(tmp_path):
    """latestOffset consumes only the READY PREFIX of batch dirs: batch 2
    complete while batch 1 still writing must not be skipped past (no
    Spark needed — pure offset logic)."""
    import os

    from parquet_main_spark.sources.datasource import _ready_batches

    root = str(tmp_path / "root")
    for b, done in ((0, True), (1, False), (2, True)):
        os.makedirs(f"{root}/batch={b}/lineage", exist_ok=True)
        if done:
            open(f"{root}/batch={b}/lineage/part-0.parquet", "wb").close()
    assert _ready_batches(root) == [0, 2]
    # the reader's latestOffset walks the ready prefix: stops before the gap
    ready, nxt = _ready_batches(root), 0
    for b in ready:
        if b != nxt:
            break
        nxt += 1
    assert nxt == 1  # batch 0 consumable; batch 2 waits for batch 1


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Spark's session_window boundary is INCLUSIVE: an event landing
    EXACTLY ``gap`` after the previous one MERGES into the same session;
    only a STRICTLY longer gap starts a new one (verified in batch mode:
    [00:00, 00:30] with gap=30min -> ONE session [00:00, 01:00)). The
    gaps-and-islands oracle must therefore break on ``delta > gap`` —
    pinned here with exact-gap and gap-plus-one-second fixtures that the
    driver testdata never contained."""
    import duckdb

    from parquet_main_spark.streaming.rollup import rollup_stream

    src = str(tmp_path / "sess_src")
    out_root = str(tmp_path / "sess_root")
    ckpt = str(tmp_path / "sess_ckpt")

    # user 1: 00:00 then EXACTLY +30min  -> MERGED, 1 session (inclusive)
    # user 2: 00:00 then +29:59          -> 1 session
    # user 4: 00:00 then +30:01          -> 2 sessions (strictly beyond gap)
    # user 3: lone late event advancing the watermark past everything
    ev = spark.createDataFrame(
        [
            (1, "2024-06-01 00:00:00"),
            (1, "2024-06-01 00:30:00"),
            (2, "2024-06-01 00:00:00"),
            (2, "2024-06-01 00:29:59"),
            (4, "2024-06-01 00:00:00"),
            (4, "2024-06-01 00:30:01"),
            (3, "2024-06-02 12:00:00"),
        ],
        "user_id int, s string",
    ).select("user_id", F.col("s").cast("timestamp").alias("ts"))
    ev.write.mode("append").parquet(src)

    cfg = EncodeConfig(out_dir="ignored", bucket_key="user_id", buckets=1,
                       block_size=16, snapshot_id="gap")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    rollup_stream(spark, stream, out_root, cfg, ckpt,
                  ts_col="ts", session_gap="30 minutes",
                  watermark_delay="1 minute", group_cols=["user_id"],
                  aggs={"n_events": F.count("*")})
    got = (
        scan_batches(spark, out_root).toPandas()
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    )
    # engine semantics: exact gap merges, strictly-longer gap splits
    by_user = got.groupby("user_id").size().to_dict()
    assert by_user == {1: 1, 2: 1, 4: 2}, by_user

    # the oracle formulation (> break) reproduces it row-for-row
    pdf = ev.toPandas()
    want = duckdb.query("""
        WITH cut AS (SELECT max(ts) - INTERVAL 1 MINUTE AS wm FROM pdf),
        o AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM pdf),
        s AS (SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
        sess AS (SELECT user_id, sid, min(ts) AS window_start,
                        max(ts) + INTERVAL 30 MINUTE AS window_end,
                        CAST(count(*) AS BIGINT) AS n_events
                 FROM s GROUP BY user_id, sid)
        SELECT user_id, window_start, window_end, n_events
        FROM sess, cut WHERE window_end <= wm
        ORDER BY user_id, window_start
    """).df()
    cols = ["user_id", "window_start", "window_end", "n_events"]
    dt = {"user_id": "int64", "window_start": "datetime64[us]",
          "window_end": "datetime64[us]"}
    g = got[cols].astype(dt).reset_index(drop=True)
    w = want[cols].astype(dt).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_datasource_stream_writer(spark, tmp_path):
    """df.writeStream.format('pms_encoded'): each micro-batch lands as a
    self-contained encoded batch=N dir (the encode_stream layout), readable
    by scan_batches and the pms_encoded batch reader; a second wave appends
    batch 1; lineage is written last so ready-prefix consumers never see a
    half-moved batch."""
    import os

    from parquet_main_spark.sources.datasource import FORMAT_NAME, register

    register(spark)
    src = str(tmp_path / "dsw_src")
    out_root = str(tmp_path / "dsw_root")
    ckpt = str(tmp_path / "dsw_ckpt")

    full = webpages(spark, 800, partitions=2)
    wave1 = full.filter(F.col("url") < "https://host5")
    wave2 = full.filter(F.col("url") >= "https://host5")

    def drain():
        stream = spark.readStream.schema(full.schema).parquet(src)
        q = (stream.writeStream.format(FORMAT_NAME)
             .option("checkpointLocation", ckpt)
             .option("block_size", "128")
             .trigger(availableNow=True)
             .start(out_root))
        q.awaitTermination(120)

    wave1.write.mode("append").parquet(src)
    drain()
    assert list_batches(out_root) == [0]
    got1 = _sorted(scan_batches(spark, out_root))
    want1 = _sorted(wave1)[got1.columns.tolist()]
    pd.testing.assert_frame_equal(got1, want1)
    # batch dir is a full table: meta + lineage + blocks
    for sub in ("meta", "lineage", "blocks"):
        assert os.path.isdir(f"{out_root}/batch=0/{sub}")
    assert not os.path.isdir(f"{out_root}/_staging") or not os.listdir(
        f"{out_root}/_staging"
    )

    wave2.write.mode("append").parquet(src)
    drain()
    assert list_batches(out_root) == [0, 1]
    got = _sorted(scan_batches(spark, out_root))
    want = _sorted(full)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)

    # the pms_encoded STREAM READER consumes what the stream writer wrote
    sink = str(tmp_path / "dsw_sink")
    rckpt = str(tmp_path / "dsw_rckpt")
    rq = (spark.readStream.format(FORMAT_NAME).load(out_root)
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", rckpt)
          .trigger(availableNow=True).start())
    rq.awaitTermination(120)
    assert spark.read.parquet(sink).count() == full.count()


def test_stream_writer_batch_retry_replaces(spark, tmp_path):
    """A replayed micro-batch commit (same batchId) must REPLACE the batch
    dir, never duplicate rows — driven through the writer's own protocol
    surface (Spark only retries on real failures, so the replay is
    simulated by invoking write+commit twice with the same id)."""
    import pyarrow as pa

    from parquet_main_spark.sources.datasource import EncodedTableStreamWriter

    out_root = str(tmp_path / "retry_root")
    df = webpages(spark, 300, partitions=1)
    schema = df.schema
    batches = df.toArrow().to_batches()

    w = EncodedTableStreamWriter(out_root, schema, {"block_size": "64"})

    class _Ctx:  # the writer only asks for partitionId()
        def partitionId(self):
            return 0

    import pyspark

    orig = pyspark.TaskContext.get
    pyspark.TaskContext.get = staticmethod(lambda: _Ctx())
    try:
        m1 = w.write(iter(batches))
        w.commit([m1], 0)
        n1 = scan_batches(spark, out_root).count()
        m2 = w.write(iter(batches))  # replay of batch 0
        w.commit([m2], 0)
    finally:
        pyspark.TaskContext.get = orig
    assert list_batches(out_root) == [0]
    assert scan_batches(spark, out_root).count() == n1 == 300


def test_compact_batches_over_stream_writer_dirs(spark, tmp_path):
    """Batch dirs produced by the pms_encoded STREAM WRITER are full
    encoded tables, so compact_batches merges them like encode_stream's
    own output."""
    from parquet_main_spark.sources.datasource import FORMAT_NAME, register
    from parquet_main_spark.streaming.ingest import compact_batches

    register(spark)
    src = str(tmp_path / "cmp_src")
    out_root = str(tmp_path / "cmp_root")
    ckpt = str(tmp_path / "cmp_ckpt")
    dest = str(tmp_path / "cmp_dest")

    full = webpages(spark, 600, partitions=2)
    w1 = full.filter(F.col("url") < "https://host5")
    w2 = full.filter(F.col("url") >= "https://host5")
    for wave in (w1, w2):
        wave.write.mode("append").parquet(src)
        q = (spark.readStream.schema(full.schema).parquet(src)
             .writeStream.format(FORMAT_NAME)
             .option("checkpointLocation", ckpt)
             .option("block_size", "128")
             .trigger(availableNow=True).start(out_root))
        q.awaitTermination(120)
    assert list_batches(out_root) == [0, 1]

    compact_batches(spark, out_root, dest,
                    EncodeConfig(out_dir="ignored", bucket_key="url",
                                 buckets=4, block_size=128))
    from parquet_main_spark.operators.decode import scan

    got = _sorted(scan(spark, dest))
    want = _sorted(full)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
