"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Three families (SURVEY.md §2 / driver brief):

1. Relational capability proofs over the TPC-H-ish tables — Spark SQL gives
   these "for free" (SURVEY.md §2.6); they prove scan/filter/join/agg/window
   parity at the DataFrame level (broadcast joins for dims, partial aggs).
2. Engine queries — encode the table with THIS engine at query time, answer
   from the encoded blocks (in-situ dictionary predicates, zone-map pruning),
   decode only what survives. Oracle = plain SQL over the raw table, so the
   driver verifies the whole encode->prune->translate->decode pipeline.
3. Training-data ops over documents/embeddings — dedup (exact, minhash-LSH,
   n-gram jaccard, simhash), text analysis (tokens, quality, lang-id,
   fingerprint), similarity search (cosine top-k, near-dup pairs, LSH
   buckets), multimodal blob plumbing. All deterministic and expressed so
   DuckDB computes the identical result.

Column names/aliases match the oracle exactly (driver hashes values after
sorting columns by name). Float aggregates are rounded in BOTH dialects.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

# --------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ENCODE_CACHE: dict[tuple[str, str], str] = {}


def _encoded_dir(spark: SparkSession, sf_dir: str, table: str, bucket_key: str,
                 name: str | None = None, transform=None, **cfg_kw) -> str:
    """Encode a testdata table with the engine once per (sf_dir, name);
    reused by every engine query in the same session. ``transform`` derives
    the input DataFrame; extra kwargs reach EncodeConfig (e.g. plan_override
    to force a codec — the reference's forced per-column encoding,
    ParquetWriterHelper.java:129-293)."""
    key = (sf_dir, name or table)
    if key not in _ENCODE_CACHE:
        from .codecs import FORMAT_VERSION
        from .operators.encode import EncodeConfig, encode_table

        out = os.path.join(tempfile.gettempdir(), f"pms_enc_v{FORMAT_VERSION}",
                           sf_dir.strip("/").replace("/", "_"), name or table)
        cfg = EncodeConfig(out_dir=out, bucket_key=bucket_key, buckets=8,
                           block_size=8192, snapshot_id=f"{name or table}@{sf_dir}",
                           **cfg_kw)
        df = _t(spark, sf_dir, table)
        if transform is not None:
            df = transform(df)
        encode_table(spark, df, cfg)
        _ENCODE_CACHE[key] = out
    return _ENCODE_CACHE[key]


# --------------------------------------------------------------------------
# 1. relational capability proofs


def q01_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                            AS sum_qty,
       round(sum(l_extendedprice), 2)                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
       round(avg(l_quantity), 4)                            AS avg_qty,
       round(avg(l_discount), 4)                            AS avg_disc,
       count(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q03_top_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q03_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q05_region_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q05_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q06_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q06_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q_top_customers_per_segment(spark, sf_dir):
    from pyspark.sql import Window as W

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    tot = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("total_spent"), F.asc("c_custkey"))
    return tot.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


Q_TOPCUST_SQL = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         round(sum(o_totalprice), 2) AS total_spent,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(sum(o_totalprice), 2) DESC, c_custkey ASC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey
) WHERE rn <= 3
"""


def q_events_by_type(spark, sf_dir):
    """Bench-only since r4 (not in the driver registry): the driver's
    CORRECTNESS artifact caps at 50 queries, and this groupBy-agg shape is
    already gated by q01/q_events_daily/eng_lang_counts. bench.py keeps it
    for round-over-round timing continuity; tests/test_queries_oracle.py
    still oracles it locally via BENCH_ONLY_ORACLES."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


Q_EVENTS_SQL = """
SELECT event_type,
       count(*)                  AS n_events,
       count(DISTINCT user_id)   AS n_users,
       round(sum(value), 2)      AS sum_value,
       round(avg(value), 4)      AS avg_value
FROM events GROUP BY event_type
"""


def q_events_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.to_date(F.date_trunc("day", F.col("ts"))))
        .groupBy("day")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("dau"))
    )


Q_DAILY_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n, count(DISTINCT user_id) AS dau
FROM events GROUP BY 1
"""


def q_rollup_orders(spark, sf_dir):
    """Hierarchical aggregate (ROLLUP) — grouping-sets capability."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total",
        )
    )


Q_ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')  AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_semi_anti_customers(spark, sf_dir):
    """EXISTS / NOT EXISTS via left-semi + left-anti joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100_000)
    with_big = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("bucket_label")
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_big_order").alias("bucket_label")
    )
    return with_big.unionByName(without).groupBy("bucket_label").agg(
        F.count("*").alias("n_customers")
    )


Q_SEMI_SQL = """
SELECT CASE WHEN EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
            THEN 'has_big_order' ELSE 'no_big_order' END AS bucket_label,
       count(*) AS n_customers
FROM customer c GROUP BY 1
"""


def q_status_pivot(spark, sf_dir):
    """Conditional pivot: order counts per priority spread over status columns."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


Q_PIVOT_SQL = """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
FROM orders GROUP BY o_orderpriority
"""


def q_union_key_space(spark, sf_dir):
    """Set op: distinct union of two key populations. Registry-trimmed in
    r4 (driver artifact caps at 50 queries); still oracled locally via
    BENCH_ONLY_ORACLES in tests/test_queries_oracle.py."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().groupBy().agg(F.count("*").alias("n_nations"))


Q_UNION_SQL = """
SELECT count(*) AS n_nations FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey FROM supplier
)
"""


# --------------------------------------------------------------------------
# 2. engine queries (encode with THIS engine, answer from encoded blocks)


def eng_lang_counts(spark, sf_dir):
    """Group-by over a dictionary-encoded column, decoded by the engine
    (dictionary build/decode path, SURVEY.md §2.2 E3/E4)."""
    from .operators.decode import scan

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    return scan(spark, out, columns=["lang"]).groupBy("lang").agg(F.count("*").alias("n_docs"))


ENG_LANG_SQL = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"


def eng_insitu_isin(spark, sf_dir):
    """In-situ dictionary predicate: lang IN (...) evaluated in id space
    (Dictionary.filter* analog, column/Dictionary.java:107-132)."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    return scan(
        spark, out, columns=["doc_id", "lang", "source"],
        predicate=Predicate("lang", "isin", ["de", "fr"]),
    )


ENG_ISIN_SQL = "SELECT doc_id, lang, source FROM documents WHERE lang IN ('de', 'fr')"


def eng_prune_range(spark, sf_dir):
    """Zone-map pruned range scan over encoded blocks (page-skip analog,
    SkippingColumnReaderImpl.java:735-771)."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(spark, sf_dir, "lineitem", "l_orderkey")
    rows = scan(
        spark, out, columns=["l_orderkey", "l_quantity"],
        predicate=Predicate("l_orderkey", "between", (1000, 2000)),
    )
    return rows.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


ENG_PRUNE_SQL = """
SELECT l_orderkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000 GROUP BY l_orderkey
"""


def eng_ts_filter(spark, sf_dir):
    """Timestamp range predicate on delta/FOR-encoded column. Cutoff sits
    INSIDE the events data range (Jan 2024) so the decode + zone-map path is
    verified on a non-empty, non-total subset."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(spark, sf_dir, "events", "event_id")
    from datetime import datetime, timezone

    cut = int(datetime(2024, 1, 15, tzinfo=timezone.utc).timestamp() * 1_000_000)
    rows = scan(spark, out, columns=["event_id", "ts", "event_type"],
                predicate=Predicate("ts", "<", cut))
    return rows.groupBy("event_type").agg(F.count("*").alias("n"))


ENG_TS_SQL = """
SELECT event_type, count(*) AS n
FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY event_type
"""


def eng_binary_filter(spark, sf_dir):
    """Predicate pushed to a BINARY column: zone maps carry hex-prefix
    bounds, the row mask compares raw bytes (round-1 bug class: binary
    stats were never written, pruning everything)."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(
        spark, sf_dir, "documents", "doc_id", name="documents_blob",
        transform=lambda d: d.select(
            "doc_id", F.col("text").cast("binary").alias("blob"), "lang"
        ),
    )
    return scan(spark, out, columns=["doc_id", "lang"],
                predicate=Predicate("blob", "between", (b"s", b"u")))


ENG_BINARY_SQL = """
SELECT doc_id, lang FROM documents WHERE text >= 's' AND text <= 'u'
"""


def eng_compound_filter(spark, sf_dir):
    """Compound predicate TREE pushed into the scan — a conjunction with a
    nested disjunction, so one driver row gates both shapes: zone-map
    survival intersects the And children and unions the Or children, the
    row mask is the exact Kleene evaluation (the reference's arbitrary
    Predicate<Statistics<?>> surface, SkippingColumnReaderImpl.java:430-437).
    r6: absorbed the standalone eng_or_filter (now BENCH_ONLY) to free a
    registry slot for eng_point_lookup under the driver's 50-row cap."""
    from .operators.decode import And, Or, Predicate, scan

    out = _encoded_dir(spark, sf_dir, "lineitem", "l_orderkey")
    rows = scan(
        spark, out, columns=["l_orderkey", "l_linenumber", "l_quantity"],
        predicate=And([
            Predicate("l_orderkey", "between", (2000, 6000)),
            Predicate("l_quantity", ">=", 25.0),
            Or([
                Predicate("l_linenumber", "<=", 3),
                Predicate("l_quantity", ">", 48.0),
            ]),
        ]),
    )
    return rows.groupBy("l_linenumber").agg(
        F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


ENG_COMPOUND_SQL = """
SELECT l_linenumber, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_orderkey BETWEEN 2000 AND 6000 AND l_quantity >= 25.0
  AND (l_linenumber <= 3 OR l_quantity > 48.0)
GROUP BY l_linenumber
"""


def eng_or_filter(spark, sf_dir):
    """Disjunctive predicate tree pushed into the scan: zone-map survival is
    the UNION of the children's surviving block sets, the row mask is the
    exact Kleene OR (the reference's arbitrary Predicate<Statistics<?>>
    surface, SkippingColumnReaderImpl.java:430-437; round-2 scans only took
    conjunctions)."""
    from .operators.decode import Or, Predicate, scan

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    rows = scan(
        spark, out, columns=["doc_id", "lang", "n_chars"],
        predicate=Or([
            Predicate("lang", "=", "de"),
            Predicate("n_chars", ">", 500),
        ]),
    )
    return rows.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.max("n_chars").alias("max_chars")
    )


ENG_OR_SQL = """
SELECT lang, count(*) AS n_docs, max(n_chars) AS max_chars
FROM documents WHERE lang = 'de' OR n_chars > 500 GROUP BY lang
"""


def eng_point_lookup(spark, sf_dir):
    """Bucket-hash point lookup: equality/isin on the BUCKET KEY restricts
    the scan's file list driver-side via pmod(xxhash64(lit), buckets) — the
    exact assignment encode used — so a lookup opens one bucket file per
    key instead of scheduling a task for every bucket (the key is
    hash-scattered, so per-file zone maps can never prune a point on it;
    the reference's analog is row-group selection before any page IO,
    ParquetFileReader.java:709-719). At 2^16 buckets this is the difference
    between 4 file-opens and 65k tasks.

    r6.2: goes through ``lookup`` — the driver-side fast path that decodes
    the (pruned, small) file list with NO Spark job at all; broad
    predicates fall back to the distributed scan inside lookup, so the
    semantics are scan's exactly."""
    from .operators.decode import Predicate, lookup

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    tbl = lookup(spark, out, Predicate("doc_id", "isin", [7, 123, 321, 400]),
                 columns=["doc_id", "lang", "source", "n_chars"])
    return spark.createDataFrame(tbl)


ENG_POINT_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN (7, 123, 321, 400)
"""


def eng_startswith_filter(spark, sf_dir):
    """Prefix predicate pushed into the scan (the DataSource also maps
    Catalyst StringStartsWith here): zone maps prune on [p, next(p)) range
    logic, dict-coded blocks evaluate the prefix once against the tiny
    sorted dictionary."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    rows = scan(spark, out, columns=["doc_id", "source", "n_chars"],
                predicate=Predicate("source", "startswith", "src1"))
    return rows.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.min("n_chars").alias("min_chars")
    )


ENG_STARTSWITH_SQL = """
SELECT source, count(*) AS n_docs, min(n_chars) AS min_chars
FROM documents WHERE source LIKE 'src1%' GROUP BY source
"""


def eng_count_pushdown(spark, sf_dir):
    """COUNT(*) answered from the zone map's three-valued classification:
    definite-all-match blocks are counted from statistics alone (their data
    never leaves disk), only boundary blocks decode — and only the predicate
    column (the count-only converter sink, SURVEY §2.5 Q7, taken to its
    logical end)."""
    from .operators.decode import Not, Predicate, scan_count

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    n1 = scan_count(spark, out, Predicate("n_chars", "between", (100, 900)))
    n2 = scan_count(spark, out, Not(Predicate("lang", "=", "en")))
    n3 = scan_count(spark, out, None)
    return spark.createDataFrame([(n1, n2, n3)],
                                 "n_mid long, n_not_en long, n_total long")


ENG_COUNT_SQL = """
SELECT (SELECT count(*) FROM documents WHERE n_chars BETWEEN 100 AND 900) AS n_mid,
       (SELECT count(*) FROM documents WHERE NOT (lang = 'en')) AS n_not_en,
       (SELECT count(*) FROM documents) AS n_total
"""


def eng_agg_pushdown(spark, sf_dir):
    """MIN/MAX + DISTINCT answered from metadata (r6): scan_minmax reads
    block statistics and decodes only candidate blocks whose conservative
    bounds could still move an extreme (ints are stats-exact; the long
    ``text`` strings exercise the truncated-bound candidate path);
    scan_distinct answers from dictionary blobs alone for the dict-planned
    ``lang`` — SELECT DISTINCT over 100 TB as kilobytes of dict pages per
    bucket file. The converter-sink/statistics machinery is the reference's
    Q7 + C6 line (ColumnWriterV1.java:113-139) taken to the aggregates a
    columnar layout can answer without data pages. The crossJoin in the
    plan is ONE row x ONE row (two scalar aggregates stitched into one
    result row) — bounded at any table size."""
    from .operators.aggregates import scan_distinct, scan_minmax
    from .operators.decode import Predicate

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    mm = scan_minmax(spark, out, ["doc_id", "n_chars", "source", "text"],
                     predicate=Predicate("lang", "=", "en"))
    dl = scan_distinct(spark, out, "lang").agg(
        F.count("lang").alias("n_langs"),
        F.min("lang").alias("min_lang"),
        F.max("lang").alias("max_lang"),
    )
    return mm.crossJoin(dl)


ENG_AGG_SQL = """
SELECT
  (SELECT min(doc_id)  FROM documents WHERE lang = 'en') AS min_doc_id,
  (SELECT max(doc_id)  FROM documents WHERE lang = 'en') AS max_doc_id,
  (SELECT min(n_chars) FROM documents WHERE lang = 'en') AS min_n_chars,
  (SELECT max(n_chars) FROM documents WHERE lang = 'en') AS max_n_chars,
  (SELECT min(source)  FROM documents WHERE lang = 'en') AS min_source,
  (SELECT max(source)  FROM documents WHERE lang = 'en') AS max_source,
  (SELECT min(text)    FROM documents WHERE lang = 'en') AS min_text,
  (SELECT max(text)    FROM documents WHERE lang = 'en') AS max_text,
  (SELECT count(DISTINCT lang) FROM documents) AS n_langs,
  (SELECT min(lang) FROM documents) AS min_lang,
  (SELECT max(lang) FROM documents) AS max_lang
"""


def eng_topk_pushdown(spark, sf_dir):
    """ORDER BY ... LIMIT k pushed into the scan (r6): scan_topk visits
    each bucket file's blocks in zone-map bound order, decodes a prefix
    whose non-null count reaches k plus any block whose bound still beats
    the decoded k-th value, and ships only those candidates to the global
    TakeOrderedAndProject merge — the tail-query shape (latest/largest
    rows) reading ~one block per file at any scale. doc_id is unique, so
    the row set is deterministic without a tiebreaker."""
    from .operators.aggregates import scan_topk
    from .operators.decode import Or, Predicate

    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    return scan_topk(
        spark, out, "doc_id", 12,
        columns=["doc_id", "lang", "source", "n_chars"],
        predicate=Or([Predicate("lang", "=", "en"),
                      Predicate("n_chars", ">", 800)]),
    )


ENG_TOPK_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE lang = 'en' OR n_chars > 800
ORDER BY doc_id DESC LIMIT 12
"""


def _codec_forced_docs(spark, sf_dir) -> str:
    """One encoded copy of documents with four codecs PINNED via
    plan_override (strict: no fallback) — the driver-gated proof that each
    writer/reader pair round-trips, the analog of the reference's per-codec
    writer tests (VarlenBitPackingValuesWriterTest.java:24-138)."""
    return _encoded_dir(
        spark, sf_dir, "documents", "doc_id", name="documents_codecs",
        transform=lambda d: d.select(
            "doc_id", "text", "lang", "source", "n_chars",
            (F.col("n_chars") > 300).alias("is_long"),
        ),
        order_by=["text"],
        global_dict_max_card=0,  # keep dict LOCAL (per-block sorted dict)
        plan_override={"text": "prefix", "n_chars": "plain",
                       "lang": "dict", "is_long": "rle"},
    )


def eng_codec_prefix(spark, sf_dir):
    """DELTA_BYTE_ARRAY analog forced on text (blocks sorted by text so
    shared prefixes exist); range predicate + exact string decode."""
    from .operators.decode import Predicate, scan

    out = _codec_forced_docs(spark, sf_dir)
    return scan(spark, out, columns=["doc_id", "text"],
                predicate=Predicate("text", "between", ("a", "f")))


ENG_PREFIX_SQL = "SELECT doc_id, text FROM documents WHERE text BETWEEN 'a' AND 'f'"


def eng_codec_plain(spark, sf_dir):
    """PLAIN forced on n_chars: fixed-width decode + zone-map range prune."""
    from .operators.decode import Predicate, scan

    out = _codec_forced_docs(spark, sf_dir)
    return scan(spark, out, columns=["doc_id", "n_chars"],
                predicate=Predicate("n_chars", "between", (100, 300)))


ENG_PLAIN_SQL = "SELECT doc_id, n_chars FROM documents WHERE n_chars BETWEEN 100 AND 300"


def eng_codec_localdict(spark, sf_dir):
    """Per-block (local) sorted dictionary with in-situ isin translation —
    global dict disabled, so the OPOP-analog path is what answers."""
    from .operators.decode import Predicate, scan

    out = _codec_forced_docs(spark, sf_dir)
    return scan(spark, out, columns=["doc_id", "lang", "source"],
                predicate=Predicate("lang", "isin", ["en", "de"]))


ENG_LOCALDICT_SQL = "SELECT doc_id, lang, source FROM documents WHERE lang IN ('en', 'de')"


def eng_codec_bool_rle(spark, sf_dir):
    """Boolean RLE width-1 (E10 analog) round-trip through the engine."""
    from .operators.decode import scan

    out = _codec_forced_docs(spark, sf_dir)
    return scan(spark, out, columns=["is_long"]).groupBy("is_long").agg(
        F.count("*").alias("n_docs")
    )


ENG_BOOL_SQL = "SELECT n_chars > 300 AS is_long, count(*) AS n_docs FROM documents GROUP BY 1"


def eng_codec_for(spark, sf_dir):
    """Frame-of-reference + bit-pack (VARLEN_BIT_PACKED analog, E1) forced on
    both int columns; range predicate exercises FOR decode + pruning."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(
        spark, sf_dir, "events", "event_id", name="events_for",
        transform=lambda d: d.select("event_id", "user_id"),
        plan_override={"event_id": "for", "user_id": "for"},
    )
    rows = scan(spark, out, columns=["event_id", "user_id"],
                predicate=Predicate("event_id", "between", (1000, 3000)))
    return rows.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


ENG_FOR_SQL = """
SELECT user_id, count(*) AS n_events, min(event_id) AS min_event, max(event_id) AS max_event
FROM events WHERE event_id BETWEEN 1000 AND 3000 GROUP BY user_id
"""


def eng_typed_scan(spark, sf_dir):
    """DATE + SMALLINT column coverage: encode a derived typed view of
    events, push a date-range predicate (int-days zone map), group by day."""
    import datetime

    from .operators.decode import Predicate, scan

    out = _encoded_dir(
        spark, sf_dir, "events", "event_id", name="events_typed",
        transform=lambda d: d.select(
            "event_id",
            F.col("ts").cast("date").alias("day"),
            F.col("user_id").cast("smallint").alias("user_small"),
        ),
    )
    cut = (datetime.date(2024, 1, 10) - datetime.date(1970, 1, 1)).days
    rows = scan(spark, out, columns=["day", "user_small"],
                predicate=Predicate("day", "<", cut))
    return rows.groupBy("day").agg(
        F.count("*").alias("n"), F.countDistinct("user_small").alias("n_users")
    )


ENG_TYPED_SQL = """
SELECT CAST(ts AS DATE) AS day, count(*) AS n,
       count(DISTINCT CAST(user_id AS SMALLINT)) AS n_users
FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-10'
GROUP BY 1
"""


def eng_decimal_scan(spark, sf_dir):
    """DECIMAL column coverage, both width families in ONE gated query
    (merged r4 to fit the driver's 50-query artifact cap):

    * kind='dec64' — decimal(p<=18) rides the int codec family as unscaled
      int64; the pushed predicate compares unscaled values against the int
      zone map, the result comes back as exact decimal.
    * kind='dec128' — decimal(19..38) rides the BINARY codec family as
      16-byte big-endian offset-binary keys, so byte order == numeric order
      and zone maps / dictionaries / range predicates all work byte-wise —
      the FIXED_LEN_BYTE_ARRAY-decimal analog of the reference's type
      matrix (EncValuesWriterFactory.java:82-101). The value is built by
      EXACT scale extension (decimal(12,2) -> decimal(38,18), no
      arithmetic) so Spark and the DuckDB oracle agree digit-for-digit; at
      scale 18 the unscaled value ~1e23 genuinely exceeds int64.

    Both sides aggregate exactly in decimal then cast ONCE to double at the
    end (DuckDB's pandas bridge floats wide decimals anyway)."""
    from .operators.decode import Predicate, scan

    out64 = _encoded_dir(
        spark, sf_dir, "lineitem", "l_orderkey", name="lineitem_dec",
        transform=lambda d: d.select(
            "l_orderkey", F.col("l_extendedprice").cast("decimal(12,2)").alias("price")
        ),
    )
    rows64 = scan(spark, out64, columns=["l_orderkey", "price"],
                  predicate=Predicate("price", ">=", 5_000_000))  # unscaled 50000.00
    part64 = rows64.agg(
        F.count("*").alias("n_rows"),
        F.sum("price").cast("double").alias("total"),
        F.min("price").cast("double").alias("min_val"),
    ).select(F.lit("dec64").alias("kind"), "n_rows", "total", "min_val")

    out128 = _encoded_dir(
        spark, sf_dir, "lineitem", "l_orderkey", name="lineitem_dec128",
        transform=lambda d: d.select(
            "l_orderkey",
            F.col("l_extendedprice").cast("decimal(12,2)")
            .cast("decimal(38,18)").alias("big"),
        ),
    )
    thr = 50_000 * 10**18  # unscaled 50000.000000000000000000 at scale 18
    rows128 = scan(spark, out128, columns=["l_orderkey", "big"],
                   predicate=Predicate("big", ">=", thr))
    part128 = rows128.agg(
        F.count("*").alias("n_rows"),
        F.sum("big").cast("double").alias("total"),
        F.min("big").cast("double").alias("min_val"),
    ).select(F.lit("dec128").alias("kind"), "n_rows", "total", "min_val")

    return part64.unionByName(part128)


ENG_DECIMAL_SQL = """
SELECT 'dec64' AS kind, count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_val
FROM lineitem WHERE CAST(l_extendedprice AS DECIMAL(12,2)) >= 50000.00
UNION ALL
SELECT 'dec128' AS kind, count(*) AS n_rows,
       CAST(sum(big) AS DOUBLE) AS total,
       CAST(min(big) AS DOUBLE) AS min_val
FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(38,18)) AS big
      FROM lineitem)
WHERE big >= 50000
"""


def eng_vector_scan(spark, sf_dir):
    """EMBEDDING (vector) column coverage: array<float> round-trips through
    the engine as raw element bytes on the var-len BINARY codec family
    (Arrow's list layout IS the lengths+blob decomposition — the
    DELTA_LENGTH_BYTE_ARRAY analog for vectors). The scan prunes on the
    vec_id zone map; content is verified by an exact integer checksum over
    every element (floor(x*1000) in double — IEEE-identical in Spark and
    DuckDB, no float-sum nondeterminism)."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(spark, sf_dir, "embeddings", "vec_id")
    rows = scan(spark, out, columns=["vec_id", "embedding"],
                predicate=Predicate("vec_id", "between", (100, 399)))
    per_row = rows.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.aggregate(
            "embedding", F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("chk"),
    )
    return per_row.groupBy("dim").agg(
        F.count("*").alias("n_vecs"),
        F.sum("chk").alias("sum_chk"),
        F.min("vec_id").alias("min_id"),
    )


ENG_VECTOR_SQL = """
SELECT CAST(len(embedding) AS BIGINT) AS dim,
       count(*) AS n_vecs,
       CAST(sum(list_sum(list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))) AS BIGINT) AS sum_chk,
       min(vec_id) AS min_id
FROM embeddings
WHERE vec_id BETWEEN 100 AND 399
GROUP BY 1
"""


def eng_ann_cosine(spark, sf_dir):
    """ANN over the ENGINE's format: the embeddings table is encoded into
    the columnar format (vector column = raw element bytes on the binary
    family) and the cosine top-10 runs on scan() output — the zone map
    prunes the vec_id range BEFORE any vector blob is decoded, which is the
    100-TB shape: filter first on cheap stats, decode vectors only for
    surviving blocks. Same math as ops_cosine_topk, engine-backed source."""
    from .operators.decode import Predicate, scan

    out = _encoded_dir(spark, sf_dir, "embeddings", "vec_id")
    e = scan(spark, out, columns=["vec_id", "embedding", "label"],
             predicate=Predicate("vec_id", "<", 400))
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    dot = F.aggregate(
        F.zip_with("embedding", "qemb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label",
                F.round(dot / (norm("embedding") * norm("qemb")), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


ENG_ANN_SQL = """
WITH q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT e.vec_id, e.label,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qemb) AS DOUBLE)      AS y
  FROM embeddings e, q WHERE e.vec_id <> 0 AND e.vec_id < 400
)
SELECT vec_id, label,
       round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cosine
FROM p GROUP BY vec_id, label
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def eng_stream_rollup(spark, sf_dir):
    """STREAMING coverage gate: the events table replayed as a file-source
    stream -> watermarked 1-day tumbling windows (append mode: a window is
    emitted exactly once, after the 12h watermark passes its end) -> each
    micro-batch of finalized windows ENCODED into its own batch dir ->
    scan_batches reads the rollup back from the columnar format. The DuckDB
    oracle recomputes the same finalized-window set from the batch table
    (cutoff = max(ts) - 12h), so watermark semantics, the stateful window
    operator AND the encode/scan round-trip are all under the hash check."""
    import tempfile
    import uuid

    from .operators.encode import EncodeConfig
    from .streaming.ingest import scan_batches
    from .streaming.rollup import rollup_stream

    import os

    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix=f"pms_rollup_{uuid.uuid4().hex[:8]}_")
    cfg = EncodeConfig(out_dir="ignored", bucket_key="event_type", buckets=2,
                       block_size=256, snapshot_id="rollup")
    # the file stream source needs a DIRECTORY; expose the single parquet
    # file through a symlink dir
    src = f"{base}/src"
    os.makedirs(src)
    os.symlink(os.path.join(sf_dir, "events.parquet"), f"{src}/events.parquet")
    # ts is TIMESTAMP_NTZ; the watermark operator needs TIMESTAMP. Convert
    # via epoch-micros arithmetic (timestampdiff on NTZ is session-tz-proof,
    # unlike a cast), so the UTC wall-clock equals the NTZ wall-clock and
    # day windows align with DuckDB's naive time_bucket under ANY session tz
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
        .select(
            F.expr("timestamp_micros(timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))").alias("wts"),
            "event_type", "value",
        )
    )
    rollup_stream(
        spark, stream, f"{base}/out", cfg, f"{base}/ckpt",
        ts_col="wts", window_duration="1 day", watermark_delay="12 hours",
        group_cols=["event_type"],
        aggs={"n": F.count("*"), "total": F.round(F.sum("value"), 2)},
    )
    back = scan_batches(spark, f"{base}/out")
    to_ntz = lambda c: F.expr(  # noqa: E731 - inverse of the cast above
        f"timestampadd(MICROSECOND, unix_micros({c}), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias(c)
    return back.select(to_ntz("window_start"), to_ntz("window_end"),
                       "event_type", "n", "total")


ENG_ROLLUP_SQL = """
WITH cut AS (SELECT max(ts) - INTERVAL 12 HOUR AS wm FROM events),
b AS (SELECT time_bucket(INTERVAL 1 DAY, ts) AS ws, event_type, value FROM events)
SELECT ws AS window_start, ws + INTERVAL 1 DAY AS window_end, event_type,
       count(*) AS n, round(sum(value), 2) AS total
FROM b, cut WHERE ws + INTERVAL 1 DAY <= wm
GROUP BY 1, 2, 3
"""


def eng_stream_sessions(spark, sf_dir):
    """SESSION-window streaming coverage: per-user sessions with a 30-minute
    inactivity gap via Spark's native `session_window` stateful operator
    (built-in beats custom applyInPandasWithState state code for these
    semantics), append mode -> finalized sessions encoded into batch dirs.
    The DuckDB oracle is the classic gaps-and-islands rewrite with the SAME
    finalization cutoff (session last event + gap <= max(ts) - watermark),
    so the stateful session merge, watermark finalization AND the encode
    round-trip all sit under the hash check. session_end = last event + gap
    (Spark's definition); the oracle mirrors it."""
    import os
    import tempfile
    import uuid

    from .operators.encode import EncodeConfig
    from .streaming.ingest import scan_batches
    from .streaming.rollup import rollup_stream

    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix=f"pms_sess_{uuid.uuid4().hex[:8]}_")
    src = f"{base}/src"
    os.makedirs(src)
    os.symlink(os.path.join(sf_dir, "events.parquet"), f"{src}/events.parquet")
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
        .select(
            F.expr("timestamp_micros(timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))").alias("wts"),
            "user_id",
        )
    )
    cfg = EncodeConfig(out_dir="ignored", bucket_key="user_id", buckets=2,
                       block_size=256, snapshot_id="sessions")
    rollup_stream(
        spark, stream, f"{base}/out", cfg, f"{base}/ckpt",
        ts_col="wts", session_gap="30 minutes", watermark_delay="12 hours",
        group_cols=["user_id"], aggs={"n_events": F.count("*")},
    )
    back = scan_batches(spark, f"{base}/out")
    to_ntz = lambda c: F.expr(  # noqa: E731
        f"timestampadd(MICROSECOND, unix_micros({c}), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias(c)
    # per-user session profile: compact, order-insensitive
    return (
        back.select(to_ntz("window_start"), to_ntz("window_end"),
                    "user_id", "n_events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_events").alias("n_events"),
             F.min("window_start").alias("first_start"),
             F.max("window_end").alias("last_end"))
    )


ENG_SESSIONS_SQL = """
WITH cut AS (SELECT max(ts) - INTERVAL 12 HOUR AS wm FROM events),
o AS (
  SELECT user_id, ts,
         -- strictly-greater: Spark's session_window MERGES an event landing
         -- exactly `gap` after the previous one (boundary is inclusive —
         -- verified empirically and pinned by
         -- tests/test_streaming.py::test_session_window_exact_gap_boundary);
         -- only a gap STRICTLY longer than 30min starts a new session
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
sess AS (
  SELECT user_id, sid, min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
  FROM s GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions,
       -- CAST: DuckDB's integer sum() is HUGEINT, which floats through the
       -- pandas bridge; Spark's sum is BIGINT — hash would diverge
       CAST(sum(n_events) AS BIGINT) AS n_events,
       min(session_start) AS first_start, max(session_end) AS last_end
FROM sess, cut
WHERE session_end <= wm
GROUP BY user_id
"""


def eng_stream_threshold(spark, sf_dir):
    """ARBITRARY-STATE streaming coverage (applyInPandasWithState): emit one
    row per user at the moment their cumulative event count reaches 60 —
    cumulative-across-batches semantics no built-in stateful operator emits
    (windowed counts reset per window; dropDuplicates has no counter).
    Per-key state is ONE int, so state size is O(distinct keys) at any
    corpus scale. The DuckDB oracle is row_number()=60 per user in
    (ts, event_id) order — the crossing timestamp must match EXACTLY, which
    proves both the cross-batch counter and the in-batch ordering."""
    import os
    import tempfile
    import uuid

    from .streaming.state import threshold_crossings

    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix=f"pms_thr_{uuid.uuid4().hex[:8]}_")
    src = f"{base}/src"
    os.makedirs(src)
    os.symlink(os.path.join(sf_dir, "events.parquet"), f"{src}/events.parquet")
    stream = (spark.readStream.schema(ev.schema).parquet(src)
              .select("user_id", "ts", "event_id"))
    out = threshold_crossings(stream, key_col="user_id", ts_col="ts",
                              order_cols=["ts", "event_id"], threshold=60)
    sink = f"{base}/sink"
    q = (out.writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", f"{base}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink).select("user_id", "crossed_at", "n_at_crossing")


ENG_THRESHOLD_SQL = """
SELECT user_id, ts AS crossed_at, 60 AS n_at_crossing
FROM (SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 60
"""


def eng_datasource_scan(spark, sf_dir):
    """Transparent read-back through the registered Python Data Source
    (spark.read.format): the .filter() is pushed into the source via
    Catalyst filter pushdown and becomes an engine Predicate — zone-map
    prune + in-situ dict translation run inside the partition read."""
    from .sources.datasource import FORMAT_NAME, register

    register(spark)
    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    df = spark.read.format(FORMAT_NAME).load(out)
    return (
        df.filter(F.col("lang") == "en")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


ENG_DATASOURCE_SQL = """
SELECT source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM documents WHERE lang = 'en' GROUP BY source
"""


def eng_datasource_prune(spark, sf_dir):
    """Column-pruned read through the data source: the ``columns`` load
    option restricts the schema and the PHYSICAL read — the text blob's row
    groups are never fetched (chunk-selective reads,
    ParquetFileReader.java:709-719), while the pushed filter still prunes
    blocks via zone maps."""
    from .sources.datasource import FORMAT_NAME, register

    register(spark)
    out = _encoded_dir(spark, sf_dir, "documents", "doc_id")
    df = (
        spark.read.format(FORMAT_NAME)
        .option("columns", "lang,n_chars")
        .load(out)
    )
    return (
        df.filter(F.col("n_chars") >= 200)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


ENG_DATASOURCE_PRUNE_SQL = """
SELECT lang, count(*) AS n_docs,
       -- CAST: DuckDB integer sum() is HUGEINT (floats via pandas bridge);
       -- Spark sum is BIGINT — same values, different hash without it
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE n_chars >= 200 GROUP BY lang
"""


# --------------------------------------------------------------------------
# 3. training-data pipeline operators


def ops_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.count("*").alias("dup_count"), F.min("doc_id").alias("keep_doc_id")
    )


OPS_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, count(*) AS dup_count, min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text)
"""


def ops_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens")
    )


OPS_TOKENS_SQL = r"""
SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tokens FROM documents
"""


def ops_quality_score(spark, sf_dir):
    """Heuristic quality scoring: token count + mean token length blend."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+"))
    n_nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    avg_len = F.round(n_nonspace / n_tokens, 4)
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(avg_len / F.lit(10.0), F.lit(1.0)) * 0.5,
        4,
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


OPS_QUALITY_SQL = r"""
SELECT doc_id,
       len(string_split_regex(text, '\s+')) AS n_tokens,
       round(length(replace(text, ' ', '')) * 1.0 / len(string_split_regex(text, '\s+')), 4) AS avg_token_len,
       round(least(len(string_split_regex(text, '\s+')) / 100.0, 1.0) * 0.5
           + least(round(length(replace(text, ' ', '')) * 1.0 / len(string_split_regex(text, '\s+')), 4) / 10.0, 1.0) * 0.5,
         4) AS quality_score
FROM documents
"""


def ops_lang_id(spark, sf_dir):
    """Marker-word language-ID heuristic (n-gram-lite)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    pred = (
        F.when(t.contains(" the ") | t.startswith("the ") | t.contains(" a "), "en")
        .when(t.contains(" der ") | t.contains(" die "), "de")
        .otherwise("und")
    )
    return d.select("doc_id", "lang", pred.alias("predicted_lang"))


OPS_LANGID_SQL = """
SELECT doc_id, lang,
       CASE WHEN text LIKE '% the %' OR text LIKE 'the %' OR text LIKE '% a %' THEN 'en'
            WHEN text LIKE '% der %' OR text LIKE '% die %' THEN 'de'
            ELSE 'und' END AS predicted_lang
FROM documents
"""


#: shingle expression over a pre-split words column ``w``: split(text) is
#: evaluated ONCE per row (a prior form inlined split() inside the transform
#: lambda, where codegen subexpression elimination does not reach — each
#: shingle element re-split the document, O(words^2) per doc; measured 10x
#: on shingle generation at sf1.0, guide §1.2 "per-task work")
_SHINGLE_EXPR = (
    "CASE WHEN size(w) >= 3 THEN "
    "transform(sequence(0, size(w) - 3), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2])) "
    "ELSE array() END"
)

_SHINGLE_SQL = (
    "SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle "
    r"FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)"
)


def _shingles(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # small single-file inputs arrive as ONE partition; spread the shingle
    # explosion + hashing across cores before the flatMap
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    d = d.withColumn("w", F.split(F.col("text"), r"\s+"))
    return d.select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("shingle"))


def ops_fingerprint(spark, sf_dir):
    """Winnowing-lite document fingerprint: min hash over word 3-shingles."""
    sh = _shingles(spark, sf_dir)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle").cast("binary"))).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_shingles"),
    )


OPS_FINGERPRINT_SQL = f"""
SELECT doc_id, min(md5(shingle)) AS fingerprint, count(DISTINCT shingle) AS n_shingles
FROM ({_SHINGLE_SQL}) GROUP BY doc_id
"""


def ops_minhash_bands(spark, sf_dir):
    """MinHash-LSH bucketing: 16 portable minhashes (min over md5(shingle:k)),
    4 bands of 4 -> band_hash; docs sharing (band, band_hash) are candidates."""
    # NO dropDuplicates before the min-agg: min() is duplicate-insensitive,
    # so deduping (doc_id, shingle) first only added an extra aggregation
    # pass over every shingle row (plans/r07/ops_minhash_bands_*.txt; when
    # shuffle.partitions differs from _shingles' partition count it would
    # also add an Exchange). Results are identical by construction.
    sh = _shingles(spark, sf_dir)
    # all 16 minhashes in ONE aggregation pass (no 16x row explosion before
    # the shuffle — partial aggregation does the min map-side)
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f":{k}")).cast("binary"))).alias(f"h{k}")
            for k in range(16)
        ]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[F.col(f"h{4 * b + i}") for i in range(4)]).cast("binary")).alias("band_hash"),
            )
            for b in range(4)
        ]
    )
    return (
        mh.select("doc_id", F.explode(bands).alias("s"))
        .select("doc_id", F.col("s.band").alias("band"), F.col("s.band_hash").alias("band_hash"))
    )


OPS_MINHASH_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLE_SQL})),
mh AS (
  SELECT doc_id, k, min(md5(shingle || ':' || CAST(k AS VARCHAR))) AS h
  FROM sh, generate_series(0, 15) t(k)
  GROUP BY doc_id, k
)
SELECT doc_id, CAST(k // 4 AS INT) AS band,
       md5(string_agg(h, ',' ORDER BY k)) AS band_hash
FROM mh GROUP BY doc_id, CAST(k // 4 AS INT)
"""


def ops_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-shingle Jaccard over MINHASH-BAND CANDIDATE PAIRS (top 20).

    Scale-safe form of near-dup scoring: the quadratic shingle self-join
    (any shingle shared by k docs emits k^2 rows — fatal on hot shingles at
    Common-Crawl scale) is replaced by LSH candidate generation: only pairs
    colliding in a minhash band are scored, and the exact Jaccard join is
    restricted to those docs. Candidate count ~ #near-dups, not #docs^2."""
    sh = _shingles(spark, sf_dir).dropDuplicates(["doc_id", "shingle"])
    bands = ops_minhash_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb_sh = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(sa_sh, "doc_a")
        .join(sb_sh, (F.col("doc_b") == F.col("doc_b2")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .select("doc_a", "doc_b", "inter", "jaccard")
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(20)
    )


OPS_JACCARD_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLE_SQL})),
mh AS (
  SELECT doc_id, k, min(md5(shingle || ':' || CAST(k AS VARCHAR))) AS h
  FROM sh, generate_series(0, 15) t(k)
  GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, CAST(k // 4 AS INT) AS band,
         md5(string_agg(h, ',' ORDER BY k)) AS band_hash
  FROM mh GROUP BY doc_id, CAST(k // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, inter,
       round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
LIMIT 20
"""


def ops_simhash(spark, sf_dir):
    """32-bit SimHash from per-word md5 hex nibble high bits (portable).

    Bit extraction is integer math, not string ops: the 32 hex nibbles are
    parsed ONCE into four int64 chunks (conv of 8 hex chars each) and each
    bit is a shift+mask — the prior per-bit ``substring(wh, b+1, 1)
    .isin('8'..'f')`` evaluated 32 substrings + 32 list-membership tests
    per word row (guide §1.2 per-task work; measured ~15% off the query).
    The high bit of a hex nibble is set exactly when the char is '8'..'f',
    so results are identical by construction."""
    d = _t(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    words = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), r"\s+"))).alias("word")
    ).withColumn("wh", F.md5(F.col("word").cast("binary")))
    chunks = [F.conv(F.substring("wh", 1 + 8 * c, 8), 16, 10).cast("long").alias(f"c{c}")
              for c in range(4)]
    words = words.select("doc_id", *chunks)

    def bit(b):
        c, k = divmod(b, 8)
        shift = (7 - k) * 4 + 3  # high bit of nibble k within chunk c
        return F.shiftright(F.col(f"c{c}"), shift).bitwiseAND(F.lit(1)) * 2 - 1

    agg = words.groupBy("doc_id").agg(
        *[F.sum(bit(b)).alias(f"s{b}") for b in range(32)]
    )
    bits = F.concat(*[F.when(F.col(f"s{b}") >= 0, "1").otherwise("0") for b in range(32)])
    return agg.select("doc_id", bits.alias("simhash"))


OPS_SIMHASH_SQL = (
    "WITH w0 AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word FROM documents),\n"
    "words AS (SELECT DISTINCT doc_id, word FROM w0),\n"
    "wh AS (SELECT doc_id, md5(word) AS wh FROM words),\n"
    "agg AS (SELECT doc_id, "
    + ", ".join(
        f"sum(CASE WHEN substr(wh, {b + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    + " FROM wh GROUP BY doc_id)\n"
    + "SELECT doc_id, "
    + " || ".join(f"(CASE WHEN s{b} >= 0 THEN '1' ELSE '0' END)" for b in range(32))
    + " AS simhash FROM agg"
)


def ops_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against query vec_id=0 (ANN baseline)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    dot = F.aggregate(
        F.zip_with("embedding", "qemb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(dot / (norm("embedding") * norm("qemb")), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


OPS_COSINE_SQL = """
WITH q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT e.vec_id, e.label,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qemb) AS DOUBLE)      AS y
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, label,
       round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cosine
FROM p GROUP BY vec_id, label
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def ops_neardup_embeddings(spark, sf_dir):
    """Embedding near-dup: top-20 most-similar pairs by exact cosine AMONG
    LSH-BUCKET-MATE CANDIDATES.

    Scale-safe form: candidates come from an equi-join on the sign-LSH
    bucket (hash join keyed on the bucket — no cross/theta join in the
    plan), then exact cosine reranks only those pairs. O(sum bucket^2)
    instead of O(N^2); at 10^9 vectors you widen the bucket bit count."""
    e = _t(spark, sf_dir, "embeddings")
    b = _lsh_buckets(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    en = e.join(b, "vec_id").select("vec_id", "embedding", "lsh_bucket", norm.alias("nrm"))
    a = en.alias("a")
    bb = en.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(bb, (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(20)
    )


OPS_NEARDUP_SQL = f"""
WITH buckets AS ({{lsh}}),
n AS (
  SELECT e.vec_id, e.embedding, k.lsh_bucket,
         sqrt((SELECT sum(CAST(u AS DOUBLE) * CAST(u AS DOUBLE)) FROM unnest(e.embedding) t(u))) AS nrm
  FROM embeddings e JOIN buckets k ON e.vec_id = k.vec_id
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.nrm AS na, b.nrm AS nb,
         CAST(unnest(a.embedding) AS DOUBLE) AS x, CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM n a JOIN n b ON a.lsh_bucket = b.lsh_bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(sum(x * y) / (any_value(na) * any_value(nb)), 4) AS cosine
FROM p GROUP BY vec_a, vec_b
ORDER BY cosine DESC, vec_a ASC, vec_b ASC
LIMIT 20
"""


_LSH_DIMS, _LSH_PLANES = 64, 8


def _lsh_buckets(spark, sf_dir) -> DataFrame:
    """8 deterministic pseudo-random hyperplanes: plane(i, j) =
    ((i*31 + j*17) % 7) - 3 over 0-based dim i; bucket = sign-bit string.
    The LSH 'scale path' for ANN: candidates share a bucket, so search cost
    drops from O(N) to O(bucket).

    Implementation is a shuffle-free mapInArrow numpy matmul: one
    (n x 64) @ (64 x 8) product per Arrow batch — zero intermediate rows
    (round 1 posexploded 64 dims x crossJoined 8 planes = 512 rows/vector
    plus a groupBy shuffle)."""
    import pyarrow as pa

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def project(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        i = np.arange(_LSH_DIMS)[:, None]
        j = np.arange(_LSH_PLANES)[None, :]
        planes = ((i * 31 + j * 17) % 7 - 3).astype(np.float64)
        for batch in it:
            if batch.num_rows == 0:
                continue
            emb = batch.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            s = np.round(flat.reshape(-1, _LSH_DIMS) @ planes, 6)
            ch = np.where(s >= 0, 49, 48).astype(np.uint8)  # '1' / '0'
            buckets = np.ascontiguousarray(ch).view(f"S{_LSH_PLANES}").ravel().astype(str)
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"), pa.array(buckets, type=pa.string())],
                ["vec_id", "lsh_bucket"],
            )

    return e.mapInArrow(project, "vec_id bigint, lsh_bucket string")


_LSH_BUCKETS_SQL = """
WITH proj AS (
  SELECT vec_id, j,
         sum(CAST(embedding[i] AS DOUBLE) * (((i - 1) * 31 + j * 17) % 7 - 3)) AS s
  FROM embeddings, generate_series(1, 64) t(i), generate_series(0, 7) u(j)
  GROUP BY vec_id, j
),
bits AS (
  SELECT vec_id, j, CASE WHEN round(s, 6) >= 0 THEN '1' ELSE '0' END AS bit FROM proj
)
SELECT vec_id, string_agg(bit, '' ORDER BY j) AS lsh_bucket FROM bits GROUP BY vec_id
"""


OPS_NEARDUP_SQL = OPS_NEARDUP_SQL.format(lsh=_LSH_BUCKETS_SQL)


def ops_ann_lsh_buckets(spark, sf_dir):
    return _lsh_buckets(spark, sf_dir)


OPS_ANN_LSH_SQL = _LSH_BUCKETS_SQL


def ops_ann_lsh_topk(spark, sf_dir):
    """ANN via LSH: top-5 cosine neighbors of vec_id=0 AMONG ITS BUCKET —
    the bucketed search path (vs ops_cosine_topk's brute force baseline)."""
    b = _lsh_buckets(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    qb = b.filter(F.col("vec_id") == 0).select(F.col("lsh_bucket").alias("qbucket"))
    cands = (
        b.join(F.broadcast(qb), F.col("lsh_bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    ce = cands.join(e, "vec_id")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    dot = F.aggregate(
        F.zip_with("embedding", "qemb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        ce.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(dot / (norm("embedding") * norm("qemb")), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


OPS_ANN_TOPK_SQL = f"""
WITH buckets AS ({_LSH_BUCKETS_SQL}),
qb AS (SELECT lsh_bucket FROM buckets WHERE vec_id = 0),
cands AS (
  SELECT b.vec_id FROM buckets b, qb WHERE b.lsh_bucket = qb.lsh_bucket AND b.vec_id <> 0
),
q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qemb) AS DOUBLE)      AS y
  FROM embeddings e JOIN cands c ON e.vec_id = c.vec_id, q
)
SELECT vec_id, round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cosine
FROM p GROUP BY vec_id
ORDER BY cosine DESC, vec_id ASC
LIMIT 5
"""


def ops_curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation: exact-dedup winners AND a quality floor
    AND a language allowlist, composed exactly as a training-data pipeline
    would chain them (dedup -> quality -> lang). One hash aggregation + one
    broadcast-able semi-join; every stage partial-aggregates map-side."""
    d = _t(spark, sf_dir, "documents")
    winners = d.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    n_tokens = F.size(F.split(F.col("text"), r"\s+"))
    n_nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    avg_len = F.round(n_nonspace / n_tokens, 4)
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(avg_len / F.lit(10.0), F.lit(1.0)) * 0.5,
        4,
    )
    scored = d.select("doc_id", "lang", score.alias("quality_score"))
    return (
        scored.join(winners, "doc_id", "left_semi")
        .filter((F.col("quality_score") >= 0.6) & F.col("lang").isin("en", "de"))
    )


OPS_CURATION_SQL = r"""
WITH winners AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
scored AS (
  SELECT doc_id, lang,
         round(least(len(string_split_regex(text, '\s+')) / 100.0, 1.0) * 0.5
             + least(round(length(replace(text, ' ', '')) * 1.0
                           / len(string_split_regex(text, '\s+')), 4) / 10.0, 1.0) * 0.5,
           4) AS quality_score
  FROM documents
)
SELECT s.doc_id, s.lang, s.quality_score
FROM scored s JOIN winners w ON s.doc_id = w.doc_id
WHERE s.quality_score >= 0.6 AND s.lang IN ('en', 'de')
"""


#: IVF coarse-codebook size — FIXED in N (the reference's dictionary page is
#: likewise a bounded structure read ahead of data,
#: ParquetFileReader.java:819-859); round 2 used vec_id % 50, whose N/50
#: codebook collect would be ~10 GB pickled per task closure at 10^9 vectors
IVF_K = 16
#: Knuth multiplicative hash — computable identically in Spark and DuckDB
#: BIGINT arithmetic (no overflow below ~3.5e9 vec_ids; xxhash64 differs
#: between engines, so the oracle could not reproduce it)
_IVF_H_MUL = 2654435761
_IVF_H_MOD = 4294967296


def _ivf_codebook(spark, sf_dir):
    """Deterministic fixed-K codebook: the K vectors with the smallest
    multiplicative hash of vec_id (a stand-in for k-means||; training is out
    of scope, BOUNDED codebook mechanics are the point). orderBy+limit plans
    as TakeOrderedAndProject — a per-partition top-K then a K-row driver
    merge, never a full collect. Returns (cids, cmat, cnorm) numpy arrays,
    cids ascending."""
    import numpy as np

    e = _t(spark, sf_dir, "embeddings")
    h = (F.col("vec_id") * F.lit(_IVF_H_MUL)) % F.lit(_IVF_H_MOD)
    cents = (
        e.select("vec_id", "embedding")
        .orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .collect()
    )
    cids_l = np.array([r["vec_id"] for r in cents], dtype=np.int64)
    order = np.argsort(cids_l)
    cids = cids_l[order]
    cmat = np.array([cents[i]["embedding"] for i in order], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    return cids, cmat, cnorm


def _ivf_assign(spark, sf_dir) -> DataFrame:
    """IVF coarse quantizer: each vector is assigned to its max-cosine
    centroid via ONE mapInArrow numpy matmul per batch against the
    sc.broadcast codebook — no row explosion, no shuffle (the same scale
    shape as _lsh_buckets), and the codebook ships once per executor
    instead of being re-pickled into every task closure."""
    import pyarrow as pa

    e = _t(spark, sf_dir, "embeddings")
    bc = spark.sparkContext.broadcast(_ivf_codebook(spark, sf_dir))

    def assign(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as _np

        cids, cmat, cnorm = bc.value
        for batch in it:
            if batch.num_rows == 0:
                continue
            emb = batch.column("embedding").flatten().to_numpy(zero_copy_only=False)
            emb = emb.astype(_np.float64).reshape(batch.num_rows, -1)
            vnorm = _np.sqrt((emb * emb).sum(axis=1))
            cos = _np.round((emb @ cmat.T) / (vnorm[:, None] * cnorm[None, :]), 6)
            best = cos.argmax(axis=1)  # first max = smallest centroid id (ties)
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"), pa.array(cids[best])],
                ["vec_id", "centroid_id"],
            )

    return e.select("vec_id", "embedding").mapInArrow(
        assign, "vec_id bigint, centroid_id bigint"
    )


_IVF_ASSIGN_SQL = f"""
cent AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
         ORDER BY (vec_id * {_IVF_H_MUL}) % {_IVF_H_MOD}, vec_id LIMIT {IVF_K}),
pc AS (
  SELECT e.vec_id, c.cid,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(c.cemb) AS DOUBLE)      AS y
  FROM embeddings e, cent c
),
cos AS (
  SELECT vec_id, cid,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS c
  FROM pc GROUP BY vec_id, cid
),
assign AS (
  SELECT vec_id, cid AS centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid ASC) AS rn
  FROM cos
)
"""


def ops_ivf_clusters(spark, sf_dir):
    """IVF inverted-list sizes: how many vectors each coarse cell holds —
    validates the full assignment (every vector, not just the probed cell)."""
    a = _ivf_assign(spark, sf_dir)
    return a.groupBy("centroid_id").agg(F.count("*").alias("n_vectors"))


OPS_IVF_CLUSTERS_SQL = f"""
WITH {_IVF_ASSIGN_SQL}
SELECT centroid_id, count(*) AS n_vectors FROM assign WHERE rn = 1 GROUP BY centroid_id
"""


IVF_NPROBE = 2


def ops_ivf_topk(spark, sf_dir):
    """ANN via IVF with nprobe=2: probe the query's TWO nearest coarse cells
    (recovers neighbors that straddle a cell boundary — the standard recall
    lever), rerank members by exact cosine. Search cost O(nprobe*N/K)
    instead of O(N); the probe set is computed on the driver against the
    K-row codebook, so no extra distributed pass."""
    import numpy as np

    a = _ivf_assign(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    cids, cmat, cnorm = _ivf_codebook(spark, sf_dir)
    qemb = np.array(
        e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0],
        dtype=np.float64,
    )
    qcos = np.round((cmat @ qemb) / (cnorm * np.sqrt(qemb @ qemb)), 6)
    order = np.lexsort((cids, -qcos))  # cosine desc, centroid id asc
    probe = [int(cids[i]) for i in order[:IVF_NPROBE]]
    members = (
        a.filter(F.col("centroid_id").isin(probe))
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    ce = members.join(e, "vec_id")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    dot = F.aggregate(
        F.zip_with("embedding", "qemb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        ce.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(dot / (norm("embedding") * norm("qemb")), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


OPS_IVF_TOPK_SQL = f"""
WITH {_IVF_ASSIGN_SQL},
qc AS (SELECT cid AS centroid_id FROM cos
       WHERE vec_id = 0 ORDER BY c DESC, cid ASC LIMIT {IVF_NPROBE}),
members AS (
  SELECT DISTINCT a.vec_id FROM assign a JOIN qc ON a.centroid_id = qc.centroid_id
  WHERE a.rn = 1 AND a.vec_id <> 0
),
q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qemb) AS DOUBLE)      AS y
  FROM embeddings e JOIN members m ON e.vec_id = m.vec_id, q
)
SELECT vec_id, round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cosine
FROM p GROUP BY vec_id
ORDER BY cosine DESC, vec_id ASC
LIMIT 5
"""


def ops_blob_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary blobs -> typed metadata via a
    vectorized mapInArrow 'decoder' (real image/audio decode stubbed —
    libs absent; the Spark-side schema/batch plumbing is real). Everything
    is Arrow-kernel or JVM builtin — zero per-row Python."""
    import pyarrow as pa

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )

    def extract(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in it:
            blob = batch.column("blob")
            head = pc.binary_slice(blob, 0, 8)
            try:
                magic = pc.cast(head, pa.string())
            except pa.lib.ArrowInvalid:
                # genuinely opaque bytes (or a slice mid-codepoint): fall back
                # to replacement-char decoding for this batch only
                magic = pa.array(
                    [None if b is None else bytes(b).decode("utf-8", "replace")
                     for b in head.to_pylist()],
                    type=pa.string(),
                )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.cast(pc.binary_length(blob), pa.int64()),
                 magic, blob],
                ["doc_id", "n_bytes", "magic", "blob"],
            )

    out = d.mapInArrow(extract, "doc_id bigint, n_bytes bigint, magic string, blob binary")
    # content hash stays JVM-side (F.md5 is the exact builtin; per-row
    # Python hashlib in the hot path violates the north rule)
    return out.select("doc_id", "n_bytes", "magic", F.md5("blob").alias("content_md5"))


OPS_BLOB_SQL = """
SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes, substr(text, 1, 8) AS magic,
       md5(text) AS content_md5
FROM documents
"""


def ops_frame_sample(spark, sf_dir):
    """Video-style frame sampling: each blob = concatenated fixed-size
    frames; emit every 4th complete 256-byte frame as its own row. One
    mapInArrow pass per batch — frame counts from the Arrow offsets, one
    np.repeat for keys, ONE fancy-index gather for all sampled bytes; no
    shuffle, no per-frame Python (operators/multimodal.py:sample_frames)."""
    from .operators.multimodal import sample_frames

    # ASCII docs only so the DuckDB oracle (whose substring is
    # character-based and has no BLOB slicing) can mirror the BYTE-level
    # frames the operator cuts; the operator itself always works on bytes
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .select("doc_id", F.col("text").cast("binary").alias("blob"))
    )
    frames = sample_frames(d, frame_bytes=256, every_n=4,
                           blob_col="blob", key_col="doc_id")
    return frames.select(
        F.col("media_id").alias("doc_id"), "frame_idx",
        F.md5("frame").alias("frame_md5"),
    )


OPS_FRAMES_SQL = """
WITH f AS (
  SELECT doc_id, text, length(text) // 256 AS nf
  FROM documents
  WHERE octet_length(CAST(text AS BLOB)) = length(text)
)
SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       md5(substring(text, CAST(i AS INT) * 256 + 1, 256)) AS frame_md5
FROM f, unnest(range(0, nf, 4)) AS t(i)
"""


def ops_image_pipeline(spark, sf_dir):
    """Image pipeline plumbing: deterministic fake-image corpus -> decode
    (stubbed codec, real vectorized header/payload parse) -> nearest-neighbor
    resize to 8x8 -> brightness features, aggregated per source dimension.
    Each stage is one mapInArrow pass. Pixels are BIGINT arithmetic
    (multimodal.py: px[j] = (media_id*PX_K1 + j*PX_K2) % 256), so the DuckDB
    oracle re-derives every resized pixel and the integer brightness moments
    exactly; avg_brightness is ONE division of exact integers (identical
    IEEE rounding in both engines). Per-stage numpy oracles live in
    tests/test_multimodal.py."""
    from .operators.multimodal import (
        decode_images, image_features, resize_images, synth_image_blobs,
    )

    decoded = decode_images(synth_image_blobs(spark, 2000, partitions=8))
    feats = image_features(resize_images(decoded, 8, 8))
    joined = decoded.select("media_id", "width", "height").join(
        feats, "media_id"
    )
    # integer-exact aggregates: sum_px / sum_sq are exact int64 moments of
    # the 64-pixel resized image; 64*sum_sq - sum_px^2 = 4096 * variance
    return (
        joined.groupBy("width", "height")
        .agg(F.count("*").alias("n_images"),
             F.sum("sum_px").alias("brightness_sum"),
             F.sum(F.lit(64) * F.col("sum_sq")
                   - F.col("sum_px") * F.col("sum_px")).alias("var4096_sum"),
             (F.sum("sum_px") / (F.count("*") * F.lit(64)))
             .alias("avg_brightness"))
        .orderBy("width", "height")
    )


def ops_audio_meta(spark, sf_dir):
    """Audio pipeline plumbing: deterministic fake-audio corpus -> vectorized
    header parse + exact PCM byte sum (operators/multimodal.py:audio_meta),
    aggregated per (sample_rate, channels). PCM bytes are BIGINT arithmetic
    (pcm[j] = (media_id*PX_K1 + j*PX_K2 + PCM_SHIFT) % 256), so the DuckDB
    oracle re-derives every payload byte — content, not just headers."""
    from .operators.multimodal import audio_meta, synth_audio_blobs

    m = audio_meta(synth_audio_blobs(spark, 2000, partitions=8))
    return (
        m.groupBy("sample_rate", "channels")
        .agg(F.count("*").alias("n_clips"),
             F.sum("duration_ms").alias("total_ms"),
             F.sum("pcm_sum").alias("pcm_total"))
        .orderBy("sample_rate", "channels")
    )


OPS_AUDIO_SQL = """
WITH ids AS (
  SELECT i AS media_id,
         CASE i % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate,
         1 + i % 2 AS ch
  FROM range(0, 2000) t(i)
),
pcm AS (  -- 10 ms of 16-bit PCM: rate//100 * ch * 2 payload bytes
  SELECT media_id, rate, ch,
         SUM((media_id * 2654435761 + j * 40503 + 101) % 256) AS psum,
         COUNT(*) AS n_bytes
  FROM ids, unnest(range(0, rate // 100 * ch * 2)) AS u(j)
  GROUP BY media_id, rate, ch
)
SELECT CAST(rate AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
       CAST(COUNT(*) AS BIGINT) AS n_clips,
       CAST(SUM(n_bytes * 1000 // (rate * ch * 2)) AS BIGINT) AS total_ms,
       CAST(SUM(psum) AS BIGINT) AS pcm_total
FROM pcm GROUP BY rate, ch ORDER BY sample_rate, channels
"""


OPS_IMAGE_SQL = """
WITH ids AS (
  SELECT i AS media_id, 8 + i % 9 AS w, 6 + i % 7 AS h
  FROM range(0, 2000) t(i)
),
px AS (  -- nearest-neighbor 8x8 resize: source flat index (y*h//8)*w + (x*w//8)
  SELECT media_id, w, h,
         (media_id * 2654435761 +
          (((y * h) // 8) * w + ((x * w) // 8)) * 40503) % 256 AS p
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)
),
per_img AS (
  SELECT media_id, w, h, SUM(p) AS sp, SUM(p * p) AS sq
  FROM px GROUP BY media_id, w, h
)
SELECT CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(sp) AS BIGINT) AS brightness_sum,
       CAST(SUM(64 * sq - sp * sp) AS BIGINT) AS var4096_sum,
       CAST(SUM(sp) AS DOUBLE) / (COUNT(*) * 64) AS avg_brightness
FROM per_img
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# registry

#: EXACTLY 50 entries: the driver's CORRECTNESS artifact records at most 50
#: rows per round (r3 registered 53 and the last 3 got no row at all), so
#: every entry here must fit under that cap. q_events_by_type /
#: q_union_key_space moved to BENCH_ONLY (still oracled locally);
#: eng_decimal128_scan merged into eng_decimal_scan.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_top_orders": q03_top_orders,
    "q05_region_revenue": q05_region_revenue,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q_top_customers_per_segment": q_top_customers_per_segment,
    "q_events_daily": q_events_daily,
    "q_rollup_orders": q_rollup_orders,
    "q_semi_anti_customers": q_semi_anti_customers,
    "q_status_pivot": q_status_pivot,
    "eng_lang_counts": eng_lang_counts,
    "eng_insitu_isin": eng_insitu_isin,
    "eng_prune_range": eng_prune_range,
    "eng_ts_filter": eng_ts_filter,
    "eng_binary_filter": eng_binary_filter,
    "eng_compound_filter": eng_compound_filter,
    "eng_point_lookup": eng_point_lookup,
    "eng_startswith_filter": eng_startswith_filter,
    "eng_count_pushdown": eng_count_pushdown,
    "eng_agg_pushdown": eng_agg_pushdown,
    "eng_topk_pushdown": eng_topk_pushdown,
    "eng_codec_for": eng_codec_for,
    "eng_codec_prefix": eng_codec_prefix,
    "eng_codec_plain": eng_codec_plain,
    "eng_codec_localdict": eng_codec_localdict,
    "eng_codec_bool_rle": eng_codec_bool_rle,
    "eng_typed_scan": eng_typed_scan,
    "eng_decimal_scan": eng_decimal_scan,
    "eng_vector_scan": eng_vector_scan,
    "eng_ann_cosine": eng_ann_cosine,
    "eng_stream_rollup": eng_stream_rollup,
    "eng_stream_sessions": eng_stream_sessions,
    "eng_stream_threshold": eng_stream_threshold,
    "eng_datasource_scan": eng_datasource_scan,
    "eng_datasource_prune": eng_datasource_prune,
    "ops_dedup_exact": ops_dedup_exact,
    "ops_token_count": ops_token_count,
    "ops_quality_score": ops_quality_score,
    "ops_lang_id": ops_lang_id,
    "ops_fingerprint": ops_fingerprint,
    "ops_minhash_bands": ops_minhash_bands,
    "ops_ngram_jaccard_pairs": ops_ngram_jaccard_pairs,
    "ops_simhash": ops_simhash,
    "ops_cosine_topk": ops_cosine_topk,
    "ops_neardup_embeddings": ops_neardup_embeddings,
    "ops_ann_lsh_topk": ops_ann_lsh_topk,
    "ops_curation_pipeline": ops_curation_pipeline,
    "ops_ivf_topk": ops_ivf_topk,
    "ops_blob_meta": ops_blob_meta,
    "ops_frame_sample": ops_frame_sample,
    "ops_image_pipeline": ops_image_pipeline,
}

ORACLES: dict[str, str] = {
    "q01_pricing_summary": Q01_SQL,
    "q03_top_orders": Q03_SQL,
    "q05_region_revenue": Q05_SQL,
    "q06_forecast_revenue": Q06_SQL,
    "q_top_customers_per_segment": Q_TOPCUST_SQL,
    "q_events_daily": Q_DAILY_SQL,
    "q_rollup_orders": Q_ROLLUP_SQL,
    "q_semi_anti_customers": Q_SEMI_SQL,
    "q_status_pivot": Q_PIVOT_SQL,
    "eng_lang_counts": ENG_LANG_SQL,
    "eng_insitu_isin": ENG_ISIN_SQL,
    "eng_prune_range": ENG_PRUNE_SQL,
    "eng_ts_filter": ENG_TS_SQL,
    "eng_binary_filter": ENG_BINARY_SQL,
    "eng_compound_filter": ENG_COMPOUND_SQL,
    "eng_point_lookup": ENG_POINT_SQL,
    "eng_startswith_filter": ENG_STARTSWITH_SQL,
    "eng_count_pushdown": ENG_COUNT_SQL,
    "eng_agg_pushdown": ENG_AGG_SQL,
    "eng_topk_pushdown": ENG_TOPK_SQL,
    "eng_codec_for": ENG_FOR_SQL,
    "eng_codec_prefix": ENG_PREFIX_SQL,
    "eng_codec_plain": ENG_PLAIN_SQL,
    "eng_codec_localdict": ENG_LOCALDICT_SQL,
    "eng_codec_bool_rle": ENG_BOOL_SQL,
    "eng_typed_scan": ENG_TYPED_SQL,
    "eng_decimal_scan": ENG_DECIMAL_SQL,
    "eng_vector_scan": ENG_VECTOR_SQL,
    "eng_ann_cosine": ENG_ANN_SQL,
    "eng_stream_rollup": ENG_ROLLUP_SQL,
    "eng_stream_sessions": ENG_SESSIONS_SQL,
    "eng_stream_threshold": ENG_THRESHOLD_SQL,
    "eng_datasource_scan": ENG_DATASOURCE_SQL,
    "eng_datasource_prune": ENG_DATASOURCE_PRUNE_SQL,
    "ops_dedup_exact": OPS_DEDUP_EXACT_SQL,
    "ops_token_count": OPS_TOKENS_SQL,
    "ops_quality_score": OPS_QUALITY_SQL,
    "ops_lang_id": OPS_LANGID_SQL,
    "ops_fingerprint": OPS_FINGERPRINT_SQL,
    "ops_minhash_bands": OPS_MINHASH_SQL,
    "ops_ngram_jaccard_pairs": OPS_JACCARD_SQL,
    "ops_simhash": OPS_SIMHASH_SQL,
    "ops_cosine_topk": OPS_COSINE_SQL,
    "ops_neardup_embeddings": OPS_NEARDUP_SQL,
    "ops_ann_lsh_topk": OPS_ANN_TOPK_SQL,
    "ops_curation_pipeline": OPS_CURATION_SQL,
    "ops_ivf_topk": OPS_IVF_TOPK_SQL,
    "ops_blob_meta": OPS_BLOB_SQL,
    "ops_frame_sample": OPS_FRAMES_SQL,
    "ops_image_pipeline": OPS_IMAGE_SQL,
}

#: Queries trimmed from the driver registry to fit its 50-row artifact cap,
#: but still run + oracled by tests/test_queries_oracle.py (and bench.py for
#: q_events_by_type, for round-over-round timing continuity).
BENCH_ONLY: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_events_by_type": q_events_by_type,
    "q_union_key_space": q_union_key_space,
    # r6: slot went to eng_point_lookup; the pure-Or tree stays benched and
    # locally oracled (eng_compound_filter now carries Or in the registry)
    "eng_or_filter": eng_or_filter,
    # r6: audio pipeline — oracled locally; registry is at the 50-row cap
    "ops_audio_meta": ops_audio_meta,
    # r6.2: slots went to eng_agg_pushdown / eng_topk_pushdown; the LSH
    # bucket histogram and IVF cluster summary stay benched + locally
    # oracled (ops_ann_lsh_topk / ops_ivf_topk exercise the same bucketing
    # and codebook in the registry)
    "ops_ann_lsh_buckets": ops_ann_lsh_buckets,
    "ops_ivf_clusters": ops_ivf_clusters,
}

BENCH_ONLY_ORACLES: dict[str, str] = {
    "q_events_by_type": Q_EVENTS_SQL,
    "q_union_key_space": Q_UNION_SQL,
    "eng_or_filter": ENG_OR_SQL,
    "ops_audio_meta": OPS_AUDIO_SQL,
    "ops_ann_lsh_buckets": OPS_ANN_LSH_SQL,
    "ops_ivf_clusters": OPS_IVF_CLUSTERS_SQL,
}
