"""Driver-mimic: every queries() entry vs its DuckDB oracle_sql() at sf0.01.

Reproduces the driver's CORRECTNESS gate locally: row count + column set +
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized) must match between the Spark query and DuckDB.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _hash_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in idx) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as entry_mod

    return entry_mod


def _all_query_names():
    from parquet_main_spark.queries import BENCH_ONLY, QUERIES

    return list(QUERIES) + list(BENCH_ONLY)


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, duck, contract, name):
    from parquet_main_spark.queries import BENCH_ONLY, BENCH_ONLY_ORACLES

    qs = {**contract.queries(), **BENCH_ONLY}
    os_ = {**contract.oracle_sql(), **BENCH_ONLY_ORACLES}
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in os_:
        # non-SQL-expressible op: the driver records the weaker rows-only
        # check; locally we at least require a non-empty, schema-stable result
        assert len(srows) > 0 and len(scols) > 0, f"{name}: vacuous rows-only query"
        return
    res = duck.execute(os_[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert _hash_rows(scols, srows) == _hash_rows(dcols, drows), f"{name}: value hash mismatch"


def test_registry_fits_driver_cap(contract):
    """The driver's CORRECTNESS artifact records at most 50 rows per round
    (observed: r3 registered 53 queries, the last 3 got no row). Every
    registered query must actually be gated, so the registry must stay at
    or under the cap."""
    qs = contract.queries()
    assert len(qs) <= 50, f"registry has {len(qs)} entries; driver caps at 50"
    extra = set(contract.oracle_sql()) - set(qs)
    assert not extra, f"oracles without a registered query: {sorted(extra)}"


def test_entry_smoke(contract):
    from parquet_main_spark.session import get_spark

    spark = get_spark(8, "entry-smoke", 8)
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema is not None
