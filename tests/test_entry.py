"""Full side-by-side of __spark_entry__.queries() vs oracle_sql() via DuckDB
at sf0.001 — a local replica of the driver's correctness gate (which runs at
sf0.01): row count, schema (column names), order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _oracle_sf_env():
    """Generated VALUES oracles (louvain) must derive from the sf this test
    compares at — the driver itself runs with the default (sf0.01). Scoped
    to this module and restored afterward so other tests calling
    oracle_sql() in the same pytest process see the default again."""
    old = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
    yield
    if old is None:
        os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
    else:
        os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = old
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def canon(rows, columns):
    """Order-insensitive canonical form: rows as tuples in sorted-column
    order, floats rounded, then the multiset sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def fix(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        return v

    return sorted(tuple(fix(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: schema mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    assert canon(spark_rows, spark_cols) == canon(duck_rows, duck_cols), (
        f"{name}: value mismatch"
    )


def test_every_query_has_oracle():
    qs, os_ = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert os_ <= qs
    # every query is oracle-checked (generated VALUES oracles cover the
    # iterative ones) — no rows-only entries remain
    assert qs - os_ == set()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert df.columns == ["vid", "rank"]
    assert all(r["rank"] > 0 for r in rows)
