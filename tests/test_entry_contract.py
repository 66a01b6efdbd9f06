"""Driver-contract validation: every oracle-checked query in
__spark_entry__ must match its DuckDB oracle at sf0.01 — same row count,
same column names, same values after sorting columns by name (mirrors the
driver's CORRECTNESS comparison).  Queries without an oracle get a
runs-and-returns-rows smoke check; entry() must produce a stable schema.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(rows, columns):
    """Sort columns by name, round floats, make hashable tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        return v

    return sorted(tuple(key(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column names differ: {spark_cols} vs {ddb_cols}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count {len(spark_rows)} != oracle {len(ddb_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"{a[i]} != {b[i]}" for i in mism
    )


def test_all_queries_return_rows(spark):
    """Rows-only check for every registered query (oracle or not)."""
    for name, q in entry_mod.queries().items():
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name
        assert df.columns, name


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"doc_id", "cluster_id"}
