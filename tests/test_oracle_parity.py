"""Differential testing against the DuckDB oracle — mirrors the driver's
t2 check (row-count + schema-width + sorted-value comparison) at sf0.01.

Floats are rounded to 6 significant-ish decimals before comparing; rows and
columns are sorted so ordering differences don't matter.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{ORACLE_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.6f}"
    if isinstance(value, bool):
        return str(int(value))
    return str(value)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, ddb, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, ORACLE_SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    res = ddb.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    s_canon = canon_rows(scols, [tuple(r) for r in srows])
    d_canon = canon_rows(dcols, drows)
    mismatches = [i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"spark={s_canon[mismatches[0]]} oracle={d_canon[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, ORACLE_SF_DIR)
    assert sdf.count() >= 0
