"""Local replica of the driver's correctness harness: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.001, compare row count,
column names, and an order-insensitive value multiset."""

from __future__ import annotations

import math

import duckdb
import pytest

from dupion_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    if isinstance(value, bool):
        return str(value)
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return str(value)


def _row_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(",".join(_norm(r[i]) for i in order) for r in rows)


PAIRS = sorted(set(Q.queries()) & set(Q.oracle_sql()))


@pytest.mark.parametrize("name", PAIRS)
def test_query_matches_oracle(spark, duck, name):
    spark_df = Q.queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    res = duck.execute(Q.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_spark = _row_multiset(spark_cols, spark_rows)
    ms_duck = _row_multiset(duck_cols, duck_rows)
    if ms_spark != ms_duck:
        diff = [
            (a, b) for a, b in zip(ms_spark, ms_duck) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_every_query_has_oracle_or_is_image_pipeline():
    missing = set(Q.queries()) - set(Q.oracle_sql())
    assert all(n.startswith("img_") for n in missing), missing
