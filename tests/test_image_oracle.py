"""Local replica of the driver's correctness harness for the IMAGE queries:
Spark pipeline outputs vs DuckDB oracles over the materialized golden tables
(sources/synth.py single-process expected values). Runs at sf0.01 — the
driver's correctness scale, which the image oracle SQL binds to."""

from __future__ import annotations

import math

import duckdb
import pytest

from dupion_spark import image_queries as IQ

SF_DIR = "/root/testdata/sf0.01"


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


ORACLES = IQ.image_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_image_query_matches_golden_oracle(spark, name):
    spark_df = IQ.image_queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    con = duckdb.connect()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert len(spark_rows) > 0, f"{name}: vacuous oracle (0 rows)"
    ms_spark = _row_multiset(spark_cols, spark_rows)
    ms_duck = _row_multiset(duck_cols, duck_rows)
    if ms_spark != ms_duck:
        diff = [(a, b) for a, b in zip(ms_spark, ms_duck) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
