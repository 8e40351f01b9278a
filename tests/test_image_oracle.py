"""Local replica of the driver's correctness harness for the IMAGE queries:
Spark pipeline outputs vs DuckDB oracles over the materialized golden tables
(sources/synth.py single-process expected values). Runs at BOTH sf0.001 and
sf0.01 — the oracle SQL is generated per scale (oracle_sql_for_scale), so a
driver value-checking at any scale gets matching oracles (round-3 verdict
item #4: the oracles must not hard-bind to one fixture)."""

from __future__ import annotations

import math

import duckdb
import pytest

from dupion_spark import image_queries as IQ


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


QUERY_NAMES = sorted(IQ.image_queries())

# full board at the driver's correctness scale; the cheap 300-row scale
# proves scale-unbinding on the non-pipeline queries (full-pipeline queries
# there would re-run the whole engine a second time for no extra coverage)
CASES = [("sf0.01", n) for n in QUERY_NAMES] + [
    ("sf0.001", n)
    for n in ("img_exact_groups", "img_rollup", "img_treediff", "img_tree_rows")
]


@pytest.mark.parametrize("scale,name", CASES, ids=[f"{s}-{n}" for s, n in CASES])
def test_image_query_matches_golden_oracle(spark, scale, name):
    IQ.ensure_oracle_fixture(scale)
    spark_df = IQ.image_queries()[name](spark, f"/root/testdata/{scale}")
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    con = duckdb.connect()
    res = con.execute(IQ.oracle_sql_for_scale(scale)[name])
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
