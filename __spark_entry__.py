"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: exact+near-duplicate clustering of the synthetic
                  image+caption table at the sf0.001 scale.
queries()       — every implemented operator from SURVEY.md §2: relational
                  operators over the driver's TPC-H-ish parquet tables (each
                  with a DuckDB oracle), plus the image-pipeline queries on
                  the deterministic synthetic fixture.
oracle_sql()    — DuckDB-runnable ANSI SQL per query; column names
                  alias-matched to the Spark side. Image queries are checked
                  against materialized GOLDEN parquet tables (single-process
                  numpy/hashlib expected values, dupion_spark/sources/synth.py)
                  via read_parquet — the pixel decode itself is not
                  SQL-expressible, so the golden table IS its expected output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dupion_spark import image_queries as IQ
from dupion_spark import media_queries as MQ
from dupion_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return IQ.q_img_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(Q.queries())
    merged.update(IQ.image_queries())
    merged.update(MQ.media_queries())
    return merged


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    merged.update(Q.oracle_sql())
    merged.update(IQ.image_oracle_sql())
    merged.update(MQ.media_oracle_sql())
    return merged
