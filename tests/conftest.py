from __future__ import annotations

import pytest

from dupion_spark.config import DedupConfig
from dupion_spark.session import get_spark
from dupion_spark.sources.synth import generate


@pytest.fixture(scope="session")
def spark():
    session = get_spark("dupion_spark_tests", cores=8, shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()


@pytest.fixture(scope="session")
def fixture_small(cfg):
    """~600-row deterministic fixture with planted duplicate structure."""
    return generate(600, cfg)


@pytest.fixture(scope="session")
def images_df(spark, fixture_small):
    return spark.createDataFrame(fixture_small.images).cache()


@pytest.fixture(scope="session")
def partition_map_df(spark, fixture_small):
    return spark.createDataFrame(fixture_small.partition_map).cache()
