"""Iceberg capability probe + backend selection (VERDICT r2 next-round #4a).

The sandbox has no Iceberg runtime jar, so the probe must return None and the
CheckpointManager must fall back to parquet+manifest; the probe logic itself
is exercised with fakes so the iceberg branch is test-shaped even where the
jar is absent.
"""

from __future__ import annotations

from dupion_spark.config import DedupConfig
from dupion_spark.sources import checkpoint as cp


class _FakeConf:
    def __init__(self, entries):
        self._entries = entries

    def getAll(self):
        return list(self._entries.items())


class _FakeClassLoader:
    class java:  # noqa: N801 - mirrors the py4j attribute path
        class lang:
            class Class:
                @staticmethod
                def forName(name):
                    if "iceberg" in name.lower():
                        raise Exception("ClassNotFoundException")


class _FakeSpark:
    def __init__(self, entries, loadable=False):
        class _SC:
            pass

        self.sparkContext = _SC()
        self.sparkContext.getConf = lambda: _FakeConf(entries)
        if loadable:
            class _JVM:
                class java:
                    class lang:
                        class Class:
                            @staticmethod
                            def forName(name):
                                return object()
            self._jvm = _JVM()
        else:
            self._jvm = _FakeClassLoader()


def test_probe_none_in_sandbox(spark):
    assert cp.iceberg_catalog(spark) is None


def test_probe_ignores_non_iceberg_catalogs():
    fake = _FakeSpark({"spark.sql.catalog.mine": "com.example.OtherCatalog"})
    assert cp.iceberg_catalog(fake) is None


def test_probe_rejects_config_without_jar():
    fake = _FakeSpark(
        {"spark.sql.catalog.ice": "org.apache.iceberg.spark.SparkCatalog"},
        loadable=False,
    )
    assert cp.iceberg_catalog(fake) is None


def test_probe_accepts_loadable_iceberg_catalog():
    fake = _FakeSpark(
        {"spark.sql.catalog.ice": "org.apache.iceberg.spark.SparkCatalog"},
        loadable=True,
    )
    assert cp.iceberg_catalog(fake) == "ice"


def test_manager_falls_back_to_parquet(spark, tmp_path):
    mgr = cp.CheckpointManager(spark, str(tmp_path / "ckpt"), DedupConfig())
    assert mgr.catalog is None
    assert mgr.table_format == "parquet+manifest"


def test_manager_selects_iceberg_when_probed(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(cp, "iceberg_catalog", lambda s: "ice")
    created = []
    monkeypatch.setattr(spark, "sql", lambda q: created.append(q))
    mgr = cp.CheckpointManager(spark, str(tmp_path / "ckpt"), DedupConfig())
    assert mgr.table_format == "iceberg"
    assert mgr._table_ident("features") == "ice.ckpt.features"
    assert created and "CREATE NAMESPACE" in created[0]
