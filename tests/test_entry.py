from __future__ import annotations

from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_callable_and_runs(spark, registry):
    qs = registry.QUERIES
    assert len(qs) >= 5
    for name, fn in qs.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name


def test_oracles_reference_registered_queries(registry):
    assert set(registry.ORACLES) <= set(registry.QUERIES)
