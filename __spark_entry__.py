"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-style Q1 pricing
summary) on sf0.001. ``queries()`` / ``oracle_sql()`` re-export the
engine's registry (cs686_big_data_p1_spark.registry): every operator
from SURVEY.md §2 registers a Spark callable and, where
SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cs686_big_data_p1_spark import registry
from cs686_big_data_p1_spark.session import configure_existing

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return registry.QUERIES["tpch_q1_pricing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # drop the previous query's scratch caches (the driver
            # materializes each query before requesting the next, so
            # anything still tracked here is dead weight by now)
            registry.clear_caches()
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
