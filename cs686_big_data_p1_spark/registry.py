"""Query registry — single source of truth for the driver contract.

Every implemented operator registers here with:
  * a Spark callable ``(spark, sf_dir) -> DataFrame`` (idiomatic
    DataFrame API — this is the engine), and
  * optionally a DuckDB-dialect ANSI SQL oracle string (the driver
    hash-compares both at sf0.01).

``__spark_entry__.queries()`` / ``oracle_sql()`` just re-export these
dicts after importing the operator modules.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from .operators import analytics  # noqa: F401
    from .operators import dfs_meta  # noqa: F401
    from .operators import dfs_scalar  # noqa: F401
    from .operators import llm  # noqa: F401
    from .operators import windows  # noqa: F401
