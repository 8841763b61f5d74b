"""Named analytical queries — the judge-facing query surface.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLE: dict[str, str]`` (DuckDB-runnable ANSI SQL with
identical column aliases). ``__spark_entry__.py`` aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import kpi, relational, temporal, extensions

    out: dict = {}
    for mod in (kpi, relational, temporal, extensions):
        out.update(mod.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    from . import kpi, relational, temporal, extensions

    out: dict = {}
    for mod in (kpi, relational, temporal, extensions):
        out.update(mod.ORACLE)
    return out
