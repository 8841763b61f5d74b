"""Run every registered query against the DuckDB oracle at sf0.001 —
a local, stricter replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.oracle_util import assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_SMALL)
    assert_matches_oracle(df, _ORACLES[name], SF_SMALL, name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = _QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
