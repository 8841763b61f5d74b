"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in windowed aggregates can't
express (SURVEY.md §2.9 X7 extension surface).

``applyInPandasWithState`` gives per-group user-managed state with an
explicit timeout policy: each micro-batch, every group with new rows (or
an expired timer) gets its pandas batches plus a ``GroupState`` handle.
This is Spark's public stateful-processing API for Python (the
Arrow-batched analog of Scala's ``flatMapGroupsWithState``).

Scale/state posture:
- State lives in the executor state store, keyed by the groupBy key —
  size is O(active groups), not O(events). A timeout (here: processing-
  time) evicts idle groups so state can't grow without bound.
- The groupBy shuffles once per micro-batch on the key; skewed keys are
  salted upstream exactly like batch (operators/partitioning.salted_agg)
  at the cost of per-salt partial states merged downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

# state carries the value total in INTEGER MICRO-UNITS (the repo-wide
# exact-money discipline, functions/exact_agg.py): a double running
# total folds in micro-batch arrival order, so replaying the same
# events through a different batch split could flip the last ulp —
# long micro sums are exact and order-independent, which is what makes
# the operator's output replay-exact (and x111 oracle-checkable).
RUNNING_TOTALS_STATE = StructType([
    StructField("n", LongType()),
    StructField("total_micros", LongType()),
])


def _micros(values: pd.Series) -> int:
    """Exact micro-unit total of a batch: FLOOR(v·1e6 + 0.5) per row
    (the exact_agg half-up law — identical IEEE ops in numpy, Spark
    SQL, and DuckDB), summed. NaNs are skipped like SUM's. The per-row
    floors convert to int64 BEFORE summing: a float64 fold of exact
    integer doubles rounds once the partial total passes 2^53 micros
    (~$9e9 in one user-batch), while the int64 sum is exact to the
    state word's own ±9.2e18 bound."""
    v = values.dropna().to_numpy(dtype=np.float64)
    return int(np.floor(v * 1e6 + 0.5).astype(np.int64).sum())


def _make_update_fn(idle_timeout_ms: int | None):
    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Accumulate per-user (count, micro-unit sum(value)) across
        micro-batches and emit the updated running totals once per
        batch-with-data."""
        if state.hasTimedOut:
            # idle user: emit nothing, drop the state (bounded state size)
            state.remove()
            return
        n, total_micros = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            total_micros += _micros(pdf["value"])
        state.update((n, total_micros))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        # float(micros)/1e6 is the same double both SQL engines derive
        # from the same integer — emitted unrounded, exact to 1e-6
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [float(total_micros) / 1e6],
        })

    return update


def user_running_totals(events: DataFrame,
                        idle_timeout_ms: int | None = None) -> DataFrame:
    """Streaming per-user lifetime totals with managed state — semantics
    no built-in windowed aggregate expresses (unbounded lifetime
    accumulation with optional per-group TTL).

    ``idle_timeout_ms`` enables processing-time state eviction for 24/7
    deployments (state is O(active users), not O(ever-seen users)). Leave
    it off for bounded runs: a processing-time timeout makes the engine
    schedule timer-check batches forever, so ``processAllAvailable``/
    availableNow would never see the stream as caught up.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout_ms),
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
