"""Unit tests for the registry-wide plan lint's parser
(tools/plan_lint.py) — synthetic plan text, no Spark session. The full
sweep (193 plans, every registered query) runs per-round via
``python tools/plan_lint.py``; these pin that the pattern detectors
can't silently rot: a funnel the lint stops seeing is a funnel the
round stops catching."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.plan_lint import _lint  # noqa: E402

FUNNEL = """\
AdaptiveSparkPlan
+- Window [sum(v) windowspecdefinition(ts ASC)], [ts ASC]
   +- Sort [ts ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
         +- Scan parquet [ts,v]
"""

GRAND_TOTAL = """\
AdaptiveSparkPlan
+- HashAggregate(keys=[], functions=[sum(v)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
      +- HashAggregate(keys=[], functions=[partial_sum(v)])
         +- Scan parquet [v]
"""

ONE_ROW_BNLJ = """\
AdaptiveSparkPlan
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- Scan parquet [a,b]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- HashAggregate(keys=[], functions=[avg(v)])
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
            +- HashAggregate(keys=[], functions=[partial_avg(v)])
               +- Scan parquet [v]
"""

KEYED_BNLJ = """\
AdaptiveSparkPlan
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- Scan parquet [a,b]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- HashAggregate(keys=[k], functions=[avg(v)])
         +- Scan parquet [k,v]
"""

# a grand aggregate on the STREAMED side must not excuse a keyed build
STREAM_SIDE_GRAND_BNLJ = """\
AdaptiveSparkPlan
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- HashAggregate(keys=[], functions=[sum(v)])
   :  +- Scan parquet [v]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- Scan parquet [k]
"""


def test_flags_single_partition_window_funnel():
    found = _lint(FUNNEL)
    assert len(found) == 1 and found[0].startswith("SinglePartition->")
    assert "Sort" in found[0]


def test_accepts_grand_total_single_partition():
    assert _lint(GRAND_TOTAL) == []


def test_accepts_one_row_statistic_bnlj():
    assert _lint(ONE_ROW_BNLJ) == []


def test_flags_keyed_build_bnlj():
    assert _lint(KEYED_BNLJ) == ["BroadcastNestedLoopJoin"]


def test_stream_side_grand_agg_does_not_excuse_bnlj():
    assert _lint(STREAM_SIDE_GRAND_BNLJ) == ["BroadcastNestedLoopJoin"]


def test_flags_cartesian_and_python_udf():
    assert "CartesianProduct" in _lint("+- CartesianProduct\n")
    assert "BatchEvalPython" in _lint("+- BatchEvalPython [f(x)]\n")


SORT_AGG_BNLJ = """\
AdaptiveSparkPlan
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- Scan parquet [a,b]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- SortAggregate(key=[], functions=[min(struct(p, p, nh, nh))])
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
            +- SortAggregate(key=[], functions=[partial_min(struct(p, p))])
               +- Scan parquet [p,nh]
"""

KEYED_SORT_AGG_BNLJ = SORT_AGG_BNLJ.replace("key=[]", "key=[k]")


def test_accepts_one_row_sort_aggregate_bnlj():
    """SortAggregate prints the SINGULAR `key=[]` (min(struct(...))
    forces the sort-based impl — x130's boundary statistic); it is
    exactly as one-row-bounded as HashAggregate(keys=[])."""
    assert _lint(SORT_AGG_BNLJ) == []


def test_flags_keyed_sort_aggregate_bnlj():
    assert "BroadcastNestedLoopJoin" in _lint(KEYED_SORT_AGG_BNLJ)
