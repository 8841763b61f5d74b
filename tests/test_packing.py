"""operators/packing.py — concat-then-chunk sequence packing.

Pins the invariants the r9 driver face will certify: token
conservation, exact pack fullness, gap-/overlap-free pack tiling,
straddle segmentation, partition-layout independence, and the seed
contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.operators.packing import (
    pack_concat_chunks,
)

BUDGET = 128


def _docs(spark, n=200):
    # token counts 1..~300 — some docs bigger than the budget (straddle
    # several packs), many smaller (several docs per pack)
    rows = [(i, 1 + (i * 37) % 300) for i in range(1, n + 1)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_token_conservation_and_pack_fullness(spark):
    docs = _docs(spark)
    seg = pack_concat_chunks(docs, "doc_id", "n_tokens", BUDGET, seed=1)
    total = docs.agg(F.sum("n_tokens")).first()[0]
    # conservation: per-document segment lengths sum to its count
    per_doc = (
        seg.groupBy("doc_id").agg(F.sum("seg_len").alias("s"))
        .join(docs, "doc_id")
        .filter(F.col("s") != F.col("n_tokens"))
    )
    assert per_doc.count() == 0
    # fullness: every pack except the last holds exactly BUDGET tokens
    packs = (
        seg.groupBy("pack_id").agg(F.sum("seg_len").alias("tok"))
        .orderBy("pack_id").collect()
    )
    assert [p.pack_id for p in packs] == list(range(len(packs)))
    assert all(p.tok == BUDGET for p in packs[:-1])
    assert 0 < packs[-1].tok <= BUDGET
    assert sum(p.tok for p in packs) == total


def test_segments_tile_each_pack_without_gaps_or_overlap(spark):
    seg = pack_concat_chunks(_docs(spark), "doc_id", "n_tokens",
                             BUDGET, seed=1).collect()
    by_pack: dict[int, list] = {}
    for r in seg:
        assert r.seg_len > 0
        assert 0 <= r.pack_offset < BUDGET
        by_pack.setdefault(r.pack_id, []).append(r)
    for rows in by_pack.values():
        rows.sort(key=lambda r: r.pack_offset)
        pos = 0
        for r in rows:
            assert r.pack_offset == pos  # no gap, no overlap
            pos += r.seg_len
        assert pos <= BUDGET


def test_straddling_docs_split_into_contiguous_segments(spark):
    # one doc of 3.5 budgets between two small ones
    docs = spark.createDataFrame(
        [(1, 100), (2, int(BUDGET * 3.5)), (3, 50)],
        "doc_id long, n_tokens long",
    )
    seg = pack_concat_chunks(docs, "doc_id", "n_tokens", BUDGET, seed=0)
    big = sorted(
        (r for r in seg.collect() if r.doc_id == 2),
        key=lambda r: r.seg_start,
    )
    assert len(big) >= 4  # 3.5 budgets span at least 4 packs
    # document coverage is contiguous: seg_starts chain by seg_len
    pos = 0
    for r in big:
        assert r.seg_start == pos
        pos += r.seg_len
    assert pos == int(BUDGET * 3.5)
    # pack ids are consecutive
    pids = [r.pack_id for r in big]
    assert pids == list(range(pids[0], pids[0] + len(pids)))


def test_partition_layout_independence(spark):
    docs = _docs(spark)
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    a = key(pack_concat_chunks(docs, "doc_id", "n_tokens",
                               BUDGET, seed=7).collect())
    b = key(pack_concat_chunks(docs.repartition(13), "doc_id", "n_tokens",
                               BUDGET, seed=7).collect())
    c = key(pack_concat_chunks(docs.coalesce(1), "doc_id", "n_tokens",
                               BUDGET, seed=7).collect())
    assert a == b == c


def test_seed_changes_adjacency_reproducibly(spark):
    docs = _docs(spark)
    a1 = sorted(map(tuple, pack_concat_chunks(
        docs, "doc_id", "n_tokens", BUDGET, seed=1).collect()))
    a2 = sorted(map(tuple, pack_concat_chunks(
        docs, "doc_id", "n_tokens", BUDGET, seed=1).collect()))
    b = sorted(map(tuple, pack_concat_chunks(
        docs, "doc_id", "n_tokens", BUDGET, seed=2).collect()))
    assert a1 == a2      # same seed → identical packing
    assert a1 != b       # new epoch seed → different adjacency


def test_rejects_bad_token_counts_and_reserved_columns(spark):
    bad = spark.createDataFrame([(1, 5), (2, 0)],
                                "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="positive"):
        pack_concat_chunks(bad, "doc_id", "n_tokens", BUDGET)
    nulls = spark.createDataFrame([(1, 5), (2, None)],
                                  "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="positive"):
        pack_concat_chunks(nulls, "doc_id", "n_tokens", BUDGET)
    clash = spark.createDataFrame([(1, 5, 0)],
                                  "doc_id long, n_tokens long, pack_id long")
    with pytest.raises(ValueError, match="collide"):
        pack_concat_chunks(clash, "doc_id", "n_tokens", BUDGET)
    with pytest.raises(ValueError, match="budget"):
        pack_concat_chunks(_docs(spark), "doc_id", "n_tokens", 0)


def test_validate_false_drops_bad_rows_instead_of_corrupting(spark):
    # r8 ADVICE: with validate=False a zero-token row whose global start
    # lands on a pack boundary made __p1 < __p0 and sequence() fanned
    # out a DESCENDING range — corrupt negative-length segments. The
    # guard must degrade it to a silent drop: the packing of the good
    # rows is EXACTLY the packing with the bad rows pre-filtered.
    good = _docs(spark, n=60)
    with_bad = good.union(
        spark.createDataFrame([(1001, 0), (1002, None)],
                              "doc_id long, n_tokens long")
    )
    want = {
        tuple(r)
        for r in pack_concat_chunks(good, "doc_id", "n_tokens", BUDGET,
                                    seed=3).collect()
    }
    got_rows = pack_concat_chunks(with_bad, "doc_id", "n_tokens", BUDGET,
                                  seed=3, validate=False).collect()
    assert {tuple(r) for r in got_rows} == want
    assert all(r.seg_len > 0 for r in got_rows)
    assert not any(r.doc_id in (1001, 1002) for r in got_rows)


def test_validate_false_negative_counts_do_not_shift_offsets(spark):
    # r9 ADVICE: zero/NULL counts are inert in SUM, but a NEGATIVE
    # count entering the band totals / prefix windows would SUBTRACT
    # from every later document's global offset — re-cutting every
    # downstream pack even though the bad row itself is dropped at the
    # fan-out. Bad rows must be filtered BEFORE the prefix sums: the
    # packing must equal packing the pre-filtered input exactly.
    good = _docs(spark, n=60)
    with_neg = good.union(
        spark.createDataFrame([(2001, -17), (2002, -1)],
                              "doc_id long, n_tokens long")
    )
    want = {
        tuple(r)
        for r in pack_concat_chunks(good, "doc_id", "n_tokens", BUDGET,
                                    seed=3).collect()
    }
    got_rows = pack_concat_chunks(with_neg, "doc_id", "n_tokens", BUDGET,
                                  seed=3, validate=False).collect()
    assert {tuple(r) for r in got_rows} == want
    assert not any(r.doc_id in (2001, 2002) for r in got_rows)


def test_empty_input_packs_to_empty_output(spark):
    # zero documents (or all filtered by the validate=False guard) must
    # yield an empty segment table with the contract schema, not an
    # error from the offsets window or the broadcast join over nothing
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = pack_concat_chunks(empty, "doc_id", "n_tokens", BUDGET)
    assert out.columns == ["doc_id", "pack_id", "seg_start", "seg_len",
                           "pack_offset"]
    assert out.count() == 0
    all_bad = spark.createDataFrame([(1, 0), (2, None)],
                                    "doc_id long, n_tokens long")
    assert pack_concat_chunks(all_bad, "doc_id", "n_tokens", BUDGET,
                              validate=False).count() == 0


def test_no_single_partition_window_funnel(spark):
    """The global prefix sum must be the two-phase scan, not a bare
    Window.orderBy over the data (which funnels everything to ONE
    partition): the only unpartitioned window in the plan may be the
    |partitions|-row offsets table, which the plan shows as a window
    whose input is an aggregate, never the base scan."""
    seg = pack_concat_chunks(_docs(spark, n=500), "doc_id", "n_tokens",
                             BUDGET, seed=3)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # every row-level window (ordered by the doc hash) must carry the
    # hash-band key — an unpartitioned one would be the funnel
    row_windows = [ln for ln in plan.splitlines()
                   if "Window" in ln and "__ph" in ln]
    assert row_windows, plan
    assert all("__band" in ln for ln in row_windows), plan
    # r9: the band is a projection, not a range partitioner — no
    # sampling pass, and the full data shuffles exactly once (for the
    # per-band window; the offsets side is a map-side partial agg)
    assert "RangePartitioning" not in plan, plan
