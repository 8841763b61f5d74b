"""Concurrency semantics of the snapshot-swap dimension upsert
(operators/transactional.py — r2 VERDICT missing #1).

The dangerous interleaving is: writer B reads state N, writer A commits
N+1, writer B commits its diff computed against the now-stale N. A naive
read-diff-append duplicates every key both writers saw as new. The
protocol must instead force B into a conflict + rebase.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.operators.transactional import (
    CommitConflict,
    SnapshotTable,
)


def _dim(spark, rows):
    return spark.createDataFrame(rows, "airline_id int, airline_name string")


def test_insert_if_new_basic(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "dim"))
    v1 = t.upsert(spark, _dim(spark, [(1, "AirA"), (2, "AirB")]), "airline_id")
    assert v1 == 1
    # existing key 2 must NOT be updated (insert-if-new), key 3 appended
    v2 = t.upsert(spark, _dim(spark, [(2, "Renamed"), (3, "AirC")]), "airline_id")
    assert v2 == 2
    state = {r.airline_id: r.airline_name for r in t.read(spark).collect()}
    assert state == {1: "AirA", 2: "AirB", 3: "AirC"}


def test_in_batch_duplicate_keys_deduped_deterministically(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "dim"))
    t.upsert(spark, _dim(spark, [(1, "Zeta"), (1, "Alpha"), (1, "Mid")]),
             "airline_id")
    rows = t.read(spark).collect()
    assert len(rows) == 1
    assert rows[0].airline_name == "Alpha"  # min-struct, order-free


def test_interleaved_upserts_do_not_duplicate_keys(spark, tmp_path):
    """Writer B reads the base, writer A commits in between, writer B must
    conflict, rebase onto A's state, and retry — no duplicated keys, no
    lost updates, and insert-if-new still honors A's earlier write."""
    t = SnapshotTable(str(tmp_path / "dim"))
    t.upsert(spark, _dim(spark, [(1, "AirA")]), "airline_id")

    def concurrent_writer_a():
        # interleaves exactly between B's read and B's commit; key 2 and
        # the shared key 3 are committed by A first
        t.upsert(spark, _dim(spark, [(2, "AirB-from-A"), (3, "Shared-from-A")]),
                 "airline_id")

    v = t.upsert(
        spark,
        _dim(spark, [(3, "Shared-from-B"), (4, "AirD")]),
        "airline_id",
        _test_between_read_and_commit=concurrent_writer_a,
    )
    assert v == 3  # base was 1, A took 2, B rebased onto 2 and committed 3

    state = t.read(spark)
    assert state.count() == state.select("airline_id").distinct().count()
    by_key = {r.airline_id: r.airline_name for r in state.collect()}
    # A won key 3 (committed first); B's rebase must not clobber it
    assert by_key == {1: "AirA", 2: "AirB-from-A", 3: "Shared-from-A", 4: "AirD"}


def test_reader_never_sees_uncommitted_snapshot(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "dim"))
    t.upsert(spark, _dim(spark, [(1, "AirA")]), "airline_id")
    # a crashed writer: snapshot data written, marker never created
    orphan = _dim(spark, [(99, "Ghost")])
    orphan.write.parquet(str(tmp_path / "dim" / "data" / "deadbeef"))
    assert t.latest_version() == 1
    assert [r.airline_id for r in t.read(spark).collect()] == [1]


def test_commit_conflict_exhausts_retries(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "dim"))
    t.upsert(spark, _dim(spark, [(1, "AirA")]), "airline_id")

    class AlwaysConflict(SnapshotTable):
        def _try_commit(self, df, version):
            raise CommitConflict("forced")

    t2 = AlwaysConflict(str(tmp_path / "dim"))
    with pytest.raises(CommitConflict, match="gave up"):
        t2.upsert(spark, _dim(spark, [(5, "AirE")]), "airline_id",
                  max_retries=2)


def test_scd2_apply_composes_with_snapshot_commit(spark, tmp_path):
    """The protocol is apply-agnostic: plugging scd2_upsert in gives a
    transactional SCD2 dimension."""
    from airflow_project_flight_price_analysis_spark.operators.scd import (
        OPEN_END,
        scd2_upsert,
    )

    t = SnapshotTable(str(tmp_path / "scd"))
    init = spark.createDataFrame(
        [(1, "AirA", "2024-01-01", OPEN_END)],
        "airline_id int, airline_name string, valid_from string, valid_to string",
    )
    t.upsert(spark, init, "airline_id", apply=lambda cur, upd: upd)

    updates = spark.createDataFrame(
        [(1, "AirA-renamed")], "airline_id int, airline_name string")
    t.upsert(
        spark, updates, "airline_id",
        apply=lambda cur, upd: scd2_upsert(
            cur, upd, "airline_id", ["airline_name"], "2024-06-01"),
    )
    live = t.read(spark).filter(F.col("valid_to") == OPEN_END).collect()
    assert len(live) == 1 and live[0].airline_name == "AirA-renamed"
    closed = t.read(spark).filter(F.col("valid_to") == "2024-06-01").collect()
    assert len(closed) == 1 and closed[0].airline_name == "AirA"


def test_streaming_dim_upsert_epoch_replay_is_idempotent(spark, tmp_path):
    """X7 × D5: a replayed foreachBatch epoch (at-least-once delivery)
    must not duplicate dimension keys — insert-if-new + snapshot commit
    makes the replay an empty diff."""
    from airflow_project_flight_price_analysis_spark.streaming.dim_upsert import (
        make_dim_upsert_sink,
    )

    root = str(tmp_path / "dim")
    sink = make_dim_upsert_sink(root, "airline_id")
    batch1 = _dim(spark, [(1, "AirA"), (2, "AirB")])
    sink(batch1, 0)
    sink(batch1, 0)  # crash-replay of the same epoch
    sink(_dim(spark, [(2, "Renamed"), (3, "AirC")]), 1)

    t = SnapshotTable(root)
    state = {r.airline_id: r.airline_name for r in t.read(spark).collect()}
    assert state == {1: "AirA", 2: "AirB", 3: "AirC"}
    # the replay still committed (empty diff) — version advanced per call
    assert t.latest_version() == 3


def test_streaming_dim_upsert_end_to_end(spark, tmp_path):
    """Real readStream → foreachBatch → SnapshotTable wiring."""
    from airflow_project_flight_price_analysis_spark.streaming.dim_upsert import (
        start_dim_stream,
    )

    src_dir = str(tmp_path / "landing")
    _dim(spark, [(1, "AirA"), (2, "AirB"), (2, "AirB")]).write.parquet(src_dir)
    source = spark.readStream.schema(
        "airline_id int, airline_name string").parquet(src_dir)
    q = start_dim_stream(source, str(tmp_path / "dim"), "airline_id",
                         str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)  # False = timed out

    state = SnapshotTable(str(tmp_path / "dim")).read(spark)
    assert state.count() == 2
    assert state.select("airline_id").distinct().count() == 2


def test_upsert_null_key_inserts_once(spark, tmp_path):
    """A NULL-key row must behave like any other key: inserted once,
    then recognized as existing by the null-safe check — not re-inserted
    on every subsequent upsert (the r5 ADVICE anti-join bug class)."""
    from airflow_project_flight_price_analysis_spark.operators.transactional import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path / "tbl"))
    upd = spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string")
    t.upsert(spark, upd, key="k")
    t.upsert(spark, upd, key="k")
    rows = t.read(spark).collect()
    assert len(rows) == 2
    got = sorted(
        [(r.k, r.v) for r in rows], key=lambda p: (p[0] is None, p)
    )
    assert got == [(1, "a"), (None, "x")]


# --- BucketedMergeTable: bucket-granular copy-on-write MERGE (r7) ----------

def _bm(tmp_path, n_buckets=8):
    from airflow_project_flight_price_analysis_spark.operators.transactional import (
        BucketedMergeTable,
    )

    return BucketedMergeTable(str(tmp_path / "bm"), "k", n_buckets=n_buckets)


def _rows(t, spark):
    df = t.read(spark)
    return sorted((r.k, r.v) for r in df.collect()) if df is not None else []


def test_merge_update_and_insert_semantics(spark, tmp_path):
    t = _bm(tmp_path)
    t.merge(spark, spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    # update 2, insert 4
    t.merge(spark, spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"))
    assert _rows(t, spark) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_merge_delete_semantics(spark, tmp_path):
    t = _bm(tmp_path)
    t.merge(spark, spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    t.merge(spark, spark.createDataFrame(
        [(2, "ignored"), (9, "no-op")], "k long, v string"),
        when_matched="delete")
    assert _rows(t, spark) == [(1, "a"), (3, "c")]


def test_merge_rewrites_only_changed_buckets(spark, tmp_path):
    """The copy-on-write contract: buckets without source keys carry
    forward BY REFERENCE — their manifest entries are byte-identical
    across the commit."""
    t = _bm(tmp_path, n_buckets=16)
    base = spark.createDataFrame([(i, f"v{i}") for i in range(64)],
                                 "k long, v string")
    t.merge(spark, base)
    man1 = t._manifest(t.latest_version())
    t.merge(spark, spark.createDataFrame([(5, "V5")], "k long, v string"))
    man2 = t._manifest(t.latest_version())
    changed = [b for b in man1 if man1[b] != man2.get(b)]
    assert len(changed) == 1  # exactly key 5's bucket rewrote
    carried = [b for b in man1 if man1[b] == man2.get(b)]
    assert len(carried) == len(man1) - 1
    assert _rows(t, spark)[5] == (5, "V5")


def test_merge_conflict_rebases_and_both_commits_land(spark, tmp_path):
    """Concurrent-writer seam: writer A reads v1, writer B commits v2,
    A's first commit attempt conflicts, A rebases onto B's state —
    both merges are visible in the final table."""
    t = _bm(tmp_path)
    t.merge(spark, spark.createDataFrame([(1, "a")], "k long, v string"))

    def interleave():
        t2 = _bm(tmp_path)
        t2.merge(spark, spark.createDataFrame(
            [(2, "b")], "k long, v string"))

    v = t.merge(
        spark, spark.createDataFrame([(3, "c")], "k long, v string"),
        _test_between_read_and_commit=interleave,
    )
    assert v == 3
    assert _rows(t, spark) == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_time_travel_and_empty_delete(spark, tmp_path):
    t = _bm(tmp_path, n_buckets=4)
    t.merge(spark, spark.createDataFrame([(1, "a"), (2, "b")],
                                         "k long, v string"))
    t.merge(spark, spark.createDataFrame([(1, "x"), (2, "x")],
                                         "k long, v string"),
            when_matched="delete")
    assert _rows(t, spark) == []                      # emptied
    old = t.read(spark, version=1)
    assert sorted((r.k, r.v) for r in old.collect()) == [(1, "a"), (2, "b")]


def test_merge_null_key_is_null_safe(spark, tmp_path):
    t = _bm(tmp_path)
    t.merge(spark, spark.createDataFrame([(None, "a"), (1, "b")],
                                         "k long, v string"))
    t.merge(spark, spark.createDataFrame([(None, "A")], "k long, v string"))
    got = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got == {(None, "A"), (1, "b")}


def test_vacuum_removes_only_orphans(spark, tmp_path):
    """Every historical version stays readable after vacuum (manifests
    still referenced by commits are live); only truly orphaned snapshot
    dirs/manifests — from losing or abandoned writers — are removed."""
    import os
    import shutil
    import uuid as _uuid

    t = _bm(tmp_path, n_buckets=4)
    t.merge(spark, spark.createDataFrame([(1, "a")], "k long, v string"))
    t.merge(spark, spark.createDataFrame([(2, "b")], "k long, v string"))
    # fake a losing writer's leftovers: an orphan snapshot dir + manifest
    orphan_dir = os.path.join(t.root, "data", _uuid.uuid4().hex)
    os.makedirs(os.path.join(orphan_dir, "__bucket=0"))
    orphan_man = os.path.join(t.root, "manifests",
                              f"{_uuid.uuid4().hex}.json")
    with open(orphan_man, "w", encoding="utf-8") as f:
        f.write("{}")
    removed = t.vacuum()
    assert sorted(removed) == sorted([orphan_dir, orphan_man])
    # both versions still fully readable
    assert {r.k for r in t.read(spark, version=1).collect()} == {1}
    assert {r.k for r in t.read(spark, version=2).collect()} == {1, 2}
    shutil.rmtree(t.root)


def test_table_properties_pin_and_adopt(spark, tmp_path):
    """r7 ADVICE: (key, n_buckets) define bucket routing, so they are
    pinned in table_properties.json on first open; a mismatched reopen
    fails loudly instead of silently mis-routing, and a parameterless
    reopen adopts the pinned values."""
    import pytest

    from airflow_project_flight_price_analysis_spark.operators.transactional import (
        BucketedMergeTable,
    )

    root = str(tmp_path / "bm")
    t = BucketedMergeTable(root, "k", n_buckets=4)
    t.merge(spark, spark.createDataFrame([(1, "a")], "k long, v string"))

    # mismatched n_buckets → routing would split keys across handles
    with pytest.raises(ValueError, match="mis-route"):
        BucketedMergeTable(root, "k", n_buckets=16)
    # mismatched key → same failure
    with pytest.raises(ValueError, match="mis-route"):
        BucketedMergeTable(root, "other", n_buckets=4)
    # parameterless open adopts the pinned properties
    t2 = BucketedMergeTable(root)
    assert (t2.key, t2.n_buckets) == ("k", 4)
    assert {r.k for r in t2.read(spark).collect()} == {1}
    # first open of a fresh root must supply the parameters
    with pytest.raises(ValueError, match="first open"):
        BucketedMergeTable(str(tmp_path / "fresh"))


def test_parameterless_open_of_missing_root_fabricates_nothing(tmp_path):
    """r8 review: validation must run BEFORE the skeleton makedirs — a
    parameterless open of a mistyped root raises without planting an
    empty table there (a later parameterful open of the fabricated path
    would pin fresh properties and hide the typo)."""
    import os

    import pytest

    from airflow_project_flight_price_analysis_spark.operators.transactional import (
        BucketedMergeTable,
    )

    bad = str(tmp_path / "merge_tabel")  # the typo
    with pytest.raises(ValueError, match="first open"):
        BucketedMergeTable(bad)
    assert not os.path.exists(bad)


# --- snapshot_diff (q87) ------------------------------------------------------

def test_snapshot_diff_statuses_and_flags(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.transactional import (
        BucketedMergeTable,
        snapshot_diff,
    )

    t = BucketedMergeTable(str(tmp_path / "t"), "k", n_buckets=4)
    v1_rows = [(1, 10, "a"), (2, 20, None), (3, 30, "c"), (4, 40, "d")]
    t.merge(spark, spark.createDataFrame(v1_rows, "k long, v long, s string"))
    # v2: change k=1 (value), change k=2 (NULL -> non-NULL: null-safe
    # struct compare must call this 'changed', not 'unchanged'),
    # delete k=3, add k=9
    t.merge(spark, spark.createDataFrame(
        [(1, 11, "a"), (2, 20, "z"), (9, 90, "i")],
        "k long, v long, s string"))
    t.merge(spark, spark.createDataFrame([(3,)], "k long")
            .withColumn("v", F.lit(0)).withColumn("s", F.lit("")),
            when_matched="delete")
    got = {r.k: r for r in snapshot_diff(spark, t, 1, 3).collect()}
    assert {k: r.diff_status for k, r in got.items()} == \
        {1: "changed", 2: "changed", 3: "removed", 9: "added"}
    assert got[1].old_v == 10 and got[1].new_v == 11
    assert got[2].old_s is None and got[2].new_s == "z"
    assert got[3].new_v is None and got[9].old_v is None
    # include_unchanged surfaces k=4
    all_rows = {r.k: r.diff_status for r in snapshot_diff(
        spark, t, 1, 3, include_unchanged=True).collect()}
    assert all_rows[4] == "unchanged" and len(all_rows) == 5
    # identical versions diff to empty
    assert snapshot_diff(spark, t, 2, 2).count() == 0
    # missing version raises
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_diff(spark, t, 1, 99)


def test_merge_mixed_op_batch(spark, tmp_path):
    """op_col routes a single CDC batch: upsert rows update/insert,
    delete rows remove their matched base row and never insert; the
    op column itself is never stored (r13 verdict item 7)."""
    from pyspark.sql import functions as F

    t = _bm(tmp_path)
    t.merge(spark, spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    mixed = spark.createDataFrame(
        [(2, "B", "upsert"),    # update
         (4, "d", "upsert"),    # insert
         (3, "x", "delete"),    # delete matched
         (9, "y", "delete")],   # delete unmatched: no-op, never inserts
        "k long, v string, __op string")
    v = t.merge(spark, mixed, op_col="__op")
    assert v == 2  # ONE commit for the whole batch
    assert _rows(t, spark) == [(1, "a"), (2, "B"), (4, "d")]
    assert t.read(spark).columns == ["k", "v"]  # op col not stored
    with pytest.raises(ValueError, match="op_col requires"):
        t.merge(spark, mixed, op_col="__op", when_matched="delete")


def test_merge_writes_one_file_per_bucket(spark, tmp_path):
    """The bucket-clustered write: each commit lands exactly one data
    file per non-empty bucket, not one per (task x bucket) — the r13
    small-files finding (1500+ files across a three-commit history)."""
    import glob
    import os

    t = _bm(tmp_path, n_buckets=4)
    src = spark.createDataFrame([(i, f"v{i}") for i in range(100)],
                                "k long, v string").repartition(16)
    t.merge(spark, src)
    man = t._manifest(t.latest_version())
    for rel in man.values():
        files = glob.glob(os.path.join(str(tmp_path / "bm"), rel,
                                       "part-*.parquet"))
        assert len(files) == 1, rel
