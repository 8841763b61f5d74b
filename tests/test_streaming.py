"""Structured Streaming tests: memory sink + processAllAvailable drives a
bounded stream to completion synchronously (guide pattern)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.sources import load_table
from airflow_project_flight_price_analysis_spark.streaming import windows as SW
from airflow_project_flight_price_analysis_spark.streaming.ingest import (
    start_stream_ingest,
)

from tests.test_flight_pipeline import CSV_HEADER, GOOD_ROW, SECOND_ROW


def _events_stream(spark, tmp_path):
    """Events parquet re-written with micro timestamps, then readStream."""
    src = str(tmp_path / "events_src")
    load_table(spark, "/root/testdata/sf0.001", "events").write.parquet(src)
    batch = spark.read.parquet(src)
    return spark.readStream.schema(batch.schema).parquet(src), batch


def _run_to_memory(stream_df, name, output_mode="append"):
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return name


def test_tumbling_counts_match_batch(spark, tmp_path):
    stream, batch = _events_stream(spark, tmp_path)
    name = f"t_{uuid.uuid4().hex[:8]}"
    # complete mode: append would hold back windows above the final
    # watermark (they'd emit on the *next* batch in a live stream)
    _run_to_memory(SW.tumbling_counts(stream, "1 hour"), name, "complete")
    got = spark.sql(f"SELECT * FROM {name}")
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    assert got.count() == expected.count() > 0
    # spot-check one cell end-to-end
    g = {(r.window_start, r.event_type): (r.n, r.total_value) for r in got.collect()}
    e = {(r.win.start, r.event_type): (r.n, r.total_value) for r in expected.collect()}
    assert g == e


def test_session_counts_runs(spark, tmp_path):
    stream, batch = _events_stream(spark, tmp_path)
    name = f"s_{uuid.uuid4().hex[:8]}"
    _run_to_memory(SW.session_counts(stream, gap="30 minutes"), name, "complete")
    got = spark.sql(f"SELECT * FROM {name}")
    n_sessions_stream = got.count()
    assert n_sessions_stream > 0
    # total events across sessions == total events
    assert got.agg(F.sum("n_events")).collect()[0][0] == batch.count()


def test_dedup_within_watermark(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(100)
    dup_src = str(tmp_path / "dup_events")
    events.unionAll(events).write.parquet(dup_src)  # every event twice
    stream = spark.readStream.schema(events.schema).parquet(dup_src)
    name = f"d_{uuid.uuid4().hex[:8]}"
    _run_to_memory(SW.dedup_within_watermark(stream), name)
    got = spark.sql(f"SELECT * FROM {name}")
    assert got.count() == 100
    assert got.select("event_id").distinct().count() == 100


def test_stream_ingest_is_incremental_and_idempotent(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "batch1.csv").write_text(
        "\n".join([CSV_HEADER, GOOD_ROW, GOOD_ROW]) + "\n"
    )
    bronze = str(tmp_path / "bronze")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")

    q = start_stream_ingest(spark, str(landing), bronze, ledger, ckpt)
    assert q.awaitTermination(120)  # False = timed out
    assert spark.read.parquet(bronze).count() == 1  # in-batch dup collapsed

    # new file lands: only its new row is ingested; old file not re-read
    (landing / "batch2.csv").write_text(
        "\n".join([CSV_HEADER, GOOD_ROW, SECOND_ROW]) + "\n"
    )
    q2 = start_stream_ingest(spark, str(landing), bronze, ledger, ckpt)
    assert q2.awaitTermination(120)  # False = timed out
    bronze_df = spark.read.parquet(bronze)
    assert bronze_df.count() == 2
    assert spark.read.parquet(ledger).count() == 2


def test_stream_ingest_epoch_replay_is_exactly_once(spark, tmp_path):
    """Simulate the crash window the at-least-once contract worries
    about: bronze write committed, ledger write lost, epoch replayed.
    The dynamic epoch-partition overwrite must leave bronze with ONE
    copy of the rows, not an appended duplicate."""
    import shutil

    from airflow_project_flight_price_analysis_spark.sources.flights_csv import (
        read_flights_csv,
    )
    from airflow_project_flight_price_analysis_spark.streaming.ingest import (
        make_ingest_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b.csv").write_text("\n".join([CSV_HEADER, GOOD_ROW, SECOND_ROW]) + "\n")
    batch = read_flights_csv(spark, str(landing / "b.csv"))
    bronze, ledger = str(tmp_path / "bronze"), str(tmp_path / "ledger")

    sink = make_ingest_sink(bronze, ledger)
    sink(batch, 0)
    assert spark.read.parquet(bronze).count() == 2
    # crash window: ledger write is lost, epoch 0 replays
    shutil.rmtree(ledger)
    sink(batch, 0)
    assert spark.read.parquet(bronze).count() == 2  # overwritten, not appended
    assert spark.read.parquet(ledger).count() == 2


def test_read_ledger_surfaces_corruption(spark, tmp_path):
    """Only a missing path means 'first run'; a corrupt ledger must raise,
    not silently re-ingest everything as if the ledger were empty."""
    import pytest

    from airflow_project_flight_price_analysis_spark.operators.star import read_ledger

    assert read_ledger(spark, str(tmp_path / "absent")) is None
    bad = tmp_path / "bad_ledger"
    bad.mkdir()
    (bad / "part-00000.parquet").write_text("this is not parquet")
    with pytest.raises(Exception):
        read_ledger(spark, str(bad)).collect()


def test_stateful_running_totals_match_batch(spark, tmp_path):
    from airflow_project_flight_price_analysis_spark.streaming.stateful import (
        user_running_totals,
    )

    stream, batch = _events_stream(spark, tmp_path)
    name = f"st_{uuid.uuid4().hex[:8]}"
    _run_to_memory(user_running_totals(stream), name, "update")
    # update mode emits one row per (user, batch-with-data); the LAST
    # emission per user is the lifetime total
    got = spark.sql(
        f"""SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) rn FROM {name})
            WHERE rn = 1"""
    )
    # the operator accumulates exact integer micro-units (replay-exact,
    # order-independent) and emits micros/1e6 — mirror that arithmetic
    expected = batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.expr("CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) "
                "AS DOUBLE)") / F.lit(1e6)).alias("total_value"),
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    e = {r.user_id: (r.n_events, r.total_value) for r in expected.collect()}
    assert g == e and len(g) > 0


def test_stream_static_join(spark, tmp_path):
    """Stream-static join: per-microbatch the static side behaves like a
    broadcast dim — the streaming form of the star schema's FK resolution."""
    stream, batch = _events_stream(spark, tmp_path)
    static_dim = (
        batch.select("user_id").distinct()
        .withColumn("user_tier", F.when(F.col("user_id") % 2 == 0, "even")
                    .otherwise("odd"))
    )
    joined = stream.join(static_dim, "user_id").groupBy("user_tier").count()
    name = f"ss_{uuid.uuid4().hex[:8]}"
    _run_to_memory(joined, name, "complete")
    got = {r.user_tier: r["count"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    expected = {
        r.user_tier: r["count"]
        for r in batch.join(static_dim, "user_id").groupBy("user_tier").count().collect()
    }
    assert got == expected and len(got) == 2


def test_stream_interval_join_boundaries(spark, tmp_path):
    """Crafted-data edge cases for the stream-stream interval join: both
    interval endpoints are INCLUSIVE ([left.ts - lookback, left.ts]),
    keys never cross, and out-of-window rows never match."""
    import uuid

    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.streaming.windows import (
        stream_interval_join,
    )

    from datetime import datetime

    def ts(s):
        return datetime.fromisoformat(f"2024-01-01 {s}")

    left_rows = [(100, ts("10:00:00"), 1)]
    right_rows = [
        (200, ts("09:29:59"), 1),  # 1s before the window opens -> out
        (201, ts("09:30:00"), 1),  # exactly lookback before -> in
        (202, ts("10:00:00"), 1),  # equal timestamps -> in
        (203, ts("10:00:01"), 1),  # after the error -> out
        (204, ts("09:45:00"), 2),  # right time, wrong user -> out
    ]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    schema = "event_id long, ts timestamp, user_id long"
    spark.createDataFrame(left_rows, schema).write.parquet(ldir)
    spark.createDataFrame(right_rows, schema).write.parquet(rdir)
    lstream = spark.readStream.schema(schema).parquet(ldir)
    rstream = spark.readStream.schema(schema).parquet(rdir)

    joined = stream_interval_join(lstream, rstream, key="user_id",
                                  lookback="30 minutes")
    name = "tij_" + uuid.uuid4().hex[:8]
    q = (
        joined.select(F.col("l_event_id").alias("l"), F.col("r_event_id").alias("r"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r.l, r.r) for r in spark.table(name).collect()}
    assert got == {(100, 201), (100, 202)}, got


def test_quality_quarantine_splits_and_annotates(spark, tmp_path):
    """streaming/quality.py: a streamed feed with known-bad rows must
    land clean rows in the good path, bad rows in quarantine annotated
    with exactly the failed check names, and conserve row counts. NULL
    check results count as failures (unknown != pass)."""
    from airflow_project_flight_price_analysis_spark.streaming.quality import (
        start_quality_stream,
    )

    src = str(tmp_path / "src")
    rows = [
        (1, 10.0, "A"),       # clean
        (2, -5.0, "B"),       # nonneg fails
        (3, 10.0, None),      # category_known fails (NULL -> fail)
        (4, -1.0, "Z"),       # both fail
    ]
    spark.createDataFrame(rows, ["id", "amount", "cat"]).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    checks = {
        "nonneg_amount": F.col("amount") >= 0,
        "category_known": F.col("cat").isin("A", "B"),
    }
    good, quar = str(tmp_path / "good"), str(tmp_path / "quarantine")
    q = start_quality_stream(
        stream, checks, good, quar, str(tmp_path / "ckpt"),
        available_now=True,
    )
    assert q.awaitTermination(120)  # False = timed out

    good_rows = {r.id for r in spark.read.parquet(good).collect()}
    bad = {r.id: sorted(r.violations)
           for r in spark.read.parquet(quar).collect()}
    assert good_rows == {1}
    assert bad == {
        2: ["nonneg_amount"],
        3: ["category_known"],
        4: ["category_known", "nonneg_amount"],
    }
    assert len(good_rows) + len(bad) == len(rows)


def test_quality_quarantine_batch_twin_matches_x97_semantics(spark):
    """The with_violations annotator is the same predicate algebra the
    batch x97 battery uses — run it as a plain batch expression over
    lineitem and reconcile against the registered DQ report's
    quantity-range check."""
    from airflow_project_flight_price_analysis_spark.plans import all_queries
    from airflow_project_flight_price_analysis_spark.sources import load_table
    from airflow_project_flight_price_analysis_spark.streaming.quality import (
        with_violations,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    annotated = with_violations(
        li,
        {"li_quantity_out_of_range":
            (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50)},
    )
    n_bad = annotated.filter(F.size("violations") > 0).count()
    report = {
        r.check_name: r.n_violations
        for r in all_queries()["x97_dq_expectations"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert n_bad == report["li_quantity_out_of_range"]


def test_streaming_decontaminate_splits_exactly(spark, tmp_path):
    """streaming/decontam.py: the (clean, flagged) split must be exact
    against the ledger — flagged = keys present in the blocklist,
    clean = everything else (bloom false positives rejected by the
    exact join; NULL keys land in clean), and counts conserved."""
    from airflow_project_flight_price_analysis_spark.streaming.decontam import (
        streaming_decontaminate,
    )

    src = str(tmp_path / "src")
    rows = [(i, f"fp{i}" if i % 3 else None) for i in range(30)]
    spark.createDataFrame(rows, "id int, fp string").write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    block = spark.createDataFrame(
        [(f"fp{i}",) for i in range(0, 30, 5)], "bk string"
    )
    clean, flagged = streaming_decontaminate(stream, block, "fp", "bk")

    qc = (clean.writeStream.format("memory").queryName("dc_clean")
          .trigger(availableNow=True).start())
    qf = (flagged.writeStream.format("memory").queryName("dc_flagged")
          .trigger(availableNow=True).start())
    assert qc.awaitTermination(120) and qf.awaitTermination(120)

    got_clean = {r.id for r in spark.sql("select * from dc_clean").collect()}
    got_flagged = {r.id for r in spark.sql("select * from dc_flagged").collect()}
    # ledger holds fp0..fp25 step 5; fp of id i is f"fp{i}" unless i%3==0 (NULL)
    want_flagged = {i for i in range(30) if i % 3 and i % 5 == 0}
    assert got_flagged == want_flagged
    assert got_clean == set(range(30)) - want_flagged
    assert len(got_clean) + len(got_flagged) == 30


# --------------------------------------------------------------------------
# streaming near-dup ingest (streaming/neardup.py)
# --------------------------------------------------------------------------

def _doc(i, text):
    return (i, text, "en", "web")


_DOC_SCHEMA = "doc_id long, text string, lang string, source string"

_T1 = ("the quick brown fox jumps over the lazy dog and then runs far "
       "away into the deep green forest before sunset tonight")
_T2 = ("completely different content about database engines and "
       "distributed query planning with cost based optimizers at scale")
_T3 = ("a third unrelated passage describing mountain weather patterns "
       "and the formation of orographic clouds above high ridges")


def test_neardup_stream_flags_corpus_and_batch_dups(spark, tmp_path):
    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        read_sig_ledger,
        start_neardup_stream,
    )

    e1 = str(tmp_path / "in1")
    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("clean", "flagged", "ledger"))
    # epoch 1: two distinct docs
    spark.createDataFrame([_doc(1, _T1), _doc(2, _T2)], _DOC_SCHEMA) \
        .write.parquet(e1)
    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(e1)
    q = start_neardup_stream(stream, clean_p, flagged_p, ledger_p,
                             str(tmp_path / "ck1"), threshold=0.5)
    assert q.awaitTermination(120)  # False = timed out
    assert sorted(r.doc_id for r in
                  spark.read.parquet(clean_p).collect()) == [1, 2]
    led = read_sig_ledger(spark, ledger_p)
    assert sorted(r.id for r in led.collect()) == [1, 2]

    # epoch 2 (same checkpoint, new file): a near-dup of doc 1 (one word
    # changed), a fresh doc, and an in-batch identical pair (5, 6)
    t1_near = _T1.replace("lazy", "sleepy")
    spark.createDataFrame(
        [_doc(3, t1_near), _doc(4, _T3), _doc(5, _T2 + " extra"),
         _doc(6, _T2 + " extra")],
        _DOC_SCHEMA,
    ).write.mode("append").parquet(e1)
    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(e1)
    q = start_neardup_stream(stream, clean_p, flagged_p, ledger_p,
                             str(tmp_path / "ck1"), threshold=0.5)
    assert q.awaitTermination(120)  # False = timed out

    clean = {r.doc_id for r in spark.read.parquet(clean_p).collect()}
    flagged = {r.doc_id: (r.matched_id, r.reason)
               for r in spark.read.parquet(flagged_p).collect()}
    # doc 3 ≈ corpus doc 1; doc 6 ≈ in-batch doc 5 (lowest id survives).
    # doc 5 ≈ corpus doc 2? no — "_T2 + ' extra'" shares most shingles
    # with _T2, so 5 may flag against the corpus instead; accept either
    # reason but the SURVIVOR SET is what matters.
    assert 1 in clean and 2 in clean and 4 in clean
    assert 3 in flagged and flagged[3][0] == 1
    assert 6 in flagged
    assert flagged[3][1] == "corpus_neardup"
    # ledger grew by exactly the epoch-2 clean docs
    led_ids = sorted(r.id for r in
                     read_sig_ledger(spark, ledger_p).collect())
    assert led_ids == sorted(clean)


def test_neardup_sink_epoch_replay_is_exactly_once(spark, tmp_path):
    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        make_neardup_sink,
        read_sig_ledger,
    )

    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("clean", "flagged", "ledger"))
    sink = make_neardup_sink(clean_p, flagged_p, ledger_p, threshold=0.5)
    b1 = spark.createDataFrame([_doc(1, _T1), _doc(2, _T2)], _DOC_SCHEMA)
    sink(b1, 0)
    b2 = spark.createDataFrame(
        [_doc(3, _T1.replace("dog", "cat")), _doc(4, _T3)], _DOC_SCHEMA)
    sink(b2, 1)
    before_clean = sorted(r.doc_id for r in
                          spark.read.parquet(clean_p).collect())
    before_led = sorted(r.id for r in
                        read_sig_ledger(spark, ledger_p).collect())
    # replay epoch 1 (at-least-once delivery): identical outcome, no dupes
    sink(b2, 1)
    assert sorted(r.doc_id for r in
                  spark.read.parquet(clean_p).collect()) == before_clean
    assert sorted(r.id for r in
                  read_sig_ledger(spark, ledger_p).collect()) == before_led
    # and the replay's split was computed against the PRE-epoch ledger:
    # doc 3 is still flagged exactly once
    flagged = [r.doc_id for r in spark.read.parquet(flagged_p).collect()]
    assert flagged == [3]


def test_neardup_sink_rejects_checkpoint_reset_over_live_ledger(
        spark, tmp_path):
    """ADVICE r7 (medium): a wiped/relocated checkpoint restarts epoch
    ids at 0 while the ledger persists — the sink must raise instead of
    silently screening against an empty ledger and clobbering prior
    epoch partitions. Replaying the CURRENT max epoch stays legal."""
    import pytest

    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        make_neardup_sink,
    )

    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("clean", "flagged", "ledger"))
    sink = make_neardup_sink(clean_p, flagged_p, ledger_p, threshold=0.5)
    sink(spark.createDataFrame([_doc(1, _T1)], _DOC_SCHEMA), 0)
    sink(spark.createDataFrame([_doc(2, _T2)], _DOC_SCHEMA), 1)
    # replay of the max epoch is fine (at-least-once delivery)
    sink(spark.createDataFrame([_doc(2, _T2)], _DOC_SCHEMA), 1)
    # ...but a restart at epoch 0 means checkpoint/ledger incoherence
    with pytest.raises(RuntimeError, match="checkpoint"):
        sink(spark.createDataFrame([_doc(3, _T3)], _DOC_SCHEMA), 0)


def test_neardup_sink_rejects_ledger_geometry_drift(spark, tmp_path):
    """ADVICE r7 (low): a ledger written with a different num_hashes
    would zip_with-pad with NULLs and silently drop every cross-epoch
    match — the sink must fail on signature-length mismatch."""
    import pytest

    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        make_neardup_sink,
    )

    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("clean", "flagged", "ledger"))
    sink16 = make_neardup_sink(clean_p, flagged_p, ledger_p,
                               threshold=0.5, num_hashes=16, num_bands=4)
    sink16(spark.createDataFrame([_doc(1, _T1)], _DOC_SCHEMA), 0)
    sink32 = make_neardup_sink(clean_p, flagged_p, ledger_p,
                               threshold=0.5, num_hashes=32, num_bands=8)
    with pytest.raises(RuntimeError, match="num_hashes"):
        sink32(spark.createDataFrame([_doc(2, _T2)], _DOC_SCHEMA), 1)


def test_neardup_incremental_matches_batch_on_chain_free_corpus(spark,
                                                                tmp_path):
    """On a corpus with no near-dup CHAINS (every dup links straight to
    a surviving doc), sequential epoch ingestion must keep exactly the
    docs batch minhash_dedup keeps on the union — arrival order = id
    order makes both greedy keep-first rules coincide. (On chains the
    two legitimately differ: the incremental ledger never contains
    dropped docs, so a dup-of-a-dropped-doc survives — documented in
    the module docstring.)"""
    from airflow_project_flight_price_analysis_spark.operators.dedup import (
        minhash_dedup,
    )
    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        make_neardup_sink,
    )

    docs = [
        _doc(1, _T1), _doc(2, _T2),
        _doc(3, _T3), _doc(4, _T1.replace("quick", "rapid")),
        _doc(5, _T2.replace("database", "storage")),
    ]
    union = spark.createDataFrame(docs, _DOC_SCHEMA)
    kept_batch = sorted(
        r.doc_id for r in
        minhash_dedup(union, "text", "doc_id", threshold=0.5).collect()
    )

    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("c2", "f2", "l2"))
    sink = make_neardup_sink(clean_p, flagged_p, ledger_p, threshold=0.5)
    sink(spark.createDataFrame(docs[:2], _DOC_SCHEMA), 0)
    sink(spark.createDataFrame(docs[2:], _DOC_SCHEMA), 1)
    kept_inc = sorted(r.doc_id for r in
                      spark.read.parquet(clean_p).collect())
    assert kept_inc == kept_batch


def test_neardup_screens_have_fixed_points(spark):
    """Two algebraic anchors of the screens: against an EMPTY ledger
    nothing flags; against a ledger equal to the batch every doc flags
    itself at estimated Jaccard exactly 1.0."""
    from airflow_project_flight_price_analysis_spark.operators.dedup import (
        minhash_signatures,
    )
    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        screen_against_ledger,
    )

    docs = spark.createDataFrame(
        [_doc(1, _T1), _doc(2, _T2), _doc(3, _T3)], _DOC_SCHEMA)
    sigs = minhash_signatures(docs, "text", "doc_id")
    empty = spark.createDataFrame([], "id bigint, sig array<bigint>")
    assert screen_against_ledger(sigs, empty, threshold=0.1).count() == 0
    self_hits = screen_against_ledger(sigs, sigs, threshold=0.99).collect()
    assert sorted((r.id, r.matched_id, r.est_jaccard) for r in self_hits) \
        == [(1, 1, 1.0), (2, 2, 1.0), (3, 3, 1.0)]


def test_events_stream_reads_directory_layout(spark, tmp_path):
    """A Spark-written events.parquet DIRECTORY must stream its rows —
    the old pathGlobFilter matched zero part-files and started a
    silently empty stream."""
    from airflow_project_flight_price_analysis_spark.sources.testdata import (
        events_stream,
    )

    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sf = str(tmp_path / "sf")
    batch.limit(50).write.parquet(f"{sf}/events.parquet")  # directory layout
    q = (events_stream(spark, sf)
         .writeStream.format("memory").queryName("evdir")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)  # False = timed out
    assert spark.table("evdir").count() == 50


def test_decontaminate_rejects_mixed_key_types(spark, tmp_path):
    import pytest

    from airflow_project_flight_price_analysis_spark.streaming.decontam import (
        streaming_decontaminate,
    )

    src = str(tmp_path / "s")
    spark.createDataFrame([(1,)], "k int").write.parquet(src)
    stream = spark.readStream.schema("k int").parquet(src)
    block = spark.createDataFrame([(1.0,)], "k double")
    with pytest.raises(TypeError, match="type mismatch"):
        streaming_decontaminate(stream, block, "k", "k")


def test_sig_ledger_compaction_preserves_screen_results(spark, tmp_path):
    """r6 verdict item 7: folding all epochs <= K into one base
    partition must leave every future epoch's screen IDENTICAL — the
    screen reads epoch_id < current, and the base lands on the max
    compacted epoch."""
    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        compact_sig_ledger,
        make_neardup_sink,
        read_sig_ledger,
    )

    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("clean", "flagged", "ledger"))
    sink = make_neardup_sink(clean_p, flagged_p, ledger_p, threshold=0.5)
    sink(spark.createDataFrame([_doc(1, _T1)], _DOC_SCHEMA), 0)
    sink(spark.createDataFrame([_doc(2, _T2)], _DOC_SCHEMA), 1)
    sink(spark.createDataFrame([_doc(3, _T3)], _DOC_SCHEMA), 2)

    compacted_p = str(tmp_path / "ledger_compacted")
    compact_sig_ledger(spark, ledger_p, compacted_p, upto_epoch=2)
    led = read_sig_ledger(spark, compacted_p)
    # one base partition, same signature set
    assert {r.epoch_id for r in led.collect()} == {2}
    assert sorted(r.id for r in led.collect()) == [1, 2, 3]

    # epoch 3 against ORIGINAL vs COMPACTED ledger: identical split
    batch = spark.createDataFrame(
        [_doc(4, _T1.replace("quick", "swift")), _doc(5, "wholly new text "
              "with nothing shared at all among previous passages here")],
        _DOC_SCHEMA,
    )
    out_a = (str(tmp_path / "ca"), str(tmp_path / "fa"),
             str(tmp_path / "la"))
    out_b = (str(tmp_path / "cb"), str(tmp_path / "fb"),
             str(tmp_path / "lb"))
    import shutil
    shutil.copytree(ledger_p, out_a[2])
    shutil.copytree(compacted_p, out_b[2])
    make_neardup_sink(out_a[0], out_a[1], out_a[2], threshold=0.5)(batch, 3)
    make_neardup_sink(out_b[0], out_b[1], out_b[2], threshold=0.5)(batch, 3)
    for sub in (0, 1):  # clean + flagged identical
        a = sorted(r.doc_id for r in spark.read.parquet(out_a[sub])
                   .filter("epoch_id = 3").collect())
        b = sorted(r.doc_id for r in spark.read.parquet(out_b[sub])
                   .filter("epoch_id = 3").collect())
        assert a == b and a  # non-vacuous


def test_ingest_sink_rejects_checkpoint_reset_over_live_ledger(
        spark, tmp_path):
    """The neardup coherence guard applied to exact-dedup ingest: a
    checkpoint restart at epoch 0 over a persisted ledger must raise
    (dynamic overwrite would clobber historical epoch partitions);
    replaying the current max epoch stays legal."""
    import pytest

    from airflow_project_flight_price_analysis_spark.sources.flights_csv import (
        read_flights_csv,
    )
    from airflow_project_flight_price_analysis_spark.streaming.ingest import (
        make_ingest_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text("\n".join([CSV_HEADER, GOOD_ROW]) + "\n")
    (landing / "b.csv").write_text("\n".join([CSV_HEADER, SECOND_ROW]) + "\n")
    bronze, ledger = str(tmp_path / "bronze"), str(tmp_path / "ledger")
    sink = make_ingest_sink(bronze, ledger)
    sink(read_flights_csv(spark, str(landing / "a.csv")), 0)
    sink(read_flights_csv(spark, str(landing / "b.csv")), 1)
    # replay of the max epoch: fine
    sink(read_flights_csv(spark, str(landing / "b.csv")), 1)
    # restart at 0 over the live ledger: refuse
    with pytest.raises(RuntimeError, match="checkpoint"):
        sink(read_flights_csv(spark, str(landing / "a.csv")), 0)
    # history intact
    assert spark.read.parquet(bronze).count() == 2


def test_ledger_compaction_validates_against_checkpoint(spark, tmp_path):
    """r7 review: the fold bound must be enforceable against the
    stream's checkpoint — folding a replayable epoch would change its
    visible ledger on replay."""
    import os

    import pytest

    from airflow_project_flight_price_analysis_spark.streaming.coherence import (
        last_committed_epoch,
    )
    from airflow_project_flight_price_analysis_spark.streaming.neardup import (
        compact_sig_ledger,
        make_neardup_sink,
    )

    clean_p, flagged_p, ledger_p = (str(tmp_path / d)
                                    for d in ("clean", "flagged", "ledger"))
    sink = make_neardup_sink(clean_p, flagged_p, ledger_p, threshold=0.5)
    sink(spark.createDataFrame([_doc(1, _T1)], _DOC_SCHEMA), 0)
    sink(spark.createDataFrame([_doc(2, _T2)], _DOC_SCHEMA), 1)
    # fabricate a checkpoint whose last committed epoch is 0
    ck = tmp_path / "ck" / "commits"
    ck.mkdir(parents=True)
    (ck / "0").write_text("{}")
    assert last_committed_epoch(str(tmp_path / "ck")) == 0
    assert last_committed_epoch(str(tmp_path / "nope")) is None
    with pytest.raises(ValueError, match="replayable"):
        compact_sig_ledger(spark, ledger_p, str(tmp_path / "out"),
                           upto_epoch=1, checkpoint_dir=str(tmp_path / "ck"))
    # within the committed bound: succeeds, and the base is sized from
    # the base epochs only (tiny → exactly 1 file)
    n = compact_sig_ledger(spark, ledger_p, str(tmp_path / "out"),
                           upto_epoch=0,
                           checkpoint_dir=str(tmp_path / "ck"))
    assert n == 1
    led = spark.read.parquet(str(tmp_path / "out"))
    assert {r.epoch_id for r in led.select("epoch_id").collect()} == {0, 1}


def test_ingest_replay_survives_partial_ledger_write(spark, tmp_path):
    """r7 review (data-loss class): a crash MID-ledger-write leaves a
    partial epoch_id=N ledger partition; the replay of N must dedup
    against the PRE-epoch ledger only — otherwise fresh becomes a
    strict subset and the dynamic overwrite deletes the missing rows
    from bronze permanently."""
    from airflow_project_flight_price_analysis_spark.sources.flights_csv import (
        read_flights_csv,
    )
    from airflow_project_flight_price_analysis_spark.streaming.ingest import (
        make_ingest_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b.csv").write_text(
        "\n".join([CSV_HEADER, GOOD_ROW, SECOND_ROW]) + "\n")
    batch = read_flights_csv(spark, str(landing / "b.csv"))
    bronze, ledger = str(tmp_path / "bronze"), str(tmp_path / "ledger")
    sink = make_ingest_sink(bronze, ledger)
    sink(batch, 0)
    assert spark.read.parquet(bronze).count() == 2
    # simulate the partial ledger write: drop ONE of epoch 0's ledger
    # rows (as if the commit lost a task's file), keep the other
    import glob
    import os

    rows = (spark.read.parquet(ledger).filter("epoch_id = 0")
            .drop("epoch_id").limit(1).collect())
    for f in glob.glob(os.path.join(ledger, "epoch_id=0", "*")):
        os.unlink(f)
    (spark.createDataFrame(rows).write.mode("overwrite")
     .parquet(os.path.join(ledger, "epoch_id=0")))
    # replay epoch 0: both rows must survive in bronze
    sink(batch, 0)
    assert spark.read.parquet(bronze).filter("epoch_id = 0").count() == 2
    assert spark.read.parquet(ledger).filter("epoch_id = 0").count() == 2


# --- streaming KMV sketch maintenance (streaming/sketches.py, x124) ----------

def test_stream_kmv_sketch_equals_batch_sketch(spark, tmp_path):
    """The folded streaming sketch must equal the one-shot batch sketch
    REGARDLESS of how the backlog splits into micro-batches (the merge
    law) — here three files with overlapping key ranges, one file per
    trigger."""
    import pytest
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_sketch_table,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_kmv_sketch,
    )

    root = str(tmp_path / "backlog")
    whole = spark.range(0, 900).select(F.col("id").alias("key"))
    # overlapping thirds (0-399, 300-699, 500-899): duplicates across
    # batches exercise the distinct-merge, not just concatenation
    for i, (lo, hi) in enumerate([(0, 400), (300, 700), (500, 900)]):
        (whole.filter((F.col("key") >= lo) & (F.col("key") < hi))
         .coalesce(1).write.mode("overwrite").parquet(f"{root}/f{i}"))
    files = spark.read.parquet(f"{root}/f0", f"{root}/f1", f"{root}/f2")
    staged = str(tmp_path / "staged")
    # re-stage as exactly 3 files so maxFilesPerTrigger=1 -> 3 batches
    for i in range(3):
        (spark.read.parquet(f"{root}/f{i}").coalesce(1)
         .write.mode("append").parquet(staged))
    stream = (spark.readStream.schema("key long")
              .option("maxFilesPerTrigger", 1).parquet(staged))
    hs, n_batches, n_skipped = stream_kmv_sketch(stream, "key", 64)
    assert n_batches == 3
    assert n_skipped == 0
    batch = [r.h for r in kmv_sketch_table(files, "key", 64).collect()]
    assert hs == sorted(batch)
    assert len(hs) == 64
    with pytest.raises(ValueError, match="k must be"):
        stream_kmv_sketch(stream, "key", 1)


def test_stream_cms_sketch_equals_batch_sketch(spark, tmp_path):
    """Counter-wise fold across micro-batches == one-shot batch sketch
    (linearity), for a 3-file split with overlapping key ranges."""
    import pytest
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        count_min_sketch_table,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_cms_sketch,
    )

    whole = spark.range(0, 600).select((F.col("id") % 37).alias("key"))
    staged = str(tmp_path / "staged")
    for lo, hi in [(0, 250), (250, 450), (450, 600)]:
        (whole.filter((F.col("id") >= lo) & (F.col("id") < hi))
         .coalesce(1).write.mode("append").parquet(staged))
    stream = (spark.readStream.schema("key long")
              .option("maxFilesPerTrigger", 1).parquet(staged))
    # the files PARTITION [0,600) exactly — unlike the KMV fold
    # (idempotent set union), CMS counts the multiset, so overlapping
    # file ranges would legitimately double-count; duplicates here
    # exist only in KEYS (id % 37), which is what the counters count
    counters, n_batches, n_skipped = stream_cms_sketch(stream, "key", 3, 32)
    assert n_batches == 3
    assert n_skipped == 0
    batch = sorted((r.i, r.b, r.cnt) for r in
                   count_min_sketch_table(whole, "key", 3, 32).collect())
    assert counters == batch
    with pytest.raises(ValueError, match="depth/width"):
        stream_cms_sketch(stream, "key", 0, 32)


def _delete_last_commit(ckpt: str) -> int:
    """Simulate a crash AFTER the foreachBatch fold but BEFORE the
    streaming commit: remove the newest ``commits/<batchId>`` file.
    On restart Spark reconstructs that batch from the offset log and
    REPLAYS it — the exact at-least-once window the durable fold's
    watermark skip must absorb. Returns the replayed batch id."""
    import os

    commits = os.path.join(ckpt, "commits")
    last = max(int(f) for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, str(last)))
    # the local-FS checkpoint manager writes a Hadoop .crc shadow per
    # commit file; a stale one blocks the replayed commit's rename
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return last


def test_stream_cms_sketch_restart_mid_backlog(spark, tmp_path):
    """The r13 verdict's weak item: kill after N batches, restart, and
    the counters must equal the one-shot sketch — the replayed
    uncommitted batch must NOT double-count (count-min addition is not
    idempotent). Staged as: fold 2 files durably, crash between fold
    and commit, land 2 more files, restart — the replay is skipped via
    the persisted watermark, the fresh files fold on top."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        count_min_sketch_table,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_cms_sketch,
    )

    whole = spark.range(0, 800).select((F.col("id") % 53).alias("key"))
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    spans = [(0, 200), (200, 450), (450, 650), (650, 800)]
    for lo, hi in spans[:2]:
        (whole.filter((F.col("id") >= lo) & (F.col("id") < hi))
         .coalesce(1).write.mode("append").parquet(staged))

    def _stream():
        return (spark.readStream.schema("key long")
                .option("maxFilesPerTrigger", 1).parquet(staged))

    c1, folded1, skipped1 = stream_cms_sketch(
        _stream(), "key", 3, 32, state_path=state, checkpoint_dir=ckpt)
    assert (folded1, skipped1) == (2, 0)
    _delete_last_commit(ckpt)
    for lo, hi in spans[2:]:
        (whole.filter((F.col("id") >= lo) & (F.col("id") < hi))
         .coalesce(1).write.mode("append").parquet(staged))
    c2, folded2, skipped2 = stream_cms_sketch(
        _stream(), "key", 3, 32, state_path=state, checkpoint_dir=ckpt)
    # batch 1 replayed (skipped via watermark), batches 2-3 are fresh
    assert (folded2, skipped2) == (2, 1)
    one_shot = sorted((r.i, r.b, r.cnt) for r in
                      count_min_sketch_table(whole, "key", 3, 32).collect())
    assert c2 == one_shot
    # and the in-memory fold WOULD have double-counted: the replayed
    # batch is non-empty, so skipping it changed the outcome
    assert c2 != c1


def test_stream_cms_sketch_replay_without_new_data(spark, tmp_path):
    """Pure-replay restart (crash after the LAST batch's fold): the
    second run folds nothing, skips the replayed batch, and the
    persisted counters already equal the one-shot sketch."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        count_min_sketch_table,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_cms_sketch,
    )

    whole = spark.range(0, 300).select((F.col("id") % 29).alias("key"))
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    for lo, hi in [(0, 150), (150, 300)]:
        (whole.filter((F.col("id") >= lo) & (F.col("id") < hi))
         .coalesce(1).write.mode("append").parquet(staged))

    def _stream():
        return (spark.readStream.schema("key long")
                .option("maxFilesPerTrigger", 1).parquet(staged))

    c1, folded1, _ = stream_cms_sketch(
        _stream(), "key", 3, 32, state_path=state, checkpoint_dir=ckpt)
    assert folded1 == 2
    _delete_last_commit(ckpt)
    c2, folded2, skipped2 = stream_cms_sketch(
        _stream(), "key", 3, 32, state_path=state, checkpoint_dir=ckpt)
    assert (folded2, skipped2) == (0, 1)
    one_shot = sorted((r.i, r.b, r.cnt) for r in
                      count_min_sketch_table(whole, "key", 3, 32).collect())
    assert c1 == one_shot
    assert c2 == one_shot


def test_stream_kmv_sketch_durable_restart(spark, tmp_path):
    """KMV durable mode: restart resumes from the persisted bottom-k
    (in-memory state dies with the driver) and the watermark skip
    spares the replayed batch's scan; result equals the one-shot
    sketch."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_sketch_table,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_kmv_sketch,
    )

    whole = spark.range(0, 600).select(F.col("id").alias("key"))
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    for lo, hi in [(0, 300), (200, 600)]:
        (whole.filter((F.col("key") >= lo) & (F.col("key") < hi))
         .coalesce(1).write.mode("append").parquet(staged))

    def _stream():
        return (spark.readStream.schema("key long")
                .option("maxFilesPerTrigger", 1).parquet(staged))

    hs1, folded1, _ = stream_kmv_sketch(
        _stream(), "key", 64, state_path=state, checkpoint_dir=ckpt)
    assert folded1 == 2
    _delete_last_commit(ckpt)
    hs2, folded2, skipped2 = stream_kmv_sketch(
        _stream(), "key", 64, state_path=state, checkpoint_dir=ckpt)
    assert (folded2, skipped2) == (0, 1)
    batch = sorted(r.h for r in kmv_sketch_table(whole, "key", 64).collect())
    assert hs1 == batch
    assert hs2 == batch


def test_stream_sketch_fold_checkpoint_coherence(spark, tmp_path):
    """Wiping the checkpoint while the sketch state persists restarts
    batch ids at 0 BEHIND the watermark — the fold must raise (the
    streaming/coherence.py hazard), not silently skip fresh data."""
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_cms_sketch,
    )

    whole = spark.range(0, 200).select((F.col("id") % 17).alias("key"))
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    for lo, hi in [(0, 100), (100, 200)]:
        (whole.filter((F.col("id") >= lo) & (F.col("id") < hi))
         .coalesce(1).write.mode("append").parquet(staged))

    def _stream():
        return (spark.readStream.schema("key long")
                .option("maxFilesPerTrigger", 1).parquet(staged))

    from pyspark.errors.exceptions.captured import StreamingQueryException

    _, folded1, _ = stream_cms_sketch(
        _stream(), "key", 3, 32, state_path=state, checkpoint_dir=ckpt)
    assert folded1 == 2
    shutil.rmtree(ckpt)
    # the RuntimeError surfaces wrapped in the engine's query-failure
    # envelope; the coherence message must ride through it
    with pytest.raises(StreamingQueryException, match="reset or relocated"):
        stream_cms_sketch(
            _stream(), "key", 3, 32, state_path=state, checkpoint_dir=ckpt)


def test_stream_bottomk_sample_equals_batch_sample(spark, tmp_path):
    """The folded streaming sample must equal the one-shot batch
    bottom-k sample (multiset merge law) regardless of the backlog
    split; durable restart resumes from the persisted sample and skips
    the replayed batch (concatenate-merge is NOT replay-idempotent
    without the watermark)."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.sampling import (
        hash_bottomk_sample,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_bottomk_sample,
    )

    whole = spark.range(0, 900).select(
        F.col("id").alias("key"), (F.col("id") * 1.5).alias("v"))
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    for lo, hi in [(0, 300), (300, 600), (600, 900)]:
        (whole.filter((F.col("key") >= lo) & (F.col("key") < hi))
         .coalesce(1).write.mode("append").parquet(staged))

    def _stream():
        return (spark.readStream.schema("key long, v double")
                .option("maxFilesPerTrigger", 1).parquet(staged))

    s1, folded1, _ = stream_bottomk_sample(
        _stream(), ["key"], "v", 64, state_path=state, checkpoint_dir=ckpt)
    assert folded1 == 3
    one_shot = sorted(
        (r["__sample_h"], r["v"]) for r in hash_bottomk_sample(
            whole, ["key"], 64).select("__sample_h", "v").collect())
    assert s1 == one_shot
    assert len(s1) == 64
    # crash after last fold, before commit: replay must be skipped
    _delete_last_commit(ckpt)
    s2, folded2, skipped2 = stream_bottomk_sample(
        _stream(), ["key"], "v", 64, state_path=state, checkpoint_dir=ckpt)
    assert (folded2, skipped2) == (0, 1)
    assert s2 == one_shot


def test_stream_kmv_sketch_by_group_equals_batch_sketch(spark, tmp_path):
    """Grouped fold: each lane's folded sketch equals its one-shot
    batch sketch (the merge law per group), for a 3-file backlog with
    overlapping key ranges and uneven lane membership."""
    import pytest
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_sketch_by_group,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_kmv_sketch_by_group,
    )

    whole = spark.range(0, 900).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "m3").otherwise("other").alias("g"),
    )
    staged = str(tmp_path / "staged")
    for lo, hi in [(0, 400), (300, 700), (500, 900)]:
        (whole.filter((F.col("key") >= lo) & (F.col("key") < hi))
         .coalesce(1).write.mode("append").parquet(staged))
    stream = (spark.readStream.schema("key long, g string")
              .option("maxFilesPerTrigger", 1).parquet(staged))
    folded, n_batches, n_skipped = stream_kmv_sketch_by_group(
        stream, "g", "key", 64)
    assert n_batches == 3 and n_skipped == 0
    batch = {}
    for r in kmv_sketch_by_group(whole, "g", "key", 64).collect():
        batch.setdefault(r.g, []).append(r.h)
    assert set(folded) == set(batch)
    for g in batch:
        assert folded[g] == sorted(batch[g]), g
        assert len(folded[g]) == 64
    with pytest.raises(ValueError, match="k must be"):
        stream_kmv_sketch_by_group(stream, "g", "key", 1)


def test_stream_kmv_sketch_by_group_durable_restart(spark, tmp_path):
    """Grouped durable mode: restart resumes every lane from the
    persisted state and the watermark skip spares the replayed batch;
    result equals the one-shot grouped sketch."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_sketch_by_group,
    )
    from airflow_project_flight_price_analysis_spark.streaming.sketches import (
        stream_kmv_sketch_by_group,
    )

    whole = spark.range(0, 600).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
    )
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    for lo, hi in [(0, 300), (200, 600)]:
        (whole.filter((F.col("key") >= lo) & (F.col("key") < hi))
         .coalesce(1).write.mode("append").parquet(staged))

    def _stream():
        return (spark.readStream.schema("key long, g string")
                .option("maxFilesPerTrigger", 1).parquet(staged))

    f1, folded1, _ = stream_kmv_sketch_by_group(
        _stream(), "g", "key", 32, state_path=state, checkpoint_dir=ckpt)
    assert folded1 == 2
    _delete_last_commit(ckpt)
    f2, folded2, skipped2 = stream_kmv_sketch_by_group(
        _stream(), "g", "key", 32, state_path=state, checkpoint_dir=ckpt)
    assert (folded2, skipped2) == (0, 1)
    batch = {}
    for r in kmv_sketch_by_group(whole, "g", "key", 32).collect():
        batch.setdefault(r.g, []).append(r.h)
    want = {g: sorted(hs) for g, hs in batch.items()}
    assert f1 == want
    assert f2 == want


def test_kmv_sketch_by_group_prefilter_lossless_and_validated(spark):
    """The per-group prefilter is lossless while every group keeps
    >= k survivors (same self-certification as kmv_sketch_table), and
    the denom validates."""
    import pytest
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.profiling import (
        kmv_sketch_by_group,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("key"),
        (F.col("id") % 2).cast("string").alias("g"),
    )
    plain = {(r.g, r.h) for r in
             kmv_sketch_by_group(df, "g", "key", 32).collect()}
    pre = {(r.g, r.h) for r in
           kmv_sketch_by_group(df, "g", "key", 32, 4).collect()}
    assert plain == pre
    with pytest.raises(ValueError, match="prefilter_denom"):
        kmv_sketch_by_group(df, "g", "key", 32, 0)
