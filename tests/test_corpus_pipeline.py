"""End-to-end corpus curation job (jobs/corpus_pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.functions.text import (
    fingerprint_expr,
)
from airflow_project_flight_price_analysis_spark.jobs.corpus_pipeline import (
    curate_corpus,
)
from tests.conftest import SF_SMALL


def test_curation_stages_monotone_and_deduped(spark, tmp_path):
    report = curate_corpus(spark, SF_SMALL, str(tmp_path / "out"))
    # each stage only removes rows
    assert (report["n_input"] >= report["n_after_quality"]
            >= report["n_after_exact_dedup"] >= report["n_after_neardup"]
            == report["n_written"] > 0)
    out = spark.read.parquet(str(tmp_path / "out" / "curated"))
    # no two rows share a fingerprint after exact dedup
    n_fp = out.select(fingerprint_expr("text").alias("f")).distinct().count()
    assert n_fp == report["n_written"]
    # both splits materialize and cover everything
    assert set(report["splits"]) == {"train", "test"}
    assert sum(report["splits"].values()) == report["n_written"]


def test_curation_is_deterministic(spark, tmp_path):
    r1 = curate_corpus(spark, SF_SMALL, str(tmp_path / "a"))
    r2 = curate_corpus(spark, SF_SMALL, str(tmp_path / "b"))
    assert r1 == r2
    a = spark.read.parquet(str(tmp_path / "a" / "curated"))
    b = spark.read.parquet(str(tmp_path / "b" / "curated"))
    assert (a.select("doc_id", "split").exceptAll(b.select("doc_id", "split"))
            .count() == 0)


def test_curation_thresholds_bite(spark, tmp_path):
    strict = curate_corpus(
        spark, SF_SMALL, str(tmp_path / "strict"),
        min_tokens=40, neardup_threshold=0.3,
    )
    loose = curate_corpus(
        spark, SF_SMALL, str(tmp_path / "loose"),
        min_tokens=1, min_quality=0.0, neardup_threshold=0.99,
    )
    assert strict["n_written"] < loose["n_written"]


def test_curation_chunks_and_pii(spark, tmp_path):
    report = curate_corpus(spark, SF_SMALL, str(tmp_path / "out"))
    chunks = spark.read.parquet(str(tmp_path / "out" / "chunks"))
    assert report["n_chunks"] == chunks.count() > 0
    # every curated doc produced at least one chunk; splits carried through
    assert chunks.select("doc_id").distinct().count() == report["n_written"]
    assert set(r["split"] for r in chunks.select("split").distinct().collect()) \
        <= {"train", "test"}
    # chunk lengths: at most 128 tokens each
    too_long = chunks.filter(
        F.size(F.split("chunk_text", r"\s+")) > 128
    ).count()
    assert too_long == 0
    # synthetic corpus has no PII; the counter exists and is 0 here
    assert report["n_pii_hits_redacted"] == 0
