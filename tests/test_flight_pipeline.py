"""End-to-end flight pipeline: CSV → bronze (hash-dedup ledger) → silver →
star schema → reconciliation. Mirrors the reference DAG's
ingest→transform→validate flow (dags/flight_pipeline_dag.py:49-68)."""

from __future__ import annotations

import pytest

from airflow_project_flight_price_analysis_spark.operators import star
from airflow_project_flight_price_analysis_spark.sources.flights_csv import (
    read_flights_csv,
)
from airflow_project_flight_price_analysis_spark.validation import reconcile

CSV_HEADER = (
    "Airline,Source,Source Name,Destination,Destination Name,"
    "Departure Date & Time,Arrival Date & Time,Duration (hrs),Stopovers,"
    "Aircraft Type,Class,Booking Source,Base Fare (BDT),"
    "Tax & Surcharge (BDT),Total Fare (BDT),Seasonality,Days Before Departure"
)

GOOD_ROW = (
    "biman bangladesh airlines,DAC,hazrat shahjalal intl,CXB,cox's bazar airport,"
    "2025-03-14 08:30:00,2025-03-14 10:05:00,1.58,Direct,Boeing 737,economy,"
    "online,4500.00,675.50,5175.50,Eid,21"
)
DUP_ROW = GOOD_ROW
BAD_FARE_ROW = (  # total_fare 0 → dropped by validity filter
    "novoair,DAC,hazrat shahjalal intl,ZYL,osmani intl,"
    "2025-03-15 09:00:00,2025-03-15 10:00:00,1.0,non-stop,ATR 72,economy,"
    "agency,0,0,0,Regular,7"
)
BAD_DATE_ROW = (  # unparseable departure → null date → dropped from fact
    "us-bangla,DAC,hazrat shahjalal intl,CGP,shah amanat intl,"
    "not-a-date,also-not,1.2,1 Stop,Boeing 737,business,online,"
    "6000,900,6900,Regular,3"
)
SECOND_ROW = (
    "novoair ,DAC, hazrat shahjalal intl ,ZYL,osmani intl,"
    "2025-03-16 18:30:00,2025-03-16 19:30:00,1.0,2 stops,ATR 72, Economy ,"
    "agency,3000,450,3450,Regular,10"
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "flights.csv"
    p.write_text("\n".join([CSV_HEADER, GOOD_ROW, DUP_ROW, BAD_FARE_ROW,
                            BAD_DATE_ROW, SECOND_ROW]) + "\n")
    return str(p)


def _run_pipeline(spark, csv_file, tmp_path):
    bronze_path = str(tmp_path / "bronze")
    ledger_path = str(tmp_path / "ledger")
    raw = read_flights_csv(spark, csv_file)
    n_new = star.ingest_increment(spark, raw, bronze_path, ledger_path)
    bronze = spark.read.parquet(bronze_path)
    silver = star.clean_flights(bronze)
    schema = star.build_star_schema(silver)
    return n_new, raw, bronze, silver, schema


def test_ingest_dedups_exact_duplicates(spark, csv_file, tmp_path):
    n_new, raw, bronze, *_ = _run_pipeline(spark, csv_file, tmp_path)
    assert raw.count() == 5
    assert n_new == 4  # DUP_ROW collapsed (ingestion.py:69-83)
    assert bronze.count() == 4


def test_reingest_is_idempotent(spark, csv_file, tmp_path):
    _run_pipeline(spark, csv_file, tmp_path)
    raw = read_flights_csv(spark, csv_file)
    n_second = star.ingest_increment(
        spark, raw, str(tmp_path / "bronze"), str(tmp_path / "ledger")
    )
    assert n_second == 0  # re-run adds nothing (effective exactly-once)
    assert spark.read.parquet(str(tmp_path / "bronze")).count() == 4


def test_appended_rows_are_incremental(spark, csv_file, tmp_path):
    _run_pipeline(spark, csv_file, tmp_path)
    extra = (
        "biman bangladesh airlines,DAC,hazrat shahjalal intl,SPD,saidpur airport,"
        "2025-04-01 07:00:00,2025-04-01 08:10:00,1.17,Direct,Dash 8,economy,"
        "online,3800,570,4370,Hajj,30"
    )
    with open(csv_file, "a") as f:
        f.write(extra + "\n")
    raw = read_flights_csv(spark, csv_file)
    n = star.ingest_increment(
        spark, raw, str(tmp_path / "bronze"), str(tmp_path / "ledger")
    )
    assert n == 1
    assert spark.read.parquet(str(tmp_path / "bronze")).count() == 5


def test_silver_cleaning_and_validity_filter(spark, csv_file, tmp_path):
    _, _, bronze, silver, _ = _run_pipeline(spark, csv_file, tmp_path)
    rows = {r.airline: r for r in silver.collect()}
    # BAD_FARE_ROW dropped (total_fare<=0); others survive
    assert len(rows) == 3 and "Novoair" in rows
    nv = rows["Novoair"]
    assert nv.stopovers == 2          # '2 stops' parsed
    assert nv.total_fare == 3450.0
    assert nv.airline == "Novoair"    # trimmed + initcap
    assert rows["Us-bangla"].departure_date is None  # coerce-to-null


def test_star_schema_shapes(spark, csv_file, tmp_path):
    *_, schema = _run_pipeline(spark, csv_file, tmp_path)
    assert schema.dim_airlines.count() == 3
    # airports deduped on code: DAC, CXB, ZYL, CGP
    assert schema.dim_airports.count() == 4
    # fact: BAD_DATE_ROW dropped for null date → 2 rows
    fact = schema.fact_flights.collect()
    assert len(fact) == 2
    assert all(r.airline_id is not None for r in fact)
    dim_date = {r.date_id.isoformat(): r for r in schema.dim_date.collect()}
    assert dim_date["2025-03-14"].seasonality == "Eid"
    assert dim_date["2025-03-14"].day_of_week == 4  # Friday
    assert not dim_date["2025-03-14"].is_weekend


def test_reconciliation_gate(spark, csv_file, tmp_path):
    _, raw, bronze, silver, schema = _run_pipeline(spark, csv_file, tmp_path)
    report = reconcile(
        source_rows=raw.count(),
        deduped_rows=bronze.count(),
        staged_rows=bronze.count(),
        fact_rows=schema.fact_flights.count(),
    )
    assert report.staging_ok
    # 2 of 4 deduped rows lost (bad fare, bad date) = 50% > 1% budget
    assert not report.loss_ok and not report.passed


def test_reconciliation_passes_within_budget():
    r = reconcile(source_rows=1000, deduped_rows=1000,
                  staged_rows=1000, fact_rows=995)
    assert r.loss_pct == 0.5 and r.passed
    r2 = reconcile(source_rows=1000, deduped_rows=1000,
                   staged_rows=1000, fact_rows=980)
    assert not r2.passed


def test_dropped_row_accounting_single_pass(spark, csv_file, tmp_path):
    """df.observe metrics reconcile with the actual filter effect."""
    from airflow_project_flight_price_analysis_spark.jobs.flight_pipeline import (
        run_pipeline,
    )

    report = run_pipeline(spark, csv_file, str(tmp_path / "wh"))
    assert "rows_dropped_invalid" in report
    assert report["rows_dropped_invalid"] >= 0
    # silver rows = deduped - dropped_invalid; fact may drop more (null FKs)
    silver_rows = report["deduped_rows"] - report["rows_dropped_invalid"]
    assert report["fact_rows"] <= silver_rows <= report["deduped_rows"]


def test_jdbc_wrappers_contract(spark):
    """No DB (or JDBC driver) ships in this environment. Pin the API
    contract: missing partition bounds raise ValueError before any remote
    call; with bounds, the failure is at the JDBC layer (driver/connect —
    schema resolution is eager for JDBC), proving the options are wired
    through to the datasource."""
    import pytest as _pytest

    from airflow_project_flight_price_analysis_spark.sources.jdbc import read_jdbc

    with _pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:postgresql://example.invalid/x", "t",
                  partition_column="id")
    with _pytest.raises(Exception) as ei:
        read_jdbc(
            spark, "jdbc:postgresql://example.invalid:5432/x", "analytics.fact",
            partition_column="id", lower_bound=0, upper_bound=1000,
            num_partitions=4,
        )
    assert "driver" in str(ei.value).lower() or "connect" in str(ei.value).lower()


def test_reordered_csv_header_fails_loudly(spark, tmp_path):
    """enforceSchema=false: a vendor reordering columns must fail the
    read, not silently swap source/destination through the pipeline."""
    import pytest

    from airflow_project_flight_price_analysis_spark.sources.flights_csv import (
        RENAME_MAP,
        read_flights_csv,
    )

    cols = list(RENAME_MAP)
    swapped = cols.copy()
    i, j = cols.index("Source"), cols.index("Destination")
    swapped[i], swapped[j] = swapped[j], swapped[i]
    p = tmp_path / "swapped.csv"
    p.write_text(",".join(f'"{c}"' for c in swapped) + "\n"
                 + ",".join(["x"] * len(cols)) + "\n")
    with pytest.raises(Exception, match="(?i)header|schema"):
        read_flights_csv(spark, str(p)).collect()


def test_reconcile_fails_closed_on_inflation_and_phantoms():
    """r7 review: the gate must fail CLOSED in both directions — row
    inflation (negative loss) and phantom fact rows over an empty
    source both fail; the report's loss_ok agrees with its own rounded
    loss_pct."""
    from airflow_project_flight_price_analysis_spark.validation import (
        reconcile,
    )

    # dim-fanout inflation: MORE fact rows than deduped source
    r = reconcile(1000, 1000, 1000, 1100)
    assert r.loss_pct < 0 and not r.loss_ok and not r.passed
    # phantom fact rows under an empty source
    r = reconcile(1000, 0, 0, 500)
    assert not r.passed
    # legitimate empty no-op run still passes
    r = reconcile(0, 0, 0, 0)
    assert r.passed
    # rounded-value consistency: loss_ok computed on the REPORTED value
    r = reconcile(10_000_000, 10_000_000, 10_000_000, 9_899_996)
    assert r.loss_pct == 1.0 and r.loss_ok
