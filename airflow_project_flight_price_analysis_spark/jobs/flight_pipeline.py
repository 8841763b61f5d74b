"""Flight pipeline job — the spark-submit entry point the orchestrator
(Airflow, per the driver mandate) schedules.

Mirrors the reference DAG's task bodies
(``dags/flight_pipeline_dag.py:49-68``): ingest → transform → validate,
as one Spark job per stage or a single end-to-end run. Emits a JSON
report to stdout (the reference logs counts; ``dags/tasks/validation.py``).

Usage:
    python -m airflow_project_flight_price_analysis_spark.jobs.flight_pipeline \
        --csv /path/flights.csv --warehouse /path/warehouse [--stage all]
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from ..operators import star
from ..session import get_spark
from ..sources.flights_csv import read_flights_csv
from ..validation import reconcile


def run_pipeline(spark: SparkSession, csv_path: str, warehouse: str) -> dict:
    bronze_path = f"{warehouse}/bronze_flights"
    ledger_path = f"{warehouse}/processed_hashes"

    # --- ingest (ingestion.py:18-129) ---
    raw = read_flights_csv(spark, csv_path)
    source_rows = raw.count()
    n_new = star.ingest_increment(spark, raw, bronze_path, ledger_path)

    # --- transform (transformation.py:45-138) ---
    from pyspark.sql import Observation

    bronze = spark.read.parquet(bronze_path)
    deduped_rows = bronze.count()
    clean_obs = Observation("clean_metrics")
    silver = star.clean_flights(bronze, observation=clean_obs)
    schema = star.build_star_schema(silver)

    for name, df in [
        ("dim_airlines", schema.dim_airlines),
        ("dim_airports", schema.dim_airports),
        ("dim_date", schema.dim_date),
        ("fact_flights", schema.fact_flights),
    ]:
        df.write.mode("overwrite").parquet(f"{warehouse}/{name}")

    # --- validate (validation.py:17-49, post-dedup semantics) ---
    # staged_rows is a fresh READ-BACK of the bronze table counted
    # AFTER the star build — passing the earlier deduped_rows variable
    # here would make staging_ok compare a value to itself (vacuously
    # true, validating nothing); the re-count catches a bronze
    # partition lost or doubled between ingest and validation.
    staged_rows = spark.read.parquet(bronze_path).count()
    fact_rows = spark.read.parquet(f"{warehouse}/fact_flights").count()
    report = reconcile(
        source_rows=source_rows,
        deduped_rows=deduped_rows,
        staged_rows=staged_rows,
        fact_rows=fact_rows,
    )
    return {
        "ingested_new_rows": n_new,
        # single-pass dropped-row accounting (A7) via df.observe — no
        # extra count() jobs; available after the first action over silver
        "rows_dropped_invalid": int(clean_obs.get["rows_dropped_invalid"] or 0),
        "dims": {
            "dim_airlines": schema.dim_airlines.count(),
            "dim_airports": schema.dim_airports.count(),
            "dim_date": schema.dim_date.count(),
        },
        **report.as_dict(),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", required=True, help="raw flight CSV path")
    ap.add_argument("--warehouse", required=True, help="parquet warehouse dir")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="flight-pipeline")
    try:
        report = run_pipeline(spark, args.csv, args.warehouse)
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
