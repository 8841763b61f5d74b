"""Airflow DAG shim for the corpus-curation job (the extension surface's
end-to-end pipeline, ``jobs/corpus_pipeline.py``) — same orchestration
posture as flight_pipeline_dag: Airflow schedules, Spark executes.

A weekly cadence fits corpus refreshes (curation re-runs are deterministic
— content-hash dedup and splits — so a re-run over grown input only adds
rows; see jobs/corpus_pipeline.py). Import-gated like its sibling.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator

    HAVE_AIRFLOW = True
except ImportError:  # build container has no airflow — engine is unaffected
    HAVE_AIRFLOW = False

CORPUS_IN = os.environ.get("FPA_CORPUS_IN", "/data/raw_corpus")
CORPUS_OUT = os.environ.get("FPA_CORPUS_OUT", "/data/curated_corpus")
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")
# See flight_pipeline_dag: spark-submit takes a script path, not a module.
PY_FILES = os.environ.get(
    "FPA_PY_FILES", os.path.join(os.path.dirname(__file__), "fpa_package.zip")
)
LAUNCHER = os.path.join(os.path.dirname(__file__), "launch_corpus_pipeline.py")

CURATE_CMD = (
    f"{SPARK_SUBMIT} --deploy-mode cluster "
    "--conf spark.sql.adaptive.enabled=true "
    f"--py-files {PY_FILES} "
    f"{LAUNCHER} --sf-dir {CORPUS_IN} --out-dir {CORPUS_OUT}"
)

if HAVE_AIRFLOW:
    with DAG(
        dag_id="corpus_curation_spark",
        schedule="@weekly",
        catchup=False,
        start_date=datetime(2026, 1, 1),
        default_args={"retries": 3, "retry_delay": timedelta(minutes=5)},
    ) as dag:
        BashOperator(task_id="curate_corpus", bash_command=CURATE_CMD)
