"""spark-submit primary resource for the maintenance job (see
launch_flight_pipeline.py for why a thin launcher is needed).

    spark-submit --deploy-mode cluster --py-files fpa_package.zip \
        orchestration/launch_maintenance.py compact --path ... --out ...
"""

from __future__ import annotations

import sys

from airflow_project_flight_price_analysis_spark.jobs.maintenance import main

if __name__ == "__main__":
    sys.exit(main())
