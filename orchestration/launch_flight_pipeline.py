"""spark-submit primary resource for the flight pipeline.

spark-submit takes a script path, not a module (there is no ``-m`` flag),
and the job module itself uses package-relative imports, so it cannot be
the primary resource. This thin launcher is: ship the package alongside it
(``--py-files fpa_package.zip`` built from
``airflow_project_flight_price_analysis_spark/``) and submit this file.

    spark-submit --deploy-mode cluster --py-files fpa_package.zip \
        orchestration/launch_flight_pipeline.py --csv ... --warehouse ...
"""

from __future__ import annotations

import sys

from airflow_project_flight_price_analysis_spark.jobs.flight_pipeline import main

if __name__ == "__main__":
    sys.exit(main())
