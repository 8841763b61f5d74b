"""spark-submit primary resource for the corpus-curation pipeline.

Same posture as launch_flight_pipeline.py: spark-submit needs a script
path (no ``-m`` flag exists), the package ships via ``--py-files``.

    spark-submit --deploy-mode cluster --py-files fpa_package.zip \
        orchestration/launch_corpus_pipeline.py --sf-dir ... --out-dir ...
"""

from __future__ import annotations

import sys

from airflow_project_flight_price_analysis_spark.jobs.corpus_pipeline import main

if __name__ == "__main__":
    sys.exit(main())
