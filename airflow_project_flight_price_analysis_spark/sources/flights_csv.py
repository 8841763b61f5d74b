"""Schema-first CSV source for raw flight records.

Reference: chunked pandas CSV ingestion (``dags/tasks/ingestion.py:53-64``)
with the 17-column rename map (``ingestion.py:96-114``) and staging DDL
types (``scripts/init_mysql.sql:6-26``).

Spark-first redesign:
- No chunking: Spark partitions the file natively (splittable text input);
  at 100 TB the CSV lands in many splits across executors.
- No schema inference in production paths: the explicit ``StructType``
  below mirrors the staging DDL, fixing the reference's type-loss bug
  (``pd.to_sql(if_exists='replace')`` dropping DDL types,
  ``ingestion.py:62,117-118`` — SURVEY §1.1).
- Datetimes stay strings in bronze (as in the DDL,
  ``init_mysql.sql:13-14``); parsing to timestamp happens in the silver
  clean with coerce-to-null semantics (``transformation.py:91``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# CSV header → engine column name (ingestion.py:96-114)
RENAME_MAP = {
    "Airline": "airline",
    "Source": "source_code",
    "Source Name": "source_name",
    "Destination": "destination_code",
    "Destination Name": "destination_name",
    "Departure Date & Time": "departure_datetime",
    "Arrival Date & Time": "arrival_datetime",
    "Duration (hrs)": "duration_hours",
    "Stopovers": "stopovers",
    "Aircraft Type": "aircraft_type",
    "Class": "class",
    "Booking Source": "booking_source",
    "Base Fare (BDT)": "base_fare",
    "Tax & Surcharge (BDT)": "tax_surcharge",
    "Total Fare (BDT)": "total_fare",
    "Seasonality": "seasonality",
    "Days Before Departure": "days_before_departure",
}

# Bronze schema, mirroring init_mysql.sql:6-26 (strings stay strings;
# numerics read as raw strings too so coerce-to-null cleaning semantics
# are preserved exactly — dirty values must reach the cleaner, not die
# in the CSV parser).
BRONZE_SCHEMA = T.StructType(
    [T.StructField(csv_name, T.StringType(), True) for csv_name in RENAME_MAP]
)


def read_flights_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read raw flight CSV → bronze DataFrame with canonical column names.

    ``enforceSchema=false`` makes Spark VALIDATE the file header against
    the schema's field names (which are exactly the vendor header
    names). The default (true) binds columns positionally and ignores
    the header — a vendor reordering two columns would silently swap
    their data through bronze, the star schema, and the fact table;
    with validation on, the mismatch fails the read loudly instead."""
    df = spark.read.csv(path, header=True, schema=BRONZE_SCHEMA,
                        enforceSchema=False)
    return df.withColumnsRenamed(RENAME_MAP)
