"""Flight star-schema pipeline: bronze → silver → dims → fact.

Re-expresses the reference's three pipeline stages
(``dags/tasks/ingestion.py``, ``dags/tasks/transformation.py``) as lazy
DataFrame plans. Contrasts with the reference:

- Hash-ledger dedup is a ``left_anti`` join, not a per-chunk SQL IN-list
  round-trip (``ingestion.py:76-83``). At 100 TB the ledger is partitioned
  by hash prefix → co-partitioned sort-merge anti-join (SURVEY §7.4.3).
- FK resolution is three broadcast hash joins, not driver-side dict maps
  (``transformation.py:43,123-125``) — no collect, no driver memory ceiling.
- Surrogate keys are ``xxhash64`` of the natural key, not SERIAL
  (``scripts/init_postgres.sql:5,10,27``) — stable, distributed, join-free
  re-derivation (SURVEY §7.4.1).
- All cleaning is Catalyst expressions (functions/cleaning.py) — the
  reference's row-at-a-time ``apply`` loops vanish into codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    clean_text_expr,
    coerce_money_expr,
    date_parts,
    parse_stopovers_expr,
    row_hash_expr,
    surrogate_key_expr,
)

BRONZE_COLS = [
    "airline", "source_code", "source_name", "destination_code",
    "destination_name", "departure_datetime", "arrival_datetime",
    "duration_hours", "stopovers", "aircraft_type", "class",
    "booking_source", "base_fare", "tax_surcharge", "total_fare",
    "seasonality", "days_before_departure",
]

TEXT_COLS = [
    # transformation.py:56-59 — the 7 standardized text columns
    "airline", "source_name", "destination_name", "aircraft_type",
    "class", "booking_source", "seasonality",
]

MONEY_COLS = ["duration_hours", "base_fare", "tax_surcharge", "total_fare"]


# --------------------------------------------------------------------------
# Ingestion: bronze append with hash-ledger dedup (D1, ingestion.py:18-129)
# --------------------------------------------------------------------------

def with_row_hash(df: DataFrame) -> DataFrame:
    """P4 — content hash over all bronze columns (ingestion.py:69)."""
    return df.withColumn("row_hash", row_hash_expr([c for c in BRONZE_COLS if c in df.columns]))


def dedup_against_ledger(incoming: DataFrame, ledger: DataFrame | None) -> DataFrame:
    """D1 — drop rows whose hash is already in the ledger, then drop
    in-batch duplicates (keep one row per hash, ingestion.py:82-83).

    A ledger that EXISTS but lacks ``row_hash`` is schema drift, not
    first-run — silently skipping the anti-join would re-ingest the
    entire source (the exact failure read_ledger's fail-loud rule
    exists to prevent). ``None`` (genuinely absent path) means first
    run."""
    hashed = with_row_hash(incoming)
    if ledger is not None:
        if "row_hash" not in ledger.columns:
            raise ValueError(
                "dedup_against_ledger: ledger exists but has no "
                f"'row_hash' column (schema drift? columns={ledger.columns})"
            )
        hashed = hashed.join(ledger.select("row_hash"), "row_hash", "left_anti")
    return hashed.dropDuplicates(["row_hash"])


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame | None:
    """Read the hash ledger; only a genuinely absent path means 'first
    run' (→ None). Any other failure — corrupt parquet, permissions —
    must surface: swallowing it would silently re-ingest the entire
    source as if the ledger were empty."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(ledger_path)
    except AnalysisException as e:
        if e.getCondition() == "PATH_NOT_FOUND":
            return None
        raise


def ingest_increment(
    spark: SparkSession,
    incoming: DataFrame,
    bronze_path: str,
    ledger_path: str,
) -> int:
    """Incremental load (§3.1 Spark shape): anti-join the ledger, append
    new rows to bronze, THEN append their hashes to the ledger — same
    ordering as the reference (``ingestion.py:118-119,127``) so a crash
    between the two writes re-reads rather than loses data.

    Delivery contract: **at-least-once into bronze**. A crash in the
    window between the bronze append and the ledger append means the
    next run re-appends those rows (their hashes never made the ledger).
    Readers that need exactly-once use the streaming path
    (``streaming.ingest``), whose epoch-partitioned dynamic-overwrite
    sink is replay-idempotent; batch replays leave content-identical
    rows, removable with a full-row distinct.

    Returns the number of newly ingested rows.
    """
    ledger = read_ledger(spark, ledger_path)

    fresh = dedup_against_ledger(incoming, ledger)
    fresh = fresh.withColumn("load_timestamp", F.current_timestamp())
    # two writes, one lineage — cache to avoid recomputing the anti-join
    fresh.persist()
    try:
        n_new = fresh.count()
        if n_new:
            fresh.drop("row_hash").write.mode("append").parquet(bronze_path)
            fresh.select("row_hash", "load_timestamp").write.mode("append").parquet(ledger_path)
    finally:
        fresh.unpersist()
    return n_new


# --------------------------------------------------------------------------
# Silver: cleaning (transformation.py:54-79,91)
# --------------------------------------------------------------------------

def clean_flights(df: DataFrame, observation=None) -> DataFrame:
    """P5-P9: standardize text, parse stopovers, coerce measures,
    validity-filter, parse departure timestamp (coerce-to-null).

    ``observation`` (a ``pyspark.sql.Observation``) piggybacks dropped-row
    accounting (A7) onto the existing pass: rows_in / rows_dropped_invalid
    are computed inside the same scan instead of the reference's two extra
    length calls (``transformation.py:75-79``) — at 100 TB a pre/post
    ``count()`` pair is two additional full-table passes."""
    for c in TEXT_COLS:
        if c in df.columns:
            df = df.withColumn(c, clean_text_expr(c))
    missing = [c for c in MONEY_COLS if c not in df.columns]
    for c in missing:  # transformation.py:70-72 — absent column → 0.0
        df = df.withColumn(c, F.lit(0.0))
    df = df.withColumns({c: coerce_money_expr(c) for c in MONEY_COLS})
    df = df.withColumn("stopovers", parse_stopovers_expr("stopovers"))
    df = df.withColumn(
        "days_before_departure",
        F.coalesce(F.col("days_before_departure").try_cast("int"), F.lit(0)),
    )
    # try_to_timestamp = pd.to_datetime(errors='coerce') (ANSI-safe null)
    df = df.withColumn("departure_ts", F.try_to_timestamp("departure_datetime"))
    df = df.withColumn("departure_date", F.to_date("departure_ts"))
    # P8 validity filter (transformation.py:74-76)
    valid = (F.col("total_fare") > 0) & (F.col("duration_hours") > 0)
    if observation is not None:
        df = df.observe(
            observation,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.when(~valid, 1).otherwise(0)).alias("rows_dropped_invalid"),
        )
    return df.filter(valid)


# --------------------------------------------------------------------------
# Dims (D2-D4 + surrogate keys §7.4)
# --------------------------------------------------------------------------

def build_dim_airlines(silver: DataFrame) -> DataFrame:
    """D2 (transformation.py:82-83): distinct airline + hash key."""
    return (
        silver.select("airline").where(F.col("airline").isNotNull()).distinct()
        .select(
            surrogate_key_expr("airline").alias("airline_id"),
            F.col("airline").alias("airline_name"),
        )
    )


def build_dim_airports(silver: DataFrame) -> DataFrame:
    """D3 (transformation.py:86-88) with the documented divergence-fix:
    dedup on *code* (one name per code via deterministic max), because the
    reference's (code,name) dedup violates its own UNIQUE(airport_code)
    constraint when one code has two spellings (SURVEY D3)."""
    src = silver.select(F.col("source_code").alias("airport_code"),
                        F.col("source_name").alias("airport_name"))
    dst = silver.select(F.col("destination_code").alias("airport_code"),
                        F.col("destination_name").alias("airport_name"))
    return (
        src.unionByName(dst)
        .where(F.col("airport_code").isNotNull())
        .groupBy("airport_code")
        .agg(F.max("airport_name").alias("airport_name"))
        .select(
            surrogate_key_expr("airport_code").alias("airport_id"),
            "airport_code",
            "airport_name",
        )
    )


def build_dim_date(silver: DataFrame) -> DataFrame:
    """D4 + P11-P13 (transformation.py:91-101): calendar spine from
    distinct departure dates; seasonality = deterministic max() per date
    (J4 divergence-fix)."""
    per_date_label = (
        silver.where(F.col("departure_date").isNotNull())
        .groupBy(F.col("departure_date").alias("date_id"))
        .agg(F.max("seasonality").alias("seasonality"))
    )
    parts = date_parts("date_id")
    return per_date_label.select(
        "date_id",
        parts["year"].alias("year"),
        parts["month"].alias("month"),
        parts["day"].alias("day"),
        parts["quarter"].alias("quarter"),
        parts["day_of_week"].alias("day_of_week"),
        parts["is_weekend"].alias("is_weekend"),
        F.coalesce(F.col("seasonality"), F.lit("Normal")).alias("seasonality"),
    )


# --------------------------------------------------------------------------
# Fact (J1 + P14 + P2, transformation.py:121-137)
# --------------------------------------------------------------------------

@dataclass
class StarSchema:
    dim_airlines: DataFrame
    dim_airports: DataFrame
    dim_date: DataFrame
    fact_flights: DataFrame


def build_fact(silver: DataFrame,
               dim_airlines: DataFrame,
               dim_airports: DataFrame) -> DataFrame:
    """FK resolution via broadcast joins; unmatched rows and null dates are
    dropped (inner-join semantics = the reference's dropna,
    ``transformation.py:134``)."""
    airlines = F.broadcast(dim_airlines.select("airline_id", "airline_name"))
    src_airports = F.broadcast(
        dim_airports.select(F.col("airport_id").alias("source_airport_id"),
                            F.col("airport_code").alias("src_code"))
    )
    dst_airports = F.broadcast(
        dim_airports.select(F.col("airport_id").alias("destination_airport_id"),
                            F.col("airport_code").alias("dst_code"))
    )
    return (
        silver
        .where(F.col("departure_date").isNotNull())  # P14 (transformation.py:111,134)
        .join(airlines, silver.airline == airlines.airline_name)
        .join(src_airports, silver.source_code == src_airports.src_code)
        .join(dst_airports, silver.destination_code == dst_airports.dst_code)
        .select(
            # flight_id doubles as the dedup key (SURVEY §7.4.1)
            surrogate_key_expr(*BRONZE_COLS).alias("flight_id"),
            "airline_id",
            "source_airport_id",
            "destination_airport_id",
            F.col("departure_date").alias("departure_date_id"),
            "aircraft_type",
            "class",
            "stopovers",
            "booking_source",
            "duration_hours",
            "days_before_departure",
            "base_fare",
            "tax_surcharge",
            "total_fare",
            F.current_timestamp().alias("load_timestamp"),
        )
    )


def build_star_schema(silver: DataFrame) -> StarSchema:
    dim_airlines = build_dim_airlines(silver)
    dim_airports = build_dim_airports(silver)
    dim_date = build_dim_date(silver)
    fact = build_fact(silver, dim_airlines, dim_airports)
    return StarSchema(dim_airlines, dim_airports, dim_date, fact)
