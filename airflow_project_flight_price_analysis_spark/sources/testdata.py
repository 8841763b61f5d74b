"""Readers for the driver-generated parquet testdata (TESTDATA.md).

Parquet is the engine's bronze/silver storage format of choice: columnar,
self-describing schema, predicate pushdown + column pruning reach the scan
(check ``.explain`` for ``PushedFilters`` / ``ReadSchema``), splittable for
1000-executor parallelism. The reference's MySQL staging table
(``scripts/init_mysql.sql:6-26``) maps to a parquet bronze layer here.

``events.parquet``'s ``ts`` column has changed physical type across driver
regenerations (TIMESTAMP(NANOS) in rounds 1-2, plain ``timestamp[us]`` /
TIMESTAMP_NTZ since round 4's refresh). Both the batch and the streaming
reader therefore dispatch on the *actual* footer type instead of assuming
one — see :func:`_events_ts_kind`. Whatever the storage type, downstream
operators always see ``ts`` as session-timezone ``TimestampType`` (the
session is pinned UTC in ``session.py``, so the NTZ→timestamp cast is
value-preserving and matches what DuckDB's reader yields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _events_ts_kind(sf_dir: str) -> str:
    """Classify how ``events.parquet`` physically stores ``ts``.

    Returns one of:
      * ``"nanos"`` — parquet TIMESTAMP(NANOS); Spark's vectorized reader
        rejects it unless read as long via ``legacy.parquet.nanosAsLong``.
      * ``"ntz"``   — timestamp without timezone (reads as TIMESTAMP_NTZ
        under Spark 4).
      * ``"tz"``    — timestamp with timezone (reads as TimestampType).
      * ``"long"``  — plain int64, interpreted as epoch nanoseconds.

    The footer is read driver-side with pyarrow (a few KiB of metadata, no
    data IO) — the same probe a production job would run once per batch to
    survive upstream schema drift.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        # Spark writes parquet as a directory of part files; any one
        # part's footer carries the column type.
        parts = sorted(glob.glob(f"{path}/*.parquet")) or sorted(
            glob.glob(f"{path}/part-*")
        )
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        path = parts[0]
    t = str(pq.read_schema(path).field("ts").type)
    if t.startswith("timestamp"):
        # Unit check FIRST (ADVICE r4): Spark's vectorized reader rejects
        # parquet TIMESTAMP(NANOS) regardless of tz-adjustment, so
        # ``timestamp[ns, tz=...]`` must take the nanosAsLong path, not
        # the tz path. (isAdjustedToUTC nanos store UTC epoch nanos and
        # the session tz is pinned UTC, so the long->micros normalization
        # is value-preserving for both nanos flavors.)
        if t.startswith("timestamp[ns"):
            return "nanos"
        if "tz=" in t:
            return "tz"
        return "ntz"
    return "long"


def _normalize_events_ts(df: DataFrame, kind: str) -> DataFrame:
    """Map the storage-typed ``ts`` to session-tz TimestampType."""
    if kind in ("nanos", "long"):
        # long epoch-nanos -> truncate to micros (what DuckDB's reader does)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if kind == "ntz":
        # session tz is pinned UTC (session.py), so this cast is
        # value-preserving against the DuckDB oracle.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-first scan: parquet carries the schema; no inference runs."""
    if name not in TABLES:
        raise ValueError(f"unknown testdata table {name!r}; expected one of {TABLES}")
    if name == "events":
        kind = _events_ts_kind(sf_dir)
        if kind == "nanos":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/{name}.parquet"), kind
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``load_table(spark, sf_dir, "events")``.

    File-source streams require an explicit read schema; it is derived from
    the same footer probe as the batch reader so both paths normalize ``ts``
    identically, and a testdata regeneration changes ONE function's
    behavior, not three subsystems (the round-3 lesson).
    """
    import os

    kind = _events_ts_kind(sf_dir)
    if kind in ("nanos", "long"):
        ts_type = "long"
        if kind == "nanos":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    elif kind == "ntz":
        ts_type = "timestamp_ntz"
    else:
        ts_type = "timestamp"
    schema = (f"event_id long, ts {ts_type}, user_id long, "
              "event_type string, value double, props string")
    events_path = f"{sf_dir}/events.parquet"
    if os.path.isdir(events_path):
        # directory-of-part-files layout (a Spark write): point the
        # stream AT the directory. pathGlobFilter matches LEAF file
        # names, so filtering sf_dir for "events.parquet" would match
        # zero part-* leaves and start a silently EMPTY stream.
        stream = spark.readStream.schema(schema).parquet(events_path)
    else:
        # single-file layout: glob so sibling tables in sf_dir are
        # not swept into the stream
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return _normalize_events_ts(stream, kind)


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, str]:
    """Register testdata tables as temp views for ``spark.sql`` queries.

    Each table loads independently: a missing or malformed file skips that
    one view (recorded in the returned ``{table: error}`` map) instead of
    taking down queries that never touch it — a query that does need the
    broken table fails later with a readable ``TABLE_OR_VIEW_NOT_FOUND``
    naming it.
    """
    errors: dict[str, str] = {}
    for name in tables if tables is not None else TABLES:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception as exc:  # noqa: BLE001 — isolate per-table failures
            errors[name] = f"{type(exc).__name__}: {exc}"
    return errors
