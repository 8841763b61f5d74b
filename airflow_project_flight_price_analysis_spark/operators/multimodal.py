"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.9 X5).

Design: media lives as a ``binary`` column with a metadata struct
(modality, format, width/height/duration, …). Per-item decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators — the only place the engine leaves the JVM,
because media codecs are Python/C libraries. The Spark-side plumbing
(schema, partition sizing, batch shape) is real and tested; the codec
call itself is stubbed (image/audio libs absent in this container) behind
``SPARK_GRAFT_FAKE_DECODE`` — a deterministic fake preserving shapes.

Scale posture: payload columns make rows wide → keep
``spark.sql.files.maxPartitionBytes`` small for media tables, never
groupBy a payload, and project payloads out before any shuffle
(metadata-only lineage for joins/aggs; payloads re-joined by id at sinks).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("modality", T.StringType()),     # image | audio | video
    T.StructField("format", T.StringType()),       # png | wav | mp4 | ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents testdata:
    payload = utf-8 bytes of the text (a stand-in blob), metadata typed;
    modality assigned round-robin by doc_id (image/audio/video) so the
    per-modality operators (frame sampling, resize) have real input.
    Demonstrates the binary-column plumbing without shipping real media."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    is_timed = F.col("doc_id") % 3 != 0  # audio + video carry a duration
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.lit("fake").alias("format"),
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            F.when(is_timed, (F.col("n_chars") * 7 % 5000).cast("int"))
                .otherwise(F.lit(None).cast("int")).alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, fmt: str):  # pragma: no cover - no codecs here
    raise NotImplementedError(
        "real media decode requires PIL/av/soundfile, not present in this "
        "environment; set SPARK_GRAFT_FAKE_DECODE=1 (default in tests) for "
        "the deterministic fake"
    )


def _decode_fake(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in 'feature vector': bytes of sha256(payload)
    scaled to [0,1). Stable across runs/machines. Divisor 256 (not
    255): a 0xFF byte under /255 lands EXACTLY on 1.0, violating the
    half-open range ~3% of rows (8 bytes × 1/255) — the all-rows range
    test caught it."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 256.0 for b in h[:dim]]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each batch arrives as a pandas DataFrame (payload as
    bytes); output schema is fixed (FEATURE_SCHEMA). Swap ``_decode_fake``
    for a real codec on a cluster with media libs installed.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            decode = _decode_fake if fake else _decode_real
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int32"),
                "sha": payloads.map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()
                ),
                "feature": payloads.map(lambda p: decode(p, dim)),
            })

    from ..session import scale_out
    return scale_out(media, "media_id").mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def resize(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Arrow-batched image resize stub: real path needs PIL (absent here —
    raises NotImplementedError); fake path passes the payload through and
    rewrites the metadata dims, preserving the exact batch/schema shape a
    real resize kernel would produce."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:  # pragma: no cover - no codecs in this container
                raise NotImplementedError(
                    "real resize requires PIL; use fake=True here"
                )
            meta = pdf["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": pdf["payload"],
                "meta": meta,
            })

    from ..session import scale_out
    return scale_out(media, "media_id").mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes each video into frame
    timestamps (metadata-only — JVM expressions); the per-frame decode
    would then run through ``extract_features``-style mapInPandas. Shows
    the row-explosion shape without decoding."""
    return (
        media.filter(F.col("meta.modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
