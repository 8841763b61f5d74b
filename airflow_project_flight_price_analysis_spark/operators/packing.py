"""Sequence packing for LLM pretraining (SURVEY.md §2.9 X4 family).

Concat-then-split packing: documents are concatenated in a deterministic
order and cut every ``seq_len`` tokens; each document belongs to the pack
where it STARTS. Implemented as a window cumulative sum — no iterative
driver loop, no UDF.

Scale posture: a single ``partitionBy(source)`` window sorts each source
on ONE reducer, which serializes for giant sources. ``shards > 1`` salts
the window key with a deterministic doc-hash shard — each (source, shard)
packs independently and in parallel, at the cost of at most one
underfilled pack per shard (the classic throughput/packing-efficiency
trade; negligible when shards ≪ corpus_tokens / seq_len).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pack_sequences(df: DataFrame, id_col: str, source_col: str,
                   n_tokens_col: str, seq_len: int = 2048,
                   shards: int = 1,
                   shard_col: Column | None = None) -> DataFrame:
    """Assign every document a (shard, pack_id) within its source.

    Output: input columns + ``shard`` + ``pack_id``. Deterministic:
    ordering inside a shard is by ``id_col``; shard = xxhash64(id) mod
    ``shards`` (stable under reprocessing, independent of row order).
    Pass ``shard_col`` to override the shard assignment with any
    deterministic expression (e.g. ``pmod(doc_id, shards)`` when a
    cross-engine oracle must reproduce the sharding — DuckDB has no
    xxhash64)."""
    if shard_col is not None:
        shard = shard_col.cast("int")
    else:
        shard = (
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int")
            if shards > 1 else F.lit(0)
        )
    out = df.withColumn("shard", shard)
    w = (
        W.partitionBy(source_col, "shard").orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return out.withColumn(
        "pack_id",
        F.floor((F.sum(n_tokens_col).over(w) - F.col(n_tokens_col))
                / F.lit(seq_len)),
    )
