"""Streaming decontamination — the bloom runtime filter (operators/
bloom.py) composed with Structured Streaming.

A training-data ingest stream must be screened against a contamination
ledger (eval-set fingerprints, takedown lists). The naive form joins
every micro-batch against the ledger; this operator short-circuits the
definite-clean majority MAP-SIDE:

- the ledger's bloom bitset is collected ONCE at query-build time and
  embedded as a LITERAL map expression, so bloom-negative rows (no
  false negatives by construction) never enter any join — a pure
  filter inside the stream's own stage, no stream-static join, no
  state;
- only bloom-positive candidates (true hits + ~fpp false positives)
  go through the EXACT stream-static join against the ledger, so the
  per-batch join input is candidate-sized, not batch-sized.

Result streams are exact: ``flagged`` = rows whose key IS in the
ledger, ``clean`` = all others (bloom negatives ∪ join-rejected false
positives).

Scale/ops notes: the literal-map form fixes the filter at query START —
a ledger update means restarting the query (normal for blocklist
rollouts; the checkpoint makes the restart seamless). The literal is
sized by the LEDGER (m/64 entries ≈ 2 MB at 8M bits); for very large
ledgers where plan-embedding is unreasonable, fall back to
``foreachBatch`` + ``bloom_semi_join`` per batch (same operators,
broadcast instead of literal). Sister of streaming/quality.py's
quarantine split — run decontamination first, DQ checks second.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_parameters,
)


def literal_bloom_predicate(blocklist: DataFrame, block_col: str,
                            key: Column, *, fpp: float = 0.01) -> Column:
    """A pure-expression membership predicate for ``key`` against the
    (batch) blocklist: builds the bloom bitset now, embeds it as a
    literal ``map<int,bigint>``. NULL keys evaluate to FALSE (the
    guard lives in ``bloom_might_contain`` — without it every NULL key
    hashes to one seed-only position set and can pass) — matching
    equi-join semantics."""
    n = max(blocklist.select(block_col).count(), 1)
    m, k = bloom_parameters(n, fpp)
    row = bloom_build(
        blocklist.select(F.col(block_col).alias("__bk")), "__bk",
        num_bits=m, num_hashes=k,
    ).collect()[0]
    words = row["words"] or {}
    if words:
        lit_map = F.map_from_arrays(
            F.array(*[F.lit(int(i)) for i in words]),
            F.array(*[F.lit(int(w)).cast("bigint") for w in words.values()]),
        )
    else:
        lit_map = F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<bigint>")
        )
    return bloom_might_contain(lit_map, key, num_bits=m, num_hashes=k)


def streaming_decontaminate(
    stream: DataFrame,
    blocklist: DataFrame,
    stream_col: str,
    block_col: str,
    *,
    fpp: float = 0.01,
) -> tuple[DataFrame, DataFrame]:
    """Split a stream into (clean, flagged) against a batch blocklist.
    Exact: ``flagged`` is precisely the stream-static semi-join; the
    bloom literal only routes definite-clean rows around the join."""
    from ..operators.bloom import (
        _require_no_reserved,
        _require_same_key_type,
    )

    # same guard as bloom_prune: the literal hashes key.cast('string')
    # but the exact join compares natively — mixed types would give
    # bloom false negatives and route contaminated rows into `clean`;
    # and the reserved-name guard keeps a stream that already carries a
    # `__bloom_bk` column from making the verify joins ambiguous
    _require_no_reserved(stream)
    _require_same_key_type(stream, stream_col, blocklist, block_col)
    might = literal_bloom_predicate(
        blocklist, block_col, F.col(stream_col), fpp=fpp
    )
    candidates = stream.filter(might)
    keys = blocklist.select(F.col(block_col).alias("__bloom_bk")).distinct()
    flagged = candidates.join(
        keys, candidates[stream_col] == F.col("__bloom_bk"), "left_semi"
    )
    clean = stream.filter(~F.coalesce(might, F.lit(False))).unionByName(
        candidates.join(
            keys, candidates[stream_col] == F.col("__bloom_bk"), "left_anti"
        )
    )
    return clean, flagged
