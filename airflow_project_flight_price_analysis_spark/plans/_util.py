"""Shared plan-construction helpers (ADVICE r14: the footer-count
logic x83 and x131 both use lived as a private function in
plans/insights.py, creating a cross-module dependency on another plan
file's underscore-private name)."""

from __future__ import annotations


def parquet_num_rows(path: str) -> int | None:
    """Row count from parquet footers only (driver-side, a few KiB of
    metadata IO — the bounded file-footer-stats pattern). Returns
    ``None`` when the footers can't be read locally (non-local
    ``sf_dir`` such as s3:// or hdfs://, or an unexpected layout) —
    callers must treat ``None`` as over-cap and take their shuffled
    fallback rather than fail the plan build (ADVICE r12)."""
    import glob
    import os

    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            parts = sorted(glob.glob(f"{path}/*.parquet")) or sorted(
                glob.glob(f"{path}/part-*"))
            if not parts:
                return None
            return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:  # noqa: BLE001 — any unreadable footer ⇒ size unknown
        return None
