"""Table-maintenance job — the scheduled housekeeping pass a long-lived
lake needs (the orchestrator schedules it off-peak, like the reference
schedules its pipeline DAG daily — ``dags/flight_pipeline_dag.py:21-26``).

Three maintenance families, each a first-class operator elsewhere in the
engine, wired here into one spark-submit entry point:

- ``compact``     small-file compaction of a parquet directory
                  (operators/compaction.py — size-targeted rewrite to a
                  NEW directory; the caller swaps atomically)
- ``ledger``      streaming near-dup signature-ledger epoch folding
                  (streaming/neardup.py::compact_sig_ledger — collapse
                  epochs <= K into one base partition; screens of all
                  future epochs are provably unchanged)
- ``vacuum``      orphan-snapshot removal for BucketedMergeTable roots
                  (operators/transactional.py — losing optimistic
                  writers leak uuid dirs; never run under a live writer)

Usage:
    python -m airflow_project_flight_price_analysis_spark.jobs.maintenance \
        compact --path /wh/bronze --out /wh/bronze_c [--target-mb 128]
    python -m ... maintenance ledger --path /wh/sig_ledger \
        --out /wh/sig_ledger_c --upto-epoch 41
    python -m ... maintenance vacuum --root /wh/merge_table
    # (key/n_buckets are adopted from the root's table_properties.json;
    #  only a legacy pre-properties root needs BOTH --key and
    #  --n-buckets passed explicitly)

Emits one JSON report line to stdout (the flight_pipeline convention).
"""

from __future__ import annotations

import argparse
import json
import sys

from ..session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="maintenance")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compact", help="small-file compaction")
    c.add_argument("--path", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--no-shuffle", action="store_true",
                   help="coalesce instead of repartition (uneven files)")

    led = sub.add_parser("ledger", help="near-dup sig-ledger epoch folding")
    led.add_argument("--path", required=True)
    led.add_argument("--out", required=True)
    led.add_argument("--checkpoint", required=True,
                     help="the stream's checkpoint dir — the fold bound "
                          "is DERIVED from (or validated against) its "
                          "last committed epoch; never trust a manual "
                          "number")
    led.add_argument("--upto-epoch", type=int, default=None,
                     help="fold epochs <= this (default: the "
                          "checkpoint's last committed epoch; values "
                          "above it are rejected)")
    led.add_argument("--target-mb", type=int, default=128)

    v = sub.add_parser("vacuum", help="merge-table orphan removal")
    v.add_argument("--root", required=True)
    # key/n_buckets are ADOPTED from the table's pinned
    # table_properties.json — passing them here (and getting them
    # wrong) was exactly the mis-routing hazard the r7 ADVICE flagged;
    # legacy pre-properties roots can still supply them explicitly
    v.add_argument("--key", default=None,
                   help="only for legacy roots without "
                        "table_properties.json")
    v.add_argument("--n-buckets", type=int, default=None,
                   help="only for legacy roots without "
                        "table_properties.json")

    args = ap.parse_args(argv)
    report: dict = {"cmd": args.cmd}

    if args.cmd == "vacuum":
        # pure-filesystem maintenance: no SparkSession needed. Require
        # an EXISTING table — the handle's makedirs would otherwise
        # fabricate an empty skeleton at a mistyped --root and report
        # success while the real table's orphans survive (r7 review).
        import os

        from ..operators.transactional import BucketedMergeTable

        if not os.path.isdir(os.path.join(args.root, "commits")):
            print(f"error: {args.root} is not a merge-table root "
                  "(no commits/ dir)", file=sys.stderr)
            return 2
        # legacy pre-properties roots (no table_properties.json) with a
        # missing/mismatched --key/--n-buckets raise ValueError — report
        # it in the CLI's stderr-message + exit-2 convention (like the
        # missing-commits check above), not as a raw traceback
        try:
            t = BucketedMergeTable(args.root, args.key,
                                   n_buckets=args.n_buckets)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        removed = t.vacuum()
        report.update(root=args.root, removed=len(removed))
    else:
        spark = get_spark(app_name=f"fpa-maintenance-{args.cmd}")
        target = args.target_mb * 1024 * 1024
        if args.cmd == "compact":
            from ..operators.compaction import compact_parquet

            n = compact_parquet(spark, args.path, args.out,
                                target_file_bytes=target,
                                shuffle=not args.no_shuffle)
            report.update(path=args.path, out=args.out, files=n)
        else:
            from ..streaming.coherence import last_committed_epoch
            from ..streaming.neardup import compact_sig_ledger

            upto = args.upto_epoch
            if upto is None:
                upto = last_committed_epoch(args.checkpoint)
                if upto is None:
                    print("error: checkpoint has no committed epochs — "
                          "nothing to fold", file=sys.stderr)
                    return 2
            n = compact_sig_ledger(spark, args.path, args.out,
                                   upto_epoch=upto,
                                   target_file_bytes=target,
                                   checkpoint_dir=args.checkpoint)
            report.update(path=args.path, out=args.out,
                          upto_epoch=upto, base_files=n)

    json.dump(report, sys.stdout)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
