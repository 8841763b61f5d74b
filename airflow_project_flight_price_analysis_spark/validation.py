"""Row-count reconciliation quality gate — SURVEY.md §2.8 O4.

Reference: ``dags/tasks/validation.py:17-49`` — staging must equal source
exactly; analytics may lose ≤1% of source rows, else the pipeline fails.

Divergence-fix (documented, SURVEY O4): the reference compares the *raw*
source count against staging, so a source file containing exact duplicates
would fail its own gate (dedup removes them before staging). This engine
reconciles post-dedup counts: staging must equal the deduplicated source
count; the loss budget applies between deduplicated source and fact.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass


@dataclass
class ReconciliationReport:
    source_rows: int
    deduped_rows: int
    staged_rows: int
    fact_rows: int
    staging_ok: bool
    loss_pct: float
    loss_ok: bool
    passed: bool

    def as_dict(self) -> dict:
        return asdict(self)


LOSS_BUDGET_PCT = 1.0  # validation.py:45-47


def reconcile(source_rows: int, deduped_rows: int, staged_rows: int,
              fact_rows: int) -> ReconciliationReport:
    """r7 review hardening — the gate must fail CLOSED in both
    directions:

    - row INFLATION (fact > deduped, e.g. a dim-join fanout bug) gives
      a negative loss; ``loss_pct <= budget`` alone passed it. The
      budget is now two-sided: ``0 <= loss_pct <= LOSS_BUDGET_PCT``.
    - ``deduped_rows == 0`` with a NONZERO fact table means phantom
      rows from a stale/corrupt warehouse under a broken ingest — that
      must fail, not report a clean 0.0% loss. (Empty source AND empty
      fact remains a legitimate no-op run.)

    ``loss_ok`` is computed on the SAME rounded value the report
    carries, so the JSON artifact can never read 'loss within budget'
    while ``loss_ok`` says false."""
    staging_ok = staged_rows == deduped_rows
    if deduped_rows == 0:
        loss_pct = 0.0 if fact_rows == 0 else 100.0
    else:
        loss_pct = (deduped_rows - fact_rows) * 100.0 / deduped_rows
    loss_pct = round(loss_pct, 4)
    loss_ok = 0.0 <= loss_pct <= LOSS_BUDGET_PCT
    return ReconciliationReport(
        source_rows=source_rows,
        deduped_rows=deduped_rows,
        staged_rows=staged_rows,
        fact_rows=fact_rows,
        staging_ok=staging_ok,
        loss_pct=loss_pct,
        loss_ok=loss_ok,
        passed=staging_ok and loss_ok,
    )
