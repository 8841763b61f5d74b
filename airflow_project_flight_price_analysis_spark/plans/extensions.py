"""Extension operator queries (SURVEY.md §2.9 X1-X7) — filled in task #4."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
