"""Relational operator queries (SURVEY.md §2.2-2.6) — filled in task #2."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
