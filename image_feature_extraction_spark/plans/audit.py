"""Shared physical-plan counting: ONE definition of the formatted-explain
operator regexes, used by both the committed audit artifact
(``scripts/plan_audit.py`` -> BENCH/PLAN_AUDIT.md) and the per-operator
plan pins (``tests/test_plan_regressions.py``) — two hand-maintained
copies would let the pins and the artifact silently count different
operator sets.

Formatted explain numbers nodes "(n) Window"; "(n) Exchange" matches
only shuffle exchanges (broadcasts print "(n) BroadcastExchange", which
the word-boundary regex does not match) — the two are reported
separately on purpose. Codegen spans are NOT counted: AQE plans print
``isFinalPlan=false`` before execution and codegen ids are only
assigned at finalization.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

PATTERNS = {
    "win": r"\(\d+\) Window\b",
    "exch": r"\(\d+\) Exchange\b",
    "bcast": r"\(\d+\) BroadcastExchange\b",
    "pyrow": r"\(\d+\) BatchEvalPython\b",
    "arrow": r"\(\d+\) (?:ArrowEvalPython|MapInPandas|MapInArrow|"
             r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)\b",
    "cartesian": r"\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin)\b",
}


def plan_of(df) -> str:
    """The formatted explain text of a DataFrame."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def counts_of(plan: str) -> dict[str, int]:
    """Operator counts of a formatted plan, keyed by PATTERNS."""
    return {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}


def plan_counts(df) -> dict[str, int]:
    """counts_of(plan_of(df)) in one call."""
    return counts_of(plan_of(df))
