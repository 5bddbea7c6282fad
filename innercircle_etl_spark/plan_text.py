"""Helpers for classifying executed-plan text — shared by the plan
tests and tools/plan_report.py so the gate and the report can never
count exchanges differently (they did briefly in round 8, when the
ReusedExchange fix landed in one copy of this logic)."""

from __future__ import annotations

import re

# tree-drawing prefix characters Spark puts before node names
_TREE_PREFIX = " +-:*()0123456789"

_EXCHANGE_RE = re.compile(r"(?<!Reused)Exchange (?:hash|range|Single)[^\n]*")


def real_shuffle_exchanges(plan: str) -> list[str]:
    """Matches for REAL shuffle exchanges in a plan's toString —
    ReusedExchange nodes are the optimizer sharing one shuffle or
    broadcast between consumers, not extra data movement. Their
    LINES are dropped before matching: the negative lookbehind alone
    excludes the node name but still matches the `Exchange
    hashpartitioning(...)` description embedded after the comma on a
    ReusedExchange line."""
    lines = [
        ln
        for ln in plan.splitlines()
        if not ln.lstrip(_TREE_PREFIX).startswith("ReusedExchange")
    ]
    return _EXCHANGE_RE.findall("\n".join(lines))
