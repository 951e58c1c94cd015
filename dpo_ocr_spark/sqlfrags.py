"""Shared oracle-SQL fragments for the label-fixture determinism contract.

Lives below the query-registration modules (no import of .queries) so
that queries_eval / queries_cascade / queries_sinks can share fragments
without a circular import — a chain that starts at queries_eval would
otherwise re-enter it partially initialized via queries' tail imports.
"""

from __future__ import annotations

from .interpret.dims import _COUNTIES
from .interpret.labels import PRECISE_TAILS

# k/100-indexed (labels are multiples of 100 — k % 10/5 is degenerate;
# k/100 is exact in double, so the CAST is loss-free)
_COUNTY_SQL = (
    "[" + ", ".join(f"'{c}'" for c in _COUNTIES) + "]"
    "[CAST((k / 100) % 10 AS INT) + 1]"
)
_TAIL_SQL = (
    "[" + ", ".join(f"'{t}'" for t in PRECISE_TAILS) + "]"
    "[CAST((k / 100) % 5 AS INT) + 1]"
)
