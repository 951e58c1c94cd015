"""Query+oracle registrations for ops.events and ops.curation.

Round-2 additions widening the training-data-pipeline surface:
as-of join, sessionization, eval-set decontamination, Gopher repetition
signals, deterministic training order.  All five carry full DuckDB
oracles (integer/bool-exact outputs; epoch-microsecond timestamps).
"""

from __future__ import annotations

from .queries import ORACLES, QUERIES
from .ops import curation as C
from .ops import events as EV


def _register(name: str, fn, sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


_register("asof_join", EV.asof_join, EV.ASOF_ORACLE)
_register("sessionize", EV.sessionize, EV.SESSIONIZE_ORACLE)
_register("decontaminate", C.decontaminate, C.DECONTAMINATE_ORACLE)
_register("repetition_stats", C.repetition_stats, C.REPETITION_ORACLE)
_register("training_order", C.training_order, C.TRAINING_ORDER_ORACLE)

from .ops.similarity import SEMANTIC_PRUNE_ORACLE, semantic_prune  # noqa: E402

_register("semantic_prune", semantic_prune, SEMANTIC_PRUNE_ORACLE)
_register("tfidf_top_terms", C.tfidf_top_terms, C.TFIDF_ORACLE)
