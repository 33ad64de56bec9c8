"""Query registry — the single source of truth for the driver contract.

Each operator registers its Spark plan builder and (when SQL-expressible)
its DuckDB oracle SQL in ONE place, so ``queries()`` and ``oracle_sql()``
(``__spark_entry__.py``) can never drift apart, and the parity test suite
iterates the same registry. Hash-stability rules (SURVEY.md §5) are
enforced by convention here: every computed column is aliased identically
in the DataFrame code and the SQL; LIMIT queries carry a unique
tiebreaker; ordered containers (collect_list) are sorted on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    phase: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Order is phase order (§7).
_QUERY_MODULES: tuple[str, ...] = (
    "data_integration_tool_spark.operators.scans",
    "data_integration_tool_spark.operators.filters",
    "data_integration_tool_spark.operators.aggregates",
    "data_integration_tool_spark.operators.joins",
    "data_integration_tool_spark.operators.windows",
    "data_integration_tool_spark.operators.sort_limit",
    "data_integration_tool_spark.operators.setops",
    "data_integration_tool_spark.operators.subqueries",
    "data_integration_tool_spark.operators.reshape",
    "data_integration_tool_spark.operators.analytics",
    "data_integration_tool_spark.functions.strings",
    "data_integration_tool_spark.functions.dates",
    "data_integration_tool_spark.functions.math_fns",
    "data_integration_tool_spark.functions.arrays",
    "data_integration_tool_spark.functions.json_fns",
    "data_integration_tool_spark.functions.maps",
    "data_integration_tool_spark.operators.udfs",
    "data_integration_tool_spark.sources.multimodal",
    "data_integration_tool_spark.streaming.event_windows",
    "data_integration_tool_spark.operators.text",
    "data_integration_tool_spark.operators.dedup",
    "data_integration_tool_spark.operators.similarity",
)

_loaded = False


def query(
    name: str, oracle: str | None = None, phase: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the builder for query ``name`` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, phase, tuple(tags))
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so their @query decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def specs() -> dict[str, QuerySpec]:
    load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.builder for n, s in specs().items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in specs().items() if s.oracle is not None}
