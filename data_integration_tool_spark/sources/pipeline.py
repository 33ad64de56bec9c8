"""Declarative ETL pipelines: a JSON-serializable spec → one lazy
Spark plan → one job.

This is the engine's product surface for integration work ("format
data from one complex system to another"): a pipeline is data, not
code — it can be stored, diffed, templated, and shipped — and it
compiles to exactly the DataFrame program a Spark engineer would have
written by hand, so Catalyst sees one end-to-end plan (pushdown,
pruning, and join planning cross step boundaries; nothing materializes
between steps).

Spec shape::

    {
      "source": {"path": ..., "format": "parquet|csv|json|orc"},
      "steps": [
        {"op": "map", "mapping": {"out_col": "sql expr", ...}},
        {"op": "with_columns", "mapping": {...}},        # add, keep rest
        {"op": "filter", "predicate": "sql expr"},
        {"op": "select", "columns": [...]},
        {"op": "rename", "mapping": {"old": "new", ...}},
        {"op": "dedup", "keys": [...], "order_by": [...]},  # keep first
        {"op": "join", "source": {...}, "on": [...]|expr, "how": "..."},
        {"op": "aggregate", "group_by": [...],
         "aggs": {"out": "sql agg expr", ...}},
        {"op": "sort", "by": [...desc-prefixed with '-'...]},
        {"op": "limit", "n": ...},
      ],
      "sink": {"path": ..., "format": ..., "mode": "overwrite",
               "partition_by": [...]}
    }

``build`` returns the lazy DataFrame (no sink needed); ``run`` writes
the sink. Unknown ops / malformed steps fail fast with the step index.

The dedup step is the scale-shaped form: row_number over a window would
sort every group, so it uses max/min(struct) only when an order is
given, and a plain groupBy-first otherwise.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .etl import read_any, write_any

_VALID_OPS = (
    "map",
    "with_columns",
    "filter",
    "select",
    "rename",
    "dedup",
    "join",
    "aggregate",
    "sort",
    "limit",
)


def _sort_cols(by: list[str]):
    """'-col' → descending, 'col' → ascending."""
    return [
        F.col(c[1:]).desc() if c.startswith("-") else F.col(c).asc() for c in by
    ]


def _apply_step(
    spark: SparkSession, df: DataFrame, step: dict[str, Any], idx: int
) -> DataFrame:
    op = step.get("op")
    try:
        if op == "map":
            return df.select(
                *[F.expr(e).alias(n) for n, e in step["mapping"].items()]
            )
        if op == "with_columns":
            return df.withColumns(
                {n: F.expr(e) for n, e in step["mapping"].items()}
            )
        if op == "filter":
            return df.filter(F.expr(step["predicate"]))
        if op == "select":
            return df.select(*step["columns"])
        if op == "rename":
            return df.withColumnsRenamed(step["mapping"])
        if op == "dedup":
            keys = step["keys"]
            order_by = step.get("order_by")
            if not order_by:
                return df.dropDuplicates(keys)
            # keep the first row per key under order_by, WITHOUT a
            # sort-based window: min/max(struct(order_cols..., rest...))
            # combines map-side. '-col' orders that column descending;
            # all order columns must share a direction (mixed asc/desc
            # would need per-column negation, which isn't portable
            # across types).
            directions = {c.startswith("-") for c in order_by}
            if len(directions) > 1:
                raise ValueError(
                    "dedup order_by must be all ascending or all "
                    "descending (mix of 'col' and '-col' given)"
                )
            desc = directions.pop()
            order_cols = [c.lstrip("-") for c in order_by]
            payload = [c for c in df.columns if c not in keys]
            s = F.struct(*[F.col(c) for c in order_cols],
                         *[F.col(c) for c in payload if c not in order_cols])
            picked = (F.max if desc else F.min)(s).alias("_first")
            agg = df.groupBy(*keys).agg(picked)
            kept = order_cols + [c for c in payload if c not in order_cols]
            return agg.select(
                *keys, *[F.col(f"_first.{c}").alias(c) for c in kept]
            )
        if op == "join":
            other = read_any(
                spark,
                step["source"]["path"],
                step["source"]["format"],
                **step["source"].get("options", {}),
            )
            on = step["on"]
            how = step.get("how", "inner")
            if isinstance(on, str):
                return df.join(other, F.expr(on), how)
            return df.join(other, on, how)
        if op == "aggregate":
            aggs = [F.expr(e).alias(n) for n, e in step["aggs"].items()]
            gb = step.get("group_by") or []
            return df.groupBy(*gb).agg(*aggs) if gb else df.agg(*aggs)
        if op == "sort":
            return df.orderBy(*_sort_cols(step["by"]))
        if op == "limit":
            return df.limit(int(step["n"]))
    except KeyError as e:
        raise ValueError(f"pipeline step {idx} ({op}): missing field {e}") from e
    raise ValueError(
        f"pipeline step {idx}: unknown op {op!r}; expected one of {_VALID_OPS}"
    )


def build(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    """Compile a pipeline spec to its (lazy) DataFrame."""
    src = spec["source"]
    df = read_any(spark, src["path"], src["format"], **src.get("options", {}))
    for idx, step in enumerate(spec.get("steps", [])):
        df = _apply_step(spark, df, step, idx)
    return df


def run(spark: SparkSession, spec: dict[str, Any]) -> None:
    """Compile and execute a pipeline, writing its sink. One Spark job:
    the sink write is the only action."""
    sink = spec["sink"]
    write_any(
        build(spark, spec),
        sink["path"],
        sink["format"],
        mode=sink.get("mode", "overwrite"),
        partition_by=sink.get("partition_by"),
        **sink.get("options", {}),
    )
