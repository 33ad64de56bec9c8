"""Local re-implementation of the driver's t2 compare: run a registered
Spark query and its DuckDB oracle on the same parquet, then compare
row-count + column set + order-insensitive values (with float
tolerance). Used by test_oracle_parity.py and the check_all script.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from data_integration_tool_spark.io import TABLES

_SIG = 9  # significant digits for the float sort key


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.bool_,)):
        v = bool(v)
    if isinstance(v, float):
        if math.isinf(v):
            return v
        if v == 0:
            return 0.0
        # round to _SIG significant digits as the sort key
        return round(v, _SIG - 1 - int(math.floor(math.log10(abs(v)))))
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        # pandas renders DuckDB DATE as midnight Timestamp while Spark
        # yields datetime.date — same logical value, normalize together
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _raw_cell(v: Any) -> Any:
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_raw_cell(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _close(a: Any, b: Any, rtol: float = 1e-9, atol: float = 1e-12) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=atol)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_close(x, y, rtol, atol) for x, y in zip(a, b))
    return a == b


def compare_frames(sp: pd.DataFrame, du: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        return [f"{name}: column mismatch spark={sp_cols} duck={du_cols}"]
    if len(sp) != len(du):
        problems.append(f"{name}: row count spark={len(sp)} duck={len(du)}")
        return problems
    sp = sp[sp_cols]
    du = du[du_cols]

    def keyed(df: pd.DataFrame) -> list[tuple[tuple, tuple]]:
        rows = []
        for row in df.itertuples(index=False, name=None):
            rows.append(
                (tuple(_norm_cell(v) for v in row), tuple(_raw_cell(v) for v in row))
            )
        rows.sort(key=lambda kr: tuple(
            (x is None, str(type(x).__name__), x if not isinstance(x, tuple) else str(x))
            for x in kr[0]
        ))
        return rows

    sp_rows = keyed(sp)
    du_rows = keyed(du)
    n_bad = 0
    for i, ((ks, rs), (kd, rd)) in enumerate(zip(sp_rows, du_rows)):
        norm_s = tuple(_norm_cell(v) for v in rs)
        norm_d = tuple(_norm_cell(v) for v in rd)
        if not _close(norm_s, norm_d, rtol=1e-7, atol=1e-9):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row {i} spark={rs!r} duck={rd!r}")
    if n_bad:
        problems.append(f"{name}: {n_bad}/{len(sp_rows)} rows mismatched")
    return problems


def max_float_divergence(sp: pd.DataFrame, du: pd.DataFrame) -> float:
    """Largest relative float difference between matched rows (for
    deciding whether a query is safe for an exact-hash driver compare)."""
    sp_cols = sorted(sp.columns)
    if sorted(du.columns) != sp_cols or len(sp) != len(du) or not len(sp):
        return float("inf")

    def keyed(df):
        rows = [tuple(_norm_cell(v) for v in r) for r in df[sp_cols].itertuples(index=False, name=None)]
        raw = [tuple(_raw_cell(v) for v in r) for r in df[sp_cols].itertuples(index=False, name=None)]
        order = sorted(range(len(rows)), key=lambda i: str(rows[i]))
        return [raw[i] for i in order]

    worst = 0.0
    for rs, rd in zip(keyed(sp), keyed(du)):
        for a, b in zip(rs, rd):
            if isinstance(a, float) and isinstance(b, float) and b != 0:
                worst = max(worst, abs(a - b) / max(abs(a), abs(b)))
    return worst
