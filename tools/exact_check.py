"""Exact-value (no float tolerance) comparison of registered queries vs
their DuckDB oracles — mimics the driver's value-hash compare. Usage:

    python tools/exact_check.py [sf_dir] q1 q2 ...

Prints per-query exact-mismatch cells so hash-unstable floats can be
hunted down and stabilized (round on both engines, or restructure).
Rows are matched via the 9-sig-digit sort key (so float noise can't
permute the pairing), but cells are compared RAW — any bit-level
difference prints.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from data_integration_tool_spark import registry
from data_integration_tool_spark.session import get_spark
from tests.oracle_check import duck_connect, _norm_cell, _raw_cell


def main() -> None:
    args = sys.argv[1:]
    sf_dir = (
        args.pop(0)
        if args and (os.path.isdir(args[0]) or "/" in args[0])
        else "/root/testdata/sf0.01"
    )
    spark = get_spark()
    duck = duck_connect(sf_dir)
    specs = registry.specs()
    names = args or sorted(specs)
    for name in names:
        if name not in specs:
            print(f"{name}: unknown query")
            continue
        spec = specs[name]
        if spec.oracle is None:
            print(f"{name}: rows-only (skip)")
            continue
        sp = spec.builder(spark, sf_dir).toPandas()
        du = duck.execute(spec.oracle).fetchdf()
        cols = sorted(sp.columns)
        if sorted(du.columns) != cols:
            print(f"{name}: COLUMN MISMATCH {sorted(sp.columns)} vs {sorted(du.columns)}")
            continue
        if len(sp) != len(du):
            print(f"{name}: ROW COUNT {len(sp)} vs {len(du)}")
            continue

        def rows(df):
            out = [
                (
                    tuple(_norm_cell(v) for v in r),
                    tuple(_raw_cell(v) for v in r),
                )
                for r in df[cols].itertuples(index=False, name=None)
            ]
            out.sort(key=lambda kr: tuple(
                (x is None, type(x).__name__, str(x)) for x in kr[0]))
            return [raw for _, raw in out]

        rs, rd = rows(sp), rows(du)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(rs, rd)) if a != b]
        if not bad:
            print(f"{name}: EXACT MATCH ({len(rs)} rows)")
        else:
            print(f"{name}: {len(bad)}/{len(rs)} rows differ exactly")
            for i, a, b in bad[:4]:
                for c, (x, y) in zip(cols, zip(a, b)):
                    if x != y:
                        print(f"   row {i} col {c}: spark={x!r} duck={y!r}")


if __name__ == "__main__":
    main()
