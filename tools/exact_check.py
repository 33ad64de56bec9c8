"""Exact-value (no float tolerance) comparison of registered queries vs
their DuckDB oracles — mimics the driver's value-hash compare. Usage:

    python tools/exact_check.py [sf_dir] q1 q2 ...

Prints per-query exact-mismatch cells so hash-unstable floats can be
hunted down and stabilized (quantize on both engines, or restructure).
Delegates to tests/oracle_check.compare_frames(exact=True) — the same
raw-cell gate the pytest parity suite enforces, so this tool and the
suite can never disagree about what "exact" means. Row pairing uses the
9-sig-digit sort key tie-broken by the raw tuple, so float noise cannot
permute the pairing across engines.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from data_integration_tool_spark import registry
from data_integration_tool_spark.session import get_spark
from tests.oracle_check import compare_frames, duck_connect


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
        problems = compare_frames(sp, du, name, exact=True)
        if not problems:
            print(f"{name}: EXACT MATCH ({len(sp)} rows)")
        else:
            for p in problems[:6]:
                print(f"   {p}")


if __name__ == "__main__":
    main()
