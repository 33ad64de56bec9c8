"""Per-query DuckDB twin-set timing — the mechanical baseline that
BASELINE.md's narrative totals come from. Times every registered
oracle SQL in DuckDB at a given SF (min over BENCH_ITERS runs, same
policy as bench.py) and writes BASELINE_detail.json so round-over-round
per-query Spark/DuckDB ratios are diffable instead of narrative.

Usage: python tools/duck_bench.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_integration_tool_spark import registry

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args[1] if len(args) > 1 else os.path.join(
        repo, "BASELINE_detail.json"
    )
    iters = max(1, int(os.environ.get("BENCH_ITERS", "2")))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry.load_all_modules()
    specs = registry.specs()
    per_run: dict[str, list[float]] = {}
    for name in sorted(specs):
        sql = specs[name].oracle
        if sql is None:
            continue
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        per_run[name] = runs

    timings = {n: round(min(r), 4) for n, r in per_run.items()}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "engine": "duckdb",
        "duckdb_version": duckdb.__version__,
        "sf": float(sf),
        "iters": iters,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "total_sec": round(sum(timings.values()), 2),
        "queries": timings,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_sec": out["total_sec"],
                      "n_queries": len(timings),
                      "out": out_path}))


if __name__ == "__main__":
    main()
