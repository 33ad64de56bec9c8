"""Interleaved Spark<->DuckDB bench pair (VERDICT r11 Next #5).

The standard pair runs two 15+ minute legs back-to-back, so a co-tenant
CPU burst lands inside ONE leg and skews the ratio (every r11 leg was
burst-hit). This harness alternates ENGINES PER QUERY inside a single
run — Spark min-of-N, then immediately the DuckDB twin min-of-N, then
the next query — so host-load excursions hit both columns nearly
equally and the RATIO is burst-robust even when the absolute totals
are not.

Conf parity with the standard legs: Spark side replicates bench.py's
heavy/AQE conf split, cached tables, noop sink, min-of-BENCH_ITERS;
DuckDB side replicates tools/duck_bench.py (fetchall, min-of-iters).
Only oracled, non-bench-skip queries run (the shared set).

Usage: python tools/interleaved_bench.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(_repo, "bench_interleaved.json")
)
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

    import duckdb

    from data_integration_tool_spark import benchconf, registry
    from data_integration_tool_spark.session import get_spark

    spark = get_spark(
        app_name="interleaved-bench", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    benchconf.silence_dagscheduler_accumulator_spew(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    specs = registry.specs()
    # warmup both engines (excluded from timings, same as the legs)
    specs["agg_group"].builder(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    con.execute(specs["agg_group"].oracle).fetchall()

    # conf split comes from the shared module so it can never diverge
    # from bench.py's legs (ADVICE r12 #1)
    heavy = benchconf.heavy_set(specs)
    aqe_pinned = benchconf.aqe_pinned_set(specs)

    iters = max(1, int(os.environ.get("BENCH_ITERS", "2")))
    shared = [
        n
        for n in sorted(specs)
        if specs[n].oracle is not None and "bench-skip" not in specs[n].tags
    ]
    sp_times: dict[str, float] = {}
    du_times: dict[str, float] = {}
    t_start = time.time()
    load_samples = [os.getloadavg()[0]]
    for name in shared:
        spec = specs[name]
        benchconf.apply_query_conf(spark, name, heavy, aqe_pinned, CPUS)
        s_runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            spec.builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            s_runs.append(time.perf_counter() - t0)
        d_runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            d_runs.append(time.perf_counter() - t0)
        sp_times[name] = min(s_runs)
        du_times[name] = min(d_runs)
        load_samples.append(os.getloadavg()[0])

    sp_total = sum(sp_times.values())
    du_total = sum(du_times.values())
    out = {
        "kind": "interleaved_pair",
        # None when the dir doesn't follow sf<N> (ADVICE r12 #3)
        "sf": benchconf.parse_sf(SF_DIR),
        "iters": iters,
        "n_queries": len(shared),
        "wall_sec": round(time.time() - t_start, 1),
        "loadavg_minmax": [
            round(min(load_samples), 2),
            round(max(load_samples), 2),
        ],
        "spark_total_sec": round(sp_total, 2),
        "duckdb_total_sec": round(du_total, 2),
        "ratio_spark_over_duckdb": round(sp_total / du_total, 3),
        "spark": {n: round(v, 4) for n, v in sp_times.items()},
        "duckdb": {n: round(v, 4) for n, v in du_times.items()},
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                k: out[k]
                for k in (
                    "spark_total_sec",
                    "duckdb_total_sec",
                    "ratio_spark_over_duckdb",
                    "n_queries",
                    "wall_sec",
                    "loadavg_minmax",
                )
            }
        )
    )


if __name__ == "__main__":
    main()
