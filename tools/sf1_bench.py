"""sf1 mini-bench (VERDICT r13 Next #4): make scale visible.

At sf0.1 the c8/c32 geomean across the registry is 0.95 — ~95% of
queries are stage-floor-bound and cannot demonstrate a distributed win
or regression. This tool (1) builds a deterministic 10x dataset
("sf1") from the read-only sf0.1 fixtures by FK-consistent key-shifted
replication, and (2) runs the most expensive queries at sf1 with the
standard bench confs, min-of-N, noop sink, so the heavy class can show
whether it actually parallelizes (c8 vs c32 at sf1).

The generated data lives in scratch/sf1 (gitignored). It is INPUT
data for timing only — no query result is persisted, every run
computes from the parquet inputs; the oracle never sees sf1 (queries
are correctness-proven on the driver fixtures at sf0.001/0.01/0.1).

Upsampling scheme (seedless, deterministic): each table is the
union of FACTOR copies; copy i shifts every key column by
i * OFFSET(domain), where OFFSET is the next power of 10 above the
domain's max key in sf0.1 — foreign keys shift by their referenced
domain's offset, so joins land exactly as in the original (the graph
becomes FACTOR disjoint isomorphic components; dedup/text corpora
gain FACTOR exact duplicates per doc, which is heavier, realistic
dedup load). nation/region stay single-copy dims; non-key columns are
byte-identical. Powers of 10 are ≡ 0 mod 5, so `key % 5` filters
select the same subset in every copy.

Usage:
  python tools/sf1_bench.py gen  [--factor=10]
  python tools/sf1_bench.py run  [q1 q2 ...] [--iters=3] [--top=25]
      (no names: the --top most expensive queries by the r13+r14
       cross-leg minima, plus graph_kcore)
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "scratch", "sf1")

# key domains: table -> {column: domain}; FKs name the referenced domain
_KEYS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
_DOMAIN_SOURCE = {  # domain -> (table, column) that defines its max
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
_COPY_ASIS = ("region", "nation")


def _get_session(cpus: str):
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from data_integration_tool_spark.session import get_spark

    spark = get_spark(app_name="sf1_bench", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def gen(factor: int) -> None:
    from pyspark.sql import functions as F

    spark = _get_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # raw reads (nanosAsLong for the NANOS-encoded events generation)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = {
        t: spark.read.parquet(f"{SF01}/{t}.parquet")
        for t in list(_KEYS) + list(_COPY_ASIS)
    }
    offsets = {}
    for dom, (t, c) in _DOMAIN_SOURCE.items():
        mx = raw[t].agg(F.max(c)).collect()[0][0]
        off = 10
        while off <= mx:
            off *= 10
        offsets[dom] = off
    print("offsets:", offsets)
    os.makedirs(SF1, exist_ok=True)
    for t in _COPY_ASIS:
        raw[t].write.mode("overwrite").parquet(f"{SF1}/{t}.parquet")
        print(t, "copied")
    for t, keys in _KEYS.items():
        parts = []
        for i in range(factor):
            df = raw[t]
            for col, dom in keys.items():
                df = df.withColumn(
                    col, (F.col(col) + F.lit(i * offsets[dom])).cast(
                        dict(raw[t].dtypes)[col]
                    )
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        # ~8 comfortable files per table at this size (guide §6)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{SF1}/{t}.parquet"
        )
        n = spark.read.parquet(f"{SF1}/{t}.parquet").count()
        print(t, "x", factor, "->", n, "rows")


def default_queries(top: int) -> list[str]:
    """Most expensive queries by cross-leg per-query minima over the
    committed r13/r14 detail files."""
    mins: dict[str, float] = {}
    for p in glob.glob(os.path.join(REPO, "bench_detail_r1[34]*.json")):
        runs = json.load(open(p)).get("runs", {})
        for q, v in runs.items():
            m = min(v)
            if q not in mins or m < mins[q]:
                mins[q] = m
    names = [q for q, _ in sorted(mins.items(), key=lambda kv: -kv[1])]
    out = names[:top]
    if "graph_kcore" not in out:
        out.append("graph_kcore")
    return out


def run(names: list[str], iters: int) -> None:
    from data_integration_tool_spark import benchconf, registry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    spark = _get_session(cpus)
    benchconf.silence_dagscheduler_accumulator_spew(spark)
    specs = registry.specs()
    heavy = benchconf.heavy_set(specs)
    aqe = benchconf.aqe_pinned_set(specs)
    # warmup
    specs["agg_group"].builder(spark, SF1).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    failed = {}
    for name in names:
        benchconf.apply_query_conf(spark, name, heavy, aqe, cpus)
        runs = []
        try:
            for _ in range(iters):
                t0 = time.perf_counter()
                specs[name].builder(spark, SF1).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # scale hazard surfaced loudly — record it
            failed[name] = str(exc).split("\n")[0][:200]
            print(f"{name:32s} FAILED: {failed[name]}", flush=True)
            continue
        out[name] = runs
        print(
            f"{name:32s} {min(runs):7.2f}/{statistics.median(runs):7.2f}"
            f"  min/med of {iters}, load {os.getloadavg()[0]:.1f}",
            flush=True,
        )
    summary = {
        "sf_dir": SF1,
        "cpus": int(cpus),
        "iters": iters,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "runs": out,
        "failed": failed,
        "total_min_sec": round(sum(min(v) for v in out.values()), 2),
    }
    path = os.path.join(REPO, "scratch", f"sf1_bench_c{cpus}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: round(min(v), 2) for k, v in out.items()}))
    print("total(min):", summary["total_min_sec"], "->", path)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        k: v
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
        for k, v in [a[2:].split("=", 1)]
    }
    if not args:
        print(__doc__)
        return
    cmd, rest = args[0], args[1:]
    if cmd == "gen":
        gen(int(opts.get("factor", "10")))
    elif cmd == "run":
        names = rest or default_queries(int(opts.get("top", "25")))
        run(names, int(opts.get("iters", "3")))
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
