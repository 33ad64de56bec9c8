"""ETL format-conversion round-trips (SURVEY.md §2.1): parquet → csv /
json / orc → parquet must preserve row counts and values; mapping specs
must apply; partitioned writes must produce prunable layouts."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_integration_tool_spark.io import load
from data_integration_tool_spark.sources import etl


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip(spark, sf_dir, tmpdir, fmt):
    src = load(spark, sf_dir, "nation")
    mid = os.path.join(tmpdir, f"nation_{fmt}")
    back = os.path.join(tmpdir, "nation_back")
    etl.convert(spark, f"{sf_dir}/nation.parquet", "parquet", mid, fmt)
    # csv/json are schemaless → supply the schema on the way back
    schema = NATION_SCHEMA if fmt in ("csv", "json") else None
    etl.convert(spark, mid, fmt, back, "parquet", schema=schema)
    got = spark.read.parquet(back)
    assert got.count() == src.count()
    assert sorted(r.n_name for r in got.collect()) == sorted(
        r.n_name for r in src.collect()
    )


def test_mapping_applies(spark, sf_dir, tmpdir):
    dst = os.path.join(tmpdir, "mapped")
    etl.convert(
        spark,
        f"{sf_dir}/lineitem.parquet",
        "parquet",
        dst,
        "parquet",
        mapping={
            "order_key": "l_orderkey",
            "revenue": "l_extendedprice * (1 - l_discount)",
            "ship_year": "year(l_shipdate)",
        },
    )
    got = spark.read.parquet(dst)
    assert got.columns == ["order_key", "revenue", "ship_year"]
    src = load(spark, sf_dir, "lineitem")
    expect = src.agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).first()[0]
    assert abs(got.agg(F.sum("revenue")).first()[0] - expect) < 1e-6


def test_partitioned_write_prunes(spark, sf_dir, tmpdir):
    dst = os.path.join(tmpdir, "by_status")
    etl.convert(
        spark,
        f"{sf_dir}/orders.parquet",
        "parquet",
        dst,
        "parquet",
        partition_by=["o_orderstatus"],
    )
    # hive layout on disk
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(dst))
    # partition filter prunes to one directory (visible in the plan)
    df = spark.read.parquet(dst).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    src_f = (
        load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").count()
    )
    assert df.count() == src_f


def test_convert_roundtrip_query_reconciles(spark, sf_dir):
    """The registered etl_convert_roundtrip query is rows-only at the
    driver (it always emits 3 rows), so the reconciliation itself must
    be asserted HERE: every ok flag True, all three checks present —
    otherwise a silently-corrupting hop would stay green everywhere."""
    rows = etl.etl_convert_roundtrip(spark, sf_dir).collect()
    assert {r.check for r in rows} == {
        "row_count",
        "key_checksum",
        "name_len_sum",
    }
    for r in rows:
        assert r.ok is True, f"{r.check}: src={r.src} dst={r.dst}"


def test_bad_format_rejected(spark, tmpdir):
    with pytest.raises(ValueError, match="unsupported"):
        etl.read_any(spark, tmpdir, "xml")
    with pytest.raises(ValueError, match="unsupported"):
        etl.write_any(spark.range(1), tmpdir, "avro")


def test_pipeline_spec_roundtrips_as_json(spark, sf_dir, tmp_path):
    """A pipeline is pure data: json-serialize, reload, run — and the
    result matches the hand-written DataFrame program."""
    import json

    from data_integration_tool_spark.sources import pipeline

    spec = {
        "source": {"path": f"{sf_dir}/documents.parquet", "format": "parquet"},
        "steps": [
            {"op": "filter", "predicate": "n_chars > 100"},
            {
                "op": "with_columns",
                "mapping": {"n_tokens": "size(split(lower(text), ' '))"},
            },
            {"op": "dedup", "keys": ["text"], "order_by": ["doc_id"]},
            {
                "op": "aggregate",
                "group_by": ["source", "lang"],
                "aggs": {
                    "n_docs": "count(*)",
                    "avg_tokens": "avg(n_tokens)",
                },
            },
            {"op": "sort", "by": ["source", "lang"]},
        ],
        "sink": {"path": str(tmp_path / "out"), "format": "json"},
    }
    spec = json.loads(json.dumps(spec))  # prove serializability
    pipeline.run(spark, spec)

    got = spark.read.json(str(tmp_path / "out"))
    d = load(spark, sf_dir, "documents").filter("n_chars > 100")
    d = d.withColumn("n_tokens", F.expr("size(split(lower(text), ' '))"))
    w_first = d.groupBy("text").agg(
        F.min(F.struct("doc_id", *[c for c in d.columns if c != "text" and c != "doc_id"])).alias("f")
    ).select("text", "f.*")
    want = (
        w_first.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("n_tokens").alias("avg_tokens"))
    )
    got_rows = {(r.source, r.lang): (r.n_docs, round(r.avg_tokens, 9)) for r in got.collect()}
    want_rows = {(r.source, r.lang): (r.n_docs, round(r.avg_tokens, 9)) for r in want.collect()}
    assert got_rows == want_rows and got_rows


def test_pipeline_join_and_format_conversion(spark, sf_dir, tmp_path):
    """parquet source joined to a csv dim, written as partitioned orc."""
    import json

    from data_integration_tool_spark.sources import etl, pipeline

    nation_csv = str(tmp_path / "nation_csv")
    etl.convert(spark, f"{sf_dir}/nation.parquet", "parquet", nation_csv, "csv")
    spec = {
        "source": {"path": f"{sf_dir}/customer.parquet", "format": "parquet"},
        "steps": [
            {
                "op": "join",
                "source": {
                    "path": nation_csv,
                    "format": "csv",
                    "options": {"inferSchema": "true"},
                },
                "on": "c_nationkey = n_nationkey",
                "how": "inner",
            },
            {
                "op": "map",
                "mapping": {
                    "c_custkey": "c_custkey",
                    "nation": "n_name",
                    "acctbal": "c_acctbal",
                },
            },
        ],
        "sink": {
            "path": str(tmp_path / "out_orc"),
            "format": "orc",
            "partition_by": ["nation"],
        },
    }
    pipeline.run(spark, json.loads(json.dumps(spec)))
    back = spark.read.orc(str(tmp_path / "out_orc"))
    n_cust = load(spark, sf_dir, "customer").count()
    assert back.count() == n_cust
    assert set(back.columns) == {"c_custkey", "nation", "acctbal"}
    # partition pruning works on the partitioned sink
    one = back.filter(F.col("nation") == back.select("nation").first()[0])
    assert one.count() > 0


def test_pipeline_unknown_op_fails_fast(spark, sf_dir):
    from data_integration_tool_spark.sources import pipeline

    spec = {
        "source": {"path": f"{sf_dir}/nation.parquet", "format": "parquet"},
        "steps": [{"op": "explode_everything"}],
    }
    with pytest.raises(ValueError, match="unknown op"):
        pipeline.build(spark, spec)


def test_pipeline_dedup_desc_keeps_latest(spark, sf_dir):
    """'-col' order in the dedup step keeps the max-ordered row per key."""
    from data_integration_tool_spark.sources import pipeline

    spec = {
        "source": {"path": f"{sf_dir}/orders.parquet", "format": "parquet"},
        "steps": [
            {"op": "select", "columns": ["o_custkey", "o_orderkey", "o_totalprice"]},
            {"op": "dedup", "keys": ["o_custkey"], "order_by": ["-o_orderkey"]},
        ],
    }
    got = {r.o_custkey: r.o_orderkey for r in pipeline.build(spark, spec).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r.o_custkey: r.m
        for r in o.groupBy("o_custkey").agg(F.max("o_orderkey").alias("m")).collect()
    }
    assert got == want


def test_pipeline_dedup_mixed_order_rejected(spark, sf_dir):
    from data_integration_tool_spark.sources import pipeline

    spec = {
        "source": {"path": f"{sf_dir}/orders.parquet", "format": "parquet"},
        "steps": [
            {"op": "dedup", "keys": ["o_custkey"],
             "order_by": ["o_orderdate", "-o_orderkey"]},
        ],
    }
    with pytest.raises(ValueError, match="all ascending or all descending"):
        pipeline.build(spark, spec)


def test_schema_evolution_merge(spark, sf_dir, tmpdir):
    """Schema evolution across parquet writes: a later batch adds a
    column; reading the directory with mergeSchema unions the schemas
    and back-fills nulls — the append-only lake pattern."""
    from pyspark.sql import functions as F

    from data_integration_tool_spark.io import load

    dest = os.path.join(tmpdir, "evolving")
    v1 = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    v1.write.mode("overwrite").parquet(dest)
    v2 = load(spark, sf_dir, "region").select(
        "r_regionkey", "r_name", F.lit("2026-08").alias("ingest_month")
    )
    v2.write.mode("append").parquet(dest)
    merged = spark.read.option("mergeSchema", "true").parquet(dest)
    assert set(merged.columns) == {"r_regionkey", "r_name", "ingest_month"}
    n_regions = v1.count()
    assert merged.count() == 2 * n_regions
    assert merged.filter(F.col("ingest_month").isNull()).count() == n_regions
    assert merged.filter(F.col("ingest_month") == "2026-08").count() == n_regions


def test_corrupt_json_permissive_and_failfast(spark, tmpdir):
    """Ingest robustness: PERMISSIVE mode captures malformed JSON lines
    in a corrupt-record column instead of failing the job; FAILFAST
    surfaces the error — the two operating modes of a production
    ingest."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src = os.path.join(tmpdir, "raw.jsonl")
    with open(src, "w") as f:
        f.write('{"id": 1, "name": "ok"}\n{"id": 2 BROKEN\n{"id": 3, "name": "fine"}\n')
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(src)
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.id for r in good} == {1, 3}
    assert len(bad) == 1 and "BROKEN" in bad[0]._corrupt

    strict = (
        spark.read.schema(
            StructType([StructField("id", LongType()), StructField("name", StringType())])
        )
        .option("mode", "FAILFAST")
        .json(src)
    )
    with _pytest.raises(Exception):
        strict.collect()


def test_compaction_rewrite(spark, sf_dir, tmpdir):
    """Small-files compaction — the table-maintenance pass every lake
    needs: a fragmented write (40 files) compacts to a bounded file
    count with identical content and a prunable layout."""
    src = load(spark, sf_dir, "orders")
    frag = os.path.join(tmpdir, "fragmented")
    src.repartition(40).write.mode("overwrite").parquet(frag)
    n_small = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_small >= 40

    compact = os.path.join(tmpdir, "compacted")
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(
        compact
    )
    n_big = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    assert n_big <= 4

    a = spark.read.parquet(frag)
    b = spark.read.parquet(compact)
    assert a.count() == b.count() == src.count()
    # exceptAll both ways == empty → content identical including dup rows
    assert a.exceptAll(b).limit(1).count() == 0
    assert b.exceptAll(a).limit(1).count() == 0


def test_zorder_layout_partitions_the_table(spark, sf_dir):
    """The z-order manifest is a true partition of orders: file row
    counts sum to the table total, file_ids are within the 8-bit curve,
    and every file's custkey bounding box spans at most 1/16th of the
    key domain (the point of interleaving: BOTH dimensions stay tight,
    so min/max footer stats prune on either column)."""
    from data_integration_tool_spark.io import load
    from data_integration_tool_spark.sources.etl import etl_zorder_layout

    man = etl_zorder_layout(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders")
    total = orders.count()
    ck_min, ck_max = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    assert sum(r.n_rows for r in man) == total
    assert all(0 <= r.file_id <= 255 for r in man)
    # 4 custkey bits → each file covers one of 16 key stripes
    stripe = (ck_max - ck_min + 1) / 16
    for r in man:
        assert r.max_ck - r.min_ck <= stripe, (
            f"file {r.file_id} custkey box {r.min_ck}..{r.max_ck} "
            f"wider than one stripe ({stripe})"
        )


def test_schema_evolution_ok(spark, sf_dir):
    """mergeSchema read across two parquet generations: rows conserved,
    nulls exactly where the old generation lacks the column, unified
    3-column schema."""
    from data_integration_tool_spark import registry

    row = (
        registry.specs()["etl_schema_evolution"]
        .builder(spark, sf_dir)
        .collect()[0]
    )
    assert row.ok is True
    assert row.n_merged == row.n_v1 + row.n_v2 > 0
    assert row.n_null_priority == row.n_v1


def test_partition_layout_prunes(spark, sf_dir):
    """Hive-partitioned round-trip: rows conserved, and the pruned read
    physically touched only o_year=1995 files (input_file_name proof)."""
    from data_integration_tool_spark import registry

    row = (
        registry.specs()["etl_partition_layout"]
        .builder(spark, sf_dir)
        .collect()[0]
    )
    assert row.ok is True
    assert row.n_roundtrip == row.n_src > 0
    assert row.n_1995_pruned == row.n_1995_src
    assert row.n_pruned_files >= 1


def test_clustered_write_tightens_envelopes(spark, sf_dir):
    """Range-clustered files tile the price domain: summed per-file
    min/max spans must be far under the hash layout's (files-fold)."""
    from data_integration_tool_spark import registry

    row = (
        registry.specs()["etl_clustered_write"]
        .builder(spark, sf_dir)
        .collect()[0]
    )
    assert row.ok is True
    assert row.range_span_cents * 4 < row.hash_span_cents
    assert row.hash_files == row.range_files == 8


def test_python_datasource_partition_parallel(spark, sf_dir):
    """The custom source must expose 8 input partitions (one task
    each) and generate exactly the arithmetic stream."""
    from data_integration_tool_spark.sources.pysource import (
        N_PARTS,
        N_ROWS,
        _register,
        _reading,
    )

    _register(spark)
    df = (
        spark.read.format("sensorgen")
        .option("n", N_ROWS)
        .option("parts", N_PARTS)
        .load()
    )
    assert df.rdd.getNumPartitions() == N_PARTS
    sample = {r.id: r.reading for r in df.filter("id < 100").collect()}
    assert sample == {i: _reading(i) for i in range(100)}
    assert df.count() == N_ROWS


def test_python_stream_source_reconciles(spark, sf_dir):
    """The streaming custom source must deliver exactly the batch row
    set across restart-replayed offsets — all_match invariant."""
    from data_integration_tool_spark.sources.pysource import (
        stream_python_source,
    )

    row = stream_python_source(spark, sf_dir).first()
    assert row.all_match == 1
    assert row.n_match == row.n_sensors == 8


def test_vacuum_plan_never_deletes_reachable(spark, sf_dir):
    """Vacuum must never delete a live file (latest per partition) or
    any file whose superseding version is inside the retention
    horizon; totals must reconcile with the manifest size."""
    import pyspark.sql.functions as F

    from data_integration_tool_spark.io import load
    from data_integration_tool_spark.sources.etl import etl_vacuum_plan

    rows = etl_vacuum_plan(spark, sf_dir).collect()
    assert rows
    o = load(spark, sf_dir, "orders")
    n_files = (
        o.select(F.year("o_orderdate").alias("v"), "o_orderpriority")
        .distinct()
        .count()
    )
    assert sum(r.n_delete + r.n_keep for r in rows) == n_files
    latest = max(r.created_v for r in rows)
    for r in rows:
        # live files (created at the latest version) are always kept
        if r.created_v == latest:
            assert r.n_delete == 0
        # inside the horizon nothing is deleted: replaced_v=created_v+1
        # > latest-3 whenever created_v > latest-4
        if r.created_v > latest - 4:
            assert r.n_delete == 0
        else:
            assert r.n_delete > 0
        assert (r.bytes_delete == 0) == (r.n_delete == 0)
        assert (r.bytes_keep == 0) == (r.n_keep == 0)


def test_zorder_incremental_plan_reconciles(spark, sf_dir):
    """The incremental plan must conserve rows (Σ n_total = |orders|),
    keep-cells must gain nothing, new-cells must have no base rows,
    and every delta row must land in some cell (clamped ranks)."""
    from data_integration_tool_spark.io import load
    from data_integration_tool_spark.sources.etl import (
        etl_zorder_incremental,
    )

    rows = etl_zorder_incremental(spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    n_orders = o.count()
    n_delta = o.filter("o_orderkey % 10 = 0").count()
    assert sum(r.n_total for r in rows) == n_orders
    assert sum(r.n_add for r in rows) == n_delta
    for r in rows:
        assert 0 <= r.file_id <= 255
        assert r.n_total == r.n_old + r.n_add
        if r.status == "keep":
            assert r.n_add == 0 and r.n_old > 0
        elif r.status == "new":
            assert r.n_old == 0 and r.n_add > 0
        else:
            assert r.status == "rewrite" and r.n_old > 0 and r.n_add > 0
    # the point of incremental maintenance: a real fraction of the
    # layout is untouched (keep) at every fixture SF
    assert any(r.status == "keep" for r in rows)
