"""Maintenance I/O: small-files compaction and schema-evolution reads."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.sources import (
    compact_parquet,
    read_parquet_merged,
    read_table,
)
from tests.conftest import SF_SMALL


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    frag, out = str(tmp_path / "frag"), str(tmp_path / "compact")
    li = read_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    li.repartition(40).write.parquet(frag)  # simulate micro-batch litter
    n_in = len(
        [f for f in os.listdir(frag) if f.startswith("part-") and f.endswith(".parquet")]
    )
    assert n_in == 40

    n_planned = compact_parquet(spark, frag, out, target_file_bytes=10 * 1024 * 1024)
    n_out = len(
        [f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")]
    )
    assert n_out == n_planned < n_in

    a = spark.read.parquet(frag).agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    ).first()
    b = spark.read.parquet(out).agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    ).first()
    assert (a[0], round(a[1], 4)) == (b[0], round(b[1], 4))


def test_read_parquet_merged_reconciles_drifted_schemas(spark, tmp_path):
    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], "id long, old string").write.parquet(v1)
    spark.createDataFrame([(2, 9.5)], "id long, new double").write.parquet(v2)

    df = read_parquet_merged(spark, v1, v2)
    assert set(df.columns) == {"id", "old", "new"}
    rows = {r.id: (r.old, r.new) for r in df.collect()}
    assert rows == {1: ("a", None), 2: (None, 9.5)}


def test_cluster_parquet_zone_maps_prune(spark, tmp_path):
    """Range clustering must leave pairwise-disjoint per-file min/max
    bands on the leading key, so a point predicate maps to ~1 file; the
    same data written round-robin leaves every file covering the probe."""
    from retail_sales_project_bigdata_spark.sources import (
        cluster_parquet,
        file_minmax,
    )

    li = read_table(spark, SF_SMALL, "lineitem").select(
        "l_suppkey", "l_partkey", "l_extendedprice"
    )
    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    cluster_parquet(li, clustered, ["l_suppkey", "l_partkey"], n_files=6)
    li.repartition(6).write.mode("overwrite").parquet(shuffled)

    spans = file_minmax(clustered, "l_suppkey")
    assert len(spans) == 6
    # disjoint up to one shared boundary key between adjacent files
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert lo >= hi
    probe = spans[2][0]
    covering = sum(1 for lo, hi in spans if lo <= probe <= hi)
    covering_shuffled = sum(
        1 for lo, hi in file_minmax(shuffled, "l_suppkey") if lo <= probe <= hi
    )
    assert covering <= 2 < covering_shuffled
    # rewrite is lossless
    assert spark.read.parquet(clustered).count() == li.count()


def test_publish_versioned_snapshot_swap_and_time_travel(spark, tmp_path):
    from retail_sales_project_bigdata_spark.sources import (
        publish_versioned,
        read_versioned,
    )

    table = str(tmp_path / "dim_customer")
    c = read_table(spark, SF_SMALL, "customer")
    v1 = publish_versioned(c.limit(10), table)
    v2 = publish_versioned(c.limit(25), table)
    assert (v1, v2) == (1, 2)
    assert read_versioned(spark, table).count() == 25      # manifest → v2
    assert read_versioned(spark, table, 1).count() == 10   # time travel


def test_zorder_cluster_prunes_both_dimensions(spark, tmp_path):
    """Morton-curve clustering must bound per-file min/max spans on BOTH
    dimensions; linear range clustering on x leaves every file spanning
    the full y domain (a probe on y alone reads everything)."""
    from retail_sales_project_bigdata_spark.sources import (
        cluster_parquet,
        file_minmax,
        zorder_cluster_parquet,
    )

    li = read_table(spark, SF_SMALL, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zdir, lindir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_cluster_parquet(li, zdir, "l_partkey", "l_suppkey", n_files=8)
    cluster_parquet(li, lindir, ["l_partkey"], n_files=8)

    def coverage(out_dir: str, column: str, probe) -> int:
        return sum(
            1 for lo, hi in file_minmax(out_dir, column) if lo <= probe <= hi
        )

    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    x_mid = (bounds[0] + bounds[1]) // 2
    y_mid = (bounds[2] + bounds[3]) // 2

    # linear layout: x prunes, y does not (every file covers the y probe)
    assert coverage(lindir, "l_partkey", x_mid) <= 2
    assert coverage(lindir, "l_suppkey", y_mid) == 8
    # z-order: BOTH probes skip files
    assert coverage(zdir, "l_partkey", x_mid) < 8
    assert coverage(zdir, "l_suppkey", y_mid) < 8
    # rewrite is lossless
    assert spark.read.parquet(zdir).count() == li.count()
