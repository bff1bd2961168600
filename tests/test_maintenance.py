"""Table-maintenance operator tests: compaction, sorted writes,
incremental rollup with month-replace semantics."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import Window

from nyc_taxi_bigdata_pipeline_spark import ingest, warehouse
from nyc_taxi_bigdata_pipeline_spark.operators import maintenance

from .taxi_fixtures import make_trips_month


def test_compact_parquet(spark, tmp_path):
    p = str(tmp_path / "many_files")
    spark.range(100000).toDF("id").repartition(40).write.parquet(p)
    assert len(list(Path(p).rglob("*.parquet"))) == 40
    before = spark.read.parquet(p).agg(F.sum("id")).first()[0]
    n = maintenance.compact_parquet(spark, p, target_file_bytes=1 << 30)
    files = list(Path(p).rglob("*.parquet"))
    assert len(files) == n == 1  # tiny table → one file
    assert spark.read.parquet(p).agg(F.sum("id")).first()[0] == before


def test_write_sorted_clusters_rows(spark, tmp_path):
    p = str(tmp_path / "sorted")
    df = spark.range(50000).selectExpr("id", "CAST(id % 997 AS LONG) AS k")
    maintenance.write_sorted(df, p, ["k"], n_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 50000
    # within every file, k must be non-decreasing (row-group skippable)
    chk = (
        back.withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag("k").over(
                Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("prev").isNotNull() & (F.col("k") < F.col("prev")))
    )
    assert chk.count() == 0


def test_incremental_rollup_month_replace(spark, tmp_path):
    rollup = str(tmp_path / "rollup")
    f1 = warehouse.build_fact(
        ingest.clean_month(make_trips_month(spark, 2023, 1, n=1000), 2023, 1)
    )
    f2 = warehouse.build_fact(
        ingest.clean_month(make_trips_month(spark, 2023, 2, n=800), 2023, 2)
    )
    maintenance.update_daily_rollup(f1, rollup)
    maintenance.update_daily_rollup(f2, rollup)
    out = maintenance.read_rollup(spark, rollup)
    assert out.agg(F.sum("trips")).first()[0] == f1.count() + f2.count()
    # re-running month 1 replaces, not duplicates
    maintenance.update_daily_rollup(f1, rollup)
    out2 = maintenance.read_rollup(spark, rollup)
    assert out2.agg(F.sum("trips")).first()[0] == f1.count() + f2.count()
    assert out2.groupBy("pickup_date").count().filter(F.col("count") > 1).count() == 0

def test_zorder_write_narrows_file_stats(spark, sf_dir, tmp_path):
    """Z-order clustering must shrink per-file min-max ranges on BOTH
    dimensions vs the natural layout — that's the property parquet
    skipping actually uses (file pruned when predicate ∉ [min,max])."""
    import pyarrow.parquet as pq

    from nyc_taxi_bigdata_pipeline_spark.operators import maintenance

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    # 16 curve segments ⇒ ~4 splits per dimension (2-D curve: n_files
    # segments shrink each dim by ~√n_files, not n_files)
    li.repartition(16).write.mode("overwrite").parquet(plain)
    maintenance.write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=16)

    def avg_range(path: str, col: str) -> float:
        spans = []
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(
                    [c.path_in_schema for c in
                     [md.row_group(rg).column(i) for i in range(md.num_columns)]
                     ].index(col)
                ).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    for col in ("l_partkey", "l_suppkey"):
        assert avg_range(zpath, col) < 0.55 * avg_range(plain, col), col


def test_zorder_scan_prunes_row_groups(spark, sf_dir, tmp_path):
    """The pruning WIN, not just the layout: for a 2-D box predicate,
    count the row groups whose [min,max] stats intersect the box — the
    exact skip decision the parquet reader makes from PushedFilters. The
    z-ordered layout must touch a fraction of the row groups the natural
    layout touches, while Spark returns identical rows from both."""
    import pyarrow.parquet as pq

    from nyc_taxi_bigdata_pipeline_spark.operators import maintenance

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    li.repartition(16).write.mode("overwrite").parquet(plain)
    maintenance.write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=16)

    lo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    # ~15% box in each dimension, anchored off the corner
    p_lo = lo[0] + (lo[1] - lo[0]) // 3
    p_hi = p_lo + max(1, (lo[1] - lo[0]) * 15 // 100)
    s_lo = lo[2] + (lo[3] - lo[2]) // 3
    s_hi = s_lo + max(1, (lo[3] - lo[2]) * 15 // 100)

    def touched(path: str) -> tuple[int, int]:
        touch = total = 0
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            pi, si = names.index("l_partkey"), names.index("l_suppkey")
            for rg in range(md.num_row_groups):
                total += 1
                ps = md.row_group(rg).column(pi).statistics
                ss = md.row_group(rg).column(si).statistics
                if ps.min <= p_hi and ps.max >= p_lo and ss.min <= s_hi and ss.max >= s_lo:
                    touch += 1
        return touch, total

    zt, ztot = touched(zpath)
    pt, ptot = touched(plain)
    assert pt == ptot  # natural layout: every row group overlaps the box
    assert zt <= ztot // 2, f"z-order touched {zt}/{ztot} vs plain {pt}/{ptot}"

    pred = (
        (F.col("l_partkey").between(p_lo, p_hi))
        & (F.col("l_suppkey").between(s_lo, s_hi))
    )
    a = spark.read.parquet(plain).filter(pred)
    b = spark.read.parquet(zpath).filter(pred).drop("zorder_key")
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0


def test_zorder_empty_and_wide_range(spark, tmp_path):
    """Round-3 guards: empty input writes an empty (schema-stable) table
    instead of raising, and epoch-µs-wide key ranges normalize without
    BIGINT overflow (pre-division path)."""
    from nyc_taxi_bigdata_pipeline_spark.operators import maintenance

    empty = spark.range(0).selectExpr("id AS a", "id AS b")
    ep = str(tmp_path / "empty")
    maintenance.write_zordered(empty, ep, "a", "b")
    assert spark.read.parquet(ep).count() == 0

    # span ~1.7e15 (decades of epoch-µs): (col-lo)*mask would overflow
    wide = spark.range(20000).selectExpr(
        "CAST(800000000000000 + id * 80000000000 AS LONG) AS a",
        "CAST(id % 997 AS LONG) AS b",
    )
    wp = str(tmp_path / "wide")
    maintenance.write_zordered(wide, wp, "a", "b", n_files=4)
    out = spark.read.parquet(wp)
    assert out.count() == 20000
    assert out.agg(F.min("zorder_key")).first()[0] >= 0  # no overflow wrap
