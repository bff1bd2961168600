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
