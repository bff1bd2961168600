"""Bucketed-table co-located join (100 TB discipline, SURVEY §4).

When both join sides are bucketed+sorted on the join key, Spark plans a
SortMergeJoin with NO Exchange on either side — the pre-shuffled layout
replaces the reference's Postgres B-tree indexes for big fact⋈fact
joins. This test persists bucketed lineitem/orders and pins that plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nyc_taxi_bigdata_pipeline_spark.plans import physical_plan
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # explicit per-table paths — spark.sql.warehouse.dir is a static conf
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(wh / "li_b")).mode("overwrite").saveAsTable("li_b")
    )
    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(wh / "ord_b")).mode("overwrite").saveAsTable("ord_b")
    )
    yield spark.table("li_b"), spark.table("ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    li, orders = bucketed
    # disable broadcast so the join strategy decision is about shuffles
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout reused
        # correctness unchanged vs the unbucketed join
        n_b = joined.count()
        n_u = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n_b == n_u
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_avoids_exchange(spark, bucketed):
    li, _ = bucketed
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = physical_plan(agg)
    # aggregation on the bucket key reuses the layout: no shuffle
    assert "Exchange" not in plan
