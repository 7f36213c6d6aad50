"""Bucketed co-located joins: the 100 TB technique for repeated joins
on the same key — both tables pre-hashed into matching buckets, so the
join plan has NO shuffle exchange at all."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # tables land in the default warehouse dir (static conf, cannot be
    # redirected at runtime); DROP TABLE below removes the files
    orders = spark.range(0, 5000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.col("id") * 1.5).alias("o_totalprice"),
    )
    items = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("l_orderkey"),
        (F.col("id") % 7).alias("l_linenumber"),
        (F.col("id") * 0.25).alias("l_extendedprice"),
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        items.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_items")
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: at real scale neither side fits
        # a broadcast — that is the case bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table("b_orders")
        bi = spark.table("b_items")
        joined = bo.join(bi, bo.o_orderkey == bi.l_orderkey).groupBy(
            "o_custkey"
        ).agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))

        plan = _plan(joined)
        # the join itself must not shuffle either side: bucket layout IS
        # the required hash partitioning (the groupBy after it may)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan

        # and the result matches the unbucketed join
        expected = sorted(
            map(tuple,
                orders.join(items, orders.o_orderkey == items.l_orderkey)
                .groupBy("o_custkey")
                .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
                .collect())
        )
        got = sorted(map(tuple, joined.collect()))
        assert got == expected
        assert len(got) == 97
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
