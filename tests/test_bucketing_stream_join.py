"""Tests for bucketed co-located joins (no-exchange fact⋈fact) and the
watermarked stream-stream interval join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_etl_pipeline_spark import sinks, streaming
from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.plans import explain_formatted, n_shuffles

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    try:
        sinks.write_bucketed(
            li, "b_lineitem", bucket_cols=["l_orderkey"], n_buckets=8,
            sort_cols=["l_orderkey"], path=str(tmp_path / "b_lineitem"),
        )
        sinks.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders",
            bucket_cols=["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"],
            path=str(tmp_path / "b_orders"),
        )
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
        p = explain_formatted(joined)
        # co-located: the join itself requires NO exchange on either side
        assert n_shuffles(p) == 0, p
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_unbucketed_join_needs_exchanges(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    # contrast case: same join without bucketing shuffles both sides
    # (disable auto-broadcast so size doesn't hide the exchanges at tiny SF)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = explain_formatted(li.join(orders, "l_orderkey"))
        assert n_shuffles(p) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture
def events_dir(spark, tmp_path):
    src = str(tmp_path / "events_src")
    load_table(spark, SF, "events").repartition(4).write.parquet(src)
    return src


def test_stream_stream_interval_join(spark, events_dir, tmp_path):
    purchases = streaming.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    errors = streaming.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "error"
    )
    joined = streaming.interval_join_streams(
        purchases, errors, within="30 minutes", watermark="10 hours"
    )
    streaming.run_to_memory(joined, "t_ssjoin", str(tmp_path / "ckpt_ss"))
    got = spark.table("t_ssjoin")

    # batch twin: same join condition on the static table
    e = load_table(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    x = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    batch = p.join(
        x,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 minutes")),
    )
    assert got.count() == batch.count()
    assert got.count() > 0  # the condition actually matches something
    got_pairs = {(r["l_event_id"], r["r_event_id"]) for r in got.collect()}
    want_pairs = {(r["l_event_id"], r["r_event_id"]) for r in batch.collect()}
    assert got_pairs == want_pairs
