"""Bucketed co-located join: the Exchange must disappear."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators import bucketing
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # (warehouse dir is a static conf — tables land in the session default
    # and are dropped at teardown)
    orders = table(spark, SF_SMALL, "orders")
    lineitem = table(spark, SF_SMALL, "lineitem")
    bucketing.write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    bucketing.write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o, li = bucketed_tables
    # disable broadcast so the co-located sort-merge path is exercised
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            bucketing.bucketed(spark, li)
            .join(bucketing.bucketed(spark, o), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        pre_agg = plan.split("HashAggregate")[-1]  # below the agg: the join
        assert "Exchange" not in pre_agg, "bucketed join still shuffles"
        # and the result matches the unbucketed computation
        expected = (
            table(spark, SF_SMALL, "lineitem")
            .join(
                table(spark, SF_SMALL, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
            .collect()
        )
        got = joined.collect()
        assert sorted((r.o_orderstatus, round(r.qty, 4)) for r in got) == sorted(
            (r.o_orderstatus, round(r.qty, 4)) for r in expected
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivf_probe_join_is_corpus_exchange_free_when_bucketed(spark, tmp_path):
    """SCALE.md's IVF scale path: corpus bucketed by cluster -> the
    probe join adds NO corpus-side Exchange; only probes shuffle."""
    import pyspark.sql.functions as F

    from flink_1_8_sourcecode_spark.operators.bucketing import write_bucketed
    from flink_1_8_sourcecode_spark.operators.similarity import ivf_topk

    emb = table(spark, SF_SMALL, "embeddings")
    write_bucketed(emb, "t_emb_bucketed", ["label"], num_buckets=8)
    corpus = spark.table("t_emb_bucketed")
    queries = emb.limit(5)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ivf_topk(
            corpus, queries, "vec_id", "embedding", "vec_id",
            cluster_col="label", k=3, nprobe=2, broadcast_probes=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the probe join must sort-merge with a single (probe-side) exchange
    assert "SortMergeJoin" in plan
    # corpus side reads the bucketed table scan with no Exchange above it:
    # count exchanges feeding the join — bucketed side contributes none
    assert "Bucketed: true" in plan
    n_rows = out.count()
    assert n_rows > 0
