"""Scale-path operators: bucketed co-located joins (exchange-free),
salted skew joins, forced broadcast."""

import pytest

from pyspark.sql import functions as F

import charmpandas_spark as cps
from charmpandas_spark.operators.bucketing import (
    bucketed_join, read_bucketed, write_bucketed)
from charmpandas_spark.operators.skew import broadcast_join, salted_join
from charmpandas_spark.plans.explain import join_strategies, num_exchanges


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "lineitem").sdf


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "orders").sdf


def test_bucketed_join_is_exchange_free(spark, li, orders):
    # tables land in ./spark-warehouse (gitignored); warehouse dir is a
    # static conf so it can't be pointed at tmp_path per-test
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "li_b", "l_orderkey", 8)
    write_bucketed(orders.select("o_orderkey", "o_orderpriority")
                   .withColumnRenamed("o_orderkey", "l_orderkey"),
                   "ord_b", "l_orderkey", 8)
    # disable auto-broadcast so the co-location (not a broadcast) is
    # what removes the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
        assert num_exchanges(j.sdf) == 0, "bucketed join still shuffles"
        assert "SortMergeJoin" in join_strategies(j.sdf)
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_salted_join_matches_plain(spark, li, orders):
    o = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey", salt=8).count()
    assert salted == plain


def test_salted_left_join_matches_plain(spark, orders, li):
    l = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = l.join(li, "l_orderkey", "left").count()
    salted = salted_join(l, li, "l_orderkey", salt=4, how="left").count()
    assert salted == plain


def test_salted_join_rejects_right(li, orders):
    with pytest.raises(ValueError):
        salted_join(li, orders, "l_orderkey", how="right")


def test_broadcast_join_forced(spark, li, orders):
    o = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    j = broadcast_join(li, o, "l_orderkey")
    assert "BroadcastHashJoin" in join_strategies(j.sdf)
    assert j.count() == li.join(o, "l_orderkey").count()
