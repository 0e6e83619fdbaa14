"""functions/exact.py — the long-backed exact fixed-point sum.

Pins the r13 contract: `exact_sum` / `exact_sum_over` produce
BIT-IDENTICAL results to the decimal(18,6)-cast sums they replaced
(same per-row quantization, exact integer accumulation), while the
aggregation buffers stay on codegen'd longs instead of the
BigDecimal-backed decimal(28,6) the old path allocated per row —
the cliff the sf5 relational curve exposed (tpch_q1 e 1.41 → 0.62,
SCALING.md round-13 refresh)."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from charmpandas_spark.functions.exact import (
    exact_sum, exact_sum_over, micro_parts, recombine)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _old_dsum(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def test_exact_sum_matches_decimal_path_on_lineitem(spark):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    expr = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")))
    old = li.groupBy("l_returnflag", "l_linestatus").agg(
        _old_dsum("l_quantity").alias("q"),
        _old_dsum(expr).alias("e")).orderBy(
        "l_returnflag", "l_linestatus").collect()
    new = li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum("l_quantity").alias("q"),
        exact_sum(expr).alias("e")).orderBy(
        "l_returnflag", "l_linestatus").collect()
    assert old == new


def test_exact_sum_negative_values_and_sign_carrying_lo(spark):
    # c_acctbal goes negative: lo must carry the value's sign so
    # hi*unit + lo reconstructs trunc-consistent micro-units.
    c = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    old = c.agg(_old_dsum("c_acctbal").alias("s")).collect()
    new = c.agg(exact_sum("c_acctbal").alias("s")).collect()
    assert old == new
    # synthetic exact check around negative fractions
    df = spark.createDataFrame(
        [(-0.5,), (-1.25,), (2.75,), (-0.000001,), (0.000001,)],
        "x double")
    got = df.agg(exact_sum("x").alias("s")).collect()[0]["s"]
    assert got == 1.0  # -0.5 - 1.25 + 2.75 - 1e-6 + 1e-6, exactly


def test_micro_parts_reconstruct_and_bounds(spark):
    df = spark.createDataFrame(
        [(123.456789,), (-123.456789,), (0.0,), (999999.999999,),
         (-0.000001,)], "x double")
    hi, lo = micro_parts("x")
    rows = df.select(
        F.col("x"), hi.alias("hi"), lo.alias("lo"),
        (F.col("x").cast("decimal(18,6)") * 1000000).cast("long")
        .alias("micro")).collect()
    for r in rows:
        assert r["hi"] * 1_000_000 + r["lo"] == r["micro"]
        assert abs(r["lo"]) < 1_000_000


def test_exact_sum_empty_and_all_null_returns_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    assert df.agg(exact_sum("x").alias("s")).collect()[0]["s"] is None
    empty = df.filter(F.lit(False))
    assert empty.agg(exact_sum("x").alias("s")).collect()[0]["s"] is None


def test_exact_sum_buffer_is_long_not_decimal(spark):
    """The point of the refactor: no decimal sum buffer in the plan —
    the aggregate functions are sums over LongType children."""
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    plan = li.groupBy("l_returnflag").agg(
        exact_sum("l_quantity").alias("s"))._jdf.queryExecution() \
        .optimizedPlan().toString()
    import re
    agg_lines = [ln for ln in plan.splitlines() if "Aggregate" in ln]
    assert agg_lines, plan
    for ln in agg_lines:
        # old path: the sum's DIRECT child was a decimal cast of the
        # column -> decimal(28,6) buffer. New path: every sum's child
        # is cast to bigint (the decimal quantization happens inside,
        # per row, before the bigint conversion).
        assert re.search(r"sum\(cast\([\w#]+ as decimal", ln) is None, ln
        assert "as bigint)" in ln, ln


def test_exact_sum_over_matches_decimal_window(spark):
    o = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0))
    old = o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w)
        .cast("double").alias("r")).orderBy("o_orderkey").collect()
    new = o.select(
        "o_orderkey",
        exact_sum_over("o_totalprice", w).alias("r")) \
        .orderBy("o_orderkey").collect()
    assert old == new


def test_recombine_overflow_headroom_documented_bound(spark):
    # hi/lo long partials recombine exactly in decimal(38): a value
    # far past double's 2^53 integer range survives bit-exact.
    df = spark.createDataFrame(
        [(9_000_000_000_000, 999_999), (9_000_000_000_000, 999_999)],
        "hi long, lo long")
    got = df.agg(
        recombine(F.sum("hi"), F.sum("lo")).alias("s")).collect()[0]["s"]
    assert got == pytest.approx(18_000_000_000_001.999998, rel=0, abs=1e-6)
