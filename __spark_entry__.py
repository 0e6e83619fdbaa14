"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's Demo.ipynb
workload: shuffle join + groupby-count — SURVEY.md §6) on sf0.001.
``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (+ the beyond-reference LLM-pipeline operators);
``oracle_sql()`` gives the DuckDB twin for each.

Aliasing rule: every computed/aggregate column is aliased identically
in the Spark query and the oracle SQL (driver hash-compares values
after sorting columns by name). Double-typed aggregates are rounded
to a fixed number of decimals ON BOTH SIDES so cross-engine
floating-point summation order cannot flip the hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

import charmpandas_spark as cps

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> cps.DataFrame:
    return cps.read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# entry: flagship query (reference Demo.ipynb — join on key + groupby +
# count; here lineitem ⋈ orders on orderkey → count per o_orderpriority)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    li = _t(spark, SF_SMOKE, "lineitem")
    orders = _t(spark, SF_SMOKE, "orders")
    joined = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey",
                      how="inner")
    out = joined.groupby("o_orderpriority")["l_quantity"].count()
    return out.to_spark()


# ---------------------------------------------------------------------------
# queries — reference surface (SURVEY §2)
# ---------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P1: parquet scan with column projection (pruned at the scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return li[["l_orderkey", "l_extendedprice", "l_shipdate"]].to_spark()


def q_filter_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P5: arithmetic expression, comparison filter, add-column."""
    li = _t(spark, sf_dir, "lineitem")
    li["revenue"] = li["l_extendedprice"] * (1 - li["l_discount"])
    flt = li[li["revenue"] > 45000.0]
    return flt.sdf.select("l_orderkey", "l_linenumber",
                          (F.floor(F.col("revenue") * 100) / 100).alias("revenue"))


def q_flagship_join_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A2: the reference's Demo.ipynb pipeline shape."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey",
                      how="inner")
    return joined.groupby("o_orderpriority")["l_quantity"].count().to_spark()


def _join_q(how: str, swap: bool = False):
    """orders ⋈ lineitem: 257 orders have no lineitems at sf0.01, so
    outer/anti variants genuinely null-extend/filter. ``swap`` puts
    orders on the right (exercises the right_semi/right_anti
    side-swap path in DataFrame.merge)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = _t(spark, sf_dir, "orders")
        li = _t(spark, sf_dir, "lineitem")
        if swap:
            j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey",
                         how=how)
        else:
            j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey",
                             how=how)
        cols = [c for c in
                ["o_orderkey", "o_orderpriority", "l_orderkey",
                 "l_linenumber", "l_quantity"] if c in j.columns]
        return j[cols].to_spark()
    return q


q_join_inner = _join_q("inner")
q_join_left = _join_q("left")
q_join_right = _join_q("right", swap=True)
q_join_full = _join_q("outer")
q_join_left_semi = _join_q("left_semi")
q_join_left_anti = _join_q("left_anti")
q_join_right_semi = _join_q("right_semi", swap=True)
q_join_right_anti = _join_q("right_anti", swap=True)


def q_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: multi-key self-join with `on=` (single surviving key cols) +
    `_l`/`_r` collision suffixes on non-key columns."""
    li = _t(spark, sf_dir, "lineitem")
    a = li[["l_orderkey", "l_linenumber", "l_quantity"]]
    b = li[["l_orderkey", "l_linenumber", "l_quantity"]]
    j = a.merge(b, on=["l_orderkey", "l_linenumber"], how="inner")
    sdf = j.sdf.select("l_orderkey", "l_linenumber",
                       (F.floor(F.col("l_quantity_l") * 100) / 100).alias("qty_l"),
                       (F.floor(F.col("l_quantity_r") * 100) / 100).alias("qty_r"))
    return sdf


def q_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: grouped sum with the reference's `sum(col)` result naming."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupby(["l_returnflag", "l_linestatus"])["l_quantity"].sum()
    sdf = out.sdf.select(
        "l_returnflag", "l_linestatus",
        (F.floor(F.col("sum(l_quantity)") * 100) / 100).alias("sum(l_quantity)"))
    return sdf


def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: grouped count (null-skipping, like Arrow's count kernel)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupby("event_type")["value"].count().to_spark()


def q_groupby_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the server-ready-but-unexposed aggregate set
    (src/types.hpp:17-29) — min/max/avg/median/count_distinct."""
    li = _t(spark, sf_dir, "lineitem")
    sdf = li.sdf.groupBy("l_returnflag").agg(
        (F.floor(F.min("l_quantity") * 100) / 100).alias("min_qty"),
        (F.floor(F.max("l_quantity") * 100) / 100).alias("max_qty"),
        (F.floor(F.avg("l_extendedprice") * 100) / 100).alias("avg_price"),
        (F.floor(F.percentile("l_quantity", 0.5) * 100) / 100).alias("median_qty"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
    )
    return sdf


def q_scalar_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: whole-column scalar sum/count as a one-row result."""
    li = _t(spark, sf_dir, "lineitem")
    sdf = li.sdf.agg(
        (F.floor(F.sum("l_quantity") * 100) / 100).alias("sum_qty"),
        F.count("l_quantity").alias("count_qty"),
        (F.floor(F.sum("l_extendedprice") * 100) / 100).alias("sum_price"),
    )
    return sdf


def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 (+limit extension): global sort = Spark RangePartitioner
    (the reference's sample sort), multi-key done correctly."""
    orders = _t(spark, sf_dir, "orders")
    top = orders.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).limit(10)
    sdf = top.sdf.select("o_orderkey",
                         (F.floor(F.col("o_totalprice") * 100) / 100).alias("o_totalprice"))
    return sdf


def q_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union-all by position, schemas equal."""
    li = _t(spark, sf_dir, "lineitem")
    hi = li[li["l_quantity"] > 45.0][["l_orderkey", "l_linenumber"]]
    lo = li[li["l_quantity"] < 3.0][["l_orderkey", "l_linenumber"]]
    return cps.concat([hi, lo]).to_spark()


def q_datetime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 with timestamp literals (reference wire type Timestamp=3,
    charmpandas/ast.py:55-61) + date_trunc rollup."""
    import datetime
    orders = _t(spark, sf_dir, "orders")
    flt = orders[orders["o_orderdate"] >= datetime.datetime(1995, 1, 1)]
    sdf = (flt.sdf
           .select(F.date_trunc("month", "o_orderdate").alias("month"),
                   "o_orderkey")
           .groupBy("month")
           .agg(F.count("o_orderkey").alias("n_orders")))
    return sdf


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: distinct rows (reference has none — SURVEY §2.6)."""
    cust = _t(spark, sf_dir, "customer")
    return cust[["c_mktsegment", "c_nationkey"]].distinct().to_spark()


def q_int_literal_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXTURES cross-cutting: int32 column vs Python int literal
    (server widens to int64, src/partition.cpp:689-694)."""
    part = _t(spark, sf_dir, "part")
    part["size2"] = part["p_size"] * 2 + 1
    flt = part[part["size2"] > 60]
    return flt.sdf.select("p_partkey",
                          F.col("size2").cast("bigint").alias("size2"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_project": q_scan_project,
        "filter_expr": q_filter_expr,
        "flagship_join_groupby_count": q_flagship_join_groupby_count,
        "join_inner": q_join_inner,
        "join_left": q_join_left,
        "join_right": q_join_right,
        "join_full": q_join_full,
        "join_left_semi": q_join_left_semi,
        "join_left_anti": q_join_left_anti,
        "join_right_semi": q_join_right_semi,
        "join_right_anti": q_join_right_anti,
        "join_multikey": q_join_multikey,
        "groupby_sum": q_groupby_sum,
        "groupby_count": q_groupby_count,
        "groupby_extended": q_groupby_extended,
        "scalar_reduction": q_scalar_reduction,
        "sort_topk": q_sort_topk,
        "concat": q_concat,
        "datetime_filter": q_datetime_filter,
        "distinct": q_distinct,
        "int_literal_widening": q_int_literal_widening,
    }


def oracle_sql() -> dict[str, str]:
    join_cols = ('o_orderkey, o_orderpriority, l_orderkey, l_linenumber, '
                 'l_quantity')
    return {
        "scan_project":
            "SELECT l_orderkey, l_extendedprice, l_shipdate FROM lineitem",
        "filter_expr": """
            SELECT l_orderkey, l_linenumber,
                   FLOOR(l_extendedprice * (1 - l_discount) * 100) / 100 AS revenue
            FROM lineitem
            WHERE l_extendedprice * (1 - l_discount) > 45000.0
        """,
        "flagship_join_groupby_count": """
            SELECT o_orderpriority,
                   COUNT(l_quantity) AS "count(l_quantity)"
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "join_inner": f"""
            SELECT {join_cols}
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        """,
        "join_left": f"""
            SELECT {join_cols}
            FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        """,
        "join_right": f"""
            SELECT {join_cols}
            FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
        """,
        "join_full": f"""
            SELECT {join_cols}
            FROM orders FULL OUTER JOIN lineitem ON o_orderkey = l_orderkey
        """,
        "join_left_semi": """
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "join_left_anti": """
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "join_right_semi": """
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "join_right_anti": """
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "join_multikey": """
            SELECT a.l_orderkey, a.l_linenumber,
                   FLOOR(a.l_quantity * 100) / 100 AS qty_l,
                   FLOOR(b.l_quantity * 100) / 100 AS qty_r
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_linenumber = b.l_linenumber
        """,
        "groupby_sum": """
            SELECT l_returnflag, l_linestatus,
                   FLOOR(SUM(l_quantity) * 100) / 100 AS "sum(l_quantity)"
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "groupby_count": """
            SELECT event_type, COUNT(value) AS "count(value)"
            FROM events GROUP BY event_type
        """,
        "groupby_extended": """
            SELECT l_returnflag,
                   FLOOR(MIN(l_quantity) * 100) / 100 AS min_qty,
                   FLOOR(MAX(l_quantity) * 100) / 100 AS max_qty,
                   FLOOR(AVG(l_extendedprice) * 100) / 100 AS avg_price,
                   ROUND(quantile_cont(l_quantity, 0.5), 2) AS median_qty,
                   COUNT(DISTINCT l_orderkey) AS distinct_orders
            FROM lineitem GROUP BY l_returnflag
        """,
        "scalar_reduction": """
            SELECT FLOOR(SUM(l_quantity) * 100) / 100 AS sum_qty,
                   COUNT(l_quantity) AS count_qty,
                   FLOOR(SUM(l_extendedprice) * 100) / 100 AS sum_price
            FROM lineitem
        """,
        "sort_topk": """
            SELECT o_orderkey, FLOOR(o_totalprice * 100) / 100 AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "concat": """
            SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45.0
            UNION ALL
            SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity < 3.0
        """,
        "datetime_filter": """
            SELECT date_trunc('month', o_orderdate) AS month,
                   COUNT(o_orderkey) AS n_orders
            FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            GROUP BY 1
        """,
        "distinct": """
            SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        """,
        "int_literal_widening": """
            SELECT p_partkey, CAST(p_size * 2 + 1 AS BIGINT) AS size2
            FROM part WHERE p_size * 2 + 1 > 60
        """,
    }
