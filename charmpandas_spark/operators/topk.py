"""Per-group top-k without a global per-group sort.

The naive formulation — ``row_number() OVER (PARTITION BY group ORDER
BY score)`` — shuffles EVERY row to its group's reducer and sorts all
of them, and when the group cardinality is low (segments, languages,
sources: the common case) parallelism collapses to n_groups single
tasks. This operator instead runs two BOUNDED aggregations:

  1. partial top-k per (group, salt): each of S salt shards keeps at
     most k candidates — ``sort_array(collect_list(...))`` sliced to
     k, an O(k)-state aggregate with map-side partial combine;
  2. merge: per group, flatten the ≤ S·k survivors, sort once, keep k.

Shuffled bytes are ≤ groups·S·k structs — independent of the data
size — and every stage is parallel in groups·S. This is the shape
that survives 100 TB: the reference's top-k is a full global sample
sort + limit (partition.cpp's sort path); a bounded partial aggregate
never materializes an ordering of the whole table.

Ordering contract: ``order_col`` is INTEGER units (cents/micros —
repo doctrine), descending by default, ties broken by ascending
``id_col`` so the result is total-ordered and cross-engine
hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

__all__ = ["topk_per_group", "topk_per_group_sql"]


def topk_per_group(df: SparkDF, group_cols: list[str], order_col: str,
                   id_col: str, k: int, ascending: bool = False,
                   num_salts: int = 32) -> SparkDF:
    """Top-``k`` rows per group by ``order_col`` (default descending,
    ties → smallest ``id_col``): returns
    ``(group_cols…, rank, id_col, order_col)`` with rank 1-based.

    Rows with NULL ``order_col`` never place. Groups with fewer than
    ``k`` rows yield fewer rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sign = 1 if ascending else -1
    key = (F.col(order_col).cast("long") * sign).alias("__ord")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_salts))
    cand = (df.where(F.col(order_col).isNotNull())
              .select(*group_cols, salt.alias("__salt"),
                      F.struct(key, F.col(id_col).cast("long")
                               .alias("__id")).alias("__c")))
    partial = (cand.groupBy(*group_cols, "__salt")
                   .agg(F.slice(F.sort_array(F.collect_list("__c")),
                                1, k).alias("__top")))
    merged = (partial.groupBy(*group_cols)
                     .agg(F.slice(F.sort_array(
                              F.flatten(F.collect_list("__top"))),
                          1, k).alias("__top")))
    out = merged.select(*group_cols,
                        F.posexplode("__top").alias("__pos", "__c"))
    return out.select(
        *group_cols,
        (F.col("__pos") + 1).cast("int").alias("rank"),
        F.col("__c.__id").alias(id_col),
        (F.col("__c.__ord") * sign).alias(order_col))


def topk_per_group_sql(t: str, group_exprs: list[str], order_expr: str,
                       id_expr: str, k: int,
                       ascending: bool = False) -> str:
    """DuckDB twin: the plain window formulation — same rows by the
    total-order contract, however the engine schedules it."""
    gsel = ", ".join(group_exprs)
    direction = "ASC" if ascending else "DESC"
    return f"""
        WITH ranked AS (
            SELECT {gsel},
                   CAST({order_expr} AS BIGINT) AS ord,
                   CAST({id_expr} AS BIGINT) AS id,
                   row_number() OVER (
                       PARTITION BY {gsel}
                       ORDER BY CAST({order_expr} AS BIGINT) {direction},
                                CAST({id_expr} AS BIGINT) ASC) AS rk
            FROM {t}
            WHERE {order_expr} IS NOT NULL)
        SELECT {gsel}, CAST(rk AS INT) AS rank, id, ord
        FROM ranked WHERE rk <= {k}
    """
