"""Reciprocal-rank fusion (RRF) — combine any number of independently
ranked retrieval legs (dense ANN, sparse lexical, metadata boosts)
into one hybrid ranking. The standard hybrid-search primitive
(Cormack et al. 2009, public method) a training-data pipeline uses to
mine hard negatives and build retrieval sets.

EXACT integer contract: each leg contributes
``floor(1e6 / (k0 + rank))`` micro-units; the fused score is an int64
sum, so the fused ranking is bit-identical across engines and
partitionings (same family as ``sparse.tf_cosine_topk``'s integer
cosine). Ties break on ascending item id.

Scale shape: a unionByName of the leg outputs (each already top-k per
query, so the union is |queries| x k x legs rows — tiny relative to
the corpora that produced it), ONE groupBy (query, item), one
per-query window for the fused rank. The expensive work stays inside
the legs, which keep their own bucketed/inverted-index plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

__all__ = ["rrf_fuse"]

MICRO = 1_000_000


def rrf_fuse(legs: list[SparkDF], k0: int = 60, top_k: int | None = None,
             q_col: str = "q_id", item_col: str = "item_id",
             rank_col: str = "rank") -> SparkDF:
    """Fuse ranked legs into ``(q_id, item_id, n_legs, rrf_micro,
    fused_rank)``.

    Each leg must carry ``(q_col, item_col, rank_col)`` with rank
    starting at 1 (extra columns are dropped). An item missing from a
    leg simply contributes nothing for that leg — the standard RRF
    treatment of unretrieved items.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranked leg")
    parts = [leg.select(F.col(q_col).alias("q_id"),
                        F.col(item_col).alias("item_id"),
                        F.col(rank_col).cast("bigint").alias("rank"))
             for leg in legs]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.select("q_id", "item_id",
                      F.floor(F.lit(MICRO) / (F.lit(k0) + F.col("rank")))
                       .alias("contrib"))
              .groupBy("q_id", "item_id")
              .agg(F.count(F.lit(1)).alias("n_legs"),
                   F.sum("contrib").alias("rrf_micro")))
    w = Window.partitionBy("q_id").orderBy(F.col("rrf_micro").desc(),
                                           F.col("item_id").asc())
    out = fused.withColumn("fused_rank",
                           F.row_number().over(w).cast("int"))
    if top_k is not None:
        out = out.where(F.col("fused_rank") <= top_k)
    return out
