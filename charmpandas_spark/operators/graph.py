"""Triangle counting over an undirected edge list.

The third leg of the graph-analytics family (after
:mod:`.pagerank` and the min-label connected components inside
``dedup_clusters``): triangle count is the standard clustering /
community-density statistic, and the standard "does your engine
handle the quadratic wedge blow-up" benchmark.

Algorithm: the degree-oriented node-iterator (Schank & Wagner 2005;
the "compact-forward" of Latapy 2008). Every undirected edge is
oriented from its lower-(degree, id) endpoint to the higher one,
turning the graph into a DAG where every node's out-degree is
O(sqrt(m)). Wedges (u→v, u→w) are generated per source and closed
against the oriented edge set — each triangle is counted exactly
once (its minimum-(degree, id) vertex generates the wedge).

Plan shape / 100 TB story: three hash exchanges — edges by src for
wedge generation (a self-join Catalyst executes as ONE shuffle read
both sides), wedges by (v, w) against oriented edges for closure, and
the degree aggregation. The orientation is what makes this survive
scale: without it a single hub of degree d fans out d² wedges; with
it the per-node fan-out is bounded by O(sqrt(m)) and total wedge
volume by O(m^{3/2}) — the proven optimum for exact counting. AQE
splits whatever skew remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

__all__ = ["triangle_count"]


def triangle_count(edges: SparkDF, src: str = "src",
                   dst: str = "dst") -> SparkDF:
    """Count triangles in the undirected graph given by ``edges``.

    Edge direction, duplicate edges and self-loops are normalized
    away first. Returns ONE row: ``(n_nodes, n_edges, n_triangles)``
    — nodes are edge endpoints (isolated vertices are not the edge
    list's business).
    """
    a, b = F.col(src), F.col(dst)
    und = (edges.select(F.least(a, b).alias("a"),
                        F.greatest(a, b).alias("b"))
                .where(F.col("a") != F.col("b"))
                .distinct())
    deg = (und.select(F.col("a").alias("v"))
              .unionAll(und.select(F.col("b").alias("v")))
              .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
    # orient low-(deg, id) -> high-(deg, id)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    lower_first = ((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db"))
                      & (F.col("a") < F.col("b"))))
    oriented = (und.join(da, "a").join(db, "b")
                   .select(F.when(lower_first, F.col("a"))
                            .otherwise(F.col("b")).alias("u"),
                           F.when(lower_first, F.col("b"))
                            .otherwise(F.col("a")).alias("w")))
    e1 = oriented.select(F.col("u"), F.col("w").alias("v"))
    e2 = oriented.select(F.col("u"), F.col("w"))
    # wedge pair canonicalized by VALUE so it joins the canonical
    # undirected edge set regardless of how {v, w} is oriented
    wedges = (e1.join(e2, "u")
                .where(F.col("v") < F.col("w"))
                .select("v", "w"))
    closed = wedges.join(
        und.select(F.col("a").alias("v"), F.col("b").alias("w")),
        ["v", "w"])
    n_tri = closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)
