"""Scalar (int8) embedding quantization — the storage/serving
compression step of an embedding pipeline: per-dimension global
[min, max] ranges, each float mapped to an 8-bit code. 4x smaller
vectors for ANN candidate generation with exact-rescoring on the
original floats (the standard two-stage serving layout).

Determinism contract: the code assignment is a FIXED-ORDER IEEE double
expression ``least(255, greatest(0, floor((x - lo) * 255 / (hi -
lo))))`` over stats that are exact min/maxes — bit-identical across
engines and partitionings, so even the quantized codes are
hash-checkable cross-engine (constant dimensions code to 0 instead of
dividing by zero).

Scale shape: stats are ONE posexplode + one partial-aggregated
groupBy(dim) (the stream collapses to |dims| rows map-side); the
per-dimension ranges then ride the plan as a broadcast 1-row pair of
sorted arrays, and the coding itself is SCAN-LOCAL — an index
transform over each vector, no second shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from .dedup import spread

__all__ = ["quantize_embeddings", "quantize_embeddings_sql",
           "quantized_dot_topk", "quantized_dot_topk_sql",
           "quantized_centered_sql"]


def quantize_embeddings(df: SparkDF, vec_col: str, id_col: str,
                        levels: int = 256,
                        centered: bool = False) -> SparkDF:
    """``(id, codes array<int>)`` with per-dimension global scalar
    quantization into ``levels`` buckets (default int8). Vectors
    shorter than the longest one code their own dims only; null
    vectors yield null codes.

    Two layouts: the default AFFINE form maps ``[min_d, max_d]`` onto
    ``[0, levels-1]`` (tightest reconstruction — the storage layout);
    ``centered=True`` maps symmetrically around zero,
    ``floor(x * half / max|x|_d)`` clamped to ``[-half, half]`` — the
    RETRIEVAL layout, because the integer dot of centered codes is a
    per-dim positively-weighted float dot (monotone-compatible),
    whereas affine codes' dot is dominated by the shift constants and
    does NOT rank like the float dot."""
    top = levels - 1
    half = levels // 2 - 1
    ex = (spread(df.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("v")))
          .select("id", F.posexplode("v").alias("d", "x"))
          .select("id", "d", F.col("x").cast("double").alias("x")))
    if centered:
        stats = (ex.groupBy("d")
                   .agg(F.max(F.abs(F.col("x"))).alias("m")))
        bounds = stats.agg(
            F.array_sort(F.collect_list(F.struct("d", "m")))
             .alias("b"))
    else:
        stats = (ex.groupBy("d")
                   .agg(F.min("x").alias("lo"), F.max("x").alias("hi")))
        bounds = stats.agg(
            F.array_sort(F.collect_list(F.struct("d", "lo", "hi")))
             .alias("b"))
    v = F.col("v")
    b = F.col("b")
    if centered:
        code = F.transform(
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda i: F.when(b[i]["m"] == 0.0, F.lit(0)).otherwise(
                F.least(F.lit(half), F.greatest(F.lit(-half), F.floor(
                    v[i].cast("double") * F.lit(float(half))
                    / b[i]["m"]))))
             .cast("int"))
    else:
        code = F.transform(
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda i: F.when(
                b[i]["hi"] == b[i]["lo"], F.lit(0)).otherwise(
                F.least(F.lit(top), F.greatest(F.lit(0), F.floor(
                    (v[i].cast("double") - b[i]["lo"]) * F.lit(float(top))
                    / (b[i]["hi"] - b[i]["lo"])))))
             .cast("int"))
    return (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("v"))
              .crossJoin(F.broadcast(bounds))
              .select("id", code.alias("codes")))


def quantize_embeddings_sql(t: str, id_expr: str, vec_expr: str,
                            levels: int = 256) -> str:
    """DuckDB twin in LONG format ``(id, d, code)`` (how the
    registered query exposes it — array-valued result columns don't
    hash-compare portably). Positional indexing via list_transform
    over a range, identical double-op order."""
    top = levels - 1
    return f"""
        WITH ex AS (
            SELECT {id_expr} AS {id_expr}, u.d AS d,
                   CAST({vec_expr}[CAST(u.d + 1 AS INT)] AS DOUBLE) AS x
            FROM {t},
                 (SELECT unnest(range(0,
                      (SELECT max(len({vec_expr})) FROM {t}))) AS d) u
            WHERE u.d < len({vec_expr})),
        stats AS (
            SELECT d, min(x) AS lo, max(x) AS hi FROM ex GROUP BY d)
        SELECT ex.{id_expr}, CAST(ex.d AS INT) AS d,
               CASE WHEN s.hi = s.lo THEN 0
                    ELSE CAST(LEAST({top}, GREATEST(0,
                         FLOOR((ex.x - s.lo) * CAST({top} AS DOUBLE)
                               / (s.hi - s.lo)))) AS INT) END AS code
        FROM ex JOIN stats s USING (d)
    """


def quantized_dot_topk(codes: SparkDF, queries: SparkDF, k: int = 10
                       ) -> SparkDF:
    """Stage-1 retrieval over QUANTIZED codes: for each query row of
    ``queries`` (same ``(id, codes)`` schema), the top-``k`` corpus
    rows by integer dot product of the int8 codes. The int64 fold is
    EXACT, so unlike float-dot ANN the candidate ranking itself is
    hash-checkable cross-engine; ties break on ascending corpus id,
    self-pairs excluded. Serving layouts run this over the 4x-smaller
    code table, then rescore the k survivors on the original floats.

    Use CENTERED codes (``quantize_embeddings(centered=True)``):
    affine [0, levels) codes' dot is dominated by the shift constants
    and does not rank like the float dot.

    Shape: bounded query set x corpus linear scan (a broadcast
    nested-loop on the tiny query side) + per-query top-k window —
    the brute-force stage-1 baseline; bucketed variants
    (`similarity.ann_lsh_topk`, `ivf`) bound the scan instead."""
    q = queries.select(F.col("id").alias("q_id"),
                       F.col("codes").alias("qc"))
    c = codes.select(F.col("id").alias("item_id"),
                     F.col("codes").alias("cc"))
    dot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("cc"),
                   lambda a, b: a.cast("bigint") * b),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(),
                                           F.col("item_id").asc())
    return (q.crossJoin(c)
             .where(F.col("q_id") != F.col("item_id"))
             .select("q_id", "item_id", dot.alias("dot"))
             .withColumn("rank", F.row_number().over(w).cast("int"))
             .where(F.col("rank") <= k))


def quantized_centered_sql(t: str, id_expr: str, vec_expr: str,
                           levels: int = 256) -> str:
    """DuckDB twin of ``quantize_embeddings(..., centered=True)`` in
    long format ``(id, d, code)``."""
    half = levels // 2 - 1
    return f"""
        WITH ex AS (
            SELECT {id_expr} AS {id_expr}, u.d AS d,
                   CAST({vec_expr}[CAST(u.d + 1 AS INT)] AS DOUBLE) AS x
            FROM {t},
                 (SELECT unnest(range(0,
                      (SELECT max(len({vec_expr})) FROM {t}))) AS d) u
            WHERE u.d < len({vec_expr})),
        stats AS (
            SELECT d, max(abs(x)) AS m FROM ex GROUP BY d)
        SELECT ex.{id_expr}, CAST(ex.d AS INT) AS d,
               CASE WHEN s.m = 0 THEN 0
                    ELSE CAST(LEAST({half}, GREATEST(-{half},
                         FLOOR(ex.x * CAST({half} AS DOUBLE) / s.m)))
                         AS INT) END AS code
        FROM ex JOIN stats s USING (d)
    """


def quantized_dot_topk_sql(t: str, id_expr: str, vec_expr: str,
                           query_pred: str, k: int = 10,
                           levels: int = 256) -> str:
    """DuckDB twin: CENTERED quantization (the retrieval layout —
    same fixed-order arithmetic), then integer list dot + window
    top-k."""
    inner = quantized_centered_sql(t, id_expr, vec_expr, levels)
    return f"""
        WITH long AS ({inner}),
        packed AS (
            SELECT {id_expr} AS id,
                   list(CAST(code AS BIGINT) ORDER BY d) AS codes
            FROM long GROUP BY {id_expr}),
        pairs AS (
            SELECT q.id AS q_id, c.id AS item_id,
                   list_sum(list_transform(
                       range(1, CAST(len(q.codes) AS INT) + 1),
                       i -> q.codes[CAST(i AS INT)]
                            * c.codes[CAST(i AS INT)])) AS dot
            FROM packed q CROSS JOIN packed c
            WHERE q.id IN (SELECT {id_expr} FROM {t}
                           WHERE {query_pred})
              AND q.id <> c.id)
        SELECT q_id, item_id, CAST(dot AS BIGINT) AS dot,
               CAST(row_number() OVER (
                    PARTITION BY q_id
                    ORDER BY dot DESC, item_id ASC) AS INT) AS rank
        FROM pairs QUALIFY rank <= {k}
    """
