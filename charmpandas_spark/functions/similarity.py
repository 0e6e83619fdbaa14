"""Similarity search over embedding columns (``array<float>``).

North-star operators (beyond the reference, which has no array types
at all — SURVEY §1.4 "Not supported anywhere: nested/array/...").

Three tiers:
- ``cosine_sim``/``dot``/``l2_norm``: Column-level kernels built from
  ``zip_with`` + ``aggregate`` — JVM-side, no UDF, exact.
- ``cosine_topk``: brute-force top-k vs one query vector — the exact
  baseline. One scan + a k-row ordering; at 100 TB this is a single
  pass with partial top-k per partition (Spark's orderBy+limit
  already computes per-partition top-k before the final merge).
- ``ann_lsh_topk`` / ``knn_join_lsh``: random-hyperplane LSH scale
  path — deterministic pseudo-random planes derived from hashes, so
  results are reproducible without storing plane matrices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, Window, functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_sim",
    "cosine_topk",
    "cosine_pairs",
    "cosine_pairs_ann",
    "hyperplane_bucket",
    "ann_lsh_topk",
    "knn_join",
]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double, exact order:
    left-to-right fold — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either vector has zero norm
    (ANSI-safe: no division by zero)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(None)).otherwise(
        dot(a, b) / (na * nb))


def cosine_topk(
    df: SparkDF,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> SparkDF:
    """Exact brute-force top-k by cosine vs a literal query vector.
    Ties broken by id for determinism."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        (F.floor(cosine_sim(F.col(vec_col), q) * 10000) / 10000
         ).alias("cosine"))
    return (scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
                  .limit(k))


def cosine_pairs(
    df: SparkDF,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> SparkDF:
    """Exact all-pairs cosine >= threshold (embedding near-dup).
    O(n^2) pairs — correct baseline for verification; use ``knn_join``
    / LSH for the scale path.

    Norms are computed ONCE per row below the join (not per pair), and
    the left side is spread across partitions so the nested-loop join
    parallelizes; the division dot/(na*nb) keeps the exact expression
    shape of the naive formula, so results are bit-identical to it."""
    from .dedup import spread

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                  l2_norm(F.col(vec_col)).alias("nrm"))
    a = spread(v).alias("a")
    b = v.alias("b")
    sim = F.when((F.col("a.nrm") == 0.0) | (F.col("b.nrm") == 0.0),
                 F.lit(None)).otherwise(
        dot(F.col("a.vec"), F.col("b.vec"))
        / (F.col("a.nrm") * F.col("b.nrm")))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     (F.floor(sim * 10000) / 10000).alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def cosine_pairs_ann(
    df: SparkDF,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_tables: int = 8,
    num_planes: int = 4,
    seed: int = 71,
) -> SparkDF:
    """LSH-bucketed embedding near-dup: the sub-quadratic scale path
    that replaces ``cosine_pairs``'s all-pairs nested-loop join.

    ``num_tables`` independent random-hyperplane hash tables (seeds
    ``seed + 101*t``); a pair is a candidate iff it collides in >= 1
    table. Candidates come out of a HASH JOIN on (table, bucket) —
    never a BroadcastNestedLoopJoin — then only candidates pay the
    exact cosine. Recall for a pair at angle theta is
    ``1 - (1 - (1-theta/pi)^num_planes)^num_tables`` (S-curve: ~0.99
    at cosine 0.9, ~0.65 at cosine 0.4 with the defaults).

    At 100 TB: candidates scale with bucket occupancy (corpus/2^planes
    per table), not corpus^2; the band explode is one shuffle on
    (table, bucket) and AQE handles hot buckets. ``cosine_pairs`` is
    retained as this function's exact verification oracle (recall
    measurement), not a corpus path.
    """
    from .dedup import spread

    # dims probe: first() is None on an empty frame (reachable when an
    # upstream filter drops the whole corpus) — return an empty pairs
    # frame with the right schema instead of crashing on None["d"].
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None:
        from pyspark.sql import types as T

        id_t = df.schema[id_col].dataType
        return df.sparkSession.createDataFrame([], T.StructType([
            T.StructField("id_a", id_t),
            T.StructField("id_b", id_t),
            T.StructField("cosine", T.DoubleType()),
        ]))
    dims = row["d"]
    v = spread(df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("vec"),
                         l2_norm(F.col(vec_col)).alias("nrm")))
    buckets = [hyperplane_bucket(F.col("vec"), dims, num_planes,
                                 seed + 101 * t)
               for t in range(num_tables)]
    banded = v.select("id", F.posexplode(F.array(*buckets))
                      .alias("tbl", "bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, on=[F.col("a.tbl") == F.col("b.tbl"),
                          F.col("a.bucket") == F.col("b.bucket"),
                          F.col("a.id") < F.col("b.id")])
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    va = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                  F.col("nrm").alias("na"))
    vb = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                  F.col("nrm").alias("nb"))
    sim = F.when((F.col("na") == 0.0) | (F.col("nb") == 0.0),
                 F.lit(None)).otherwise(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    return (cand.join(va, "id_a").join(vb, "id_b")
                .select("id_a", "id_b",
                        (F.floor(sim * 10000) / 10000).alias("cosine"))
                .filter(F.col("cosine") >= threshold))


def _plane_component(p: int, d: int, seed: int = 71) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1),
    derived from a splitmix64-style integer mix of (p, d) — identical
    on driver and in any engine, no RNG state."""
    x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + seed) & (2**64 - 1)
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & (2**64 - 1)
    x ^= x >> 31
    return (x / 2**63) - 1.0


def hyperplane_bucket(vec_col: Column, dims: int, num_planes: int = 12,
                      seed: int = 71) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec . plane_p).
    Planes are literal arrays (broadcast as constants into codegen),
    generated deterministically from (plane, dim) hashes."""
    bucket = F.lit(0).cast("bigint")
    for p in range(num_planes):
        plane = [_plane_component(p, d, seed) for d in range(dims)]
        proj = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(c) for c in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def ann_lsh_topk(
    df: SparkDF,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 12,
    seed: int = 71,
) -> SparkDF:
    """Approximate top-k: restrict the exact scoring to vectors whose
    hyperplane bucket is within Hamming distance 1 of the query's
    bucket (probing 1+num_planes buckets). Recall/latency knob =
    num_planes. Partition pruning applies when the table is written
    bucketed/partitioned by the bucket id."""
    dims = len(query_vec)
    qbits = 0
    for p in range(num_planes):
        plane = [_plane_component(p, d, seed) for d in range(dims)]
        if sum(q * c for q, c in zip(query_vec, plane)) >= 0:
            qbits |= 1 << p
    probe = [qbits] + [qbits ^ (1 << p) for p in range(num_planes)]
    bucketed = df.withColumn(
        "__cps_bucket",
        hyperplane_bucket(F.col(vec_col), dims, num_planes, seed))
    cand = bucketed.filter(F.col("__cps_bucket").isin(probe))
    return cosine_topk(cand.drop("__cps_bucket"), vec_col, id_col,
                       query_vec, k)


def knn_join(
    left: SparkDF,
    right: SparkDF,
    vec_col: str,
    id_col: str,
    k: int = 5,
    num_planes: int = 8,
    exact: bool = False,
    seed: int = 71,
) -> SparkDF:
    """k nearest neighbors in ``right`` for every row of ``left``.

    exact=True: block-nested-loop (crossJoin) + windowed top-k — the
    O(n*m) baseline. exact=False: co-bucket by random hyperplanes
    first, so only same-bucket pairs are scored (approximate; at scale
    the bucket join replaces the cross join with a hash join on the
    bucket id)."""
    from .dedup import spread

    lv = spread(left.select(F.col(id_col).alias("qid"),
                            F.col(vec_col).alias("qv"),
                            l2_norm(F.col(vec_col)).alias("qn")))
    rv = right.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
                      l2_norm(F.col(vec_col)).alias("nn"))
    dims_row = (None if exact
                else left.select(F.size(vec_col).alias("d")).first())
    if exact or dims_row is None or dims_row["d"] is None:
        # empty left side: the cross join is trivially empty and needs
        # no dims probe, and it preserves the output schema exactly
        pairs = lv.crossJoin(rv)
    else:
        dims = dims_row["d"]
        lb = lv.withColumn("b", hyperplane_bucket(F.col("qv"), dims,
                                                  num_planes, seed))
        rb = rv.withColumn("b", hyperplane_bucket(F.col("nv"), dims,
                                                  num_planes, seed))
        pairs = lb.join(rb, "b").drop("b")
    pairs = pairs.filter(F.col("qid") != F.col("nid"))
    sim = F.when((F.col("qn") == 0.0) | (F.col("nn") == 0.0),
                 F.lit(None)).otherwise(
        dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    scored = pairs.select(
        "qid", "nid", (F.floor(sim * 10000) / 10000).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
