"""Greedy k-center coreset selection (Gonzalez 1985; the "k-Center
Greedy" of Sener & Savarese 2018's active-learning coreset) — pick
the k points that best COVER an embedding corpus, i.e. iteratively
take the point farthest from everything chosen so far.

This is the data-selection primitive for "diverse subset" jobs:
seeding labeling budgets, picking prototype documents per corpus,
initializing codebooks, and building the farthest-point subsets that
dataset-distillation methods start from. It is a 2-approximation to
the optimal k-center cover — the classic guarantee — and, unlike
uniform sampling, it never leaves a dense far-away mode uncovered.

EXACT + deterministic, per repo doctrine: vectors quantize to integer
units (``floor(x·scale)``, the kmeans convention), all distances are
int64 sums of squared integer differences, the seed is the smallest
id, and every argmax tie-breaks to the smallest id — same selection
on any partitioning, any engine. The DuckDB oracle replays the full
greedy loop as unrolled materialized CTE chains (the kmeans-oracle
pattern, kmeans.py:179).

Scale design: each of the k−1 rounds is ONE scan-local aggregation —
the chosen centers ride into the plan as literal integer arrays (k·d
values, driver-bounded exactly like kmeans' centroid collect), the
min-distance is a codegen'd ``least`` over per-center zip_with folds,
and the round's winner is a single ``max(struct)`` aggregate (no
sort, no shuffle of the data — one partial-aggregated reduce). Total
cost: k corpus passes of pure JVM expression work. At 100 TB one
composes this with the sampled-training trick (`train_cap`, same
hash-ordered sample as kmeans) so the passes run on a bounded sample
— the guarantee degrades gracefully to the sample's cover.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from ..session import tiny_df

from .kmeans import _quantize, _train_sample, train_sample_order_sql

__all__ = ["kcenter_select", "kcenter_select_sql"]


def _dist2(vec_col: Column, center: list[int]) -> Column:
    """int64 squared distance between a quantized array column and a
    literal quantized center."""
    lit = F.array(*[F.lit(int(v)).cast("long") for v in center])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def kcenter_select(df: SparkDF, vec_col: str, id_col: str, k: int,
                   scale: int = 1000,
                   train_cap: int | None = None) -> SparkDF:
    """Select ``k`` centers by greedy farthest-point and return the
    coverage profile: ``(rank, center_id, sel_r2, n_assigned,
    max_r2)`` — selection order, the distance² at which each center
    was chosen (how uncovered its region was; 0 for the seed), and
    the post-hoc cell size / radius when every point is assigned to
    its nearest center (ties → earliest-rank center).

    ``max(max_r2)`` is the cover radius² — the quantity k-center
    minimizes; the greedy result is within 2× of optimal (Gonzalez).

    ``train_cap`` runs SELECTION on the deterministic hash-ordered
    sample (kmeans' ``_train_sample``); assignment still covers the
    full corpus in one pass.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark import StorageLevel

    q = df.select(F.col(id_col).alias("id"),
                  _quantize(vec_col, scale).alias("qv"))
    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    sel = q if train_cap is None else \
        _train_sample(q, "id", train_cap) \
        .persist(StorageLevel.MEMORY_AND_DISK)

    seed = sel.orderBy("id").limit(1).collect()
    if not seed:
        raise ValueError("empty corpus")
    centers = [(int(seed[0]["id"]), [int(v) for v in seed[0]["qv"]])]
    sel_r2 = [0]
    for _ in range(1, k):
        mind = F.least(*[_dist2(F.col("qv"), c) for _, c in centers]) \
            if len(centers) > 1 else _dist2(F.col("qv"), centers[0][1])
        # ONE bounded aggregate per round: max by (distance, then
        # SMALLEST id) — encoded as max(struct(dist, -id, vec)) so
        # ties resolve to min id and the winner's vector rides along
        # (id is unique, so the array field never gets compared)
        far = (sel.select(mind.alias("d"), F.col("id"), F.col("qv"))
                  .agg(F.max(F.struct(F.col("d"),
                                      (-F.col("id")).alias("nid"),
                                      F.col("qv"))).alias("m"))
                  .select(F.col("m.d").alias("d"),
                          (-F.col("m.nid")).alias("id"),
                          F.col("m.qv").alias("qv"))
                  .collect()[0])
        centers.append((int(far["id"]), [int(v) for v in far["qv"]]))
        sel_r2.append(int(far["d"]))

    # assignment pass over the FULL corpus: nearest center, ties to
    # the earliest rank — least(struct(dist, rank)) lexicographic
    cand = F.array(*[
        F.struct(_dist2(F.col("qv"), c).alias("d"),
                 F.lit(r).cast("int").alias("rank"))
        for r, (_, c) in enumerate(centers)])
    best = F.array_min(cand)
    assigned = (q.select(best.getField("rank").alias("rank"),
                         best.getField("d").alias("d"))
                 .groupBy("rank")
                 .agg(F.count(F.lit(1)).alias("n_assigned"),
                      F.max("d").alias("max_r2")))
    meta = tiny_df(
        df.sparkSession,
        [(r, cid, s) for r, ((cid, _), s)
         in enumerate(zip(centers, sel_r2))],
        "rank int, center_id long, sel_r2 long")
    out = (meta.join(assigned, "rank", "left")
               .select("rank", "center_id", "sel_r2",
                       F.coalesce("n_assigned", F.lit(0))
                        .cast("long").alias("n_assigned"),
                       F.coalesce("max_r2", F.lit(0)).cast("long")
                        .alias("max_r2")))
    out._cps_persisted = [q] + ([sel] if sel is not q else [])
    return out


def kcenter_select_sql(t: str, vec_expr: str, id_expr: str, dim: int,
                       k: int, scale: int = 1000,
                       train_cap: int | None = None) -> str:
    """DuckDB replay of :func:`kcenter_select`: the same
    quantization, seed, per-round argmax (DESC distance, ASC id), and
    final nearest-center assignment, as unrolled MATERIALIZED CTEs —
    one ``c{i}`` centers table per greedy round (without MATERIALIZED
    DuckDB inlines the chain and the plan explodes exponentially:
    measured 191 s -> <1 s at sf0.01; same lesson as the k-core
    oracle, operators/graph.py:135)."""
    qcols = ", ".join(
        f"CAST(FLOOR(CAST({vec_expr}[{d + 1}] AS DOUBLE) * {scale}) "
        f"AS BIGINT) AS q{d}" for d in range(dim))
    dist = " + ".join(
        f"(q.q{d} - c.q{d}) * (q.q{d} - c.q{d})" for d in range(dim))
    parts = []
    sel_src = t
    if train_cap is not None:
        parts.append(
            f"ktrain AS MATERIALIZED (SELECT * FROM {t} ORDER BY "
            f"{train_sample_order_sql(id_expr)} LIMIT {train_cap})")
        sel_src = "ktrain"
    parts.append(
        f"qf AS MATERIALIZED (SELECT {id_expr} AS id, {qcols} FROM {t})")
    parts.append(
        f"q AS MATERIALIZED (SELECT {id_expr} AS id, {qcols} FROM {sel_src})")
    qlist = ", ".join(f"q{d}" for d in range(dim))
    qqual = ", ".join(f"q.q{d}" for d in range(dim))
    parts.append(
        f"c0 AS MATERIALIZED (SELECT 0 AS rank, id, CAST(0 AS BIGINT) AS sel_r2, "
        f"{qlist} FROM (SELECT * FROM q ORDER BY id LIMIT 1))")
    for i in range(1, k):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT q.id, min({dist}) AS d "
            f"FROM q CROSS JOIN c{i - 1} c GROUP BY q.id)")
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT id, d FROM d{i} "
            f"ORDER BY d DESC, id ASC LIMIT 1)")
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT * FROM c{i - 1} UNION ALL "
            f"SELECT {i} AS rank, q.id, p.d AS sel_r2, {qqual} "
            f"FROM q JOIN p{i} p ON q.id = p.id)")
    last = f"c{k - 1}"
    return f"""
        WITH {', '.join(parts)},
        assign AS (
            SELECT q.id, c.rank AS rank, {dist} AS d,
                   row_number() OVER (PARTITION BY q.id
                                      ORDER BY {dist}, c.rank) AS rn
            FROM qf q CROSS JOIN {last} c),
        cells AS (
            SELECT rank, CAST(count(*) AS BIGINT) AS n_assigned,
                   CAST(max(d) AS BIGINT) AS max_r2
            FROM assign WHERE rn = 1 GROUP BY rank)
        SELECT c.rank, c.id AS center_id, c.sel_r2,
               COALESCE(l.n_assigned, 0) AS n_assigned,
               COALESCE(l.max_r2, 0) AS max_r2
        FROM {last} c LEFT JOIN cells l ON c.rank = l.rank
    """
