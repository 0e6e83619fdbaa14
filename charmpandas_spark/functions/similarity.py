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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame as SparkDF, Window, functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_sim",
    "cosine_topk",
    "cosine_pairs",
    "cosine_pairs_ann",
    "cosine_pairs_ann_cross",
    "hyperplane_bucket",
    "hyperplane_buckets_batch",
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


def _null_element_masked(vec: Column) -> Column:
    """Map vectors containing a null ELEMENT to null (whole vector),
    so the Arrow-batched bucket kernel — where Arrow has already
    collapsed null elements to NaN — still reproduces the JVM fold's
    null propagation (bucket 0) instead of the NaN all-ones bucket.
    One cheap HOF pass per row, JVM-side."""
    return F.when(F.exists(vec, lambda e: e.isNull()),
                  F.lit(None)).otherwise(vec)


_P_MAX_AUTO = 24  # auto-tune bucket width cap: exact to 2^27-row corpora


def _mask_auto_planes(banded: SparkDF, corpus: SparkDF) -> SparkDF:
    """Apply the auto ``num_planes`` formula IN-PLAN: ride the corpus
    count along as a 1-row broadcast (scale-free BNLJ, same pattern as
    dedup's ``_lazy_auto_cap``) and keep the first
    ``p = min(max(8, ceil(log2(n)) - 3), _P_MAX_AUTO)`` planes of each
    ``_P_MAX_AUTO``-plane bucket via ``bucket mod 2^p`` (planes are
    ordered LSB-first, so the modulus IS the p-plane bucket).
    ``pow(2, p)`` is float but exact far beyond p=24. No job runs at
    construction."""
    cnt = corpus.agg(F.count(F.lit(1)).alias("__cps_n"))
    p = F.least(
        F.greatest(
            F.lit(8),
            (F.ceil(F.log2(F.greatest(F.col("__cps_n").cast("double"),
                                      F.lit(2.0)))) - F.lit(3))
            .cast("int")),
        F.lit(_P_MAX_AUTO))
    return (banded.crossJoin(F.broadcast(cnt))
                  .withColumn("bucket",
                              F.pmod(F.col("bucket"),
                                     F.pow(F.lit(2.0), p).cast("bigint")))
                  .drop("__cps_n"))


def _probe_dims(df: SparkDF, vec_col: str) -> int | None:
    """Vector dimensionality of the first non-null vector, or None if
    the frame is empty / all vectors are null.

    ``first()`` alone is not enough: on a NON-empty frame whose first
    row happens to hold a null vector, ``F.size(null)`` is null in
    Spark 3+ and the caller would mistake real data for an empty
    corpus (ADVICE r3). Re-probe the non-null subset before giving up.
    """
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is not None and row["d"] is None:
        row = (df.filter(F.col(vec_col).isNotNull())
                 .select(F.size(vec_col).alias("d")).first())
    return None if row is None else row["d"]


def cosine_pairs_ann(
    df: SparkDF,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_tables: int = 12,
    num_planes: int | None = None,
    seed: int = 71,
) -> SparkDF:
    """LSH-bucketed embedding near-dup: the sub-quadratic scale path
    that replaces ``cosine_pairs``'s all-pairs nested-loop join.

    ``num_tables`` independent random-hyperplane hash tables (seeds
    ``seed + 101*t``); a pair is a candidate iff it collides in >= 1
    table. Candidates come out of a HASH JOIN on (table, bucket) —
    never a BroadcastNestedLoopJoin — then only candidates pay the
    exact cosine. Recall for a pair at angle theta is
    ``1 - (1 - (1-theta/pi)^num_planes)^num_tables``; at 12 tables x
    8 planes: ~0.98 at cosine 0.9, ~0.88 at 0.8, ~0.38 at 0.5. An
    unrelated (orthogonal-ish) pair becomes a candidate w.p.
    ~num_tables/2^num_planes (~4.7% at 8 planes), vs ~40% at the old
    8x4 defaults — per-table selectivity is what keeps the candidate
    set sub-quadratic; tables buy recall back at high cosine, where
    near-dups live.

    ``num_planes=None`` (default) self-tunes to the corpus:
    ``max(8, ceil(log2(n)) - 3)``, i.e. ~8+ rows per bucket per
    table, so the candidate count grows ~LINEARLY with corpus size
    (fixed planes would grow it quadratically — the per-pair
    collision rate is constant). n <= ~2^11 resolves to 8 planes, so
    small-corpus results (and their oracles) are stable; beyond that
    each corpus doubling adds a plane. r6: the corpus count resolves
    IN-PLAN (a 1-row broadcast ride-along, like dedup's
    ``_lazy_auto_cap``): the UDF emits ``_P_MAX_AUTO``-plane buckets
    and the bucket key is the first-``p``-planes prefix
    (``bucket mod 2^p`` — plane components don't depend on the plane
    COUNT, so the prefix equals the p-plane bucket bit-for-bit).
    Construction triggers zero jobs; beyond 2^27 rows the auto path
    caps at ``_P_MAX_AUTO`` planes (pass explicit ``num_planes`` at
    that scale).

    At 100 TB: candidates scale with bucket occupancy (corpus/2^planes
    per table), not corpus^2; the band explode is one shuffle on
    (table, bucket) and AQE handles hot buckets. ``v`` (vec + norm)
    and the banded index feed 3+ plan branches (candidate self-join +
    both verify joins), so both are pinned MEMORY_AND_DISK — without
    this every branch recomputes num_tables*num_planes 64-dim
    projection folds per row (HOF re-evaluation, the round-3 19.9 s
    regression). Call ``dedup.release(out)`` to free them.
    ``cosine_pairs`` is retained as this function's exact verification
    oracle (recall measurement), not a corpus path.
    """
    from pyspark import StorageLevel

    from .dedup import spread

    v = spread(df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("vec"),
                         l2_norm(F.col(vec_col)).alias("nrm"))) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    buckets = hyperplane_buckets_batch(
        None, num_tables,
        _P_MAX_AUTO if num_planes is None else num_planes, seed)
    # null(-element) vectors can only yield null cosine — keep them
    # out of the index so an all-null corpus can't pile up in bucket 0
    banded = (v.withColumn("__mv", _null_element_masked(F.col("vec")))
               .filter(F.col("__mv").isNotNull())
               .select("id", F.posexplode(buckets(F.col("__mv")))
                       .alias("tbl", "bucket")))
    if num_planes is None:
        banded = _mask_auto_planes(banded, df)
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
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
    out = (cand.join(va, "id_a").join(vb, "id_b")
               .select("id_a", "id_b",
                       (F.floor(sim * 10000) / 10000).alias("cosine"))
               .filter(F.col("cosine") >= threshold))
    out._cps_persisted = [v, banded]  # see dedup.release()
    return out


def cosine_pairs_ann_cross(
    df_a: SparkDF,
    df_b: SparkDF,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_tables: int = 12,
    num_planes: int | None = None,
    seed: int = 71,
) -> SparkDF:
    """Cross-corpus embedding near-dup — train/test LEAKAGE detection
    at the embedding level: pairs (one row from ``df_a``, one from
    ``df_b``) with cosine >= ``threshold``, found via the same banded
    hyperplane index as :func:`cosine_pairs_ann` but with candidates
    restricted to pairs that SPAN the corpora (within-corpus dupes are
    ``cosine_pairs_ann``'s job). The text-level twin is
    ``dedup.cross_corpus_pairs``; this catches paraphrase-level leaks
    that survive shingle dedup.

    No id-ordering constraint: ids may overlap between corpora (an
    identical id on both sides is a genuine leak and is reported).
    One banded index build over the union (side-tagged), one hash
    join on (table, bucket) with ``a.side < b.side``, exact cosine on
    candidates — same sub-quadratic shape and persist/release
    contract as the within-corpus path.
    """
    from pyspark import StorageLevel

    from .dedup import spread

    tag = (df_a.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("vec"))
               .withColumn("side", F.lit(0))
               .unionByName(
                   df_b.select(F.col(id_col).alias("id"),
                               F.col(vec_col).alias("vec"))
                       .withColumn("side", F.lit(1))))
    v = spread(tag.withColumn("nrm", l2_norm(F.col("vec")))) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    buckets = hyperplane_buckets_batch(
        None, num_tables,
        _P_MAX_AUTO if num_planes is None else num_planes, seed)
    banded = (v.withColumn("__mv", _null_element_masked(F.col("vec")))
               .filter(F.col("__mv").isNotNull())
               .select("id", "side",
                       F.posexplode(buckets(F.col("__mv")))
                       .alias("tbl", "bucket")))
    if num_planes is None:
        # auto planes over the UNION's row count (both corpora)
        banded = _mask_auto_planes(banded, tag)
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.filter(F.col("side") == 0).alias("a")
    b = banded.filter(F.col("side") == 1).alias("b")
    cand = (a.join(b, on=[F.col("a.tbl") == F.col("b.tbl"),
                          F.col("a.bucket") == F.col("b.bucket")])
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    va = v.filter(F.col("side") == 0).select(
        F.col("id").alias("id_a"), F.col("vec").alias("vcta"),
        F.col("nrm").alias("na"))
    vb = v.filter(F.col("side") == 1).select(
        F.col("id").alias("id_b"), F.col("vec").alias("vctb"),
        F.col("nrm").alias("nb"))
    sim = F.when((F.col("na") == 0.0) | (F.col("nb") == 0.0),
                 F.lit(None)).otherwise(
        dot(F.col("vcta"), F.col("vctb")) / (F.col("na") * F.col("nb")))
    out = (cand.join(va, "id_a").join(vb, "id_b")
               .select("id_a", "id_b",
                       (F.floor(sim * 10000) / 10000).alias("cosine"))
               .filter(F.col("cosine") >= threshold))
    out._cps_persisted = [v, banded]  # see dedup.release()
    return out


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
    generated deterministically from (plane, dim) hashes.

    JVM-side HOF fold — fine for a HANDFUL of planes (the single-table
    probes: ``ann_lsh_topk``, ``knn_join``). Spark evaluates HOF
    lambdas interpreted per array element, so cost is
    ~planes x dims x rows lambda calls; for the multi-table banded
    index (tables x planes projections per row) use
    ``hyperplane_buckets_batch`` instead — same bits, Arrow-batched.
    (A straight-line ``vec[0]*c0 + ...`` expression chain is NOT an
    alternative: 96 projections x 64 dims builds a ~250k-node plan
    that Catalyst chews on for minutes.)"""
    bucket = F.lit(0).cast("bigint")
    for p in range(num_planes):
        plane = [_plane_component(p, d, seed) for d in range(dims)]
        proj = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(c) for c in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def hyperplane_buckets_batch(dims: int | None, num_tables: int,
                             num_planes: int = 8, seed: int = 71):
    """All ``num_tables`` hyperplane bucket ids in one vectorized pass:
    returns a pandas_udf (array<float> -> array<bigint>, one bucket id
    per table) for the banded ANN index, where the per-plane HOF fold
    is quadratically too slow (tables x planes folds per row,
    interpreted — the round-3 19.9 s ANN regression was 96 folds over
    2000 rows costing 8 s alone).

    Bit-parity with the fold (and with the DuckDB
    ``list_inner_product`` oracle) is preserved by accumulating in
    STRICT ascending-dimension order — ``acc += x_d * c_d`` one dim at
    a time across the whole Arrow batch — never ``np.dot``/BLAS, whose
    pairwise/SIMD summation rounds differently near a sign boundary.
    Each step is an IEEE-double elementwise FMA-free mul+add, exactly
    what the JVM fold and DuckDB compute.

    Null/ragged vectors get bucket 0 in every table, matching the
    fold's null propagation (null element -> null projection -> the
    when() falls to otherwise(0) for every plane). NaN-element
    vectors get the ALL-ONES bucket: the fold's projection is NaN,
    and Spark SQL (like DuckDB) orders NaN above every number, so
    ``proj >= 0`` is true for every plane. CAVEAT: Arrow's
    list<double> -> numpy conversion collapses null ELEMENTS to NaN
    before the kernel runs, so a vector with a null element is
    indistinguishable from a NaN one here — feed this UDF through
    :func:`_null_element_masked` (as the ANN call sites do) to map
    null-element vectors to null JVM-side first, preserving the
    fold's null-propagation semantics.

    At 100 TB: embarrassingly parallel per Arrow batch, no shuffle,
    ~dims x tables x planes flops/row in numpy — the classic
    "vectorized Pandas UDF beats interpreted per-row by 100x" path.
    Constructed lazily (module-level pandas_udf breaks executor
    unpickling: return-type parsing needs a live session).

    ``dims=None`` defers dimensionality to RUN time: each vector is
    bucketed in its OWN length's plane space, with plane matrices
    cached per dims (plane components depend only on
    (plane, dim, seed), so every worker generates identical planes).
    This removes the construction-time ``first()`` probe — building
    the ANN plan triggers ZERO jobs (r5 verdict item #6) — and, since
    a vector's buckets depend on nothing but the vector itself, the
    result is DETERMINISTIC however the corpus is partitioned or
    batched (r6 ADVICE: the earlier derive-from-first-in-batch rule
    made mixed-dim corpora partitioning-dependent). Uniform corpora
    behave identically to the probed-dims contract; on mixed corpora,
    same-length vectors share planes (can collide = candidates) while
    different-length vectors — never true cosine neighbors — hash in
    disjoint spaces. With EXPLICIT ``dims``, vectors of any other
    length still bucket to 0 (the declared-schema contract).
    """
    from pyspark.sql.functions import pandas_udf

    def _comps(d_: int) -> np.ndarray:
        return np.array(
            [[_plane_component(p, d, seed + 101 * t) for d in range(d_)]
             for t in range(num_tables) for p in range(num_planes)])

    comps = _comps(dims) if dims is not None else None
    comps_cache: dict[int, np.ndarray] = {}

    @pandas_udf("array<bigint>")
    def buckets(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = np.zeros((n, num_tables), dtype=np.int64)
        # rows grouped by their OWN dimensionality -> deterministic
        # buckets regardless of batch composition (r6 ADVICE)
        groups: dict[int, list[tuple[int, np.ndarray]]] = {}
        nan_rows: list[int] = []
        for i, v in enumerate(vecs):
            if v is None or len(v) == 0:
                continue  # null/empty -> 0 (null propagation)
            if dims is not None and len(v) != dims:
                continue  # ragged vs declared schema -> 0
            arr = np.asarray(v, dtype=np.float64)
            if np.isnan(arr).any():
                # NaN-element vectors: the fold's projection is NaN
                # and Spark SQL orders NaN ABOVE every number, so
                # `when(proj >= 0)` sets EVERY plane bit — all-ones
                # bucket, not 0 (which is only the null/ragged
                # propagation). The DuckDB oracle agrees (NaN
                # compares greatest there too).
                nan_rows.append(i)
                continue
            groups.setdefault(len(arr), []).append((i, arr))
        weights = np.left_shift(np.int64(1),
                                np.arange(num_planes, dtype=np.int64))
        for d_, rows in groups.items():
            if comps is not None:
                cm = comps
            else:
                cm = comps_cache.get(d_)
                if cm is None:
                    cm = comps_cache[d_] = _comps(d_)
            idxs = [i for i, _ in rows]
            x = np.stack([a for _, a in rows])
            acc = np.zeros((len(rows), num_tables * num_planes))
            for d in range(d_):  # strict dim order == fold's order
                acc += x[:, d:d + 1] * cm[:, d]
            bits = (acc >= 0).reshape(len(rows), num_tables, num_planes)
            out[idxs] = (bits.astype(np.int64) * weights).sum(axis=2)
        if nan_rows:
            out[nan_rows] = (1 << num_planes) - 1
        return pd.Series(list(out))

    return buckets


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
    O(n*m) baseline. UNBOUNDED: corpus-scale callers must bound the
    query side first (the registered ``sim_knn_join`` query
    hash-samples ``left`` to 25% — the same deterministic-sample
    contract as ``dedup_embedding_cosine``). exact=False: co-bucket by
    random hyperplanes first, so only same-bucket pairs are scored
    (approximate; at scale the bucket join replaces the cross join
    with a hash join on the bucket id)."""
    from .dedup import spread

    lv = spread(left.select(F.col(id_col).alias("qid"),
                            F.col(vec_col).alias("qv"),
                            l2_norm(F.col(vec_col)).alias("qn")))
    rv = right.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
                      l2_norm(F.col(vec_col)).alias("nn"))
    dims = None if exact else _probe_dims(left, vec_col)
    if dims is None:
        # exact mode, or an empty/all-null left side: the cross join
        # is trivially empty in the latter case and needs no dims
        # probe, and it preserves the output schema exactly
        pairs = lv.crossJoin(rv)
    else:
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
