"""Deterministic, distributed sampling and dataset splitting.

Beyond the reference surface (it has no sampling at all). A training
pipeline needs REPRODUCIBLE samples and train/val/test assignment:
``df.sample``'s per-partition RNG changes with partitioning, retries,
and engine version, so instead rows are assigned by hashing a stable
key — the same row lands in the same bucket on any cluster, any day,
any engine that implements the hash.

Scale design: pure per-row expressions (no shuffle, no state, no
driver involvement); codegen'd end-to-end; composes with pushdown
(the hash filter rides along the scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from .dedup import hash64

__all__ = ["hash_bucket", "hash_sample", "assign_splits",
           "stratified_sample"]

#: buckets per unit of rate (rate resolution 0.01%)
_BUCKETS = 10_000


def hash_bucket(key: Column, seed: int = 0,
                hash_fn: str = "xxhash64") -> Column:
    """Stable bucket in [0, 10000) from a key column. ``md5`` variant
    is bit-identical in DuckDB (cross-engine verifiable); xxhash64 is
    the cheap production default."""
    return F.pmod(hash64(key.cast("string"), seed, hash_fn),
                  F.lit(_BUCKETS))


def hash_sample(df: SparkDF, key_col: str, rate: float, seed: int = 0,
                hash_fn: str = "xxhash64") -> SparkDF:
    """Deterministic ~``rate`` sample: keep rows whose key-hash bucket
    falls below ``rate * 10000``. Same keys are always co-sampled
    (stable across runs/engines/partitionings), which also makes the
    sample consistent across tables sharing the key."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    cut = int(round(rate * _BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), seed, hash_fn) < cut)


def assign_splits(
    df: SparkDF,
    key_col: str,
    weights: dict[str, float],
    seed: int = 0,
    hash_fn: str = "xxhash64",
    out_col: str = "split",
) -> SparkDF:
    """Add a train/val/test-style ``split`` label by hash range.

    ``weights`` maps label -> fraction (must sum to ~1; ranges are
    cumulative in the given insertion order, so the assignment is
    fully specified by (weights, seed)). Every row keeps its label
    forever — new data appended later cannot reshuffle old rows.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    bucket = hash_bucket(F.col(key_col), seed, hash_fn)
    expr = None
    lo = 0
    for label, w in weights.items():
        hi = lo + int(round(w * _BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None \
            else expr.when(cond, F.lit(label))
        lo = hi
    return df.withColumn(out_col, expr.otherwise(F.lit(list(weights)[-1])))


def stratified_sample(
    df: SparkDF,
    group_col: str,
    key_col: str,
    n_per_group: int,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> SparkDF:
    """Deterministic fixed-size per-group sample: the ``n_per_group``
    rows with the smallest (key-hash, key) per group — balanced
    class/domain/source subsets (eval sets, per-domain quality
    probes) that are REPRODUCIBLE across runs, partitionings, and
    engines, unlike ``sampleBy``'s RNG.

    The hash order is uniform-pseudorandom in the key, so this is a
    bona-fide uniform sample per group; the key tiebreak makes it
    total. One shuffle (hash-partition by group); per-group work is
    a partial top-k (the window's rank prunes map-side under AQE) —
    no group ever needs to fit anywhere whole except its top-k.
    """
    from pyspark.sql import Window

    h = hash64(F.col(key_col).cast("string"), seed, hash_fn)
    w = (Window.partitionBy(group_col)
         .orderBy(h.asc(), F.col(key_col).asc()))
    return (df.withColumn("__cps_rk", F.row_number().over(w))
              .filter(F.col("__cps_rk") <= n_per_group)
              .drop("__cps_rk"))
