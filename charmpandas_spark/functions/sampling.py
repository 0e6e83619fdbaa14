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
           "stratified_sample", "mixture_sample", "mixture_sample_sql",
           "mixture_token_budget", "mixture_token_budget_sql",
           "negative_sample", "negative_sample_sql",
           "weighted_sample", "weighted_sample_sql"]

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


def mixture_sample(
    df: SparkDF,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> SparkDF:
    """Data-mixture downsampling: per-group keep rates — the
    "source weights" step of assembling a training mixture (e.g.
    web 10%, books 100%, code 50%). Same determinism contract as
    ``hash_sample`` (stable across runs/partitionings/engines), and
    the same zero-shuffle plan: the per-group cut resolves through a
    literal map (``try_element_at`` — no join, rides the scan), so
    re-weighting a 10^11-row corpus is a scan-speed filter.

    Groups absent from ``rates`` keep ``default_rate`` of their rows.
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    cuts = F.map_from_arrays(
        F.array(*[F.lit(str(g)) for g in rates]),
        F.array(*[F.lit(int(round(r * _BUCKETS)))
                  for r in rates.values()]))
    cut = F.coalesce(
        F.try_element_at(cuts, F.col(group_col).cast("string")),
        F.lit(int(round(default_rate * _BUCKETS))))
    return df.filter(hash_bucket(F.col(key_col), seed, hash_fn) < cut)


def mixture_sample_sql(group_expr: str, key_expr: str,
                       rates: dict[str, float],
                       default_rate: float = 1.0,
                       seed: int = 0) -> str:
    """DuckDB twin of ``mixture_sample(..., hash_fn='md5')``: a WHERE
    predicate string (caller wraps in SELECT)."""
    from .dedup import hash64_sql

    cut = f"{int(round(default_rate * _BUCKETS))}"
    for g, r in reversed(list(rates.items())):
        cut = (f"CASE WHEN CAST({group_expr} AS VARCHAR) = '{g}' "
               f"THEN {int(round(r * _BUCKETS))} ELSE {cut} END")
    h = hash64_sql(f"CAST({key_expr} AS VARCHAR)", str(seed))
    bucket = (f"((({h}) % {_BUCKETS}) + {_BUCKETS}) % {_BUCKETS}")
    return f"({bucket}) < ({cut})"


def negative_sample(
    df: SparkDF,
    id_col: str,
    k: int = 4,
    buckets: int = 64,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> SparkDF:
    """Deterministic random negatives for contrastive training: for
    each anchor row and slot i in [0, k), pick one pseudo-random
    OTHER row — ``(anchor_id, slot, neg_id)``. (Semantic HARD
    negatives are the complement: ``similarity.knn_join`` top-k.)

    Mechanism (no contiguous-id assumption, no global sort, no
    driver state): candidates hash once into ``buckets`` buckets;
    each (anchor, slot) probes bucket ``hash(anchor#slot) % buckets``
    and takes the candidate minimizing ``(hash(anchor#slot#cand),
    cand)``, excluding the anchor itself. One hash join on the
    bucket key plus one map-side-combinable min-of-struct aggregate
    — both shuffle-bounded by n*k, never n^2.

    Size ``buckets`` ~ corpus/64: join fan-out per (anchor, slot) is
    n/buckets candidates. A slot whose probed bucket holds no other
    row emits nothing (probability (1 - 1/buckets)^(n-1) — negligible
    when buckets << n; document the contract, don't hide it).
    """
    from .dedup import hash64

    if k < 1 or buckets < 1:
        raise ValueError("k and buckets must be >= 1")
    a = F.col("anchor_id").cast("string")
    slots = df.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("slot"))
    probe = F.pmod(
        hash64(F.concat(a, F.lit("#"), F.col("slot").cast("string")),
               seed, hash_fn), F.lit(buckets))
    slots = slots.withColumn("__cps_pb", probe)
    cands = df.select(
        F.col(id_col).alias("__cps_cand"),
        F.pmod(hash64(F.col(id_col).cast("string"), seed + 1, hash_fn),
               F.lit(buckets)).alias("__cps_cb"))
    joined = slots.join(cands, F.col("__cps_pb") == F.col("__cps_cb")) \
                  .filter(F.col("__cps_cand") != F.col("anchor_id"))
    tie = hash64(
        F.concat(a, F.lit("#"), F.col("slot").cast("string"),
                 F.lit("#"), F.col("__cps_cand").cast("string")),
        seed + 2, hash_fn)
    return (joined.groupBy("anchor_id", "slot")
            .agg(F.min(F.struct(tie.alias("h"),
                                F.col("__cps_cand").alias("c")))
                 .alias("__m"))
            .select("anchor_id", "slot",
                    F.col("__m.c").alias("neg_id")))


def negative_sample_sql(t: str, id_expr: str, k: int = 4,
                        buckets: int = 64, seed: int = 0) -> str:
    """DuckDB twin of ``negative_sample(..., hash_fn='md5')``."""
    from .dedup import hash64_sql

    def pmod(e: str) -> str:
        return f"(((({e}) % {buckets}) + {buckets}) % {buckets})"

    slot_vals = ", ".join(f"({i})" for i in range(k))
    a = "CAST(s.anchor_id AS VARCHAR)"
    probe = pmod(hash64_sql(
        f"concat({a}, '#', CAST(s.slot AS VARCHAR))", str(seed)))
    cb = pmod(hash64_sql(f"CAST(c.cand AS VARCHAR)", str(seed + 1)))
    tie = hash64_sql(
        f"concat({a}, '#', CAST(s.slot AS VARCHAR), '#', "
        f"CAST(c.cand AS VARCHAR))", str(seed + 2))
    return f"""
        SELECT anchor_id, slot, neg_id FROM (
            SELECT s.anchor_id, s.slot, c.cand AS neg_id,
                   row_number() OVER (
                       PARTITION BY s.anchor_id, s.slot
                       ORDER BY {tie}, c.cand) AS rn
            FROM (SELECT {id_expr} AS anchor_id, v.slot
                  FROM {t}, (VALUES {slot_vals}) v(slot)) s
            JOIN (SELECT {id_expr} AS cand FROM {t}) c
              ON {probe} = {cb}
            WHERE c.cand <> s.anchor_id) WHERE rn = 1
    """


def weighted_sample(
    df: SparkDF,
    group_col: str,
    key_col: str,
    weight_col: str,
    n_per_group: int,
    max_weight: int = 64,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> SparkDF:
    """Deterministic WEIGHTED sampling without replacement, per group:
    the n rows per group most favored by an integer-ticket race —
    how a curation pipeline over-samples high-quality documents
    (weight = quality score, recency tier, dup count) while staying
    reproducible across runs, partitionings, and engines.

    Mechanism (min-of-w-hashes race, the integer-exact cousin of
    Efraimidis-Spirakis A-ES): each row draws ``w`` independent
    64-bit hash "tickets" (``hash(key#1) .. hash(key#w)``, ``w`` =
    its weight clamped to [1, max_weight]) and its race key is the
    MINIMUM ticket; the per-group winners are the ``n_per_group``
    smallest (race key, key) pairs. Since the minimum of ``w`` iid
    uniforms stochastically dominates by ``w``, the first pick lands
    on row i with probability exactly ``w_i / sum(w)`` (64-bit
    collisions aside), and subsequent ranks follow the same
    exhaustion race — a bona-fide weighted sample, with ZERO float
    arithmetic (A-ES's ``u^(1/w)`` pow is libm-specific; integer
    hash minima are bit-identical everywhere).

    Plan: the ticket array is a scan-local ``transform(sequence(...))``
    expression — no explode, no extra rows; then one hash-partition
    on ``group_col`` with a windowed top-k (map-side rank pruning
    under AQE). Cost is ``O(rows * avg_weight)`` hash evaluations at
    scan speed; ``max_weight`` bounds the per-row work, so a
    malicious 10^9 weight cannot stall a task."""
    from pyspark.sql import Window

    if n_per_group < 1 or max_weight < 1:
        raise ValueError("n_per_group and max_weight must be >= 1")
    k = F.col(key_col).cast("string")
    # coalesce FIRST: least/greatest skip NULLs in both engines, so a
    # NULL weight would otherwise clamp UP to max_weight tickets
    w = F.greatest(F.least(F.coalesce(F.col(weight_col).cast("int"),
                                      F.lit(1)),
                           F.lit(max_weight)), F.lit(1))
    race = F.array_min(F.transform(
        F.sequence(F.lit(1), w),
        lambda t: hash64(F.concat(k, F.lit("#"), t.cast("string")),
                         seed, hash_fn)))
    win = (Window.partitionBy(group_col)
           .orderBy(F.col("__cps_race").asc(), F.col(key_col).asc()))
    return (df.withColumn("__cps_race", race)
              .withColumn("__cps_rk", F.row_number().over(win))
              .filter(F.col("__cps_rk") <= n_per_group)
              .drop("__cps_race", "__cps_rk"))


def weighted_sample_sql(t: str, group_expr: str, key_expr: str,
                        weight_expr: str, n_per_group: int,
                        max_weight: int = 64, seed: int = 0,
                        cols: str = "*") -> str:
    """DuckDB twin of ``weighted_sample(..., hash_fn='md5')``."""
    from .dedup import hash64_sql

    w = (f"greatest(least(COALESCE(CAST({weight_expr} AS INT), 1), "
         f"{max_weight}), 1)")
    h = hash64_sql(
        f"concat(CAST({key_expr} AS VARCHAR), '#', CAST(t AS VARCHAR))",
        str(seed))
    race = f"list_min(list_transform(range(1, {w} + 1), t -> {h}))"
    return f"""
        SELECT {cols} FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY {group_expr}
                       ORDER BY ({race}) ASC, {key_expr} ASC) AS __rk
            FROM {t})
        WHERE __rk <= {n_per_group}
    """


def mixture_token_budget(
    df: SparkDF,
    group_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> SparkDF:
    """Assemble a training mixture by PER-SOURCE TOKEN BUDGETS rather
    than keep rates: within each group, documents are taken in
    deterministic hash order until the group's cumulative token count
    reaches its budget (the first budget-crossing document is
    included, so every group with data makes progress; groups without
    a budget pass through whole). How real mixtures are specified —
    "300B web tokens, 50B code" — and reproducible across runs,
    partitionings, and engines because the order is a pure key hash.

    Plan: one window per group (hash-order cumulative sum) + a
    scan-local filter. Parallelism = groups; a mixture has tens of
    sources, each window a spill-able sorted run — for a SINGLE
    gigantic source, pre-shard it (compose with ``hash_sample``) or
    use the ``text.pack_sequences`` distributed-prefix-sum machinery;
    this form is the oracle-checkable anchor."""
    from pyspark.sql import Window

    h = hash_bucket(F.col(key_col), seed, hash_fn)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc())
    cum = F.sum(F.col(token_col)).over(w)
    gname = F.col(group_col).cast("string")
    budget = F.map_from_arrays(
        F.array(*[F.lit(str(g)) for g in budgets]),
        F.array(*[F.lit(int(b)) for b in budgets.values()]))
    b = F.try_element_at(budget, gname)
    # window expressions can't sit in a filter — materialize the
    # cumulative sum first, then filter on the projected column
    prev = F.col("__cps_cum") - F.col(token_col)
    return (df.withColumn("__cps_cum", cum)
              .filter(b.isNull() | (prev < b))
              .drop("__cps_cum"))


def mixture_token_budget_sql(t: str, group_expr: str, key_expr: str,
                             token_expr: str, budgets: dict[str, int],
                             seed: int = 0, cols: str = "*") -> str:
    """DuckDB twin of ``mixture_token_budget(..., hash_fn='md5')``."""
    from .dedup import hash64_sql

    h = hash64_sql(f"CAST({key_expr} AS VARCHAR)", str(seed))
    bucket = f"((({h}) % {_BUCKETS}) + {_BUCKETS}) % {_BUCKETS}"
    budget = "NULL"
    for g, b in reversed(list(budgets.items())):
        budget = (f"CASE WHEN CAST({group_expr} AS VARCHAR) = '{g}' "
                  f"THEN {int(b)} ELSE {budget} END")
    return f"""
        SELECT {cols} FROM (
            SELECT *, ({budget}) AS __b,
                   sum({token_expr}) OVER (
                       PARTITION BY {group_expr}
                       ORDER BY ({bucket}) ASC, {key_expr} ASC
                       ROWS UNBOUNDED PRECEDING)
                   - ({token_expr}) AS __prev
            FROM {t})
        WHERE __b IS NULL OR __prev < __b
    """
