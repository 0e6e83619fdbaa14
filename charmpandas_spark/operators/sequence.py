"""Event-sequence operators: Markov transition models, forward-fill
(LOCF) imputation, and temporal train/test splitting with an embargo
gap.

Beyond the reference surface — these are the sequence/time-series
primitives a behavioral-model or forecasting pipeline needs on top of
the relational core:

- :func:`markov_transitions` learns a first-order next-event model
  (the classic clickstream transition matrix) — the "what do users do
  after X" primitive behind next-action prediction features and
  Markov-chain attribution.
- :func:`locf_fill` is pandas ``ffill`` re-expressed as one keyed
  window pass (last-observation-carried-forward), the standard
  imputation for sensor/metric gaps.
- :func:`temporal_split_embargo` is the leakage-safe TIME split: a
  quantile cutoff with a purge gap so that no training row lies
  within the embargo horizon of the test period — the standard
  protocol when features contain windowed lookbacks (a 7-day rolling
  feature computed at cutoff−1h has seen test-period data; the
  embargo removes exactly that contamination).

All three follow the repo's exactness doctrine: event ordering is the
total order ``(ts, id)``; probabilities are floored integer
micro-units; the quantile cutoff interpolates only over integer
micros. Scale: the windows partition by a HIGH-cardinality key
(user/series), so parallelism grows with the data; everything else is
grouped aggregation or scan-local projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

from ..timestamps import epoch_micros

__all__ = [
    "markov_transitions", "markov_transitions_sql",
    "top_sequences", "top_sequences_sql",
    "locf_fill", "locf_fill_sql",
    "temporal_split_embargo", "temporal_split_embargo_sql",
    "purged_kfold", "purged_kfold_sql",
]

MICRO = 1_000_000


# ---------------------------------------------------------------------------
# first-order Markov transition model
# ---------------------------------------------------------------------------

def markov_transitions(df: SparkDF, key_col: str, ts_col: str,
                       id_col: str, state_col: str) -> SparkDF:
    """Per-(src → dst) transition counts and probabilities over each
    key's event sequence: ``(src, dst, n, p_micro)`` where
    ``p_micro = (1e6·n) div Σ_dst n`` (rows out of ``src``).

    Sequences are ordered by the total order ``(ts, id)`` within each
    key; the last event of a key emits no transition. One keyed
    window pass (lead) + one grouped count + a src-cardinality
    broadcast join for the denominators — the data shuffles once on
    the key and once on (src, dst), both bounded-state aggregations.
    """
    w = Window.partitionBy(key_col).orderBy(
        epoch_micros(ts_col), F.col(id_col))
    pairs = (df.select(key_col, id_col, ts_col,
                       F.col(state_col).alias("src"),
                       F.lead(state_col).over(w).alias("dst"))
               .where(F.col("dst").isNotNull()))
    counts = (pairs.groupBy("src", "dst")
                   .agg(F.count(F.lit(1)).alias("n")))
    totals = counts.groupBy("src").agg(F.sum("n").alias("__tot"))
    return (counts.join(F.broadcast(totals), "src")
            .select("src", "dst", "n",
                    F.expr(f"({MICRO} * n) div __tot").alias("p_micro")))


def markov_transitions_sql(t: str, key_expr: str, ts_expr: str,
                           id_expr: str, state_expr: str) -> str:
    """DuckDB twin (identical (ts, id) total order and floored
    micro-probabilities)."""
    return f"""
        WITH seq AS (
            SELECT {state_expr} AS src,
                   lead({state_expr}) OVER (
                       PARTITION BY {key_expr}
                       ORDER BY {ts_expr}, {id_expr}) AS dst
            FROM {t}),
        cnt AS (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
        tot AS (SELECT src, sum(n) AS tot FROM cnt GROUP BY src)
        SELECT c.src, c.dst, c.n,
               CAST(({MICRO} * c.n) // t2.tot AS BIGINT) AS p_micro
        FROM cnt c JOIN tot t2 USING (src)
    """


# ---------------------------------------------------------------------------
# sequential pattern mining: top event trigrams
# ---------------------------------------------------------------------------

def top_sequences(df: SparkDF, key_col: str, ts_col: str,
                  id_col: str, state_col: str, k: int = 20) -> SparkDF:
    """Most frequent length-3 event sequences (consecutive trigrams
    over each key's (ts, id)-total-ordered stream) — second-order
    sequential pattern mining, the "what path do users actually
    take" primitive behind journey analysis and UX funnels, one
    order above :func:`markov_transitions`' bigrams.

    One keyed window pass (two leads), one grouped count, then the
    global top-k through the scalable sort-topk path (per-partition
    top-k before the merge — k rows per partition cross the wire,
    never a single-task global window). Ties break on the sequence
    triple ascending — a total order, so the k-th place is
    deterministic."""
    w = Window.partitionBy(key_col).orderBy(
        epoch_micros(ts_col), F.col(id_col))
    tri = (df.select(F.col(state_col).alias("s1"),
                     F.lead(state_col, 1).over(w).alias("s2"),
                     F.lead(state_col, 2).over(w).alias("s3"))
             .where(F.col("s3").isNotNull()))
    counts = (tri.groupBy("s1", "s2", "s3")
                 .agg(F.count(F.lit(1)).alias("n")))
    return (counts.orderBy(F.col("n").desc(), F.col("s1").asc(),
                           F.col("s2").asc(), F.col("s3").asc())
                  .limit(k))


def top_sequences_sql(t: str, key_expr: str, ts_expr: str,
                      id_expr: str, state_expr: str,
                      k: int = 20) -> str:
    """DuckDB twin (identical total order and tie-break)."""
    return f"""
        WITH seq AS (
            SELECT {state_expr} AS s1,
                   lead({state_expr}, 1) OVER w AS s2,
                   lead({state_expr}, 2) OVER w AS s3
            FROM {t}
            WINDOW w AS (PARTITION BY {key_expr}
                         ORDER BY {ts_expr}, {id_expr}))
        SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE s3 IS NOT NULL
        GROUP BY s1, s2, s3
        ORDER BY n DESC, s1 ASC, s2 ASC, s3 ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# last-observation-carried-forward imputation
# ---------------------------------------------------------------------------

def locf_fill(df: SparkDF, key_col: str, ts_col: str, id_col: str,
              col: str, out_col: str = "filled") -> SparkDF:
    """Forward-fill NULLs in ``col`` with the key's most recent
    non-null value (pandas ``groupby().ffill()``): one keyed ordered
    window with ``last(…, ignorenulls)`` over
    ``ROWS UNBOUNDED PRECEDING``. Leading NULLs (no prior
    observation) stay NULL. Keys are independent — a key never sees
    another key's values.

    Scale: the single window partitions by the high-cardinality
    series key; Spark's window frame for running ``last`` keeps O(1)
    state per row. No second pass, no driver state.
    """
    w = (Window.partitionBy(key_col)
               .orderBy(epoch_micros(ts_col), F.col(id_col))
               .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out_col,
                         F.last(F.col(col), ignorenulls=True).over(w))


def locf_fill_sql(t: str, key_expr: str, ts_expr: str, id_expr: str,
                  col_expr: str, out_col: str = "filled",
                  select_exprs: str = "*") -> str:
    """DuckDB twin (``last_value(x IGNORE NULLS)`` over the identical
    frame)."""
    return f"""
        SELECT {select_exprs},
               last_value({col_expr} IGNORE NULLS) OVER (
                   PARTITION BY {key_expr}
                   ORDER BY {ts_expr}, {id_expr}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS {out_col}
        FROM {t}
    """


# ---------------------------------------------------------------------------
# temporal split with embargo
# ---------------------------------------------------------------------------

def temporal_split_embargo(df: SparkDF, ts_col: str,
                           train_frac: float = 0.8,
                           embargo_us: int = 3_600 * MICRO) -> SparkDF:
    """Label every row ``train`` / ``embargo`` / ``test`` by time:
    the cutoff is the exact ``train_frac`` percentile of the event
    time (linear interpolation over integer micros — cross-engine
    identical), ``test`` is at-or-after the cutoff, and ``train``
    must additionally clear the cutoff by ``embargo_us`` — rows
    inside the purge gap are labeled ``embargo`` and excluded from
    BOTH sides, so windowed lookback features computed on train rows
    cannot have observed the test period.

    The cutoff rides the plan as a broadcast 1-row aggregate (no
    driver round-trip, no second job); the labeling is a scan-local
    codegen'd expression.
    """
    if not 0.0 < train_frac < 1.0:
        raise ValueError("train_frac must be in (0, 1)")
    us = epoch_micros(ts_col)
    cut = df.agg(F.floor(
        F.percentile(us, F.lit(train_frac))).alias("__cut"))
    lab = (df.withColumn("__us", us)
             .crossJoin(F.broadcast(cut))
             .withColumn("split",
                         F.when(F.col("__us") >= F.col("__cut"),
                                F.lit("test"))
                          .when(F.col("__us")
                                < F.col("__cut") - F.lit(embargo_us),
                                F.lit("train"))
                          .otherwise(F.lit("embargo"))))
    return lab.drop("__cut")


def temporal_split_embargo_sql(t: str, ts_expr: str,
                               train_frac: float = 0.8,
                               embargo_us: int = 3_600 * MICRO,
                               select_exprs: str = "*") -> str:
    """DuckDB twin (``quantile_cont`` = the same linear-interpolated
    exact percentile; identical floor + boundary comparisons)."""
    return f"""
        WITH cut AS (
            SELECT CAST(floor(
                quantile_cont(epoch_us({ts_expr}), {train_frac}))
                AS BIGINT) AS c
            FROM {t})
        SELECT {select_exprs},
               CASE WHEN epoch_us({ts_expr}) >= cut.c THEN 'test'
                    WHEN epoch_us({ts_expr}) < cut.c - {embargo_us}
                        THEN 'train'
                    ELSE 'embargo' END AS split
        FROM {t} CROSS JOIN cut
    """


# ---------------------------------------------------------------------------
# purged k-fold cross-validation over time
# ---------------------------------------------------------------------------

def purged_kfold(df: SparkDF, ts_col: str, n_folds: int = 5,
                 embargo_us: int = 3_600 * MICRO) -> SparkDF:
    """Purged k-fold CV assignment over TIME (López de Prado 2018,
    *Advances in Financial ML* ch. 7): the timeline is cut into
    ``n_folds`` contiguous slices at exact time quantiles; each row
    gets its ``fold``, and for every fold f the training set is
    everything OUTSIDE slice f's [start − embargo, end + embargo)
    envelope — rows inside the envelope but outside the slice are
    purged (they could leak windowed-lookback information across the
    boundary in either direction).

    Returned shape: one row per (input row, fold) with
    ``role ∈ {test, train, purged}`` — the assignment matrix a CV
    loop consumes. The quantile cutoffs ride the plan as ONE
    broadcast 1-row aggregate (an array of exact percentiles over
    integer micros); the fold/role labeling is a scan-local
    expression over a ``sequence``-generated fold axis, so the plan
    is one scan + one small explode regardless of n_folds.
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    us = epoch_micros(ts_col)
    pcts = [i / n_folds for i in range(1, n_folds)]
    cuts = df.agg(F.transform(
        F.percentile(us, F.array(*[F.lit(p) for p in pcts])),
        lambda c: F.floor(c).cast("long")).alias("__cuts"))
    with_fold = (df.withColumn("__us", us)
                   .crossJoin(F.broadcast(cuts))
                   .withColumn(
                       "fold",
                       F.aggregate(
                           F.col("__cuts"),
                           F.lit(0).cast("int"),
                           lambda acc, c: acc
                           + F.when(F.col("__us") >= c, 1)
                              .otherwise(0).cast("int"))))
    # slice f's envelope: [cut_{f-1} - embargo, cut_f + embargo)
    # (open-ended for the first/last slice)
    lo = lambda f: F.when(f == 0, F.lit(None).cast("long")) \
                    .otherwise(F.element_at(F.col("__cuts"), f))
    hi = lambda f: F.when(f == n_folds - 1,
                          F.lit(None).cast("long")) \
                    .otherwise(F.element_at(F.col("__cuts"), f + 1))
    folds = F.sequence(F.lit(0), F.lit(n_folds - 1))
    exploded = with_fold.select(
        "*", F.explode(folds).alias("cv_fold"))
    in_lo = (lo(F.col("cv_fold")).isNull()
             | (F.col("__us") >= lo(F.col("cv_fold"))
                - F.lit(embargo_us)))
    in_hi = (hi(F.col("cv_fold")).isNull()
             | (F.col("__us") < hi(F.col("cv_fold"))
                + F.lit(embargo_us)))
    role = (F.when(F.col("fold") == F.col("cv_fold"), F.lit("test"))
             .when(in_lo & in_hi, F.lit("purged"))
             .otherwise(F.lit("train")))
    return exploded.withColumn("role", role).drop("__cuts")


def purged_kfold_sql(t: str, ts_expr: str, n_folds: int = 5,
                     embargo_us: int = 3_600 * MICRO,
                     select_exprs: str = "*") -> str:
    """DuckDB twin (``quantile_cont`` list + identical envelope
    algebra; the fold axis comes from ``range()``)."""
    pcts = ", ".join(str(i / n_folds) for i in range(1, n_folds))
    return f"""
        WITH cuts AS MATERIALIZED (
            SELECT list_transform(
                quantile_cont(epoch_us({ts_expr}), [{pcts}]),
                c -> CAST(floor(c) AS BIGINT)) AS cs
            FROM {t}),
        base AS (
            SELECT {select_exprs}, epoch_us({ts_expr}) AS us,
                   CAST(len(list_filter(cuts.cs,
                            c -> epoch_us({ts_expr}) >= c)) AS INT)
                       AS fold, cuts.cs AS cs
            FROM {t} CROSS JOIN cuts),
        ex AS (
            SELECT base.*, CAST(u.f AS INT) AS cv_fold
            FROM base, unnest(range(0, {n_folds})) AS u(f))
        SELECT * EXCLUDE (us, cs, f_lo, f_hi),
               CASE WHEN fold = cv_fold THEN 'test'
                    WHEN (f_lo IS NULL OR us >= f_lo - {embargo_us})
                         AND (f_hi IS NULL OR us < f_hi + {embargo_us})
                        THEN 'purged'
                    ELSE 'train' END AS role
        FROM (
            SELECT *,
                   CASE WHEN cv_fold = 0 THEN NULL
                        ELSE cs[cv_fold] END AS f_lo,
                   CASE WHEN cv_fold = {n_folds - 1} THEN NULL
                        ELSE cs[cv_fold + 1] END AS f_hi
            FROM ex)
    """
