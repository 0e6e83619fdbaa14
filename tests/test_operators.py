"""Scale-path operators: bucketed co-located joins (exchange-free),
salted skew joins, forced broadcast."""

import pytest

from pyspark.sql import functions as F

import charmpandas_spark as cps
from charmpandas_spark.operators.bucketing import (
    bucketed_join, read_bucketed, write_bucketed)
from charmpandas_spark.operators.skew import broadcast_join, salted_join
from charmpandas_spark.plans.explain import join_strategies, num_exchanges


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "lineitem").sdf


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "orders").sdf


def test_bucketed_join_is_exchange_free(spark, li, orders):
    # tables land in ./spark-warehouse (gitignored); warehouse dir is a
    # static conf so it can't be pointed at tmp_path per-test
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "li_b", "l_orderkey", 8)
    write_bucketed(orders.select("o_orderkey", "o_orderpriority")
                   .withColumnRenamed("o_orderkey", "l_orderkey"),
                   "ord_b", "l_orderkey", 8)
    # disable auto-broadcast so the co-location (not a broadcast) is
    # what removes the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
        assert num_exchanges(j.sdf) == 0, "bucketed join still shuffles"
        assert "SortMergeJoin" in join_strategies(j.sdf)
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_salted_join_matches_plain(spark, li, orders):
    o = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey", salt=8).count()
    assert salted == plain


def test_salted_left_join_matches_plain(spark, orders, li):
    l = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = l.join(li, "l_orderkey", "left").count()
    salted = salted_join(l, li, "l_orderkey", salt=4, how="left").count()
    assert salted == plain


def test_salted_join_rejects_right(li, orders):
    with pytest.raises(ValueError):
        salted_join(li, orders, "l_orderkey", how="right")


def test_broadcast_join_forced(spark, li, orders):
    o = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    j = broadcast_join(li, o, "l_orderkey")
    assert "BroadcastHashJoin" in join_strategies(j.sdf)
    assert j.count() == li.join(o, "l_orderkey").count()


# ---------------------------------------------------------------------------
# cohort retention / CDC log processing
# ---------------------------------------------------------------------------

def test_cohort_retention_small(spark):
    """Hand-computable cohort matrix: users 1-2 start week 0, user 3
    starts week 1; user 1 returns week 1."""
    import datetime as dt

    from charmpandas_spark.operators.cohort import cohort_retention

    def ts(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    # per-DAY periods so cohort boundaries are exactly the test's
    # day offsets (epoch weeks are not calendar-aligned)
    rows = [(1, ts(0)), (2, ts(0)), (1, ts(1)), (3, ts(1))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort, r.week_offset): (r.n_active, r.cohort_size,
                                       r.retention_bp)
           for r in cohort_retention(ev, "user_id", "ts",
                                     period_us=86400 * 10**6).collect()}
    c0 = min(k[0] for k in out)
    # day-0 cohort: 2 users, both active at offset 0; 1 returns day 1
    assert out[(c0, 0)] == (2, 2, 10000)
    assert out[(c0, 1)] == (1, 2, 5000)
    # day-1 cohort: user 3 only
    assert out[(c0 + 1, 0)] == (1, 1, 10000)
    assert len(out) == 3


def test_cdc_latest_semantics(spark):
    from charmpandas_spark.operators.cdc import cdc_latest

    log = spark.createDataFrame(
        [(1, 1, "I", 10), (1, 2, "U", 20),            # update wins
         (2, 1, "I", 30), (2, 2, "D", 0),             # deleted key
         (3, 1, "I", 40),                             # plain insert
         (4, 5, "U", 50), (4, 5, "D", 0)],            # same-seq: D wins
        "k long, seq long, op string, v long")
    out = {r.k: (r.seq, r.v)
           for r in cdc_latest(log, ["k"], "seq", "op").collect()}
    assert out == {1: (2, 20), 3: (1, 40)}


def test_scd2_history_intervals(spark):
    from charmpandas_spark.operators.cdc import scd2_build

    log = spark.createDataFrame(
        [(1, 1, "I", 10), (1, 3, "U", 20), (1, 7, "U", 30),
         (2, 1, "I", 40), (2, 4, "D", 0)],
        "k long, seq long, op string, v long")
    rows = sorted(scd2_build(log, ["k"], "seq", "op").collect(),
                  key=lambda r: (r.k, r.valid_from))
    got = [(r.k, r.v, r.valid_from, r.valid_to, r.is_current)
           for r in rows]
    assert got == [
        (1, 10, 1, 3, False), (1, 20, 3, 7, False),
        (1, 30, 7, None, True),
        # delete closes the interval; key 2 has no current row
        (2, 40, 1, 4, False),
    ]


def test_cdc_single_exchange_plan(spark):
    """cdc_latest is one hash exchange on the key + a window — no
    join operator anywhere in the plan."""
    from charmpandas_spark.operators.cdc import cdc_latest

    log = spark.createDataFrame(
        [(1, 1, "I", 10)], "k long, seq long, op string, v long")
    plan = cdc_latest(log, ["k"], "seq", "op") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_triangle_count_known_graph(spark):
    """K4 plus a pendant edge: C(4,3)=4 triangles; duplicates,
    reversed edges and self-loops are normalized away."""
    from charmpandas_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(4, 5)] + [(2, 1), (3, 3), (1, 2)]  # noise
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)


def test_triangle_count_release_frees_checkpoint_blocks(spark):
    """ADVICE r12: triangle_count's eager localCheckpoint blocks were
    reclaimable only on RDD GC — repeated builds in one long session
    accumulated executor storage. The tracked handle on the result
    must free them deterministically through release()."""
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.operators.graph import triangle_count

    def persistent_ids():
        reg = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = reg.keysIterator(), set()
        while it.hasNext():
            out.add(it.next())
        return out

    before = persistent_ids()
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                               "src long, dst long")
    out = triangle_count(df)
    assert out.collect()[0].n_triangles == 1
    pinned = persistent_ids() - before
    assert pinned, "checkpoint left no persistent RDD to track"
    release(out)
    assert not (persistent_ids() - before), \
        "release() did not free the checkpoint blocks"


def test_triangle_count_star_has_none(spark):
    """A hub star has many wedges but zero triangles — the degree
    orientation keeps the hub from fanning out d^2 wedges (hub is
    always the HIGH end of every edge, so it generates none)."""
    from charmpandas_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(0, i) for i in range(1, 40)],
                               "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (40, 39, 0)


def test_ewm_matches_pandas_within_truncation(spark):
    """Truncated integer EWM tracks pandas ewm(adjust=True).mean()
    to within truncation + integer-floor tolerance."""
    import pandas as pd

    from charmpandas_spark.operators.ewm import ewm_mean

    vals = [100, 200, 50, 400, 300, 250, 120, 80, 600, 90]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    out = {r.t: r.ewm
           for r in ewm_mean(df, "x", "t", "k", alpha=0.2,
                             terms=16).collect()}
    expect = pd.Series(vals, dtype="float64").ewm(
        alpha=0.2, adjust=True).mean()
    for i in range(len(vals)):
        # truncation tail < 0.3% of mass; floor-div adds < 1
        assert abs(out[i] - expect[i]) <= max(2.0, 0.004 * expect[i])


def test_ewm_first_row_is_identity_and_keys_isolated(spark):
    from charmpandas_spark.operators.ewm import ewm_mean

    rows = [(1, 0, 500), (1, 1, 100), (2, 0, 900)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    out = {(r.k, r.t): r.ewm
           for r in ewm_mean(df, "x", "t", "k").collect()}
    assert out[(1, 0)] == 500          # single-term average = x
    assert out[(2, 0)] == 900          # other key unaffected
    # second row: (100*1e6 + 500*8e5) div (1.8e6) = 277...
    assert out[(1, 1)] == (100 * 1_000_000 + 500 * 800_000) \
        // 1_800_000


def test_ewm_single_window_pass(spark):
    """All 16 lags share one window spec -> exactly one Window node
    and one exchange in the plan."""
    from charmpandas_spark.operators.ewm import ewm_mean

    df = spark.createDataFrame([(1, 0, 1)], "k long, t long, x long")
    plan = ewm_mean(df, "x", "t", "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


def test_leakage_safe_split_no_straddle(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["leakage_safe_split"](spark, sf_dir).collect()
    assert rows and all(r.straddling_clusters == 0 for r in rows)
    assert sum(r.n_docs for r in rows) > 0


def test_mad_outliers_robust_to_extreme_point(spark):
    """One enormous outlier must be counted WITHOUT dragging the
    threshold (the z-score failure mode the median/MAD fix)."""
    from charmpandas_spark.functions.profile import mad_outliers

    xs = [100, 102, 98, 101, 99, 103, 97, 100, 1_000_000]
    df = spark.createDataFrame([("a", x) for x in xs],
                               "g string, x long")
    row = mad_outliers(df, "x", ["g"], k=3.0).collect()[0]
    assert row.n == 9
    assert row.med == 100.0     # median untouched by the outlier
    assert row.mad == 2.0
    assert row.n_outliers == 1  # only the planted point


def test_k_core_peels_tail_and_converges(spark):
    """Triangle + pendant path: the 2-core is exactly the triangle
    (the path peels away over two cascading rounds)."""
    from charmpandas_spark.operators.graph import k_core

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = k_core(df, k=2, iterations=4).collect()[0]
    assert (row.n_nodes, row.n_edges, row.converged) == (3, 3, True)


def test_k_core_unconverged_flag_is_honest(spark):
    """A long pendant chain needs one peel per hop; with a 1-round
    budget the convergence flag must report False."""
    from charmpandas_spark.operators.graph import k_core

    chain = [(i, i + 1) for i in range(6)] + [(10, 11), (11, 12),
                                              (10, 12)]
    df = spark.createDataFrame(chain, "src long, dst long")
    row = k_core(df, k=2, iterations=1).collect()[0]
    assert row.converged is False
    full = k_core(df, k=2, iterations=6).collect()[0]
    assert (full.n_nodes, full.n_edges, full.converged) == (3, 3, True)


def test_linear_attribution_credit_conserved(spark, sf_dir):
    """Total credited micro-units ~= conversions x 1e6 (each
    conversion's credit is split 1e6 div k ways; only the integer
    floor remainder, < k per conversion, may be dropped)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    rows = e.queries()["events_attribution_linear"](
        spark, sf_dir).collect()
    ev = e._t(spark, sf_dir, "events").sdf
    n_conv = ev.filter(F.col("event_type") == "purchase").count()
    total = sum(r.credit_micro for r in rows)
    assert n_conv * 1_000_000 * 0.999 <= total <= n_conv * 1_000_000


def test_cohort_retention_three_exchanges(spark):
    """One data exchange (user) + cell exchange + cohort window — no
    join, no second pass over events."""
    import datetime as dt

    from charmpandas_spark.operators.cohort import cohort_retention

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp")
    plan = cohort_retention(ev, "user_id", "ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 3


def test_survivorship_fuses_attrs_independently(spark):
    """Partial updates refine: key 1's price comes from seq 2, its
    cust from seq 3 — no single row holds the golden record."""
    from charmpandas_spark.operators.cdc import survivorship

    log = spark.createDataFrame(
        [(1, 1, 10, 100), (1, 2, 20, None), (1, 3, None, 300),
         (2, 1, 40, 400)],
        "k long, seq long, price long, cust long")
    out = {r.k: (r.last_seq, r.price, r.cust)
           for r in survivorship(log, ["k"], "seq",
                                 ["price", "cust"]).collect()}
    assert out == {1: (3, 20, 300), 2: (1, 40, 400)}


def test_impute_strategies(spark):
    from charmpandas_spark.functions.profile import impute

    rows = [("a", 10), ("a", 20), ("a", 30), ("a", None),
            ("b", 5), ("b", 5), ("b", 7), ("b", None),
            ("c", None)]  # all-null group stays null
    df = spark.createDataFrame(rows, "g string, x long")

    med = impute(df, "x", ["g"], "median", out_col="f")
    got = sorted((r.g, r.f) for r in med.where("x IS NULL").collect())
    assert got == [("a", 20.0), ("b", 5.0), ("c", None)]

    mode = impute(df, "x", ["g"], "mode", out_col="f")
    got = {r.g: r.f for r in mode.where("x IS NULL").collect()}
    assert got["b"] == 5 and got["c"] is None
    assert got["a"] == 10  # all tie at 1 -> smallest value wins

    mean = impute(df, "x", ["g"], "mean_micro", out_col="f")
    got = {r.g: r.f for r in mean.where("x IS NULL").collect()}
    assert got["a"] == 20_000_000 and got["c"] is None


def test_survivorship_single_exchange(spark):
    """Golden-record fusion is one hash exchange on the key — the
    two window specs (asc running-last, desc row_number) share the
    partitioning, so only sorts differ."""
    from charmpandas_spark.operators.cdc import survivorship

    log = spark.createDataFrame([(1, 1, 10, 100)],
                                "k long, seq long, p long, c long")
    plan = survivorship(log, ["k"], "seq", ["p", "c"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_rollup_merge_is_a_monoid(spark):
    """Folding batches in any grouping equals the from-scratch
    aggregate (associativity), and a rollup of rollups matches too."""
    from pyspark.sql import functions as F

    from charmpandas_spark.operators.rollup import (rollup_apply_batches,
                                                    rollup_batch,
                                                    rollup_merge)

    rows = [("a", i % 7, i) for i in range(50)] + \
           [("b", i % 3, 100 - i) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, d long, x long")
    whole = {tuple(r[:2]): r[2:] for r in
             rollup_batch(df, ["g", "d"], "x").collect()}
    split = [df.where(F.col("x") % 4 == i) for i in range(4)]
    inc = {tuple(r[:2]): r[2:] for r in
           rollup_apply_batches(split, ["g", "d"], "x").collect()}
    assert inc == whole
    # rollup-of-rollups: fold two half-rollups
    h1 = rollup_apply_batches(split[:2], ["g", "d"], "x")
    h2 = rollup_apply_batches(split[2:], ["g", "d"], "x")
    rr = {tuple(r[:2]): r[2:] for r in
          rollup_merge(h1, h2, ["g", "d"]).collect()}
    assert rr == whole
