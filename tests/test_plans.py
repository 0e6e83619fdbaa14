"""Plan-quality regression tests: the reference had NO optimizer
(SURVEY §4.1); staying lazy so Catalyst prunes/pushes/broadcasts is
the core architectural win — lock it in."""

import pytest

import charmpandas_spark as cps
from charmpandas_spark.plans.explain import (
    join_strategies, num_exchanges, plan_report, pushed_filters,
    scan_columns)


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "lineitem")


def test_filter_pushdown_reaches_scan(li):
    df = li[li["l_quantity"] > 30.0][["l_orderkey"]]
    pf = pushed_filters(df.sdf)
    assert any("l_quantity" in f for f in pf), pf


def test_column_pruning(li):
    df = li[["l_orderkey", "l_quantity"]]
    cols = scan_columns(df.sdf)
    assert cols and all(len(c) <= 2 for c in cols), cols


def test_projection_pruned_through_groupby(li):
    out = li.groupby("l_returnflag")["l_quantity"].sum()
    cols = scan_columns(out.sdf)
    # only the group key + agg input should be read (not all 11 cols)
    assert cols and all(len(c) <= 2 for c in cols), cols


def test_small_dim_join_broadcasts(spark, sf_dir):
    li = cps.read_table(spark, sf_dir, "lineitem")
    orders = cps.read_table(spark, sf_dir, "orders")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    strategies = join_strategies(j.sdf)
    assert "BroadcastHashJoin" in strategies, strategies


def test_groupby_single_shuffle(li):
    out = li.groupby("l_returnflag")["l_quantity"].sum()
    assert num_exchanges(out.sdf) == 1, plan_report(out.sdf)


def test_flagship_two_shuffles_max(spark, sf_dir):
    li = cps.read_table(spark, sf_dir, "lineitem")
    orders = cps.read_table(spark, sf_dir, "orders")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    out = j.groupby("o_orderpriority")["l_quantity"].count()
    # broadcast join (0 exch) + aggregation (1 exch); a shuffled join
    # would add 2 more
    assert num_exchanges(out.sdf) <= 2, plan_report(out.sdf)


def test_semi_join_prunes_right_side(spark, sf_dir):
    orders = cps.read_table(spark, sf_dir, "orders")
    li = cps.read_table(spark, sf_dir, "lineitem")
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey",
                     how="left_semi")
    cols = scan_columns(j.sdf)
    # the lineitem scan must read ONLY the join key
    assert any(c == ["l_orderkey"] for c in cols), cols


def test_filter_expr_stays_lazy_single_scan(li):
    df = cps.DataFrame(li.sdf)
    df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
    out = df[df["rev"] > 100.0][["l_orderkey", "rev"]]
    rep = plan_report(out.sdf)
    assert len(rep["scan_columns"]) == 1  # one scan, no materialization
    assert rep["exchanges"] == 0


def test_cosine_ann_never_nested_loop(spark, sf_dir):
    """The registered embedding near-dup path must candidate-join on
    (table, bucket) — a hash-partitionable equi join — never fall back
    to the O(n^2) BroadcastNestedLoopJoin of the exact baseline."""
    from charmpandas_spark.functions.similarity import (
        cosine_pairs, cosine_pairs_ann)
    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    ann = cosine_pairs_ann(emb, "embedding", "vec_id", threshold=0.4,
                           num_tables=2, num_planes=2)
    assert "BroadcastNestedLoopJoin" not in join_strategies(ann)
    # and the exact baseline IS the nested loop (so the distinction
    # is real, not vacuous)
    exact = cosine_pairs(emb, "embedding", "vec_id", threshold=0.4)
    assert "BroadcastNestedLoopJoin" in join_strategies(exact)


def test_cosine_ann_construction_runs_zero_jobs(spark, sf_dir):
    """Building the ANN plan must be pure construction — no dims
    probe, no corpus count (r5 verdict #6: both were eager actions).
    Auto num_planes rides the count in-plan; dims resolve per Arrow
    batch at run time."""
    from charmpandas_spark.functions.similarity import cosine_pairs_ann
    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    sc = spark.sparkContext
    sc.setJobGroup("ann-construct-probe", "zero-jobs check")
    try:
        ann = cosine_pairs_ann(emb, "embedding", "vec_id")  # auto planes
        jobs = sc.statusTracker().getJobIdsForGroup("ann-construct-probe")
    finally:
        sc.setJobGroup("", "")
    assert list(jobs) == [], jobs
    assert [f.name for f in ann.schema.fields] == ["id_a", "id_b",
                                                   "cosine"]
    from charmpandas_spark.functions.dedup import release
    release(ann)


def test_tpch_q2_shares_partkey_exchange(spark, sf_dir):
    """The decorrelated min-subquery must not multiply exchanges:
    one partkey aggregation exchange, dimension joins broadcast."""
    import __spark_entry__ as entry
    df = entry.q_tpch_q2(spark, sf_dir)
    assert num_exchanges(df) <= 2, plan_report(df)
    cols = scan_columns(df)
    assert all(len(c) <= 4 for c in cols), cols


def test_sample_hash_no_shuffle(spark, sf_dir):
    """Hash sampling is a pure per-row filter — zero exchanges, rides
    the scan."""
    from charmpandas_spark.functions.sampling import hash_sample
    docs = cps.read_table(spark, sf_dir, "documents").sdf
    out = hash_sample(docs, "doc_id", 0.25)
    assert num_exchanges(out) == 0, plan_report(out)


def test_contamination_index_join_never_broadcast(spark, sf_dir):
    """The bipartite inverted-index join must SHUFFLE on the shingle
    key: Catalyst's size estimate predates the explode, so without
    the shuffle_hash hint it broadcasts a multi-million-row index
    (driver OOM at scale; 70 s of the r3 sf1 probe locally).

    Only BroadcastHASHJoin is the failure mode guarded here: the
    plan legitimately contains BroadcastNestedLoopJoins of LITERAL
    one-row sides (the ``_lazy_auto_cap`` corpus-count ride-along,
    dedup.py:152) — broadcasting one row is scale-free by
    construction."""
    import __spark_entry__ as entry
    df = entry.q_dedup_contamination(spark, sf_dir)
    strategies = join_strategies(df)
    assert not any("BroadcastHashJoin" in s for s in strategies), strategies


def test_tpch_q8_snowflake_all_broadcast(spark, sf_dir):
    """The 7-table Q8 snowflake must broadcast every dimension: a
    single shuffle (the year groupBy), no SortMergeJoin of the fact
    against any dim."""
    import __spark_entry__ as entry
    df = entry.q_tpch_q8(spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin"
                              for s in strategies), strategies
    assert num_exchanges(df) <= 1, plan_report(df)


def test_tpch_q20_no_shuffle_join(spark, sf_dir):
    """Q20's correlated-aggregate join: the small filtered aggregate
    broadcasts into the all-time aggregate (no SMJ), and the semi-join
    into supplier broadcasts the candidate keys."""
    import __spark_entry__ as entry
    df = entry.q_tpch_q20(spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin"
                              for s in strategies), strategies
    # two aggregation exchanges are irreducible; nothing else shuffles
    assert num_exchanges(df) <= 2, plan_report(df)


def test_chunk_documents_zero_shuffle(spark, sf_dir):
    """Chunking rides the scan: split + posexplode + slice, no
    exchange anywhere."""
    from charmpandas_spark.functions.text import chunk_documents
    docs = cps.read_table(spark, sf_dir, "documents").sdf
    out = chunk_documents(docs, "text", "doc_id")
    assert num_exchanges(out) == 0, plan_report(out)


def test_shingle_explode_no_inferred_scan_filter(spark, sf_dir):
    """InferFiltersFromGenerate must stay EXCLUDED: it synthesizes
    `size(sh) > 0` from the shingle explode and pushes the whole
    normalize+transform pipeline below the spread exchange into the
    scan stage — a SINGLE task for any under-split-size table,
    serializing exactly the work the exchange exists to spread
    (measured 2-4x on every shingle-family query; 20 s+ single tasks
    in full sweeps). The shingle array is non-empty by construction,
    so the inferred filter can never prune a row."""
    from charmpandas_spark.functions.dedup import shingle_table
    from pyspark.sql import functions as F

    assert ("InferFiltersFromGenerate"
            in spark.conf.get("spark.sql.optimizer.excludedRules", ""))
    docs = cps.read_table(spark, sf_dir, "documents").sdf
    exploded = (shingle_table(docs, "text", "doc_id",
                              use_chars=False, n=3)
                .select("doc", F.explode("sh").alias("s")))
    plan = exploded._jdf.queryExecution().executedPlan().toString()
    # no Filter node anywhere re-evaluates the shingle transform
    # (array_join+slice only ever appear in the one Project)
    for line in plan.splitlines():
        if "Filter" in line and "array_join" in line:
            raise AssertionError(f"inferred shingle filter:\n{line}")


def test_chunked_range_window_single_shuffle(spark, sf_dir):
    """chunked_range_agg keeps the plain window's one-shuffle shape
    (on keys+chunk) — the parallelism win must not cost an exchange."""
    from pyspark.sql import functions as F

    from charmpandas_spark.streaming.windows import chunked_range_agg
    ev = cps.read_table(spark, sf_dir, "events").sdf
    out = chunked_range_agg(
        ev, ["event_type"], F.unix_micros("ts"),
        {"s": F.sum("value")}, window=3_600_000_000)
    assert num_exchanges(out) <= 1, plan_report(out)
