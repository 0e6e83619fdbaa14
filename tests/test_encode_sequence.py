"""Tests for the wave-4 feature-engineering / sequence family:
target encoding (plain, smoothed, leave-one-out), group-wise z-score
standardization, bounded per-group top-k, Markov transitions, LOCF
forward-fill, and the temporal split with embargo."""

import pandas as pd
import pytest
from pyspark.sql import Row, Window, functions as F

from charmpandas_spark.functions.encode import (
    standard_scale, target_encode_loo, target_encoding)
from charmpandas_spark.operators.sequence import (
    locf_fill, markov_transitions, temporal_split_embargo)
from charmpandas_spark.operators.topk import topk_per_group


# ---------------------------------------------------------------------------
# target encoding
# ---------------------------------------------------------------------------

def test_target_encoding_exact_floored_mean(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 11), ("b", 7)], "cat string, y long")
    out = {r["cat"]: r for r in target_encoding(df, "cat", "y").collect()}
    # mean(a) = 10.5 -> floor(1e6*21/2) = 10_500_000
    assert out["a"]["n"] == 2 and out["a"]["mean_micro"] == 10_500_000
    assert out["b"]["n"] == 1 and out["b"]["mean_micro"] == 7_000_000


def test_target_encoding_smoothing_shrinks_rare_to_global(spark):
    # global mean = (100*0 + 1*90) / 101; category 'rare' has one row
    # at 90 -> with m=100 the smoothed mean sits near the global mean,
    # far below 90.
    rows = [("common", 0)] * 100 + [("rare", 90)]
    df = spark.createDataFrame(rows, "cat string, y long")
    out = {r["cat"]: r["mean_micro"]
           for r in target_encoding(df, "cat", "y",
                                    prior_weight=100).collect()}
    # smoothed(rare) = (1*90 + 100*(90/101)) / 101 ~ 1.773
    assert 1_000_000 < out["rare"] < 3_000_000
    assert out["common"] < 1_000_000


def test_target_encode_loo_excludes_own_row_and_singletons(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        "id long, cat string, y long")
    out = {r["id"]: r["enc_loo_micro"]
           for r in target_encode_loo(df, "cat", "y", "id").collect()}
    assert out[1] == 20_000_000  # the OTHER a-row
    assert out[2] == 10_000_000
    assert out[3] is None        # singleton: no other rows


def test_target_encode_plan_is_broadcast_no_fact_shuffle(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("string").alias("cat"),
        F.col("id").alias("y"), F.col("id").alias("rid"))
    plan = (target_encode_loo(df, "cat", "y", "rid")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# standard scale
# ---------------------------------------------------------------------------

def test_standard_scale_matches_numpy_population_z(spark):
    import numpy as np
    vals = [3, 7, 11, 20, 41]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, x long")
    out = {r["x"]: r["z_micro"]
           for r in standard_scale(df, "x", ["g"]).collect()}
    mu, sd = np.mean(vals), np.std(vals)  # population std
    for v in vals:
        assert out[v] == pytest.approx((v - mu) / sd * 1e6, abs=2)


def test_standard_scale_degenerate_and_null(spark):
    df = spark.createDataFrame(
        [("const", 5), ("const", 5), ("solo", 9),
         ("ok", 1), ("ok", 3), ("ok", None)],
        "g string, x long")
    rows = standard_scale(df, "x", ["g"]).collect()
    by = {}
    for r in rows:
        by.setdefault(r["g"], []).append(r["z_micro"])
    assert by["const"] == [None, None]   # zero variance
    assert by["solo"] == [None]          # n < 2
    assert sorted(x for x in by["ok"] if x is not None) == [-1_000_000,
                                                           1_000_000]
    assert None in by["ok"]              # null x stays null


# ---------------------------------------------------------------------------
# topk per group
# ---------------------------------------------------------------------------

def test_topk_per_group_matches_window_and_breaks_ties_by_id(spark):
    rows = [("g1", i, (i * 37) % 11) for i in range(200)]
    rows += [("g2", 1000 + i, 5) for i in range(10)]  # all tied
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = (topk_per_group(df, ["g"], "v", "id", 4, num_salts=8)
           .orderBy("g", "rank").collect())
    w = Window.partitionBy("g").orderBy(F.col("v").desc(),
                                        F.col("id").asc())
    want = (df.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= 4)
              .orderBy("g", "rank")
              .select("g", "rank", "id", "v").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # tied group resolves to the 4 smallest ids
    g2 = [r["id"] for r in got if r["g"] == "g2"]
    assert g2 == [1000, 1001, 1002, 1003]


def test_topk_per_group_partial_state_is_bounded(spark):
    # the partial aggregate keeps <= k elements per (group, salt):
    # with 1 group, 4 salts, k=2, the merge sees <= 8 candidates no
    # matter how many input rows there are.
    df = spark.createDataFrame([("g", i, i) for i in range(5000)],
                               "g string, id long, v long")
    out = topk_per_group(df, ["g"], "v", "id", 2, num_salts=4)
    assert [r["v"] for r in out.collect()] == [4999, 4998]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two ObjectHashAggregate pairs (partial+final per phase), never a
    # per-group global Sort of the input
    assert plan.count("ObjectHashAggregate") >= 2
    assert "Window" not in plan


def test_topk_ascending_and_small_groups(spark):
    df = spark.createDataFrame([("g", 1, 30), ("g", 2, 10)],
                               "g string, id long, v long")
    out = (topk_per_group(df, ["g"], "v", "id", 5, ascending=True)
           .orderBy("rank").collect())
    assert [(r["rank"], r["id"], r["v"]) for r in out] == [
        (1, 2, 10), (2, 1, 30)]


# ---------------------------------------------------------------------------
# markov transitions
# ---------------------------------------------------------------------------

def test_markov_transitions_counts_and_probs(spark):
    rows = [
        # user 1: a -> b -> a   | user 2: a -> b
        (1, 1, 100, "a"), (1, 2, 200, "b"), (1, 3, 300, "a"),
        (2, 4, 100, "a"), (2, 5, 200, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, id long, tsv long, s string") \
              .withColumn("ts", F.timestamp_micros(F.col("tsv")))
    out = {(r["src"], r["dst"]): (r["n"], r["p_micro"])
           for r in markov_transitions(df, "u", "ts", "id", "s")
           .collect()}
    assert out[("a", "b")] == (2, 1_000_000)   # a always -> b
    assert out[("b", "a")] == (1, 1_000_000)   # last events emit none
    assert ("b", None) not in out


def test_markov_ties_broken_by_id_within_same_ts(spark):
    rows = [(1, 10, 100, "x"), (1, 11, 100, "y"), (1, 12, 100, "z")]
    df = spark.createDataFrame(rows, "u long, id long, tsv long, s string") \
              .withColumn("ts", F.timestamp_micros(F.col("tsv")))
    out = {(r["src"], r["dst"]) for r in
           markov_transitions(df, "u", "ts", "id", "s").collect()}
    assert out == {("x", "y"), ("y", "z")}


# ---------------------------------------------------------------------------
# locf
# ---------------------------------------------------------------------------

def test_locf_fill_carries_forward_per_key(spark):
    rows = [(1, 1, 100, 10), (1, 2, 200, None), (1, 3, 300, None),
            (1, 4, 400, 40), (2, 5, 100, None), (2, 6, 200, 7)]
    df = spark.createDataFrame(rows, "u long, id long, tsv long, v long") \
              .withColumn("ts", F.timestamp_micros(F.col("tsv")))
    out = {r["id"]: r["filled"]
           for r in locf_fill(df, "u", "ts", "id", "v").collect()}
    assert out == {1: 10, 2: 10, 3: 10, 4: 40, 5: None, 6: 7}


# ---------------------------------------------------------------------------
# temporal split
# ---------------------------------------------------------------------------

def test_temporal_split_embargo_gap_and_order(spark):
    # 100 events at micros 0..99e6; cutoff = exact 0.8 quantile;
    # embargo 5 s. No train row may lie within the embargo of the
    # cutoff, and every test row is at-or-after the cutoff.
    df = spark.range(0, 100).select(
        F.col("id"), F.timestamp_micros(F.col("id") * 1_000_000)
        .alias("ts"))
    out = temporal_split_embargo(df, "ts", 0.8, 5_000_000)
    pdf = out.select("id", "split", "__us").toPandas()
    cut = pdf.loc[pdf.split == "test", "__us"].min()
    assert (pdf.loc[pdf.split == "train", "__us"]
            < cut - 5_000_000).all()
    assert (pdf.loc[pdf.split == "test", "__us"] >= cut).all()
    emb = pdf.loc[pdf.split == "embargo", "__us"]
    assert len(emb) > 0
    assert ((emb >= cut - 5_000_000) & (emb < cut)).all()
    # nothing dropped: all 100 rows labeled
    assert len(pdf) == 100


def test_temporal_split_rejects_bad_frac(spark):
    df = spark.range(1).select(F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError):
        temporal_split_embargo(df, "ts", 1.5)


# ---------------------------------------------------------------------------
# k-center coreset
# ---------------------------------------------------------------------------

def _vec_df(spark, pts):
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in p])
         for i, p in enumerate(pts)])


def test_kcenter_greedy_geometry(spark):
    from charmpandas_spark.functions.coreset import kcenter_select
    # 1-d points 0, 1, 10, 11, 100: seed = min id (the 0-point),
    # then the farthest (100), then 11 (min-dist 121 beats 10's 100)
    df = _vec_df(spark, [[0.0], [0.001], [0.010], [0.011], [0.100]])
    out = (kcenter_select(df, "embedding", "vec_id", 3)
           .orderBy("rank").collect())
    assert [r["center_id"] for r in out] == [0, 4, 3]
    assert out[0]["sel_r2"] == 0
    assert out[1]["sel_r2"] == 100 * 100   # quantized units (x1000)
    assert out[2]["sel_r2"] == 11 * 11
    assert sum(r["n_assigned"] for r in out) == 5


def test_kcenter_tie_breaks_to_smallest_id(spark):
    from charmpandas_spark.functions.coreset import kcenter_select
    # two symmetric far points at equal distance from the seed: the
    # smaller id wins the argmax
    df = _vec_df(spark, [[0.0], [0.050], [-0.050]])
    out = (kcenter_select(df, "embedding", "vec_id", 2)
           .orderBy("rank").collect())
    assert [r["center_id"] for r in out] == [0, 1]


def test_kcenter_partition_invariant_and_sampled(spark):
    import random
    from charmpandas_spark.functions.coreset import kcenter_select
    rng = random.Random(7)
    pts = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(120)]
    df = _vec_df(spark, pts)
    a = (kcenter_select(df, "embedding", "vec_id", 5, train_cap=64)
         .orderBy("rank").collect())
    b = (kcenter_select(df.repartition(13), "embedding", "vec_id", 5,
                        train_cap=64)
         .orderBy("rank").collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # assignment covers the FULL corpus even though selection ran on
    # the 64-row sample
    assert sum(r["n_assigned"] for r in a) == 120


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------

def test_pca_finds_planted_dominant_axis(spark):
    import numpy as np
    from charmpandas_spark.functions.pca import pca_power_project
    # variance planted on axis 2: values spread +-0.5 there, tiny
    # noise elsewhere -> the projection must order like coordinate 2
    rng = np.random.RandomState(3)
    pts = []
    for i in range(80):
        v = rng.uniform(-0.01, 0.01, size=6)
        v[2] = (i - 40) / 80.0
        pts.append([float(x) for x in v])
    df = _vec_df(spark, pts)
    out = (pca_power_project(df, "embedding", "vec_id")
           .orderBy("vec_id").collect())
    proj = np.array([r["proj"] for r in out], dtype=float)
    axis = np.array([p[2] for p in pts])
    corr = np.corrcoef(proj, axis)[0, 1]
    assert abs(corr) > 0.999


def test_pca_partition_invariant(spark):
    import random
    from charmpandas_spark.functions.pca import pca_power_project
    rng = random.Random(11)
    pts = [[rng.uniform(-1, 1) for _ in range(5)] for _ in range(60)]
    df = _vec_df(spark, pts)
    a = (pca_power_project(df, "embedding", "vec_id")
         .orderBy("vec_id").collect())
    b = (pca_power_project(df.repartition(9), "embedding", "vec_id")
         .orderBy("vec_id").collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pca_centered_projection_sums_near_zero(spark):
    from charmpandas_spark.functions.pca import pca_power_project
    pts = [[float(i) / 100.0, 0.0] for i in range(10)]
    df = _vec_df(spark, pts)
    out = pca_power_project(df, "embedding", "vec_id").collect()
    # centered projections sum to ~0 (truncation leaves |sum| < n)
    assert abs(sum(r["proj"] for r in out)) < len(pts)


# ---------------------------------------------------------------------------
# keyword extraction + incremental top-k
# ---------------------------------------------------------------------------

def test_keyword_topk_prefers_rare_terms(spark):
    from charmpandas_spark.functions.sparse import keyword_topk
    docs = spark.createDataFrame(
        [(1, "the the the zebra"), (2, "the cat"), (3, "the dog"),
         (4, "the fox")],
        "doc_id long, text string")
    out = keyword_topk(docs, "text", "doc_id", k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'the' appears in every doc (idf floor: 4//4 = 1x) — the rare
    # term (4x idf) wins even against tf=3
    assert top[1] == "zebra"
    assert top[2] == "cat" and top[3] == "dog" and top[4] == "fox"


def test_topk_incremental_matches_from_scratch_any_split(spark):
    from charmpandas_spark.operators.topk import (
        topk_apply_batches, topk_per_group)
    rows = [("g%d" % (i % 3), i, (i * 53) % 97) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    want = [tuple(r) for r in
            topk_per_group(df, ["g"], "v", "id", 4)
            .orderBy("g", "rank").collect()]
    for nb in (2, 5):
        batches = [df.where(F.col("id") % nb == i) for i in range(nb)]
        got = [tuple(r) for r in
               topk_apply_batches(batches, ["g"], "v", "id", 4)
               .orderBy("g", "rank").collect()]
        assert got == want, f"split into {nb} batches diverged"


def test_topk_merge_is_associative_monoid(spark):
    from charmpandas_spark.operators.topk import (
        topk_batch, topk_merge, topk_state_result)
    df = spark.createDataFrame(
        [("g", i, i % 13) for i in range(60)], "g string, id long, v long")
    b = [topk_batch(df.where(F.col("id") % 3 == i), ["g"], "v", "id", 3)
         for i in range(3)]
    left = topk_merge(topk_merge(b[0], b[1], ["g"], 3), b[2], ["g"], 3)
    right = topk_merge(b[0], topk_merge(b[1], b[2], ["g"], 3), ["g"], 3)
    lr = [tuple(r) for r in
          topk_state_result(left, ["g"], "v", "id")
          .orderBy("rank").collect()]
    rr = [tuple(r) for r in
          topk_state_result(right, ["g"], "v", "id")
          .orderBy("rank").collect()]
    assert lr == rr


# ---------------------------------------------------------------------------
# purged k-fold
# ---------------------------------------------------------------------------

def test_purged_kfold_roles_and_envelope(spark):
    from charmpandas_spark.operators.sequence import purged_kfold
    # 100 events at seconds 0..99, 4 folds, 5 s embargo
    df = spark.range(0, 100).select(
        F.col("id"), F.timestamp_micros(F.col("id") * 1_000_000)
        .alias("ts"))
    out = purged_kfold(df, "ts", 4, 5_000_000) \
        .select("id", "fold", "cv_fold", "role").toPandas()
    # every row appears once per fold
    assert len(out) == 400
    # a row is test exactly in its own fold
    assert ((out.role == "test") == (out.fold == out.cv_fold)).all()
    for f in range(4):
        sl = out[out.cv_fold == f]
        test_ids = set(sl.loc[sl.role == "test", "id"])
        train_ids = set(sl.loc[sl.role == "train", "id"])
        purged_ids = set(sl.loc[sl.role == "purged", "id"])
        lo, hi = min(test_ids), max(test_ids)
        # no train row within 5 s of the test slice on either side
        assert all(i < lo - 5 or i > hi + 5 for i in train_ids)
        # purged rows hug the boundary (and only the boundary)
        assert all((lo - 5 <= i < lo) or (hi < i <= hi + 5)
                   for i in purged_ids)
        # edge folds purge on one side only
        if f == 0:
            assert all(i > hi for i in purged_ids)
        if f == 3:
            assert all(i < lo for i in purged_ids)
    # folds are contiguous, ordered, near-equal
    sizes = out[out.role == "test"].groupby("cv_fold")["id"].count()
    assert set(sizes) <= {24, 25, 26}


def test_pca_stats_fold_matches_from_scratch_any_split(spark):
    import random
    from charmpandas_spark.functions.pca import (
        pca_power_project, pca_project_from_stats, pca_stats,
        pca_stats_merge)
    rng = random.Random(5)
    pts = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(90)]
    df = _vec_df(spark, pts)
    want = [tuple(r) for r in
            pca_power_project(df, "embedding", "vec_id")
            .orderBy("vec_id").collect()]
    for nb in (2, 4):
        stats = None
        for i in range(nb):
            sb = pca_stats(df.where(F.col("vec_id") % nb == i),
                           "embedding")
            stats = sb if stats is None \
                else pca_stats_merge(stats, sb)
        got = [tuple(r) for r in
               pca_project_from_stats(df, "embedding", "vec_id",
                                      stats)
               .orderBy("vec_id").collect()]
        assert got == want, f"{nb}-batch fold diverged"


def test_pca_drift_detects_planted_shift(spark):
    from charmpandas_spark.functions.pca import pca_drift
    from pyspark.sql import Row
    import random
    rng = random.Random(9)
    rows = []
    for i in range(200):
        side = i % 2
        # side 1 shifted along axis 0 — drift must concentrate sides
        # in different bins
        v = [rng.uniform(-0.05, 0.05) + (0.5 if side else -0.5),
             rng.uniform(-0.05, 0.05)]
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v],
                        side=side))
    df = spark.createDataFrame(rows)
    out = pca_drift(df, "embedding", "vec_id", "side", bins=4).collect()
    tv_bp = sum(abs(r["pa_bp"] - r["pb_bp"]) for r in out) // 2
    assert tv_bp > 9000          # near-total separation
    assert sum(r["n_a"] for r in out) == 100
    assert sum(r["n_b"] for r in out) == 100


def test_pca_drift_null_on_identical_sides(spark):
    from charmpandas_spark.functions.pca import pca_drift
    from pyspark.sql import Row
    rows = []
    for i in range(50):
        v = [float(i) / 50.0, 0.1]
        rows.append(Row(vec_id=2 * i, embedding=v, side=0))
        rows.append(Row(vec_id=2 * i + 1, embedding=v, side=1))
    df = spark.createDataFrame(rows)
    out = pca_drift(df, "embedding", "vec_id", "side", bins=5).collect()
    tv_bp = sum(abs(r["pa_bp"] - r["pb_bp"]) for r in out) // 2
    assert tv_bp == 0            # identical distributions


# ---------------------------------------------------------------------------
# sampled-training equivalence: the driver-side numpy fast path used
# when train_cap is set must be BIT-IDENTICAL to the distributed loop
# run over the same materialized sample (same init, same fold order,
# same int64 sums, same tie-breaks) — this is the guard for the
# "bit-identical by construction" claim in kmeans.py / quantize.py /
# coreset.py.
# ---------------------------------------------------------------------------

def _sampled_subframe(spark, df, id_col, cap):
    """The rows of ``df`` whose ids land in the deterministic
    hash-ordered training sample — the exact population the numpy
    path trains on, rebuilt as a plain DataFrame so the distributed
    (train_cap=None) loop can be pointed at it."""
    from charmpandas_spark.functions.kmeans import (_quantize,
                                                    _train_sample)
    q = df.select(F.col(id_col).alias("id"),
                  _quantize("embedding", 1000).alias("qv"))
    ids = {r["id"] for r in _train_sample(q, "id", cap).collect()}
    return df.filter(F.col(id_col).isin(list(ids)))


def _rand_vec_df(spark, n, dim, seed):
    import random
    from pyspark.sql import Row
    rng = random.Random(seed)
    return spark.createDataFrame(
        [Row(vec_id=i,
             embedding=[rng.uniform(-1, 1) for _ in range(dim)])
         for i in range(n)])


def test_kmeans_numpy_training_matches_distributed(spark):
    from charmpandas_spark.functions.kmeans import kmeans_fit_predict
    df = _rand_vec_df(spark, 150, 4, seed=11)
    sub = _sampled_subframe(spark, df, "vec_id", 64)
    _, cents_np = kmeans_fit_predict(df, "embedding", "vec_id", k=5,
                                     iters=3, train_cap=64,
                                     return_centroids=True)
    _, cents_dist = kmeans_fit_predict(sub, "embedding", "vec_id",
                                       k=5, iters=3, train_cap=None,
                                       return_centroids=True)
    assert cents_np == cents_dist  # exact float equality


def test_pq_numpy_training_matches_distributed(spark):
    from charmpandas_spark.functions.quantize import pq_train_encode
    df = _rand_vec_df(spark, 150, 4, seed=13)
    sub = _sampled_subframe(spark, df, "vec_id", 64)
    _, books_np = pq_train_encode(df, "embedding", "vec_id", m=2,
                                  codebook_k=8, iters=2,
                                  train_cap=64)
    _, books_dist = pq_train_encode(sub, "embedding", "vec_id", m=2,
                                    codebook_k=8, iters=2,
                                    train_cap=None)
    assert books_np == books_dist  # exact float equality


def test_kcenter_numpy_selection_matches_distributed(spark):
    from charmpandas_spark.functions.coreset import kcenter_select
    df = _rand_vec_df(spark, 150, 4, seed=17)
    sub = _sampled_subframe(spark, df, "vec_id", 64)
    a = (kcenter_select(df, "embedding", "vec_id", 6, train_cap=64)
         .orderBy("rank").collect())
    b = (kcenter_select(sub, "embedding", "vec_id", 6,
                        train_cap=None)
         .orderBy("rank").collect())
    # selection (order, ids, radii) identical; assignment counts
    # differ because a covers the full corpus, b only the sample
    assert ([(r["rank"], r["center_id"], r["sel_r2"]) for r in a]
            == [(r["rank"], r["center_id"], r["sel_r2"]) for r in b])
