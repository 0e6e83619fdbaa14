"""Wave-3 operators: column profiling, histograms, RRF fusion,
bigram-LM scoring, benchmark decontamination."""

import pytest
from pyspark.sql import Row, functions as F


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------

def test_profile_columns_values_and_single_job(spark):
    from charmpandas_spark.functions.profile import profile_columns

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (2, 4.0, None), (3, 4.0, "a")],
        "k bigint, x double, s string")
    out = {r["column"]: r for r in
           profile_columns(df, ["k", "x", "s"]).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 3
    assert out["k"]["min_num"] == 1.0 and out["k"]["max_num"] == 3.0
    assert out["k"]["min_str"] is None
    assert out["x"]["n_null"] == 1 and out["x"]["n_distinct"] == 2
    assert out["s"]["n_null"] == 1
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None
    # one scan, no join, and no Expand/multi-distinct fallback (the
    # 8s-at-sf0.1 plan). The ROW-VOLUME level-1 aggregate must be a
    # HashAggregate (narrow value keys, long buffer); only the
    # per-distinct-value level 2 may sort-aggregate (string min/max
    # buffers), and it runs over ~distinct values, not rows.
    plan = profile_columns(df, ["k", "x", "s"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Expand" not in plan
    assert "HashAggregate" in plan
    pre_shuffle = plan.split("Exchange")[-1]  # below the 1st exchange
    assert "SortAggregate" not in pre_shuffle


def test_profile_columns_defaults_to_profilable_columns(spark):
    from charmpandas_spark.functions.profile import profile_columns

    df = spark.createDataFrame([(1, "a", [1, 2])],
                               "k bigint, s string, arr array<int>")
    cols = [r["column"] for r in profile_columns(df).collect()]
    assert cols == ["k", "s"]  # array column skipped


def test_histogram_equiwidth_exact_counts_and_empty_bins(spark):
    from charmpandas_spark.functions.profile import histogram_equiwidth

    vals = [0.0, 0.5, 1.0, 9.9, 10.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r["bin"]: r for r in
            histogram_equiwidth(df, "x", 5).collect()}
    assert len(rows) == 5  # scaffold fills empty bins
    assert rows[0]["n"] == 3          # 0.0, 0.5, 1.0 < 2.0
    assert rows[4]["n"] == 2          # 9.9 and hi-edge 10.0
    assert rows[1]["n"] == rows[2]["n"] == rows[3]["n"] == 0
    assert rows[0]["lo"] == 0.0 and rows[4]["hi"] == 10.0


def test_histogram_explicit_bounds_clip(spark):
    from charmpandas_spark.functions.profile import histogram_equiwidth

    df = spark.range(0, 100).select(F.col("id").cast("double").alias("x"))
    rows = histogram_equiwidth(df, "x", 4, lo=0.0, hi=40.0).collect()
    assert sum(r["n"] for r in rows) == 41  # 0..40 inclusive in range
    assert [r["n"] for r in sorted(rows, key=lambda r: r["bin"])] == \
        [10, 10, 10, 11]


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------

def _leg(spark, rows):
    return spark.createDataFrame(
        [Row(q_id=q, item_id=i, rank=r) for q, i, r in rows])


def test_rrf_fuse_matches_python_reference(spark):
    from charmpandas_spark.functions.fusion import rrf_fuse

    a = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)]
    b = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)]
    out = rrf_fuse([_leg(spark, a), _leg(spark, b)], k0=60).collect()
    got = {(r["q_id"], r["item_id"]): (r["n_legs"], r["rrf_micro"],
                                       r["fused_rank"]) for r in out}
    import collections
    scores = collections.defaultdict(lambda: [0, 0])
    for leg in (a, b):
        for q, i, r in leg:
            scores[(q, i)][0] += 1
            scores[(q, i)][1] += 1_000_000 // (60 + r)
    for q in {1, 2}:
        items = sorted(((v[1], -i) for (qq, i), v in scores.items()
                        if qq == q), reverse=True)
        for rank, (micro, neg_i) in enumerate(items, 1):
            assert got[(q, -neg_i)] == (scores[(q, -neg_i)][0],
                                        micro, rank)


def test_rrf_fuse_top_k_and_single_leg(spark):
    from charmpandas_spark.functions.fusion import rrf_fuse

    a = [(1, i, i) for i in range(1, 8)]
    out = rrf_fuse([_leg(spark, a)], top_k=3).collect()
    assert sorted(r["item_id"] for r in out) == [1, 2, 3]
    with pytest.raises(ValueError):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------

def test_bigram_lm_score_matches_python_reference(spark):
    from charmpandas_spark.functions.lm import bigram_lm_score

    texts = {1: "the cat sat on the mat",
             2: "the cat sat",
             3: "a dog barked at the cat",
             4: "zzz",                       # no bigram -> excluded
             5: "the cat sat on the mat"}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, t string")
    out = {r["doc"]: r for r in
           bigram_lm_score(df, "t", "doc_id").collect()}

    # sequential reference
    import collections
    bigrams = collections.Counter()
    for t in texts.values():
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
    ctx = collections.Counter()
    for (a, _), c in bigrams.items():
        ctx[a] += c
    vocab = {w for t in texts.values() for ws in [t.split()]
             for pair in zip(ws, ws[1:]) for w in pair}
    v = len(vocab)
    for doc, t in texts.items():
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert doc not in out
            continue
        mps = [int((bigrams[(a, b)] + 1) * 1_000_000
                   // (ctx[a] + v)) for a, b in pairs]
        assert out[doc]["n_bigrams"] == len(pairs)
        assert out[doc]["sum_micro_p"] == sum(mps)
        assert out[doc]["avg_micro_p"] == sum(mps) // len(pairs)
    # repeated text scores identically; unseen-heavy text scores lower
    assert out[1]["avg_micro_p"] == out[5]["avg_micro_p"]
    assert out[3]["avg_micro_p"] < out[1]["avg_micro_p"]


def test_bigram_lm_external_model_scores_new_docs(spark):
    from charmpandas_spark.functions.lm import bigram_lm, bigram_lm_score

    ref = spark.createDataFrame(
        [(1, "good clean text here"), (2, "good clean text again")],
        "doc_id bigint, t string")
    model = bigram_lm(ref, "t", "doc_id")
    new = spark.createDataFrame(
        [(10, "good clean text here"), (11, "totally unseen words")],
        "doc_id bigint, t string")
    out = {r["doc"]: r["avg_micro_p"] for r in
           bigram_lm_score(new, "t", "doc_id", model=model).collect()}
    assert out[10] > out[11]  # reference-like text scores higher


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_flags_overlap_exactly(spark):
    from charmpandas_spark.functions.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id bigint, t string")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),   # full overlap
         (2, "xx alpha beta gamma yy"),                # partial
         (3, "completely different words entirely")],  # clean
        "doc_id bigint, t string")
    out = {r["doc"]: r for r in
           decontaminate(corpus, bench, "t", "doc_id", n=3).collect()}
    assert out[1]["n_hits"] == out[1]["n_ngrams"] == 4
    assert out[1]["hit_micro_frac"] == 1_000_000
    assert out[2]["n_hits"] == 1 and out[2]["n_ngrams"] == 3
    assert out[3]["n_hits"] == 0 and out[3]["hit_micro_frac"] == 0


def test_decontaminate_benchmark_never_broadcast(spark, sf_dir):
    from charmpandas_spark.functions.dedup import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")
    plan = decontaminate(corpus, bench, "text", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan  # shuffle_hash hint holds

# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _pr_reference(edges, iterations=3, num=17, den=20):
    """Sequential integer micro-unit PageRank replay."""
    M = 1_000_000
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    r = {n: M for n in nodes}
    base = ((den - num) * M) // den
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for a, b in e:
            s[b] += r[a] // deg[a]
        r = {n: base + (num * s[n]) // den for n in nodes}
    return r


def test_pagerank_matches_sequential_reference(spark):
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.operators.pagerank import pagerank

    # directed graph with a dangling node (4), a hub (1), a dup edge
    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (3, 4), (1, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = pagerank(df, iterations=3)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    release(out)
    assert got == _pr_reference(edges)
    # hub node 1 outranks the dangling leaf 4's feeder
    assert got[1] == max(got.values())


def test_pagerank_deterministic_under_repartition(spark):
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.operators.pagerank import pagerank

    import random
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = pagerank(df, iterations=4)
    b = pagerank(df.repartition(13), iterations=4)
    ga = {r["node"]: r["rank_micro"] for r in a.collect()}
    gb = {r["node"]: r["rank_micro"] for r in b.collect()}
    release(a), release(b)
    assert ga == gb  # integer arithmetic: partitioning-independent


# ---------------------------------------------------------------------------
# curation report
# ---------------------------------------------------------------------------

def test_curation_report_reasons_and_null_fail(spark):
    from pyspark.sql import functions as F
    from charmpandas_spark.functions.quality import curation_report

    df = spark.createDataFrame(
        [(1, "good long text", 10), (2, "x", 10),
         (3, None, 10), (4, "fine", None)],
        "id bigint, t string, v int")
    rules = {
        "long_enough": F.length("t") >= 4,
        "has_v": F.col("v").isNotNull(),
    }
    out = {r["id"]: r for r in curation_report(df, "id", rules).collect()}
    assert out[1]["keep"] and out[1]["fail_reasons"] == ""
    assert not out[2]["keep"] and out[2]["fail_reasons"] == "long_enough"
    # NULL predicate (null text) counts as a failure, not a pass
    assert not out[3]["keep"] and out[3]["fail_reasons"] == "long_enough"
    assert out[4]["fail_reasons"] == "has_v" and out[4]["n_failed"] == 1


def test_curation_report_is_scan_local(spark, sf_dir):
    from pyspark.sql import functions as F
    from charmpandas_spark.functions.quality import curation_report
    import charmpandas_spark as cps

    docs = cps.read_table(spark, sf_dir, "documents").sdf
    plan = curation_report(
        docs, "doc_id", {"en": F.col("lang") == "en"}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: rides the scan


# ---------------------------------------------------------------------------
# group-wise OLS
# ---------------------------------------------------------------------------

def test_linear_fit_matches_numpy_and_handles_degenerate(spark):
    import numpy as np
    from charmpandas_spark.functions.regression import linear_fit

    rows = []
    rng = np.random.RandomState(3)
    for g, (slope, icpt) in {"a": (3, 10), "b": (-2, 500)}.items():
        for x in range(50):
            rows.append((g, x, slope * x + icpt + int(rng.randint(-5, 6))))
    rows += [("flat_x", 7, 1), ("flat_x", 7, 9),   # degenerate design
             ("single", 1, 2)]                     # n == 1
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in linear_fit(df, "x", "y", ["g"]).collect()}
    for g in ("a", "b"):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([y for gg, _, y in rows if gg == g], dtype=float)
        n, sx, sy = len(xs), xs.sum(), ys.sum()
        sxy, sxx = (xs * ys).sum(), (xs * xs).sum()
        den = n * sxx - sx * sx
        import math
        assert out[g]["slope_micro"] == math.floor(
            1_000_000 * (n * sxy - sx * sy) / den)
        assert out[g]["intercept_micro"] == math.floor(
            1_000_000 * (sy * sxx - sx * sxy) / den)
    assert out["flat_x"]["slope_micro"] is None
    assert out["single"]["intercept_micro"] is None


def test_linear_fit_deterministic_under_repartition(spark):
    from charmpandas_spark.functions.regression import linear_fit

    rows = [("g", i % 97, (i * 31) % 1009) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    a = linear_fit(df, "x", "y", ["g"]).collect()[0]
    b = linear_fit(df.repartition(17), "x", "y", ["g"]).collect()[0]
    assert (a["slope_micro"], a["intercept_micro"]) == \
        (b["slope_micro"], b["intercept_micro"])


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def test_quantize_embeddings_codes_and_plan(spark):
    from charmpandas_spark.functions.quantize import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 10.0, 5.0]),
         (2, [1.0, 20.0, 5.0]),     # dim 2 constant -> code 0
         (3, [0.5, 15.0, 5.0])],
        "id bigint, v array<double>")
    out = {r["id"]: r["codes"] for r in
           quantize_embeddings(df, "v", "id").collect()}
    # dim0 range [0,1]: 0.0->0, 1.0->255, 0.5->127 (floor(0.5*255))
    assert out[1] == [0, 0, 0]
    assert out[2] == [255, 255, 0]
    assert out[3] == [127, 127, 0]
    # coding is scan-local: the corpus-side plan below the broadcast
    # has no second shuffle of the vectors (stats explode aside)
    plan = quantize_embeddings(df, "v", "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quantize_reconstruction_bounded(spark):
    import numpy as np
    from charmpandas_spark.functions.quantize import quantize_embeddings

    rng = np.random.RandomState(11)
    vecs = rng.uniform(-3, 7, size=(40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "id bigint, v array<double>")
    rows = quantize_embeddings(df, "v", "id").collect()
    lo, hi = vecs.min(axis=0), vecs.max(axis=0)
    step = (hi - lo) / 255
    for r in rows:
        recon = lo + np.array(r["codes"]) * step
        # each dim reconstructs within one quantization step
        assert np.all(np.abs(recon - vecs[r["id"]]) <= step + 1e-12)


# ---------------------------------------------------------------------------
# two-pass approximate quantile cut (the 100 TB quantile_keep path)
# ---------------------------------------------------------------------------

def test_quantile_keep_approx_matches_exact_and_plan(spark):
    from charmpandas_spark.functions.quality import (
        quantile_keep, quantile_keep_approx)

    df = spark.createDataFrame(
        [(g, i, (i * 37 + hash(g)) % 1000)
         for g in ("a", "b") for i in range(500)],
        "g string, id long, score long")
    exact = quantile_keep(df, "score", "id", 0.8, by="g")
    approx = quantile_keep_approx(df, "score", 0.8, by="g")
    ne, na = exact.count(), approx.count()
    # high accuracy on small data: kept sets nearly identical
    assert abs(ne - na) <= 4
    # every row strictly above the exact cut survives the approx cut
    min_kept = exact.groupBy("g").agg(F.min("score").alias("m"))
    strict = df.join(min_kept, "g").filter(F.col("score") > F.col("m"))
    assert strict.join(approx.select("g", "id"), ["g", "id"],
                       "left_anti").count() == 0
    # plan: no Window sort; threshold joins back as a broadcast
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_quantile_keep_approx_ungrouped_no_window(spark):
    from charmpandas_spark.functions.quality import quantile_keep_approx

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 100).alias("score"))
    out = quantile_keep_approx(df, "score", 0.5)
    n = out.count()
    assert 480 <= n <= 520
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# incremental fingerprint-index dedup
# ---------------------------------------------------------------------------

def test_dedup_incremental_semantics_and_pruning(spark, tmp_path):
    from charmpandas_spark.functions.dedup import (
        dedup_incremental, fingerprint_index_write, release)

    hist = spark.createDataFrame(
        [(1, "seen before"), (2, "also history")],
        "doc_id bigint, t string")
    path = str(tmp_path / "fpidx")
    fingerprint_index_write(hist, "t", "doc_id", path, num_buckets=8)

    batch = spark.createDataFrame(
        [(10, "seen before"),        # known -> dropped
         (11, "brand new"),          # survives
         (12, "brand new"),          # intra-batch dup -> dropped
         (13, "Seen   BEFORE"),      # normalization catches it
         (14, "another new one")],   # survives
        "doc_id bigint, t string")
    out = dedup_incremental(spark, batch, path, "t", "doc_id",
                            num_buckets=8)
    got = sorted(r["doc"] for r in out.collect())
    assert got == [11, 14]
    # index scan carries the batch's bucket predicate as a PARTITION
    # filter — history I/O is bounded by the batch's bucket coverage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    release(out)


def test_dedup_incremental_append_survivors(spark, tmp_path):
    from charmpandas_spark.functions.dedup import (
        dedup_incremental, fingerprint_index_write, release)

    hist = spark.createDataFrame([(1, "day zero")],
                                 "doc_id bigint, t string")
    path = str(tmp_path / "fpidx2")
    fingerprint_index_write(hist, "t", "doc_id", path, num_buckets=4)
    b1 = spark.createDataFrame([(10, "day one")],
                               "doc_id bigint, t string")
    out1 = dedup_incremental(spark, b1, path, "t", "doc_id",
                             num_buckets=4, append_survivors=True)
    assert [r["doc"] for r in out1.collect()] == [10]
    release(out1)
    # day-one content is now part of the index: a re-send is dropped
    b2 = spark.createDataFrame([(20, "day one"), (21, "day two")],
                               "doc_id bigint, t string")
    out2 = dedup_incremental(spark, b2, path, "t", "doc_id",
                             num_buckets=4)
    assert sorted(r["doc"] for r in out2.collect()) == [21]
    release(out2)


def test_index_compact_fingerprint_roundtrip(spark, tmp_path):
    """Compaction is invisible to the probe: identical survivors,
    identical bucket pruning, strictly fewer files, ONE merged Bloom
    delta, parameter sidecar carried over (a mismatched probe still
    raises)."""
    import os

    from charmpandas_spark.functions.dedup import (
        dedup_incremental, fingerprint_index_write, index_compact,
        release)

    hist = spark.createDataFrame(
        [(1, "seen before"), (2, "also history")],
        "doc_id bigint, t string")
    path = str(tmp_path / "fpidx3")
    fingerprint_index_write(hist, "t", "doc_id", path, num_buckets=8)
    # two appends -> multi-file buckets + three Bloom deltas
    fingerprint_index_write(
        spark.createDataFrame([(3, "later history")],
                              "doc_id bigint, t string"),
        "t", "doc_id", path, num_buckets=8, mode="append")
    b0 = spark.createDataFrame([(9, "appended survivor")],
                               "doc_id bigint, t string")
    release(dedup_incremental(spark, b0, path, "t", "doc_id",
                              num_buckets=8, append_survivors=True))

    out_path = str(tmp_path / "fpidx3_compact")
    stats = index_compact(spark, path, out_path)
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == 4 and stats["buckets"] >= 1
    # exactly one merged Bloom delta parquet file
    bloom_files = [f for f in os.listdir(out_path + "/_cps_bloom")
                   if f.endswith(".parquet")]
    assert len(bloom_files) == 1

    batch = spark.createDataFrame(
        [(10, "seen before"), (11, "brand new"),
         (12, "appended survivor"), (13, "later history"),
         (14, "another new one")],
        "doc_id bigint, t string")
    out_orig = dedup_incremental(spark, batch, path, "t", "doc_id",
                                 num_buckets=8)
    out_comp = dedup_incremental(spark, batch, out_path, "t",
                                 "doc_id", num_buckets=8)
    got_orig = sorted(r["doc"] for r in out_orig.collect())
    got_comp = sorted(r["doc"] for r in out_comp.collect())
    assert got_orig == got_comp == [11, 14]
    plan = out_comp._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    release(out_orig)
    release(out_comp)
    # sidecar survived: probing with the wrong bucket count raises
    with pytest.raises(ValueError, match="different parameters"):
        dedup_incremental(spark, batch, out_path, "t", "doc_id",
                          num_buckets=4)
    # copy-on-write guard
    with pytest.raises(ValueError, match="copy-on-write"):
        index_compact(spark, out_path, out_path)


def test_index_compact_minhash_roundtrip(spark, tmp_path):
    """The same compaction works on the banded near-dup index (it is
    bucket-partitioned with the same sidecar protocol): probe results
    are unchanged after appends are compacted away."""
    from charmpandas_spark.functions.dedup import (
        index_compact, minhash_dedup_incremental, minhash_index_write,
        release)

    base = ("the quick brown fox jumps over the lazy dog again "
            "and again with many shared tokens in this sentence")
    hist = spark.createDataFrame(
        [(1, base)], "doc_id bigint, t string")
    path = str(tmp_path / "mhidx2")
    minhash_index_write(hist, "t", "doc_id", path, num_buckets=8)
    minhash_index_write(
        spark.createDataFrame(
            [(2, "completely different later content about other "
                 "topics entirely unrelated to foxes")],
            "doc_id bigint, t string"),
        "t", "doc_id", path, num_buckets=8, mode="append")

    out_path = str(tmp_path / "mhidx2_compact")
    stats = index_compact(spark, path, out_path)
    assert stats["files_after"] < stats["files_before"]

    batch = spark.createDataFrame(
        [(10, base + " extra")], "doc_id bigint, t string")
    out = minhash_dedup_incremental(spark, batch, out_path, "t",
                                    "doc_id", threshold=0.7,
                                    num_buckets=8)
    assert {(r["doc"], r["matched_doc"])
            for r in out.collect()} == {(10, 1)}
    release(out)


def test_minhash_incremental_matches_and_prunes(spark, tmp_path):
    """Near-dup incremental: batch docs match history through the
    banded index (exact-verified jaccard), novel docs don't; the
    index scan carries the batch's bucket predicate as a PARTITION
    filter; append_novel makes day-one novelty visible to day two."""
    from charmpandas_spark.functions.dedup import (
        minhash_dedup_incremental, minhash_index_write, release)

    base = ("the quick brown fox jumps over the lazy dog again "
            "and again with many shared tokens in this sentence")
    hist = spark.createDataFrame(
        [(1, base), (2, "completely different history content here "
                        "about other topics entirely unrelated")],
        "doc_id bigint, t string")
    path = str(tmp_path / "mhidx")
    minhash_index_write(hist, "t", "doc_id", path, num_buckets=8)

    batch = spark.createDataFrame(
        [(10, base + " extra"),                 # near-dup of 1
         (11, "novel text that matches nothing in the historical "
              "index at all not even close")],
        "doc_id bigint, t string")
    out = minhash_dedup_incremental(spark, batch, path, "t", "doc_id",
                                    threshold=0.7, num_buckets=8)
    got = {(r["doc"], r["matched_doc"]) for r in out.collect()}
    assert got == {(10, 1)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    release(out)

    # append_novel: doc 11's bands are indexed; a re-send matches it
    out1 = minhash_dedup_incremental(spark, batch, path, "t", "doc_id",
                                     threshold=0.7, num_buckets=8,
                                     append_novel=True)
    out1.collect()
    release(out1)
    resend = spark.createDataFrame(
        [(20, "novel text that matches nothing in the historical "
              "index at all not even close")],
        "doc_id bigint, t string")
    out2 = minhash_dedup_incremental(spark, resend, path, "t",
                                     "doc_id", threshold=0.7,
                                     num_buckets=8)
    assert {(r["doc"], r["matched_doc"])
            for r in out2.collect()} == {(20, 11)}
    release(out2)


# ---------------------------------------------------------------------------
# BPE id encoding
# ---------------------------------------------------------------------------

def test_bpe_encode_roundtrips_segmentation(spark):
    from charmpandas_spark.functions.bpe import (
        bpe_apply, bpe_encode, bpe_segment, bpe_vocab,
        learn_bpe_from_corpus)

    texts = ["low lower lowest", "new newer newest", "low new"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id bigint, t string")
    merges = learn_bpe_from_corpus(df, "t", num_merges=20)
    alphabet = {c for t in texts for c in t if not c.isspace()}
    vocab = bpe_vocab(merges, alphabet)
    inv = {i: s for s, i in vocab.items()}

    enc = df.select("doc_id", bpe_encode("t", merges, vocab).alias("ids"),
                    bpe_segment("t", merges).alias("toks")).collect()
    for r in enc:
        # decode(ids) == segmentation — no token maps to <unk> on
        # in-alphabet text, and ids round-trip to the same symbols
        assert [inv[i] for i in r["ids"]] == r["toks"]
        assert 0 not in r["ids"]
    # out-of-alphabet chars encode as unk, deterministically
    oov = spark.createDataFrame([(0, "lo Ω")], "doc_id bigint, t string") \
        .select(bpe_encode("t", merges, vocab).alias("ids")).first()
    assert oov["ids"].count(0) == 1


def test_bigram_lm_count_tables_never_broadcast(spark, sf_dir):
    import charmpandas_spark as cps
    from charmpandas_spark.functions.lm import bigram_lm_score

    docs = cps.read_table(spark, sf_dir, "documents").sdf
    plan = bigram_lm_score(docs, "text", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # Zipf count tables join via shuffle_hash; only the 1-row vocab
    # size may broadcast (nested-loop on a literal-sized side)
    assert "BroadcastHashJoin" not in plan


# ---------------------------------------------------------------------------
# token-budget mixture
# ---------------------------------------------------------------------------

def test_mixture_token_budget_semantics(spark):
    from charmpandas_spark.functions.sampling import mixture_token_budget

    rows = [("web", i, 100) for i in range(20)] + \
           [("code", i + 100, 50) for i in range(10)] + \
           [("books", 777, 10_000)]          # over-budget single doc
    df = spark.createDataFrame(rows, "src string, id long, n_tok long")
    out = mixture_token_budget(df, "src", "id", "n_tok",
                               {"web": 450, "books": 5}).collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r)
    # web: hash-ordered docs until cum >= 450 -> exactly 5 x 100
    # (first crossing included)
    assert len(by["web"]) == 5
    # books: budget smaller than the single doc, but the first
    # budget-crossing doc is still included
    assert len(by["books"]) == 1
    # code: no budget -> passes through whole
    assert len(by["code"]) == 10


def test_mixture_token_budget_partition_invariant(spark):
    from charmpandas_spark.functions.sampling import mixture_token_budget

    rows = [(f"s{i % 3}", i, (i * 7) % 90 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "src string, id long, n_tok long")
    budgets = {"s0": 1000, "s1": 500}
    a = {r["id"] for r in mixture_token_budget(
        df, "src", "id", "n_tok", budgets).collect()}
    b = {r["id"] for r in mixture_token_budget(
        df.repartition(13), "src", "id", "n_tok", budgets).collect()}
    assert a == b


def test_pq_codes_and_adc_ranking(spark, sf_dir):
    """Product quantization: an exact duplicate vector gets the SAME
    m codes as its original (so ADC ranks it first for a query equal
    to that vector), and training + encoding are bit-identical across
    partitionings. Cross-engine value parity is the sim_pq_topk
    oracle's job."""
    import charmpandas_spark as cps
    from pyspark.sql import functions as F

    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.functions.quantize import (pq_adc_topk,
                                                      pq_train_encode)

    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    # plant an exact duplicate of vec 7 under a fresh id
    dup = emb.where(F.col("vec_id") == 7) \
             .withColumn("vec_id", F.lit(999_999).cast("long"))
    corpus = emb.unionByName(dup)
    codes, books = pq_train_encode(corpus, "embedding", "vec_id",
                                   m=8, codebook_k=16, iters=1)
    cmap = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert cmap[7] == cmap[999_999]

    out = pq_adc_topk(codes, books,
                      emb.where(F.col("vec_id") == 7),
                      "embedding", "vec_id", k=5).collect()
    # the duplicate has ADC distance == vec 7's own-code distance,
    # the global minimum — it must be rank 1
    byrank = {r["rank"]: r for r in out}
    assert byrank[1]["item_id"] == 999_999
    release(codes)

    # partition invariance of the whole pipeline
    codes2, books2 = pq_train_encode(corpus.repartition(13),
                                     "embedding", "vec_id",
                                     m=8, codebook_k=16, iters=1)
    assert books2 == books
    assert {r["vec_id"]: r["codes"] for r in codes2.collect()} == cmap
    release(codes2)
    """On well-separated vectors the int8 stage-1 ranking recovers the
    float dot-product ranking (quantization noise only reorders
    near-ties); dot values are exact int64 folds."""
    import numpy as np
    from charmpandas_spark.functions.quantize import (
        quantize_embeddings, quantized_dot_topk)

    rng = np.random.RandomState(5)
    vecs = rng.uniform(-1, 1, size=(30, 16))
    vecs[1] = vecs[0] * 0.95          # planted near-neighbor of 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "id bigint, v array<double>")
    codes = quantize_embeddings(df, "v", "id", centered=True)
    out = quantized_dot_topk(codes, codes.where(F.col("id") == 0), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["item_id"] == 1  # the planted neighbor wins stage 1
    # exact integer dots: recompute from the collected codes
    cmap = {r["id"]: r["codes"] for r in codes.collect()}
    for r in rows:
        want = sum(a * b for a, b in zip(cmap[0], cmap[r["item_id"]]))
        assert r["dot"] == want


def test_curation_funnel_attribution_sums(spark):
    from pyspark.sql import functions as F
    from charmpandas_spark.functions.quality import curation_funnel

    df = spark.createDataFrame(
        [(1, 10, "x"), (2, None, "x"), (3, 5, None), (4, None, None)],
        "id bigint, v int, s string")
    rules = {"has_v": F.col("v").isNotNull(),
             "has_s": F.col("s").isNotNull()}
    out = {r["rule"]: r for r in curation_funnel(df, rules).collect()}
    assert out["has_v"]["n_failed"] == 2          # rows 2, 4
    assert out["has_s"]["n_failed"] == 2          # rows 3, 4
    assert out["has_v"]["n_first_failed"] == 2    # 2 and 4 (first rule)
    assert out["has_s"]["n_first_failed"] == 1    # only 3 reaches it
    assert out["__kept__"]["n_failed"] == 1       # row 1
    assert out["__total__"]["n_failed"] == 4
    # first-failure attribution partitions the drops
    drops = out["__total__"]["n_failed"] - out["__kept__"]["n_failed"]
    assert (out["has_v"]["n_first_failed"]
            + out["has_s"]["n_first_failed"]) == drops
    # one scan, no join
    plan = curation_funnel(df, rules) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# URL canonicalization + correlation
# ---------------------------------------------------------------------------

def test_canonicalize_url_cases(spark):
    from charmpandas_spark.functions.urls import canonicalize_url

    cases = {
        "HTTPS://Example.COM/Path/?utm_source=x&b=2&a=1#frag":
            "https://example.com/Path?a=1&b=2",
        "http://a.com/": "http://a.com",
        "http://a.com/x?fbclid=1&SID=9": "http://a.com/x",
        "http://a.com/x?z=1&y=2&z=0": "http://a.com/x?y=2&z=0&z=1",
        "not a url": None,
        # non-default ports are DISTINCT origins — never collapsed
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:8443/x": "https://a.com:8443/x",
        # scheme-default ports are dropped
        "http://a.com:80/x": "http://a.com/x",
        "HTTPS://A.com:443/x": "https://a.com/x",
        # http default on https (and vice versa) is NOT default
        "https://a.com:80/x": "https://a.com:80/x",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r["u"]: r["c"] for r in
           df.select("u", canonicalize_url("u").alias("c")).collect()}
    for u, want in cases.items():
        assert got[u] == want, (u, got[u], want)
    # zero shuffle: pure scan-local expressions
    plan = df.select(canonicalize_url("u")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_correlation_matches_numpy(spark):
    import math

    import numpy as np

    from charmpandas_spark.functions.regression import correlation

    rng = np.random.RandomState(9)
    x = rng.randint(0, 1000, 200)
    y = 3 * x + rng.randint(-50, 50, 200)
    rows = [("g", int(a), int(b)) for a, b in zip(x, y)] + \
           [("flat", 5, 1), ("flat", 5, 2)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r["corr_micro"] for r in
           correlation(df, "x", "y", ["g"]).collect()}
    n, sx, sy = len(x), x.sum(), y.sum()
    sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
    want = math.floor(
        1_000_000 * (n * sxy - sx * sy)
        / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    assert out["g"] == want
    assert out["g"] > 990_000          # strongly correlated
    assert out["flat"] is None          # zero x-variance


def test_ab_welch_matches_scipy_style_reference(spark):
    import math

    import numpy as np

    from charmpandas_spark.functions.regression import ab_welch

    rng = np.random.RandomState(21)
    a = rng.randint(90, 110, 80)
    b = rng.randint(100, 120, 70)
    rows = [("g", "A", int(x)) for x in a] + \
           [("g", "B", int(x)) for x in b] + \
           [("tiny", "A", 1), ("tiny", "B", 2)]   # n<2 per arm
    df = spark.createDataFrame(rows, "g string, v string, x long")
    out = {r["g"]: r for r in
           ab_welch(df, "v", "x", ["g"]).collect()}
    na, nb = len(a), len(b)
    va = a.var(ddof=1)
    vb = b.var(ddof=1)
    # replicate the exact fixed-order expression
    sa, qa = int(a.sum()), int((a.astype(object) ** 2).sum())
    sb, qb = int(b.sum()), int((b.astype(object) ** 2).sum())
    va_e = (qa - sa * sa / na) / (na - 1)
    vb_e = (qb - sb * sb / nb) / (nb - 1)
    want = math.floor(1_000_000 * (sa / na - sb / nb)
                      / math.sqrt(va_e / na + vb_e / nb))
    assert out["g"]["t_micro"] == want
    # sanity vs numpy variances: same t to 1e-6 relative
    t_np = (a.mean() - b.mean()) / math.sqrt(va / na + vb / nb)
    assert abs(out["g"]["t_micro"] / 1e6 - t_np) < 1e-5
    assert out["g"]["t_micro"] < 0          # B planted higher
    assert out["tiny"]["t_micro"] is None   # n<2 arms -> NULL


def test_token_drift_flags_injected_burst(spark):
    from charmpandas_spark.functions.text import token_drift

    base = [(i, "normal common words here") for i in range(40)]
    burst = [(100 + i, "normal common words here") for i in range(20)] \
        + [(200 + i, "spamtoken spamtoken spamtoken") for i in range(20)]
    a = spark.createDataFrame(base, "doc_id bigint, t string")
    b = spark.createDataFrame(burst, "doc_id bigint, t string")
    out = {r["token"]: r for r in
           token_drift(a, b, "t", "doc_id", min_count=5).collect()}
    # the injected token only exists in slice B and dominates drift
    assert out["spamtoken"]["o_a"] == 0
    assert out["spamtoken"]["o_b"] == 60
    top = max(out.values(), key=lambda r: r["chi_micro"])
    assert top["token"] == "spamtoken"
    # balanced tokens drift far less than the burst
    assert out["normal"]["chi_micro"] < out["spamtoken"]["chi_micro"] / 4


def test_pii_scan_counts_and_redaction_roundtrip(spark):
    from charmpandas_spark.functions.profile import pii_scan
    from charmpandas_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.com and c@d.org", "call 555-123-4567"),
         (2, "server at 10.0.0.1", "clean"),
         (3, "nothing here", "also clean")],
        "id bigint, a string, b string")
    out = {r["column"]: r for r in pii_scan(df, ["a", "b"]).collect()}
    assert out["a"]["email_rows"] == 1 and out["a"]["email_hits"] == 2
    assert out["a"]["ipv4_rows"] == 1 and out["a"]["phone_hits"] == 0
    assert out["b"]["phone_rows"] == 1 and out["b"]["email_hits"] == 0
    # redaction verified by re-scan: zero hits everywhere after scrub
    clean = df.select(redact_pii("a").alias("a"),
                      redact_pii("b").alias("b"))
    post = pii_scan(clean, ["a", "b"]).collect()
    assert all(r[f"{n}_hits"] == 0 for r in post
               for n in ("email", "ipv4", "phone"))
    # one scan, no join, no shuffle beyond the global agg pair
    plan = pii_scan(df, ["a", "b"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_join_blowup_profile_predicts_join_size(spark):
    from charmpandas_spark.functions.profile import join_blowup_profile

    left = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 3 + [3]], "k long")
    right = spark.createDataFrame(
        [(k,) for k in [1] * 40 + [2] * 2 + [4]], "k long")
    out = join_blowup_profile(left, right, "k", "k", top=5).collect()
    by = {r["key"]: r for r in out}
    total = by[None]
    # __total__ equals the ACTUAL inner-join cardinality
    assert total["pairs"] == left.join(right, "k").count() == 2006
    assert by["1"]["pairs"] == 2000 and by["1"]["rank"] == 1
    assert by["2"]["pairs"] == 6 and by["2"]["rank"] == 2
    assert "3" not in by and "4" not in by  # unmatched keys drop
    # profile never executes the profiled join: row-level tables only
    # meet as count tables
    plan = join_blowup_profile(left, right, "k", "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 2  # count-table join (+broadcast)


def test_histogram_equidepth_balanced_counts(spark):
    from charmpandas_spark.functions.profile import histogram_equidepth

    df = spark.range(0, 1000).select(
        (F.col("id") * 7 % 997).cast("double").alias("x"))
    rows = sorted(histogram_equidepth(df, "x", 4).collect(),
                  key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == [0, 1, 2, 3]
    # equi-depth: counts within 1 of N/buckets on distinct-ish data
    assert all(abs(r["n"] - 250) <= 1 for r in rows)
    # contiguous coverage: each bucket's hi is the next one's lo
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] == b["lo"]
    assert sum(r["n"] for r in rows) == 1000


def test_edit_distance_pairs_lossless_vs_bruteforce(spark):
    import itertools

    from charmpandas_spark.functions.dedup import edit_distance_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    names = ["small ring", "small king", "smal ring", "red widget",
             "red widgets", "blue bolt", "blu", "bl", "xu",
             "completely different"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {(r["doc_a"], r["doc_b"]): r["dist"] for r in
           edit_distance_pairs(df, "name", "name", max_dist=2)
           .collect()}
    want = {(min(a, b), max(a, b)): lev(a, b)
            for a, b in itertools.combinations(names, 2)
            if lev(a, b) <= 2}
    assert got == want
    # includes short-string matches the q-gram guarantee can't carry
    assert ("bl", "blu") in got
    assert ("blue bolt", "completely different") not in got


def test_token_drift_empty_slice_yields_null_not_crash(spark):
    from charmpandas_spark.functions.text import token_drift

    docs = spark.createDataFrame(
        [(i, "some words here repeated words") for i in range(10)],
        "doc_id bigint, t string")
    empty = docs.where("doc_id < 0")
    out = token_drift(docs, empty, "t", "doc_id", min_count=1).collect()
    assert len(out) > 0
    assert all(r["chi_micro"] is None for r in out)  # ANSI-safe


def test_all_wave3_ops_handle_empty_inputs(spark):
    """Degenerate-input sweep: every round-7 operator must return an
    empty/summary frame on EMPTY input instead of crashing (the
    constant-column histogram and empty-slice drift ANSI bugs were
    exactly this class)."""
    from charmpandas_spark.functions.dedup import (
        decontaminate, edit_distance_pairs)
    from charmpandas_spark.functions.lm import bigram_lm_score
    from charmpandas_spark.functions.profile import (
        histogram_equidepth, histogram_equiwidth, join_blowup_profile,
        pii_scan, profile_columns)
    from charmpandas_spark.functions.quantize import quantize_embeddings
    from charmpandas_spark.functions.regression import (
        ab_welch, correlation, linear_fit)
    from charmpandas_spark.functions.sampling import mixture_token_budget
    from charmpandas_spark.functions.text import token_drift
    from charmpandas_spark.operators.pagerank import pagerank

    etxt = spark.createDataFrame([], "doc_id bigint, t string")
    enum = spark.createDataFrame([], "id bigint, x double")
    evec = spark.createDataFrame([], "id bigint, v array<double>")
    eedge = spark.createDataFrame([], "src bigint, dst bigint")
    egxy = spark.createDataFrame([], "g string, x long, y long")
    evar = spark.createDataFrame([], "g string, v string, x long")
    esrc = spark.createDataFrame([], "s string, id long, n long")

    assert profile_columns(enum).count() == 0
    assert histogram_equiwidth(enum, "x", 4).count() == 4  # scaffold
    assert histogram_equidepth(enum, "x", 4).count() == 0
    assert pii_scan(etxt, ["t"]).count() == 1  # zero-hit summary row
    assert join_blowup_profile(enum, enum, "id", "id").count() == 1
    assert bigram_lm_score(etxt, "t", "doc_id").count() == 0
    assert decontaminate(etxt, etxt, "t", "doc_id").count() == 0
    assert edit_distance_pairs(etxt, "t", "doc_id").count() == 0
    assert quantize_embeddings(evec, "v", "id").count() == 0
    assert linear_fit(egxy, "x", "y", ["g"]).count() == 0
    assert correlation(egxy, "x", "y", ["g"]).count() == 0
    assert ab_welch(evar, "v", "x", ["g"]).count() == 0
    assert mixture_token_budget(esrc, "s", "id", "n",
                                {"a": 10}).count() == 0
    assert pagerank(eedge, iterations=2).count() == 0
    assert token_drift(etxt, etxt, "t", "doc_id").count() == 0


def test_minhash_incremental_rejects_mismatched_params(spark, tmp_path):
    """ADVICE r8: probing a banded index with different signing
    parameters silently returns garbage — the persisted _cps_meta
    sidecar must make it raise instead."""
    import pytest

    from charmpandas_spark.functions.dedup import (
        minhash_dedup_incremental, minhash_index_write)

    hist = spark.createDataFrame(
        [(1, "some historical document text with several words")],
        "doc_id bigint, t string")
    path = str(tmp_path / "mhmeta")
    minhash_index_write(hist, "t", "doc_id", path,
                        num_hashes=16, bands=4, num_buckets=8)
    batch = spark.createDataFrame(
        [(2, "some historical document text with several words")],
        "doc_id bigint, t string")
    with pytest.raises(ValueError, match="different parameters"):
        minhash_dedup_incremental(spark, batch, path, "t", "doc_id",
                                  num_hashes=16, bands=8,
                                  num_buckets=8)
    # matching params still work through the sidecar
    out = minhash_dedup_incremental(spark, batch, path, "t", "doc_id",
                                    num_hashes=16, bands=4,
                                    num_buckets=8)
    assert {(r["doc"], r["matched_doc"])
            for r in out.collect()} == {(2, 1)}


def test_pq_sampled_training_partition_invariant(spark, sf_dir):
    """Sampled training (train_cap): the hash-ordered sample — and
    with it the trained codebooks and every encoded vector — is
    identical across input partitionings, and sampling genuinely
    restricts training (cap < corpus) while encoding still covers
    the full corpus."""
    import charmpandas_spark as cps

    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.functions.quantize import pq_train_encode

    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    n = emb.count()
    cap = 64
    assert cap < n
    codes, books = pq_train_encode(emb, "embedding", "vec_id",
                                   m=8, codebook_k=16, iters=2,
                                   train_cap=cap)
    cmap = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert len(cmap) == n              # full corpus encoded
    release(codes)
    codes2, books2 = pq_train_encode(emb.repartition(17), "embedding",
                                     "vec_id", m=8, codebook_k=16,
                                     iters=2, train_cap=cap)
    assert books2 == books
    assert {r["vec_id"]: r["codes"]
            for r in codes2.collect()} == cmap
    release(codes2)
    # and a different cap trains a different quantizer (the cap is
    # load-bearing, not a no-op)
    _, books3 = pq_train_encode(emb, "embedding", "vec_id", m=8,
                                codebook_k=16, iters=2, train_cap=32)
    assert books3 != books


def test_kmeans_sampled_training_partition_invariant(spark, sf_dir):
    """kmeans train_cap: same clustering on any partitioning; the
    final assignment covers the full corpus."""
    import charmpandas_spark as cps

    from charmpandas_spark.functions.kmeans import kmeans_fit_predict

    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    n = emb.count()
    a = {r["vec_id"]: r["cluster"]
         for r in kmeans_fit_predict(emb, "embedding", "vec_id", k=8,
                                     iters=2, train_cap=64).collect()}
    assert len(a) == n
    b = {r["vec_id"]: r["cluster"]
         for r in kmeans_fit_predict(emb.repartition(17), "embedding",
                                     "vec_id", k=8, iters=2,
                                     train_cap=64).collect()}
    assert a == b


def test_dedup_incremental_bloom_skips_clean_batch(spark, tmp_path):
    """Two-tier incremental dedup: a batch with NO overlap against
    the index probes the Bloom summary, finds every fingerprint
    negative, and never reads an index bucket — the executed plan
    contains no scan of the bucketed index at all (only the
    _cps_bloom scan). An overlapping batch still dedups exactly."""
    from charmpandas_spark.functions.dedup import (
        dedup_incremental, fingerprint_index_write, release)

    hist = spark.createDataFrame(
        [(1, "historical content one"), (2, "historical content two")],
        "doc_id bigint, t string")
    path = str(tmp_path / "fpbloom")
    fingerprint_index_write(hist, "t", "doc_id", path, num_buckets=8)

    clean = spark.createDataFrame(
        [(10, "fresh text alpha"), (11, "fresh text beta")],
        "doc_id bigint, t string")
    out = dedup_incremental(spark, clean, path, "t", "doc_id",
                            num_buckets=8)
    assert {r["doc"] for r in out.collect()} == {10, 11}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the summary was consulted (a word-table scan is in the plan;
    # paths are truncated in toString, so match the read schema)
    assert "word:bigint,bits:bigint" in plan
    # ...but the bucketed index itself was never planned into a scan
    assert "bucket=" not in plan
    assert "PartitionFilters: [bucket" not in plan
    release(out)

    # overlap: exact semantics unchanged through the bloom tier
    mixed = spark.createDataFrame(
        [(20, "historical content one"), (21, "brand new text")],
        "doc_id bigint, t string")
    out2 = dedup_incremental(spark, mixed, path, "t", "doc_id",
                             num_buckets=8)
    assert {r["doc"] for r in out2.collect()} == {21}
    release(out2)


def test_minhash_incremental_bloom_skips_clean_batch(spark, tmp_path):
    """Two-tier NEAR-dup incremental: a batch sharing no LSH band
    with history probes the band-key Bloom summary, finds every key
    negative, and never reads an index bucket (no bucket scan in the
    executed plan). An overlapping batch still matches exactly, and
    append_novel keeps the summary current so a re-send of novel
    content matches WITHOUT the bloom hiding it."""
    from charmpandas_spark.functions.dedup import (
        minhash_dedup_incremental, minhash_index_write, release)

    base = ("the quick brown fox jumps over the lazy dog again "
            "and again with many shared tokens in this sentence")
    hist = spark.createDataFrame([(1, base)], "doc_id bigint, t string")
    path = str(tmp_path / "mhbloom")
    minhash_index_write(hist, "t", "doc_id", path, num_buckets=8)

    clean = spark.createDataFrame(
        [(10, "entirely different novel prose about other topics "
              "with no shared phrasing whatsoever at all")],
        "doc_id bigint, t string")
    out = minhash_dedup_incremental(spark, clean, path, "t", "doc_id",
                                    threshold=0.7, num_buckets=8,
                                    append_novel=True)
    assert out.collect() == []
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "bucket=" not in plan
    assert "PartitionFilters: [bucket" not in plan
    release(out)

    # overlap still matches through the bloom tier
    dup = spark.createDataFrame([(20, base + " extra")],
                                "doc_id bigint, t string")
    out2 = minhash_dedup_incremental(spark, dup, path, "t", "doc_id",
                                     threshold=0.7, num_buckets=8)
    assert {(r["doc"], r["matched_doc"])
            for r in out2.collect()} == {(20, 1)}
    release(out2)

    # the append_novel bloom delta keeps doc 10 findable
    resend = spark.createDataFrame(
        [(30, "entirely different novel prose about other topics "
              "with no shared phrasing whatsoever at all")],
        "doc_id bigint, t string")
    out3 = minhash_dedup_incremental(spark, resend, path, "t",
                                     "doc_id", threshold=0.7,
                                     num_buckets=8)
    assert {(r["doc"], r["matched_doc"])
            for r in out3.collect()} == {(30, 10)}
    release(out3)


# ---------------------------------------------------------------------------
# weighted quantiles
# ---------------------------------------------------------------------------

def test_weighted_quantiles_basic(spark):
    from charmpandas_spark.functions.profile import weighted_quantiles
    # group g: x=1 w=1, x=2 w=1, x=10 w=8 -> total 10.
    # p50: cum(1)=1 <5, cum(2)=2 <5, cum(10)=10 >=5 -> 10
    # p10: cum(1)*1e6 >= 1e5*10 -> 1_000_000 >= 1_000_000 -> x=1
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 10, 8)],
        "grp string, x long, w long")
    out = weighted_quantiles(df, "x", "w", ["grp"],
                             ps=(0.1, 0.5, 0.99)).collect()[0]
    assert out["n"] == 3 and out["total_w"] == 10
    assert out["wq_100000"] == 1
    assert out["wq_500000"] == 10
    assert out["wq_990000"] == 10


def test_weighted_quantiles_uniform_weights_match_rank(spark):
    from charmpandas_spark.functions.profile import weighted_quantiles
    # w == 1 everywhere degenerates to the type-1 unweighted
    # quantile: smallest x with rank/n >= p
    xs = [5, 1, 9, 3, 7]  # sorted: 1 3 5 7 9
    df = spark.createDataFrame([("g", x, 1) for x in xs],
                               "grp string, x long, w long")
    out = weighted_quantiles(df, "x", "w", ["grp"],
                             ps=(0.2, 0.5, 0.8, 1.0)).collect()[0]
    assert out["wq_200000"] == 1   # cum 1/5 >= 0.2
    assert out["wq_500000"] == 5   # cum 3/5 >= 0.5
    assert out["wq_800000"] == 7   # cum 4/5 >= 0.8
    assert out["wq_1000000"] == 9


def test_weighted_quantiles_drops_nonpositive_and_null_weights(spark):
    from charmpandas_spark.functions.profile import weighted_quantiles
    df = spark.createDataFrame(
        [("g", 1, 4), ("g", 100, 0), ("g", 200, -3), ("g", 300, None)],
        "grp string, x long, w long")
    out = weighted_quantiles(df, "x", "w", ["grp"]).collect()[0]
    assert out["n"] == 1 and out["total_w"] == 4
    assert out["wq_990000"] == 1


def test_weighted_quantiles_drops_cast_failures(spark):
    # ADVICE r13: a non-castable x used to survive a PRE-cast null
    # check as __wq_x=NULL, carry weight into total_w, and sort first
    # in the window — skewing every quantile. Under Spark 4's default
    # ANSI mode the cast errors loudly (same as DuckDB's CAST — no
    # silent divergence possible); with ANSI off, legacy cast yields
    # NULL and the POST-cast filter must drop the row entirely
    # (weight excluded from the denominator).
    import pytest
    from charmpandas_spark.functions.profile import weighted_quantiles
    df = spark.createDataFrame(
        [("g", "1", 1), ("g", "2", 1), ("g", "not-a-number", 98)],
        "grp string, x string, w long")
    with pytest.raises(Exception, match="(?i)number|cast|ansi"):
        weighted_quantiles(df, "x", "w", ["grp"],
                           ps=(0.5,)).collect()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        out = weighted_quantiles(df, "x", "w", ["grp"],
                                 ps=(0.5, 0.99)).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert out["n"] == 2 and out["total_w"] == 2
    assert out["wq_500000"] == 1
    assert out["wq_990000"] == 2


def test_group_quantiles_accepts_expression_string(spark):
    # ADVICE r13: the one-buffer rewrite silently narrowed `col` to
    # plain names; the public contract (mirrored by
    # group_quantiles_sql) accepts SQL expression strings too.
    from charmpandas_spark.functions.profile import group_quantiles
    df = spark.createDataFrame(
        [("g", 1.23), ("g", 4.56), ("g", 7.89)],
        "grp string, v double")
    out = group_quantiles(df, "CAST(FLOOR(v * 100) AS BIGINT)",
                          ["grp"], ps=(0.5,)).collect()[0]
    # FLOOR(4.56*100) = 455: 4.56*100 is 455.999... in binary — the
    # same value DuckDB's twin expression produces.
    assert out["n"] == 3 and out["q_5000"] == 455.0


def test_group_quantiles_non_identifier_bare_name(spark):
    # ADVICE r14: a string that exactly matches a column name must be
    # treated as a NAME even when it is not a valid SQL identifier —
    # 'a-b' routed through F.expr would parse as subtraction.
    from charmpandas_spark.functions.profile import group_quantiles
    df = spark.createDataFrame(
        [("g", 10, 3), ("g", 20, 3), ("g", 30, 3)],
        "grp string, `a-b` long, b long")
    out = group_quantiles(df, "a-b", ["grp"], ps=(0.5,)).collect()[0]
    assert out["n"] == 3 and out["q_5000"] == 20.0  # NOT (a-b)=17


def test_weighted_quantiles_partition_invariant(spark):
    import random
    from charmpandas_spark.functions.profile import weighted_quantiles
    rng = random.Random(3)
    rows = [(f"g{i % 3}", rng.randint(0, 50), rng.randint(1, 9))
            for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, x long, w long")
    a = sorted(map(tuple, weighted_quantiles(
        df, "x", "w", ["grp"]).collect()))
    b = sorted(map(tuple, weighted_quantiles(
        df.repartition(17), "x", "w", ["grp"]).collect()))
    assert a == b
