"""Property-based tests (hypothesis): random small frames through the
engine must agree with pandas on joins, sorts, and aggregations.
The reference had no property testing at all (SURVEY §5); these
harden the semantics layer against edge shapes (dup keys, all-equal
keys, singletons, negative values)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import charmpandas_spark as cps

KEYS = st.lists(st.integers(min_value=0, max_value=5),
                min_size=1, max_size=25)
VALS = st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, width=32),
                min_size=1, max_size=25)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _frames(spark, keys, vals):
    n = min(len(keys), len(vals))
    pdf = pd.DataFrame({"k": keys[:n],
                        "v": [float(v) for v in vals[:n]]})
    return pdf, cps.DataFrame(spark.createDataFrame(pdf))


@given(keys=KEYS, vals=VALS, keys2=KEYS)
@settings(**_SETTINGS)
def test_merge_counts_match_pandas(spark, keys, vals, keys2):
    pdf1, df1 = _frames(spark, keys, vals)
    pdf2 = pd.DataFrame({"k": keys2})
    df2 = cps.DataFrame(spark.createDataFrame(pdf2))
    for how, pandas_how in [("inner", "inner"), ("left", "left"),
                            ("outer", "outer")]:
        got = df1.merge(df2, on="k", how=how).count()
        want = len(pdf1.merge(pdf2, on="k", how=pandas_how))
        assert got == want, how
    semi = df1.merge(df2, on="k", how="left_semi").count()
    assert semi == len(pdf1[pdf1["k"].isin(pdf2["k"])])
    anti = df1.merge(df2, on="k", how="left_anti").count()
    assert anti == len(pdf1[~pdf1["k"].isin(pdf2["k"])])


@given(keys=KEYS, vals=VALS)
@settings(**_SETTINGS)
def test_groupby_sum_matches_pandas(spark, keys, vals):
    pdf, df = _frames(spark, keys, vals)
    got = df.groupby("k")["v"].sum().get().set_index("k")["sum(v)"]
    want = pdf.groupby("k")["v"].sum()
    assert set(got.index) == set(want.index)
    for k in want.index:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9)


@given(keys=KEYS, vals=VALS)
@settings(**_SETTINGS)
def test_sort_is_total_and_stable_on_values(spark, keys, vals):
    pdf, df = _frames(spark, keys, vals)
    got = df.sort_values(["v", "k"]).get()
    want = pdf.sort_values(["v", "k"]).reset_index(drop=True)
    assert np.array_equal(got["v"].values, want["v"].values)
    assert np.array_equal(got["k"].values, want["k"].values)


@given(keys=KEYS, vals=VALS)
@settings(**_SETTINGS)
def test_concat_filter_partition_invariant(spark, keys, vals):
    pdf, df = _frames(spark, keys, vals)
    hi = df[df["v"] > 0.0]
    lo = df[~(df["v"] > 0.0)]
    assert cps.concat([hi, lo]).count() == len(pdf)
    # distinct count matches pandas regardless of duplicates
    assert df[["k"]].distinct().count() == pdf["k"].nunique()

EDGES = st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                 min_size=1, max_size=30)


@given(edges=EDGES)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_match_union_find_random(spark, edges):
    """Random graphs (self-loops, parallel edges, chains): distributed
    min-label propagation == driver union-find."""
    from charmpandas_spark.functions.dedup import connected_components
    pdf = pd.DataFrame(edges, columns=["s", "d"])
    comp = connected_components(
        cps.DataFrame(spark.createDataFrame(pdf)).sdf, "s", "d") \
        .toPandas().set_index("v")["component"].to_dict()

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    verts = set(v for e in edges for v in e)
    assert set(comp) == verts
    for v in verts:
        assert comp[v] == find(v), (v, edges)


@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40,
                     unique=True),
       w=st.floats(min_value=0.05, max_value=0.9, allow_nan=False))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_assign_splits_total_and_determinism(spark, keys, w):
    """Splits partition the input for arbitrary weights, and the
    assignment is a pure function of (key, weights, seed)."""
    from charmpandas_spark.functions.sampling import assign_splits
    pdf = pd.DataFrame({"k": keys})
    df = spark.createDataFrame(pdf)
    r = round(w, 4)
    weights = {"a": r, "b": 1.0 - r}
    out1 = assign_splits(df, "k", weights).toPandas() \
        .set_index("k")["split"].to_dict()
    out2 = assign_splits(df.repartition(5), "k", weights).toPandas() \
        .set_index("k")["split"].to_dict()
    assert out1 == out2
    assert len(out1) == len(keys) and set(out1.values()) <= {"a", "b"}


@given(
    ts=st.lists(st.integers(min_value=0, max_value=500),
                min_size=1, max_size=30),
    keys=KEYS,
    window=st.integers(min_value=1, max_value=120),
    mult_pct=st.integers(min_value=100, max_value=300),
)
@settings(**_SETTINGS)
def test_chunked_range_agg_matches_pandas(spark, ts, keys, window,
                                          mult_pct):
    """chunked_range_agg == per-key trailing-range brute force, for
    random timestamps (ties included), keys, window widths, and
    chunk_width >= window — frames straddling chunk boundaries at any
    offset must be exact."""
    from pyspark.sql import functions as F

    from charmpandas_spark.streaming.windows import chunked_range_agg

    n = min(len(ts), len(keys))
    pdf = pd.DataFrame({"rid": range(n), "k": keys[:n], "t": ts[:n]})
    sdf = spark.createDataFrame(pdf)
    got = chunked_range_agg(
        sdf, ["k"], F.col("t").cast("long"),
        {"s": F.sum("t"), "n": F.count(F.lit(1))},
        window=window, chunk_width=window * mult_pct // 100,
    ).toPandas().set_index("rid").sort_index()
    for r in pdf.itertuples():
        frame = pdf[(pdf.k == r.k) & (pdf.t <= r.t)
                    & (pdf.t >= r.t - window)]
        assert got.loc[r.rid, "n"] == len(frame), (r, window)
        assert got.loc[r.rid, "s"] == frame["t"].sum(), (r, window)


TOKENS = st.lists(st.integers(min_value=0, max_value=120),
                  min_size=1, max_size=40)


@given(tokens=TOKENS, budget=st.integers(min_value=8, max_value=64))
@settings(**_SETTINGS)
def test_pack_sequences_matches_sequential(spark, tokens, budget):
    """Distributed prefix-sum packing == the trivial sequential pack
    for arbitrary token-count lists (incl. zeros and > budget)."""
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.functions.text import pack_sequences
    pdf = pd.DataFrame({"doc": list(range(len(tokens))),
                        "chunk_idx": [0] * len(tokens),
                        "n_tokens": tokens})
    out = pack_sequences(cps.DataFrame(spark.createDataFrame(pdf)).sdf,
                         "n_tokens", ("doc", "chunk_idx"),
                         budget=budget, num_partitions=3)
    got = out.toPandas().sort_values("doc").reset_index(drop=True)
    release(out)
    start = 0
    for i, t in enumerate(tokens):
        assert got.loc[i, "seq_id"] == start // budget
        assert got.loc[i, "seq_offset"] == start % budget
        end = start + max(t, 1)
        assert got.loc[i, "n_seqs"] == \
            (end - 1) // budget - start // budget + 1
        start += t


@given(tokens=st.lists(st.integers(min_value=1, max_value=90),
                       min_size=1, max_size=40),
       budget=st.integers(min_value=10, max_value=60))
@settings(**_SETTINGS)
def test_pack_greedy_invariants(spark, tokens, budget):
    """Greedy next-fit: multi-chunk bins never exceed the budget;
    every chunk is assigned exactly once; bins are contiguous in
    order within each group."""
    from charmpandas_spark.functions.text import pack_greedy
    pdf = pd.DataFrame({"doc": list(range(len(tokens))),
                        "chunk_idx": [0] * len(tokens),
                        "n_tokens": tokens,
                        "grp": [i % 3 for i in range(len(tokens))]})
    got = (pack_greedy(cps.DataFrame(spark.createDataFrame(pdf)).sdf,
                       "n_tokens", ("doc", "chunk_idx"),
                       budget=budget, group_col="grp")
           .toPandas())
    assert len(got) == len(tokens)
    per_bin = got.groupby("bin_id").agg(tok=("n_tokens", "sum"),
                                        n=("n_tokens", "size"))
    over = per_bin[(per_bin.tok > budget) & (per_bin.n > 1)]
    assert over.empty, over
    # within a group, bin local-ids increase monotonically in doc order
    for _, sub in got.sort_values("doc").groupby("grp"):
        locals_ = (sub["bin_id"] % (1 << 32)).tolist()
        assert locals_ == sorted(locals_)


@given(t_keys=st.lists(st.integers(0, 8), min_size=1, max_size=15,
                       unique=True),
       s_keys=st.lists(st.integers(0, 12), min_size=0, max_size=10,
                       unique=True),
       vals=st.lists(st.integers(-100, 100), min_size=1, max_size=15))
@settings(**_SETTINGS)
def test_merge_into_matches_dict_semantics(spark, t_keys, s_keys, vals):
    """merge_into == dict.update + inserts, on random unique-keyed
    frames, under BOTH physical plans."""
    from charmpandas_spark.operators.merge import merge_into

    tgt = {k: v for k, v in zip(t_keys, vals)}
    src = {k: k * 7 - 3 for k in s_keys}
    want = dict(tgt)
    want.update(src)

    target = spark.createDataFrame([(k, v) for k, v in tgt.items()],
                                   "k long, v long")
    source = spark.createDataFrame([(k, v) for k, v in src.items()],
                                   "k long, v long") \
        if src else spark.createDataFrame([], "k long, v long")
    for bc in (False, True):
        got = {r["k"]: r["v"]
               for r in merge_into(target, source, ["k"],
                                   broadcast_source=bc).collect()}
        assert got == want, f"broadcast={bc}"


@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", ""]),
             min_size=1, max_size=6),
    min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_line_dedup_matches_python_reference(spark, docs):
    """line_dedup == a sequential python replay of the df>=K rule
    (blank lines exempt, order preserved, hollow docs kept)."""
    from collections import defaultdict

    from charmpandas_spark.functions.dedup import line_dedup, release

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    # python reference
    df_count = defaultdict(set)
    for i, lines in enumerate(docs):
        for ln in lines:
            key = ln.strip().lower()
            if key:
                df_count[key].add(i)
    boiler = {k for k, s in df_count.items() if len(s) >= 2}
    want = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines
                if ln.strip().lower() not in boiler]
        dropped = len(lines) - len(kept)
        want[i] = ("\n".join(kept), len(lines), dropped)

    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_dedup(sdf, "text", "doc_id", max_doc_freq=2)
    got = {r["doc"]: (r["text"], r["n_lines"], r["n_dropped"])
           for r in out.collect()}
    release(out)
    assert got == want


WORDS = st.lists(
    st.lists(st.sampled_from(["a", "b", "cat", "dog", "the", "x"]),
             min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=10)


@given(texts=WORDS)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bigram_lm_score_matches_python_replay(spark, texts):
    """Self-scored bigram LM == a sequential integer replay for ANY
    corpus (micro-unit Laplace probabilities, int64 sums)."""
    import collections

    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.functions.lm import bigram_lm_score

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, t string")
    out = {r["doc"]: (r["n_bigrams"], r["sum_micro_p"])
           for r in bigram_lm_score(df, "t", "doc_id").collect()}

    def toks(t):
        return [w for w in t.split() if w]

    bigrams = collections.Counter()
    for t in texts:
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
    ctx = collections.Counter()
    for (a, _), c in bigrams.items():
        ctx[a] += c
    vocab = {w for pair in bigrams for w in pair}
    v = len(vocab)
    for doc, t in enumerate(texts):
        ws = toks(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert doc not in out
            continue
        mps = [(bigrams[p] + 1) * 1_000_000 // (ctx[p[0]] + v)
               for p in pairs]
        assert out[doc] == (len(pairs), sum(mps))


LEGS = st.lists(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)),
             min_size=1, max_size=15),
    min_size=1, max_size=3)


@given(legs=LEGS, k0=st.integers(min_value=1, max_value=100))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rrf_fuse_matches_python_replay(spark, legs, k0):
    """RRF fusion == integer python replay for any leg structure:
    per-leg ranks derive from per-query ordering; fused micro scores
    and ranks (score desc, item asc) must agree exactly."""
    import collections

    from pyspark.sql import Row
    from charmpandas_spark.functions.fusion import rrf_fuse

    ranked = []
    py = collections.defaultdict(lambda: [0, 0])
    for leg in legs:
        # build per-leg ranks: dedupe (q, item), rank by item for
        # determinism
        seen = sorted(set(leg))
        byq = collections.defaultdict(list)
        for q, item in seen:
            byq[q].append(item)
        rows = []
        for q, items in byq.items():
            for rank, item in enumerate(sorted(items), 1):
                rows.append(Row(q_id=q, item_id=item, rank=rank))
                py[(q, item)][0] += 1
                py[(q, item)][1] += 1_000_000 // (k0 + rank)
        ranked.append(spark.createDataFrame(rows))
    out = rrf_fuse(ranked, k0=k0).collect()
    got = {(r["q_id"], r["item_id"]): (r["n_legs"], r["rrf_micro"])
           for r in out}
    assert got == {k: tuple(v) for k, v in py.items()}
    # fused_rank consistent with (micro desc, item asc) per query
    byq = collections.defaultdict(list)
    for r in out:
        byq[r["q_id"]].append(r)
    for q, rows in byq.items():
        want = sorted(rows, key=lambda r: (-r["rrf_micro"], r["item_id"]))
        for rank, r in enumerate(want, 1):
            assert r["fused_rank"] == rank


TOKROWS = st.lists(st.tuples(st.integers(0, 2),      # source
                             st.integers(1, 400)),   # n_tok
                   min_size=1, max_size=40)


@given(rows=TOKROWS,
       budgets=st.dictionaries(st.sampled_from(["s0", "s1", "s2"]),
                               st.integers(0, 2000), max_size=3))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mixture_token_budget_matches_python_replay(spark, rows, budgets):
    """Token-budget mixture == sequential replay over the md5 hash
    order for any corpus/budget combination (first budget-crossing doc
    included; unbudgeted sources pass whole)."""
    import hashlib

    from charmpandas_spark.functions.sampling import mixture_token_budget

    data = [(f"s{src}", i, nt) for i, (src, nt) in enumerate(rows)]
    df = spark.createDataFrame(data, "src string, id long, n_tok long")
    got = {r["id"] for r in mixture_token_budget(
        df, "src", "id", "n_tok", budgets, hash_fn="md5").collect()}

    def bucket(key):
        h = int(hashlib.md5(f"0:{key}".encode()).hexdigest()[:15], 16)
        return h % 10_000

    want = set()
    by_src = {}
    for src, i, nt in data:
        by_src.setdefault(src, []).append((bucket(i), i, nt))
    for src, items in by_src.items():
        b = budgets.get(src)
        if b is None:
            want |= {i for _, i, _ in items}
            continue
        cum = 0
        for _, i, nt in sorted(items):
            if cum < b:
                want.add(i)
            cum += nt
    assert got == want


VECS = st.lists(
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=15)


@given(vecs=VECS)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quantize_matches_numpy_replay_both_layouts(spark, vecs):
    """Affine and centered quantization == a numpy replay of the same
    fixed-order IEEE expression, for arbitrary float corpora."""
    import math

    import numpy as np

    from charmpandas_spark.functions.quantize import quantize_embeddings

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id bigint, v array<double>")
    x = np.array([[float(c) for c in v] for v in vecs], dtype=np.float64)
    lo, hi = x.min(axis=0), x.max(axis=0)
    m = np.abs(x).max(axis=0)

    aff = {r["id"]: r["codes"] for r in
           quantize_embeddings(df, "v", "id").collect()}
    cen = {r["id"]: r["codes"] for r in
           quantize_embeddings(df, "v", "id", centered=True).collect()}
    for i, v in enumerate(vecs):
        for d, val in enumerate(v):
            val = float(np.float64(float(val)))
            if hi[d] == lo[d]:
                want_a = 0
            else:
                want_a = min(255, max(0, math.floor(
                    (val - lo[d]) * 255.0 / (hi[d] - lo[d]))))
            assert aff[i][d] == want_a
            if m[d] == 0:
                want_c = 0
            else:
                want_c = min(127, max(-127, math.floor(
                    val * 127.0 / m[d])))
            assert cen[i][d] == want_c


@given(texts=WORDS, bench_idx=st.sets(st.integers(0, 9), max_size=4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_decontaminate_matches_python_replay(spark, texts, bench_idx):
    """n-gram decontamination == a sequential set-overlap replay for
    arbitrary corpora and benchmark splits (3-gram, padding rule for
    short docs included)."""
    from charmpandas_spark.functions.dedup import decontaminate

    rows = list(enumerate(texts))
    bench = [(i, t) for i, t in rows if i in bench_idx]
    corpus = [(i, t) for i, t in rows if i not in bench_idx]
    if not bench or not corpus:
        return
    a = spark.createDataFrame(corpus, "doc_id bigint, t string")
    b = spark.createDataFrame(bench, "doc_id bigint, t string")
    out = {r["doc"]: (r["n_ngrams"], r["n_hits"]) for r in
           decontaminate(a, b, "t", "doc_id", n=3).collect()}

    def shingles(t):
        # mirror shingle_table's word path exactly: normalized split
        # WITHOUT dropping empties — a blank doc yields one
        # empty-string shingle (the Jaccard family's padding rule:
        # blank matches blank), shorter-than-n docs one whole-doc gram
        ws = " ".join(t.lower().split()).split(" ")
        if len(ws) <= 3:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    bset = set().union(*[shingles(t) for _, t in bench])
    for i, t in corpus:
        sh = shingles(t)
        assert out[i] == (len(sh), len(sh & bset))


@given(vals=st.lists(st.floats(min_value=-1e5, max_value=1e5,
                               allow_nan=False, width=32),
                     min_size=2, max_size=60),
       bins=st.integers(min_value=1, max_value=8))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_histogram_equiwidth_matches_python_replay(spark, vals, bins):
    """Equi-width bin counts == a python replay of the identical
    fixed-order double expression, for arbitrary float data."""
    import math

    from charmpandas_spark.functions.profile import histogram_equiwidth

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    rows = {r["bin"]: r["n"] for r in
            histogram_equiwidth(df, "x", bins).collect()}
    xs = [float(v) for v in vals]
    lo, hi = min(xs), max(xs)
    want = {b: 0 for b in range(bins)}
    for x in xs:
        if hi == lo:
            want[0] += 1  # degenerate (constant) range: ANSI-safe bin 0
        else:
            b = min(bins - 1,
                    math.floor((x - lo) * float(bins) / (hi - lo)))
            want[b] += 1
    assert rows == want


@given(data=st.lists(
           st.tuples(st.floats(min_value=-2, max_value=2,
                               allow_nan=False, width=32),
                     st.floats(min_value=-2, max_value=2,
                               allow_nan=False, width=32)),
           min_size=3, max_size=16),
       k=st.integers(min_value=1, max_value=3))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_capped_training_equals_uncapped_when_cap_covers_corpus(
        spark, data, k):
    """When train_cap >= n the hash-ordered sample IS the corpus, so
    the driver-side numpy training path must agree with the
    distributed loop BIT-FOR-BIT on arbitrary inputs — centroids
    (kmeans), selection (k-center), and codebooks (PQ) all compared
    by exact float equality. Hypothesis-randomized counterpart of the
    fixed-seed equivalence tests in test_encode_sequence.py."""
    from pyspark.sql import Row

    from charmpandas_spark.functions.coreset import kcenter_select
    from charmpandas_spark.functions.kmeans import kmeans_fit_predict
    from charmpandas_spark.functions.quantize import pq_train_encode

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(a), float(b)])
         for i, (a, b) in enumerate(data)])
    n = len(data)
    kk = min(k, n)

    _, c_np = kmeans_fit_predict(df, "embedding", "vec_id", k=kk,
                                 iters=2, train_cap=64,
                                 return_centroids=True)
    _, c_dist = kmeans_fit_predict(df, "embedding", "vec_id", k=kk,
                                   iters=2, train_cap=None,
                                   return_centroids=True)
    assert c_np == c_dist

    a = (kcenter_select(df, "embedding", "vec_id", kk, train_cap=64)
         .orderBy("rank").collect())
    b = (kcenter_select(df, "embedding", "vec_id", kk,
                        train_cap=None).orderBy("rank").collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    ck = min(4, n)
    _, b_np = pq_train_encode(df, "embedding", "vec_id", m=2,
                              codebook_k=ck, iters=2, train_cap=64)
    _, b_dist = pq_train_encode(df, "embedding", "vec_id", m=2,
                                codebook_k=ck, iters=2,
                                train_cap=None)
    assert b_np == b_dist


@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=20),
                               st.integers(min_value=1, max_value=9)),
                     min_size=1, max_size=30),
       p_micro=st.sampled_from([100_000, 500_000, 900_000, 1_000_000]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_quantiles_match_python_replay(spark, rows, p_micro):
    """weighted_quantiles == a direct python replay of the type-1
    definition (sort, cumulate, first x whose cum*1e6 >= p*total) on
    arbitrary integer data — including heavy duplicate-x runs, where
    the intra-run cumulative order is arbitrary but the emitted value
    must not be."""
    from charmpandas_spark.functions.profile import weighted_quantiles

    df = spark.createDataFrame([("g", x, w) for x, w in rows],
                               "grp string, x long, w long")
    p = p_micro / 1_000_000
    out = weighted_quantiles(df, "x", "w", ["grp"],
                             ps=(p,)).collect()[0]
    srt = sorted(rows)
    tot = sum(w for _, w in srt)
    cum, want = 0, None
    for x, w in srt:
        cum += w
        if cum * 1_000_000 >= p_micro * tot:
            want = x
            break
    assert out["total_w"] == tot
    assert out[f"wq_{p_micro}"] == want
