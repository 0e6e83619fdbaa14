"""Wave-5 operators: association rules, seasonal/CUSUM diagnostics,
chi-square feature selection — hand-computed small-case witnesses
(the registry queries cover the sf0.01 oracle equivalence)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

MICRO = 1_000_000


def test_association_rules_hand_computed(spark):
    from charmpandas_spark.operators.itemsets import association_rules
    rows = [(1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup (1,a) row
            (2, "a"), (2, "b"),
            (3, "a")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(df, "bk", "it").collect()}
    # n_baskets=3, n(a)=3, n(b)=2, n(c)=1, n(a,b)=2, n(a,c)=1
    ab = out[("a", "b")]
    assert ab.n_ab == 2
    assert ab.support_micro == (MICRO * 2) // 3
    assert ab.confidence_micro == (MICRO * 2) // 3
    assert ab.lift_micro == (((MICRO * 2) // 3) * 3) // 2  # = 1.0
    ba = out[("b", "a")]
    assert ba.confidence_micro == MICRO  # a in every b-basket
    assert ba.lift_micro == (MICRO * 3) // 3
    ca = out[("c", "a")]
    assert ca.confidence_micro == MICRO
    assert ca.lift_micro == MICRO
    assert set(out) == {("a", "b"), ("b", "a"), ("a", "c"),
                        ("c", "a"), ("b", "c"), ("c", "b")}


def test_association_rules_basket_cap_is_lossy_subset(spark):
    from charmpandas_spark.operators.itemsets import association_rules
    rows = [(1, x) for x in "abcd"] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    full = association_rules(df, "bk", "it").collect()
    capped = association_rules(df, "bk", "it",
                               max_items_per_basket=2).collect()
    # cap keeps the 2 alphabetically-first items of basket 1: {a, b}
    pairs_capped = {(r.antecedent, r.consequent) for r in capped}
    pairs_full = {(r.antecedent, r.consequent) for r in full}
    assert pairs_capped == {("a", "b"), ("b", "a")}
    assert pairs_capped <= pairs_full


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)


def test_seasonal_decompose_hand_computed(spark):
    from charmpandas_spark.operators.seasonal import seasonal_decompose
    # two days of a 2-bucket "day": phase0 buckets have 3 events,
    # phase1 buckets have 1 (period=2 on hourly buckets)
    rows = []
    eid = 0
    for day in range(2):
        for phase, n in ((0, 3), (1, 1)):
            for _ in range(n):
                rows.append((eid, _ts(day * 2 + phase), "t"))
                eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = {(r.bucket, ): r for r in seasonal_decompose(
        df, "ts", ["event_type"], 3600 * MICRO, period=2).collect()}
    assert len(out) == 4
    for (b,), r in out.items():
        want_seasonal = 3 * MICRO if r.phase == 0 else 1 * MICRO
        assert r.seasonal_micro == want_seasonal
        assert r.level_micro == 2 * MICRO  # (3+1+3+1)/4
        assert r.resid_micro == MICRO * r.n - want_seasonal == 0


def test_cusum_changepoint_finds_level_shift(spark):
    from charmpandas_spark.operators.seasonal import cusum_changepoint
    # 6 hourly buckets: counts 1,1,1,5,5,5 -> mean=3, S_t peaks
    # (|S|) at bucket index 2 (S=-6) just before the shift
    rows = []
    eid = 0
    for h, n in enumerate([1, 1, 1, 5, 5, 5]):
        for _ in range(n):
            rows.append((eid, _ts(h), "t"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    r = cusum_changepoint(df, "ts", ["event_type"],
                          3600 * MICRO).collect()[0]
    assert r.mean_micro == 3 * MICRO and r.n_buckets == 6
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    want_bucket = int(base.timestamp() * MICRO) // (3600 * MICRO) + 2
    assert r.cp_bucket == want_bucket
    assert r.s_micro == -6 * MICRO


def test_chi2_tokens_perfect_discriminator_ranks_first(spark):
    from charmpandas_spark.functions.featsel import chi2_tokens
    rows = ([(i, "apple zebra common", "A") for i in range(4)]
            + [(100 + i, "banana yellow common", "B")
               for i in range(4)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = chi2_tokens(df, "text", "doc_id", "source",
                      top_k=2, min_df=2).collect()
    byl = {}
    for r in out:
        byl.setdefault(r.label, []).append(r)
    # perfect discriminators: chi2 = N = 8 -> 8000 milli; 'common'
    # (in every doc) has zero-denominator cells and is dropped
    toks_a = {r.token for r in byl["A"]}
    assert toks_a == {"apple", "zebra"}
    for r in byl["A"]:
        assert (r.n11, r.n10, r.n01, r.n00) == (4, 0, 0, 4)
        assert r.chi2_milli == 8000
    assert all(r.token in {"banana", "yellow"} for r in byl["B"])
    assert "common" not in {r.token for r in out}


def test_calibration_table_hand_computed(spark):
    from charmpandas_spark.functions.quality import calibration_table
    # 8 rows, scores 1..8 micro, labels positive iff score > 4
    rows = [(i * MICRO, i > 4) for i in range(1, 9)]
    df = spark.createDataFrame(rows, ["score_micro", "y"])
    out = {r.bucket: r for r in
           calibration_table(df, "score_micro", "y",
                             buckets=4).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert all(r.n == 2 for r in out.values())
    assert [out[b].pos for b in range(4)] == [0, 0, 2, 2]
    assert out[3].pos_rate_micro == MICRO
    assert out[0].mean_score_micro == (1 * MICRO + 2 * MICRO) // 2


def test_top_sequences_orders_and_ties(spark):
    import datetime as dt

    from charmpandas_spark.operators.sequence import top_sequences
    # user 1: a b c a b c  -> abc x2, bca, cab
    # user 2: a b c        -> abc
    rows = []
    for u, seq in ((1, "abcabc"), (2, "abc")):
        for i, s in enumerate(seq):
            rows.append((u * 100 + i, u,
                         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                         s))
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts",
                                      "state"])
    got = [(r.s1, r.s2, r.s3, r.n) for r in
           top_sequences(df, "user_id", "ts", "event_id", "state",
                         k=3).collect()]
    assert got[0] == ("a", "b", "c", 3)
    assert got[1:] == [("b", "c", "a", 1), ("c", "a", "b", 1)]


def test_seasonal_anomalies_hand_computed(spark):
    from charmpandas_spark.operators.seasonal import seasonal_anomalies
    # 4 days of a 2-bucket "day" (period=2 on hourly buckets).
    # phase0 counts 3,3,3,11 (day-3 spike); phase1 counts 1,1,1,1.
    # seasonal(phase0) = (3+3+3+11)/4 = 5 -> resids -2,-2,-2,+6;
    # seasonal(phase1) = 1 -> resids 0,0,0,0.
    # med(resids) = (v[3]+v[4])/2 of [-2,-2,-2,0,0,0,0,6] = 0;
    # MAD = median of [0,0,0,0,2,2,2,6] = (0+2)/2 = 1 MICRO.
    # k=3 -> only the +6 residual exceeds 3*MAD.
    rows = []
    eid = 0
    for day, n0 in enumerate([3, 3, 3, 11]):
        for phase, n in ((0, n0), (1, 1)):
            for _ in range(n):
                rows.append((eid, _ts(day * 2 + phase), "t"))
                eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = seasonal_anomalies(df, "ts", ["event_type"], 3600 * MICRO,
                             period=2, k=3.0).collect()
    assert len(out) == 8
    for r in out:
        assert r.med == 0.0 and r.mad == 1.0 * MICRO
    flagged = [r for r in out if r.is_anomaly]
    assert len(flagged) == 1
    assert flagged[0].n == 11 and flagged[0].resid_micro == 6 * MICRO
