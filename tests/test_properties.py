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