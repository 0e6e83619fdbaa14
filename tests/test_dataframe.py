"""End-to-end tests of the pandas-flavored API, modeled on the
reference's only assert-based test (examples/test_datetime.py):
public API in, pandas comparison out."""

import datetime

import numpy as np
import pandas as pd
import pytest

import charmpandas_spark as cps


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "lineitem")


@pytest.fixture(scope="module")
def li_pd(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "lineitem").get()


def test_read_get_roundtrip(li, li_pd):
    assert len(li_pd) == li.count()
    assert "l_orderkey" in li.columns
    # dtype preservation through read->fetch (test_datetime.py:69-71)
    assert li_pd["l_orderkey"].dtype == np.int64
    assert li_pd["l_quantity"].dtype == np.float64
    assert pd.api.types.is_datetime64_any_dtype(li_pd["l_shipdate"])


def test_column_arithmetic(li, li_pd):
    df = cps.DataFrame(li.sdf)
    df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"]) + 0.0
    got = df.get()
    want = li_pd["l_extendedprice"] * (1 - li_pd["l_discount"])
    assert np.allclose(np.sort(got["rev"].values), np.sort(want.values))


def test_comparisons_and_filter(li, li_pd):
    for op, fn in [
        ("lt", lambda c, v: c < v), ("le", lambda c, v: c <= v),
        ("gt", lambda c, v: c > v), ("ge", lambda c, v: c >= v),
        ("eq", lambda c, v: c == v), ("ne", lambda c, v: c != v),
    ]:
        got = li[fn(li["l_quantity"], 25.0)].count()
        want = int(fn(li_pd["l_quantity"], 25.0).sum())
        assert got == want, op


def test_boolean_combinators(li, li_pd):
    mask = (li["l_quantity"] > 10.0) & ~(li["l_returnflag"] == "A")
    got = li[mask].count()
    want = int(((li_pd["l_quantity"] > 10.0)
                & (li_pd["l_returnflag"] != "A")).sum())
    assert got == want


def test_setitem_add_and_replace(li):
    df = cps.DataFrame(li.sdf)
    ncols = len(df.columns)
    df["x"] = df["l_quantity"] * 2
    assert len(df.columns) == ncols + 1  # add if new
    df["x"] = df["l_quantity"] * 3      # replace if exists
    assert len(df.columns) == ncols + 1
    got = df.get()
    assert np.allclose(got["x"], got["l_quantity"] * 3)


def test_timestamp_literal_filter(li, li_pd):
    # reference wire type Timestamp=3 (charmpandas/ast.py:55-61)
    cut = datetime.datetime(1995, 6, 1)
    got = li[li["l_shipdate"] >= cut].count()
    want = int((li_pd["l_shipdate"] >= cut).sum())
    assert got == want


def test_int_literal_widening(spark, sf_dir):
    # int32 column vs Python int literal (src/partition.cpp:689-694)
    part = cps.read_table(spark, sf_dir, "part")
    ppd = part.get()
    got = part[part["p_size"] > 25].count()
    assert got == int((ppd["p_size"] > 25).sum())


def test_cross_dataframe_positional_alignment(spark, sf_dir):
    # examples/create_table.py:17-18 semantics
    d1 = cps.read_table(spark, sf_dir, "supplier")
    d2 = cps.read_table(spark, sf_dir, "supplier")
    d1["test"] = d1["s_acctbal"] + 2 * d2["s_acctbal"]
    got = d1.get()
    assert np.allclose(got["test"], 3 * got["s_acctbal"])


def test_positional_alignment_aqe_probe(spark, sf_dir):
    """VERDICT r13 #6: AQE-era robustness of the alignment guard.

    (a) The sanctioned path — two identically-partitioned scans —
        must give STABLE pairing with AQE enabled (it is: a parquet
        scan has no exchange for AQE to re-plan, and file-split
        ordering is deterministic). Asserted by running the same
        alignment twice and comparing element-wise.
    (b) Any plan AQE can re-plan between the two zipWithIndex passes
        must WARN: an aggregate output (Aggregate node; AQE coalesces
        its shuffle) and a sorted frame with tied keys (Sort node —
        added to the guard set this round: tie order under a range
        exchange is nondeterministic).
    """
    import warnings

    import pytest

    from charmpandas_spark.dataframe import _with_row_index

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    # (a) stable pairing on the sanctioned path, twice
    vals = []
    for _ in range(2):
        d1 = cps.read_table(spark, sf_dir, "supplier")
        d2 = cps.read_table(spark, sf_dir, "supplier")
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)  # no warn
            d1["test"] = d1["s_acctbal"] + 2 * d2["s_acctbal"]
            got = d1.get().sort_values("s_suppkey")
        assert np.allclose(got["test"], 3 * got["s_acctbal"])
        vals.append(list(got["test"]))
    assert vals[0] == vals[1]

    # (b) AQE-re-plannable plans warn
    sup = cps.read_table(spark, sf_dir, "supplier")._sdf
    agg = sup.groupBy("s_nationkey").count()
    with pytest.warns(RuntimeWarning, match="positional alignment"):
        _with_row_index(agg, "__p__")
    tied_sort = sup.orderBy("s_nationkey")  # ~4 suppliers per key: ties
    with pytest.warns(RuntimeWarning, match="positional alignment"):
        _with_row_index(tied_sort, "__p__")


def test_scalar_reductions(li, li_pd):
    assert li["l_quantity"].sum() == pytest.approx(li_pd["l_quantity"].sum())
    assert li["l_quantity"].count() == li_pd["l_quantity"].count()
    assert li["l_quantity"].min() == li_pd["l_quantity"].min()
    assert li["l_quantity"].max() == li_pd["l_quantity"].max()
    assert li["l_quantity"].mean() == pytest.approx(li_pd["l_quantity"].mean())


def test_sort_values_multikey(li, li_pd):
    got = li.sort_values(["l_returnflag", "l_quantity"],
                         ascending=[True, False]).limit(50).get()
    want = li_pd.sort_values(["l_returnflag", "l_quantity"],
                             ascending=[True, False]).head(50)
    assert list(got["l_returnflag"]) == list(want["l_returnflag"])
    assert np.allclose(got["l_quantity"].values, want["l_quantity"].values)


def test_concat(li):
    a = li[li["l_quantity"] > 40.0]
    b = li[li["l_quantity"] <= 40.0]
    assert cps.concat([a, b]).count() == li.count()


def test_head_and_limit(li):
    assert len(li.head(7)) == 7
    assert li.limit(13).count() == 13


def test_distinct_and_dropdup(spark, sf_dir):
    cust = cps.read_table(spark, sf_dir, "customer")
    cpd = cust.get()
    got = cust[["c_mktsegment"]].distinct().count()
    assert got == cpd["c_mktsegment"].nunique()
    got2 = cust.drop_duplicates(["c_nationkey"]).count()
    assert got2 == cpd["c_nationkey"].nunique()


def test_rename_drop(li):
    df = li.rename({"l_quantity": "qty"})
    assert "qty" in df.columns and "l_quantity" not in df.columns
    df2 = li.drop("l_tax", "l_discount")
    assert "l_tax" not in df2.columns


def test_intersect_except(spark, sf_dir):
    cust = cps.read_table(spark, sf_dir, "customer")
    supp = cps.read_table(spark, sf_dir, "supplier")
    a = cust[["c_nationkey"]].rename({"c_nationkey": "k"})
    b = supp[["s_nationkey"]].rename({"s_nationkey": "k"})
    ca = set(cust.get()["c_nationkey"])
    cb = set(supp.get()["s_nationkey"])
    got_i = set(a.intersect(b).get()["k"])
    got_e = set(a.except_(b).get()["k"])
    assert got_i == (ca & cb)
    assert got_e == (ca - cb)


def test_merge_asof_api(spark, sf_dir):
    ev = cps.read_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F
    clicks = cps.DataFrame(ev.sdf.filter(F.col("event_type") == "click")
                           .select("event_id", "user_id", "ts"))
    purch = cps.DataFrame(ev.sdf.filter(F.col("event_type") == "purchase")
                          .select("user_id", "ts", "value"))
    out = clicks.merge_asof(purch, on="ts", by="user_id")
    assert out.count() == clicks.count()
    assert "value_asof" in out.columns


def test_describe_and_value_counts(spark, sf_dir):
    import charmpandas_spark as cps

    docs = cps.read_table(spark, sf_dir, "documents")
    prof = docs.describe(["doc_id", "lang"]).get()
    byc = {r["column"]: r for _, r in prof.iterrows()}
    n = docs.count()
    assert byc["doc_id"]["n_rows"] == n
    assert byc["doc_id"]["n_distinct"] == n      # unique key
    assert byc["lang"]["min_str"] is not None

    vc = docs.value_counts("lang", k=2).get()
    assert list(vc.columns) == ["lang", "count"]
    assert len(vc) <= 2
    assert vc["count"].is_monotonic_decreasing
    assert vc["count"].sum() <= n

    # pin the ONE surviving signature of each method (VERDICT r10 #4:
    # earlier duplicate definitions with different signatures were
    # silently shadowed — a reintroduced duplicate must fail here)
    import inspect
    assert list(inspect.signature(docs.describe).parameters) == \
        ["columns"]
    assert list(inspect.signature(docs.value_counts).parameters) == \
        ["column", "k"]
