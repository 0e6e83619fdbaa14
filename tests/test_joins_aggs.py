"""Join (all 8 how types) and aggregation semantics vs pandas."""

import numpy as np
import pandas as pd
import pytest

import charmpandas_spark as cps


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    orders = cps.read_table(spark, sf_dir, "orders")
    li = cps.read_table(spark, sf_dir, "lineitem")
    return orders, li, orders.get(), li.get()


def _pd_semi(left, right, lk, rk):
    return left[left[lk].isin(right[rk])]


def _pd_anti(left, right, lk, rk):
    return left[~left[lk].isin(right[rk])]


def test_join_counts_all_types(frames):
    orders, li, opd, lpd = frames
    inner = opd.merge(lpd, left_on="o_orderkey", right_on="l_orderkey")
    cases = {
        "inner": len(inner),
        "left": len(opd.merge(lpd, left_on="o_orderkey",
                              right_on="l_orderkey", how="left")),
        "right": len(opd.merge(lpd, left_on="o_orderkey",
                               right_on="l_orderkey", how="right")),
        "outer": len(opd.merge(lpd, left_on="o_orderkey",
                               right_on="l_orderkey", how="outer")),
        "left_semi": len(_pd_semi(opd, lpd, "o_orderkey", "l_orderkey")),
        "left_anti": len(_pd_anti(opd, lpd, "o_orderkey", "l_orderkey")),
        "right_semi": len(_pd_semi(lpd, opd, "l_orderkey", "o_orderkey")),
        "right_anti": len(_pd_anti(lpd, opd, "l_orderkey", "o_orderkey")),
    }
    for how, want in cases.items():
        got = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey",
                           how=how).count()
        assert got == want, how


def test_join_on_suffixes(frames):
    orders, li, opd, lpd = frames
    a = li[["l_orderkey", "l_quantity"]]
    b = li[["l_orderkey", "l_quantity"]]
    j = a.merge(b, on="l_orderkey", how="inner")
    # BOTH key columns survive with _l/_r suffixes, like the reference
    # (on= forwards to Acero as left_keys AND right_keys,
    # src/partition.cpp:1099-1102) — not pandas' coalesced single key
    assert set(j.columns) == {"l_orderkey_l", "l_orderkey_r",
                              "l_quantity_l", "l_quantity_r"}


def test_join_semi_columns(frames):
    orders, li, _, _ = frames
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey",
                     how="left_semi")
    assert set(j.columns) == set(orders.columns)


def test_join_multikey_timestamp(spark, sf_dir):
    # join on a timestamp key (examples/test_datetime.py:94-102)
    ev = cps.read_table(spark, sf_dir, "events")
    a = ev[["ts", "event_id"]]
    b = ev[["ts", "user_id"]]
    j = a.merge(b, on="ts", how="inner")
    epd = ev.get()
    want = len(epd[["ts", "event_id"]].merge(epd[["ts", "user_id"]], on="ts"))
    assert j.count() == want


def test_groupby_sum_count_naming(frames):
    orders, li, opd, lpd = frames
    out = li.groupby("l_returnflag")["l_quantity"].sum().get()
    assert "sum(l_quantity)" in out.columns  # interface.py:78-82 naming
    want = lpd.groupby("l_returnflag")["l_quantity"].sum()
    got = out.set_index("l_returnflag")["sum(l_quantity)"]
    for k, v in want.items():
        assert got[k] == pytest.approx(v)

    cnt = li.groupby("l_returnflag")["l_quantity"].count().get()
    assert "count(l_quantity)" in cnt.columns
    wantc = lpd.groupby("l_returnflag")["l_quantity"].count()
    gotc = cnt.set_index("l_returnflag")["count(l_quantity)"]
    assert dict(gotc) == dict(wantc)


def test_groupby_multikey(frames):
    _, li, _, lpd = frames
    out = li.groupby(["l_returnflag", "l_linestatus"])["l_extendedprice"] \
            .sum().get()
    want = lpd.groupby(["l_returnflag", "l_linestatus"])["l_extendedprice"] \
              .sum()
    assert len(out) == len(want)


def test_groupby_agg_dict(frames):
    _, li, _, lpd = frames
    out = li.groupby("l_returnflag").agg(
        {"l_quantity": ["sum", "count"], "l_extendedprice": "max"}).get()
    assert {"sum(l_quantity)", "count(l_quantity)",
            "max(l_extendedprice)"} <= set(out.columns)
    want = lpd.groupby("l_returnflag")["l_extendedprice"].max()
    got = out.set_index("l_returnflag")["max(l_extendedprice)"]
    for k, v in want.items():
        assert got[k] == v


def test_groupby_extended_aggs(frames):
    _, li, _, lpd = frames
    out = li.groupby("l_returnflag").agg(
        {"l_orderkey": "count_distinct", "l_quantity": "mean"}).get()
    want = lpd.groupby("l_returnflag")["l_orderkey"].nunique()
    got = out.set_index("l_returnflag")["count_distinct(l_orderkey)"]
    assert dict(got) == dict(want)


def test_count_skips_nulls(spark):
    # Arrow count kernel skips nulls; F.count(col) must too (SURVEY §7.4)
    pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, None, 2.0]})
    df = cps.DataFrame(spark.createDataFrame(pdf))
    out = df.groupby("k")["v"].count().get().set_index("k")["count(v)"]
    assert out["a"] == 1 and out["b"] == 1
    assert df["v"].count() == 2
