"""Tests for round-7 wave 2: merge/upsert, expectations, line dedup,
shard assignment, and small-file compaction."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# merge_into
# ---------------------------------------------------------------------------

@pytest.fixture()
def merge_frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double")
    source = spark.createDataFrame(
        [(2, "B", 22.0, False), (4, "D", 44.0, True), (9, "z", 99.0, False)],
        "k long, name string, v double, is_del boolean")
    return target, source


@pytest.mark.parametrize("bc", [False, True])
def test_merge_upsert_semantics(spark, merge_frames, bc):
    from charmpandas_spark.operators.merge import merge_into

    target, source = merge_frames
    out = merge_into(target, source.drop("is_del"), ["k"],
                     broadcast_source=bc)
    rows = {r["k"]: (r["name"], r["v"])
            for r in out.collect()}
    assert rows == {1: ("a", 10.0), 2: ("B", 22.0), 3: ("c", 30.0),
                    4: ("D", 44.0), 9: ("z", 99.0)}


@pytest.mark.parametrize("bc", [False, True])
def test_merge_delete_and_insert_off(spark, merge_frames, bc):
    from charmpandas_spark.operators.merge import merge_into

    target, source = merge_frames
    out = merge_into(target, source, ["k"], delete_col="is_del",
                     broadcast_source=bc)
    ks = sorted(r["k"] for r in out.collect())
    assert ks == [1, 2, 3, 9]  # 4 deleted, 9 inserted

    out2 = merge_into(target, source, ["k"], insert=False,
                      delete_col="is_del", broadcast_source=bc)
    assert sorted(r["k"] for r in out2.collect()) == [1, 2, 3]


@pytest.mark.parametrize("bc", [False, True])
def test_merge_update_false_keeps_target(spark, merge_frames, bc):
    from charmpandas_spark.operators.merge import merge_into

    target, source = merge_frames
    out = merge_into(target, source.drop("is_del"), ["k"], update=False,
                     broadcast_source=bc)
    rows = {r["k"]: r["name"] for r in out.collect()}
    assert rows[2] == "b" and rows[9] == "z"


def test_merge_broadcast_plan(spark, merge_frames):
    """broadcast_source=True must put the update join on a broadcast
    hash join — zero base-table shuffle for the dominant arm."""
    from charmpandas_spark.operators.merge import merge_into

    target, source = merge_frames
    out = merge_into(target, source.drop("is_del"), ["k"],
                     broadcast_source=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_merge_source_extra_column_null_for_unmatched(spark, merge_frames):
    from charmpandas_spark.operators.merge import merge_into

    target, source = merge_frames
    src = source.drop("is_del").withColumn("tag", F.lit("b1"))
    out = merge_into(target, src, ["k"])
    tags = {r["k"]: r["tag"] for r in out.collect()}
    assert tags[2] == "b1" and tags[9] == "b1" and tags[1] is None


# ---------------------------------------------------------------------------
# expectations
# ---------------------------------------------------------------------------

def test_validate_rules(spark):
    from charmpandas_spark.functions.expect import validate

    df = spark.createDataFrame(
        [(1, "x@y.com", 5.0), (2, None, 50.0), (2, "bad", -1.0),
         (4, "a@b.org", 7.5)],
        "id long, email string, score double")
    dim = spark.createDataFrame([(1,), (2,)], "id long")
    out = validate(df, [
        ("not_null", "email"),
        ("range", "score", 0.0, 10.0),
        ("regex", "email", "@"),
        ("unique", "id"),
        ("in_set", "id", [1, 2, 4]),
        ("fk", "id", dim, "id"),
    ])
    got = {r["rule"]: (r["violations"], r["total"], r["ok"])
           for r in out.collect()}
    assert got["not_null:email"] == (1, 4, False)
    assert got["range:score"] == (2, 4, False)   # 50.0 and -1.0
    assert got["regex:email"] == (2, 4, False)   # NULL + "bad"
    assert got["unique:id"] == (1, 4, False)
    assert got["in_set:id"] == (0, 4, True)
    assert got["fk:id"] == (1, 4, False)         # id=4 absent from dim


def test_validate_single_agg_job(spark):
    """All row-level rules must compile into ONE aggregate (one scan):
    the plan contains exactly one HashAggregate pair and no join."""
    from charmpandas_spark.functions.expect import validate

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = validate(df, [("not_null", "v"), ("range", "v", 0, 500),
                        ("unique", "id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------

def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from charmpandas_spark.functions.dedup import line_dedup

    rows = [
        (1, "cookie banner\nreal content one\nCOOKIE BANNER \nunique a"),
        (2, "cookie banner\nreal content two\n\nunique b"),
        (3, "standalone doc\n\n"),
        (4, "cookie banner\ncookie banner"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in
           line_dedup(df, "text", "doc_id", max_doc_freq=2).collect()}
    assert out[1]["text"] == "real content one\nunique a"
    assert out[1]["n_dropped"] == 2          # both banner casings die
    assert out[2]["text"] == "real content two\n\nunique b"
    assert out[3]["text"] == "standalone doc\n\n"  # blanks exempt
    assert out[3]["n_dropped"] == 0
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 2


def test_line_dedup_single_materialization(spark):
    """Both consumers (line-df agg + rejoin) must read the PINNED
    exploded-lines subtree — without the pin the scan+explode runs
    twice over the corpus."""
    from charmpandas_spark.functions.dedup import line_dedup, release

    df = spark.createDataFrame([(1, "a\nb"), (2, "a\nc")],
                               "doc_id long, text string")
    out = line_dedup(df, "text", "doc_id", max_doc_freq=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    release(out)


def test_line_dedup_custom_separator_is_literal(spark):
    """line_sep is escaped before hitting Spark's regex split — '. '
    must not behave as wildcard-dot."""
    from charmpandas_spark.functions.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "buy now. real a. buy now"), (2, "buy now. real b")],
        "doc_id long, text string")
    out = {r["doc"]: r["text"]
           for r in line_dedup(df, "text", "doc_id", max_doc_freq=2,
                               line_sep=". ").collect()}
    # "buy now" (df=2) dies everywhere; a regex-interpreted ". "
    # separator would instead split at every "<char> " and mangle both
    assert out[1] == "real a"
    assert out[2] == "real b"


# ---------------------------------------------------------------------------
# shard assignment / writer
# ---------------------------------------------------------------------------

def test_assign_shards_budget_and_order(spark, sf_dir):
    from charmpandas_spark.functions.text import (
        assign_shards, whitespace_token_count)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select("doc_id",
                       whitespace_token_count("text").alias("n_tok"))
    out = assign_shards(toks, "n_tok", ("doc_id",), 1000).collect()
    by_doc = sorted(out, key=lambda r: r["doc_id"])
    # shards are monotone in the order key
    shards = [r["shard"] for r in by_doc]
    assert shards == sorted(shards)
    # no shard exceeds budget + one document's tokens (docs never split)
    tot = {}
    mx = max(r["n_tok"] for r in out)
    for r in out:
        tot[r["shard"]] = tot.get(r["shard"], 0) + r["n_tok"]
    assert all(v <= 1000 + mx for v in tot.values())
    # every shard but the last is full (>= budget means next doc spills)
    full = [v for k, v in sorted(tot.items())][:-1]
    assert all(v + mx >= 1000 for v in full)


def test_write_token_shards_one_file_per_shard(spark, sf_dir):
    from charmpandas_spark.functions.text import (
        whitespace_token_count, write_token_shards)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select("doc_id",
                       whitespace_token_count("text").alias("n_tok"))
    path = tempfile.mkdtemp(prefix="cps_shards_")
    try:
        write_token_shards(toks, path, "n_tok", ("doc_id",), 2000)
        dirs = glob.glob(os.path.join(path, "shard=*"))
        assert len(dirs) >= 2
        for d in dirs:
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1
        back = spark.read.parquet(path)
        assert back.count() == toks.count()
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------

def test_compact_files_counts_and_content(spark, sf_dir):
    from charmpandas_spark.sources.parquet import compact_files

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = tempfile.mkdtemp(prefix="cps_compact_")
    small = os.path.join(base, "small")
    out = os.path.join(base, "out")
    try:
        docs.repartition(32).write.mode("overwrite").parquet(small)
        stats = compact_files(spark, small, out,
                              target_file_bytes=8 << 20)
        assert stats["files_before"] == 32
        assert stats["files_after"] == stats["target_files"] == 1
        a = spark.read.parquet(out).orderBy("doc_id").collect()
        b = docs.orderBy("doc_id").collect()
        assert a == b
        with pytest.raises(ValueError):
            compact_files(spark, small, small)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_files_clustered_layout(spark, sf_dir):
    """cluster_by compaction upgrades the layout: files own disjoint
    key ranges (parquet footer min/max per file do not overlap)."""
    import pyarrow.parquet as pq
    from charmpandas_spark.sources.parquet import compact_files

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = tempfile.mkdtemp(prefix="cps_compactc_")
    small = os.path.join(base, "small")
    out = os.path.join(base, "out")
    try:
        docs.repartition(32).write.mode("overwrite").parquet(small)
        total = sum(os.path.getsize(f)
                    for f in glob.glob(small + "/*.parquet"))
        stats = compact_files(spark, small, out,
                              target_file_bytes=max(1, total // 4),
                              cluster_by="doc_id")
        assert stats["files_after"] >= 2
        ranges = []
        for f in sorted(glob.glob(out + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            cols = {md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.row_group(0).num_columns)}
            i = cols["doc_id"]
            lo = min(md.row_group(g).column(i).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(i).statistics.max
                     for g in range(md.num_row_groups))
            ranges.append((lo, hi))
        ranges.sort()
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 <= l2  # disjoint contiguous key ranges
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# table diff + funnel
# ---------------------------------------------------------------------------

def test_table_diff_classification(spark):
    from charmpandas_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (9, "z")], "k long, v string")
    got = {r["k"]: r["change_type"]
           for r in table_diff(old, new, ["k"]).collect()}
    # 1 unchanged (dropped), 3 unchanged null-safely (dropped)
    assert got == {2: "update", 4: "delete", 9: "insert"}
    full = {r["k"]: r["change_type"]
            for r in table_diff(old, new, ["k"],
                                include_unchanged=True).collect()}
    assert full[1] == "unchanged" and full[3] == "unchanged"


def test_funnel_chained_windows(spark):
    """A stage-B event BEFORE the first stage-A event must not count,
    and each window anchors on the previous stage's completion."""
    import datetime as dt

    from charmpandas_spark.operators.funnel import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # u1: clean A -> B -> C
        (1, "A", t0), (1, "B", t0 + h), (1, "C", t0 + 2 * h),
        # u2: B precedes first A -> funnel stalls at A
        (2, "B", t0), (2, "A", t0 + h),
        # u3: B too late (outside 2h window)
        (3, "A", t0), (3, "B", t0 + 3 * h),
        # u4: A -> B, C missing
        (4, "A", t0), (4, "B", t0 + h),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel_counts(df, ["A", "B", "C"],
                        within_us=2 * 3600 * 1_000_000).collect()[0]
    assert out["n_A"] == 4 and out["n_B"] == 2 and out["n_C"] == 1
    assert out["conversion"] == 0.25


def test_classifier_score_exact_and_oov(spark):
    from charmpandas_spark.functions.quality import classifier_score

    docs = spark.createDataFrame(
        [(1, "good good bad zzz"), (2, "zzz qqq"), (3, "bad bad")],
        "doc_id long, text string")
    w = spark.createDataFrame([("good", 1_000_000), ("bad", -500_000)],
                              "term string, w_micro long")
    got = {r["doc"]: (r["score_micro"], r["keep"])
           for r in classifier_score(docs, "text", "doc_id", w,
                                     threshold_micro=1).collect()}
    assert got[1] == (1_500_000, True)    # 2*1e6 - 0.5e6, zzz OOV = 0
    assert got[2] == (0, False)           # all OOV
    assert got[3] == (-1_000_000, False)


def test_resample_gap_filling(spark):
    import datetime as dt

    from charmpandas_spark.operators.resample import resample_events

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [("a", t0, 1.0), ("a", t0, 2.0),      # bucket 0: 2 events
            ("a", t0 + 3 * h, 5.0),              # buckets 1-2 empty
            ("b", t0 + h, 7.0)]                  # b: only bucket 1
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = resample_events(df, "ts", ["g"], 3600 * 1_000_000, "value")
    got = {(r["g"], r["bucket"] - min(x["bucket"] for x in out.collect())):
           (r["n_events"], r["total"]) for r in out.collect()}
    # dense: every group x bucket 0..3 exists
    assert len(got) == 8
    assert got[("a", 0)] == (2, 3.0)
    assert got[("a", 1)] == (0, 0.0) and got[("a", 2)] == (0, 0.0)
    assert got[("a", 3)] == (1, 5.0)
    assert got[("b", 1)] == (1, 7.0) and got[("b", 0)] == (0, 0.0)
