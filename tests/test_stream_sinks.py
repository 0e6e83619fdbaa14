"""Exactly-once foreachBatch sinks: restart-no-duplicates and
idempotent batch replay."""

import glob
import os
import shutil

from pyspark.sql import functions as F


def _add_file(spark, src, rows, schema, i):
    d = src + f"_stage{i}"
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(d)
    shutil.copy(glob.glob(d + "/*.parquet")[0], f"{src}/f{i}.parquet")
    os.utime(f"{src}/f{i}.parquet", (1000 + i, 1000 + i))


def test_batched_parquet_sink_restart_no_duplicates(spark, tmp_path):
    from charmpandas_spark.streaming.sinks import (
        write_stream_parquet_batched)
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _add_file(spark, src, [(1, "a"), (2, "b")], "id long, v string", 0)
    _add_file(spark, src, [(3, "c")], "id long, v string", 1)

    q = write_stream_parquet_batched(
        stream_from_parquet(spark, src), out, ckpt)
    assert q.awaitTermination(180)
    got1 = spark.read.parquet(out).drop("batch")
    assert sorted(r["id"] for r in got1.collect()) == [1, 2, 3]

    # new data arrives; RESTART from the same checkpoint: only the new
    # file is processed — committed batches are never re-emitted
    _add_file(spark, src, [(4, "d")], "id long, v string", 2)
    q2 = write_stream_parquet_batched(
        stream_from_parquet(spark, src), out, ckpt)
    assert q2.awaitTermination(180)
    got2 = spark.read.parquet(out).drop("batch")
    assert sorted(r["id"] for r in got2.collect()) == [1, 2, 3, 4]


def test_merge_sink_upserts_and_replay_idempotent(spark, tmp_path):
    from charmpandas_spark.streaming.sinks import merge_stream_into
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "msrc")
    target = str(tmp_path / "mtarget")
    ckpt = str(tmp_path / "mckpt")
    os.makedirs(src)
    _add_file(spark, src, [(1, 10)], "k long, v long", 0)
    _add_file(spark, src, [(1, 20), (2, 90)], "k long, v long", 1)

    q = merge_stream_into(stream_from_parquet(spark, src), target,
                          ckpt, keys=["k"])
    assert q.awaitTermination(180)
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 20, 2: 90}   # later batch updated k=1

    # a re-sent (duplicate) upsert after restart converges to the
    # same end state — merge is idempotent per (key, payload)
    _add_file(spark, src, [(2, 90), (3, 7)], "k long, v long", 2)
    q2 = merge_stream_into(stream_from_parquet(spark, src), target,
                           ckpt, keys=["k"])
    assert q2.awaitTermination(180)
    got2 = {r["k"]: r["v"]
            for r in spark.read.parquet(target).collect()}
    assert got2 == {1: 20, 2: 90, 3: 7}
    assert spark.read.parquet(target).count() == 3  # no duplicates


def test_merge_sink_recovers_crash_between_renames(spark, tmp_path):
    """A crash between rename(target, old) and rename(tmp, target)
    leaves the target missing; the replayed batch must roll the old
    dir back and re-merge — NOT take the initial-load branch and wipe
    history down to one batch's rows."""
    from charmpandas_spark.streaming.sinks import (_recover_swap,
                                                   merge_stream_into)
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "csrc")
    target = str(tmp_path / "ctarget")
    ckpt = str(tmp_path / "cckpt")
    os.makedirs(src)
    _add_file(spark, src, [(1, 10), (2, 20)], "k long, v long", 0)

    q = merge_stream_into(stream_from_parquet(spark, src), target,
                          ckpt, keys=["k"])
    assert q.awaitTermination(180)

    # simulate the mid-swap crash while batch 1 was merging (3, 30):
    # committed state moved aside, replacement never landed
    spark.createDataFrame([(9, 99)], "k long, v long") \
        .write.mode("overwrite").parquet(target + ".__tmp_b1")
    os.rename(target, target + ".__old_b1")
    assert not os.path.isdir(target)

    _recover_swap(target)
    assert os.path.isdir(target)            # committed state restored
    assert not glob.glob(target + ".__*")   # stale dirs cleaned
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 10, 2: 20}

    # and a full restart through the sink replays the lost batch on
    # top of the RECOVERED table (crash state set up again first)
    _add_file(spark, src, [(3, 30)], "k long, v long", 1)
    spark.createDataFrame([(9, 99)], "k long, v long") \
        .write.mode("overwrite").parquet(target + ".__tmp_b1")
    os.rename(target, target + ".__old_b1")
    q2 = merge_stream_into(stream_from_parquet(spark, src), target,
                           ckpt, keys=["k"])
    assert q2.awaitTermination(180)
    got2 = {r["k"]: r["v"]
            for r in spark.read.parquet(target).collect()}
    assert got2 == {1: 10, 2: 20, 3: 30}    # history intact


def test_merge_sink_honors_trigger_flag(spark, tmp_path):
    """trigger_available_now=False must NOT silently apply the
    one-shot availableNow trigger (continuous micro-batch mode)."""
    from charmpandas_spark.streaming.sinks import merge_stream_into
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "tsrc")
    target = str(tmp_path / "ttarget")
    ckpt = str(tmp_path / "tckpt")
    os.makedirs(src)
    _add_file(spark, src, [(1, 1)], "k long, v long", 0)

    q = merge_stream_into(stream_from_parquet(spark, src), target,
                          ckpt, keys=["k"], trigger_available_now=False)
    try:
        # without availableNow the query drains the backlog but does
        # NOT terminate on its own
        assert not q.awaitTermination(20)
        assert q.isActive
    finally:
        q.stop()
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 1}


def test_recover_swap_numeric_batch_order(spark, tmp_path):
    """ADVICE r8: with several lingering .__old_b* dirs, recovery
    must restore the NUMERICALLY latest batch (lexicographic sort
    would pick __old_b9 over __old_b10 and resurrect a stale
    snapshot)."""
    from charmpandas_spark.streaming.sinks import _recover_swap

    target = str(tmp_path / "ntarget")
    spark.createDataFrame([(1, 9)], "k long, v long") \
        .write.parquet(target + ".__old_b9")
    spark.createDataFrame([(1, 10)], "k long, v long") \
        .write.parquet(target + ".__old_b10")
    _recover_swap(target)
    assert os.path.isdir(target)
    assert not glob.glob(target + ".__*")
    assert spark.read.parquet(target).collect()[0]["v"] == 10


def test_cdc_stream_out_of_order_batches_converge(spark, tmp_path):
    """The tombstone + seq-guard merge reaches the same fixed point
    even when NEWER changes arrive in an earlier batch: a delete at
    seq 3 lands first; the late seq-1/2 insert+update must neither
    resurrect the key nor clobber newer state."""
    from pyspark.sql import functions as F

    from charmpandas_spark.streaming.sinks import (cdc_stream_into,
                                                   read_cdc_snapshot)
    from charmpandas_spark.streaming.windows import stream_from_parquet

    target = str(tmp_path / "snap")
    schema = "k long, seq long, op string, v long"

    def run(rows, tag):
        src = str(tmp_path / f"src_{tag}")
        spark.createDataFrame(rows, schema) \
             .coalesce(1).write.mode("overwrite").parquet(src)
        stream = stream_from_parquet(spark, src,
                                     max_files_per_trigger=1)
        q = cdc_stream_into(stream, target,
                            str(tmp_path / f"ckpt_{tag}"),
                            ["k"], "seq", "op")
        assert q.awaitTermination(120)

    # batch 1 (arrives FIRST, carries the NEWEST changes):
    #   key 1 deleted at seq 3; key 2 updated at seq 5
    run([(1, 3, "D", 0), (2, 5, "U", 50)], "new")
    # batch 2 (late, older): key 1 insert/update, key 2 insert,
    # key 3 plain insert
    run([(1, 1, "I", 10), (1, 2, "U", 20),
         (2, 1, "I", 40), (3, 1, "I", 70)], "old")

    snap = {r.k: (r.seq, r.v)
            for r in read_cdc_snapshot(spark, target).collect()}
    # key 1: delete (seq 3) must win over the late seq-2 update
    # key 2: update (seq 5) must win over the late seq-1 insert
    assert snap == {2: (5, 50), 3: (1, 70)}


def test_topk_stream_leaderboard_matches_batch_and_replays(spark, tmp_path):
    """The leaderboard sink folded over micro-batches equals the
    from-scratch per-group top-k, and re-running an already-applied
    batch (at-least-once replay) leaves the state unchanged —
    topk_merge's array_distinct idempotency."""
    from pyspark.sql import functions as F

    from charmpandas_spark.operators.topk import (topk_per_group,
                                                  topk_state_result)
    from charmpandas_spark.streaming.sinks import topk_stream_into
    from charmpandas_spark.streaming.windows import stream_from_parquet

    rows = [("g%d" % (i % 2), i, (i * 29) % 41) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    target = str(tmp_path / "board")

    def run(src_df, tag, n_files):
        src = str(tmp_path / f"src_{tag}")
        src_df.repartition(n_files).write.mode("overwrite").parquet(src)
        stream = stream_from_parquet(spark, src,
                                     max_files_per_trigger=1)
        q = topk_stream_into(stream, target,
                             str(tmp_path / f"ckpt_{tag}"),
                             ["g"], "v", "id", 3)
        assert q.awaitTermination(120)

    run(df, "a", 4)
    want = [tuple(r) for r in topk_per_group(df, ["g"], "v", "id", 3)
            .orderBy("g", "rank").collect()]
    got = [tuple(r) for r in
           topk_state_result(spark.read.parquet(target), ["g"], "v",
                             "id").orderBy("g", "rank").collect()]
    assert got == want
    # replay the SAME data through a fresh checkpoint: every batch
    # re-merges rows the state already holds — result must not move
    run(df, "replay", 2)
    again = [tuple(r) for r in
             topk_state_result(spark.read.parquet(target), ["g"], "v",
                               "id").orderBy("g", "rank").collect()]
    assert again == want
