"""Exactly-once streaming sinks via ``foreachBatch``.

The built-in file sink is already exactly-once for plain appends (its
metadata log tracks committed batches), but real pipelines need sinks
the file sink can't express: MERGE upserts into a table, partitioned
layouts with per-batch overwrite, multi-destination fan-out. The
standard pattern for those is ``foreachBatch`` + IDEMPOTENT batch
handling — Spark replays a failed micro-batch with the SAME batch id,
so a writer that makes batch ``N``'s effect a pure function of
``(data, N)`` converts at-least-once replays into exactly-once
output.

Two idempotency strategies here, both replay-tested in pytest:

- :func:`write_stream_parquet_batched` — each batch owns the
  ``batch=N`` subdirectory and writes it with ``overwrite``: a replay
  of batch N clobbers its own partial output, never duplicates it.
  Readers see the sink as one partitioned table.
- :func:`merge_stream_into` — each batch MERGEs into a target table
  through ``operators.merge.merge_into`` keyed on a natural key: a
  replayed batch re-upserts the same rows to the same end state
  (merge is idempotent by construction when the source carries a
  deterministic payload per key).

At cluster scale both compose with RocksDB state upstream
(``streaming/state.py``) and a durable ``checkpointLocation``; the
checkpoint's commit log is what assigns stable batch ids across
restarts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame as SparkDF

__all__ = ["write_stream_parquet_batched", "merge_stream_into",
           "cdc_stream_into", "read_cdc_snapshot",
           "topk_stream_into"]


def write_stream_parquet_batched(stream_df: SparkDF, path: str,
                                 checkpoint: str, trigger_available_now:
                                 bool = True, query_name: str | None = None):
    """Start a ``foreachBatch`` parquet sink where batch ``N`` owns
    (and idempotently overwrites) ``{path}/batch=N``. Returns the
    StreamingQuery; read the sink back with
    ``spark.read.parquet(path)`` (partition discovery exposes the
    ``batch`` column — drop it for pure data)."""

    def _write(batch_df: SparkDF, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(path, f"batch={batch_id}")))

    w = (stream_df.writeStream.foreachBatch(_write)
         .option("checkpointLocation", checkpoint))
    if query_name:
        w = w.queryName(query_name)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def merge_stream_into(stream_df: SparkDF, target_path: str,
                      checkpoint: str, keys: list[str],
                      trigger_available_now: bool = True):
    """Start a ``foreachBatch`` MERGE sink: each micro-batch upserts
    into the parquet table at ``target_path`` on ``keys`` via
    ``operators.merge.merge_into`` (update-if-exists,
    insert-if-absent), then atomically swaps the rewritten table in.
    A replayed batch re-applies the same upsert — same end state.
    The batch is deduped on ``keys`` first (last write per key within
    a batch wins by natural order) so the merge source is
    deterministic.

    CAVEAT: the swap relies on ``os.rename`` — atomic on a POSIX
    filesystem (incl. NFS/Lustre mounts), NOT on object stores where
    rename is copy+delete. On S3-like storage use a table format with
    a transactional commit log for the target, or the per-batch-dir
    sink (:func:`write_stream_parquet_batched`), whose idempotency
    never needs a rename."""
    from ..operators.merge import merge_into

    def _merge(batch_df: SparkDF, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_swap(target_path)
        src = batch_df.dropDuplicates(keys)
        if not os.path.isdir(target_path):
            src.write.mode("overwrite").parquet(target_path)
            return
        target = spark.read.parquet(target_path)
        merged = merge_into(target, src, on=keys)
        tmp = target_path.rstrip("/") + f".__tmp_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        old = target_path.rstrip("/") + f".__old_b{batch_id}"
        os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old, ignore_errors=True)

    w = (stream_df.writeStream.foreachBatch(_merge)
         .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _recover_swap(target_path: str) -> None:
    """Crash-recovery for :func:`merge_stream_into`'s two-rename swap.

    A crash between ``rename(target, old)`` and ``rename(tmp,
    target)`` leaves the target missing; without recovery the
    replayed batch would take the "initial load" branch and overwrite
    the table with ONLY that batch's rows — silent loss of all
    history. On every batch entry: if the target is missing but an
    ``.__old_b*`` sibling exists, roll it back (the old dir is the
    last fully-committed table state; the replayed MERGE then
    re-derives the lost batch exactly). Leftover ``.__tmp_b*`` dirs
    (complete or partial) are always discarded — the replay rewrites
    them.
    """
    import glob
    import shutil

    base = target_path.rstrip("/")
    # numeric sort: lexicographic would pick __old_b9 over __old_b10,
    # restoring a stale snapshot when several old dirs linger (the
    # happy-path rmtree is ignore_errors=True, so they can)
    olds = sorted(glob.glob(base + ".__old_b*"),
                  key=lambda p: int(p.rsplit("_b", 1)[1]))
    if olds and not os.path.isdir(base):
        # crashed mid-swap: restore the committed pre-batch state
        os.rename(olds[-1], base)
        olds = olds[:-1]
    for stale in olds + sorted(glob.glob(base + ".__tmp_b*")):
        # target exists: crash was after the swap (or before it,
        # leaving only a tmp) — stale dirs are safe to drop
        shutil.rmtree(stale, ignore_errors=True)


def cdc_stream_into(stream_df: SparkDF, target_path: str,
                    checkpoint: str, keys: list[str], seq_col: str,
                    op_col: str, trigger_available_now: bool = True):
    """Start a ``foreachBatch`` CDC-apply sink: each micro-batch of
    ``(keys, seq, op ∈ I/U/D, attrs…)`` change rows is compacted to
    its latest entry per key (same D>U>I same-seq priority as
    :func:`...operators.cdc.cdc_latest`) and merged into the parquet
    snapshot at ``target_path``.

    ORDER-ROBUST by design: the snapshot persists ``seq_col`` and a
    ``__cps_deleted`` tombstone per key, and a source row only wins
    when ``src.seq >= tgt.seq`` — so a late-arriving batch of older
    changes (micro-batch boundaries don't promise LSN order) cannot
    clobber newer state, and a delete survives as a tombstone that
    out-of-order earlier updates cannot resurrect. The fixed point is
    identical for ANY split of the log into batches — which is what
    makes the streaming result oracle-checkable at all. Read the
    snapshot with :func:`read_cdc_snapshot` (filters tombstones).

    Crash-safety: same two-rename swap + recovery as
    :func:`merge_stream_into` (POSIX rename; see that caveat for
    object stores). Replayed batches re-apply idempotently — the
    seq guard makes re-merging the same rows a no-op.
    """
    from pyspark.sql import Window, functions as F

    def _apply(batch_df: SparkDF, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_swap(target_path)
        rank = (F.when(F.col(op_col) == "D", 2)
                 .when(F.col(op_col) == "U", 1).otherwise(0))
        w = (Window.partitionBy(*keys)
                   .orderBy(F.col(seq_col).desc(), rank.desc()))
        src = (batch_df.withColumn("__rn", F.row_number().over(w))
                       .where(F.col("__rn") == 1)
                       .withColumn("__cps_deleted",
                                   F.col(op_col) == "D")
                       .drop("__rn", op_col))
        if not os.path.isdir(target_path):
            src.write.mode("overwrite").parquet(target_path)
            return
        tgt = spark.read.parquet(target_path)
        s = src.select(*[F.col(c).alias(f"__s_{c}")
                         for c in src.columns])
        cond = None
        for k in keys:
            c = tgt[k] == s[f"__s_{k}"]
            cond = c if cond is None else cond & c
        j = tgt.join(s, cond, "full")
        take_src = (tgt[seq_col].isNull()
                    | (s[f"__s_{seq_col}"] >= tgt[seq_col]))
        merged = j.select(*[
            F.when(s[f"__s_{seq_col}"].isNotNull() & take_src,
                   s[f"__s_{c}"]).otherwise(tgt[c]).alias(c)
            for c in src.columns])
        tmp = target_path.rstrip("/") + f".__tmp_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        old = target_path.rstrip("/") + f".__old_b{batch_id}"
        os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old, ignore_errors=True)

    w = (stream_df.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_cdc_snapshot(spark, target_path: str) -> SparkDF:
    """Read a :func:`cdc_stream_into` snapshot: live rows only (the
    tombstone column is internal bookkeeping and dropped)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(target_path)
    return df.where(~F.col("__cps_deleted")).drop("__cps_deleted")


def topk_stream_into(stream_df: SparkDF, target_path: str,
                     checkpoint: str, group_cols: list[str],
                     order_col: str, id_col: str, k: int,
                     ascending: bool = False,
                     trigger_available_now: bool = True):
    """Start a ``foreachBatch`` LEADERBOARD sink: each micro-batch is
    folded to ≤ k ``(ord, id)`` structs per group
    (``operators.topk.topk_batch``) and merged into the persisted
    state with the top-k monoid (``topk_merge``) — so the maintained
    table is always exactly the top-k over everything that has
    arrived, at a state size of k structs per group regardless of
    stream history. The order-statistics sibling of a streaming
    rollup.

    Exactly-once: ``topk_merge`` is idempotent under the unique-id
    contract (a replayed batch re-merges the same (ord, id) pairs,
    which ``array_distinct`` collapses), and the snapshot swap is the
    same crash-recovered two-rename as :func:`merge_stream_into`.
    Read the result with ``operators.topk.topk_state_result`` over
    ``spark.read.parquet(target_path)``.
    """
    from ..operators.topk import topk_batch, topk_merge

    def _fold(batch_df: SparkDF, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_swap(target_path)
        state_b = topk_batch(batch_df, group_cols, order_col, id_col,
                             k, ascending)
        if not os.path.isdir(target_path):
            state_b.write.mode("overwrite").parquet(target_path)
            return
        tgt = spark.read.parquet(target_path)
        merged = topk_merge(tgt, state_b, group_cols, k)
        tmp = target_path.rstrip("/") + f".__tmp_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        old = target_path.rstrip("/") + f".__old_b{batch_id}"
        os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old, ignore_errors=True)

    w = (stream_df.writeStream.foreachBatch(_fold)
         .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
