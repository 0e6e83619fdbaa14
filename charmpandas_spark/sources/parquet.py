"""Parquet source (reference S1, SURVEY §2.1).

The reference regex-matches files in a directory and hand-splits each
file into equal row-ranges per chare with row-group skipping
(src/partition.cpp:748-849, regex matcher src/partition.cpp:51-63).
Spark's parquet source already splits by file/row-group and prunes
columns+predicates at the scan, so the only thing to reproduce is the
*regex path* semantics: Spark takes globs, not regexes, so when a
path contains regex metacharacters we enumerate the directory and
filter with ``re`` on the driver (file listing only — never data).
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql import SparkSession, functions as F

from ..dataframe import DataFrame
from ..timestamps import ntz_to_ltz

_GLOB_SAFE = re.compile(r"^[\w\-./*?\[\]{},= ]*$")
_REGEX_HINTS = re.compile(r"[()|+^$\\]|\.\*|\.\+")


def _expand_regex_path(path: str) -> list[str] | str:
    """If ``path`` looks like a regex (reference semantics,
    src/partition.cpp:51-63), enumerate files and match; else pass
    through to Spark (plain path or glob).

    The regex may span DIRECTORY levels (the reference matches inside
    arbitrary trees): the longest literal prefix anchors a walk and
    the remainder matches the relative path, so
    ``/data/part=(1|2)/.*\\.parquet`` works. A basename-only pattern
    stays a cheap single-directory listing."""
    if not _REGEX_HINTS.search(path):
        return path
    parts = path.split("/")
    first_rx = next((i for i, p in enumerate(parts)
                     if _REGEX_HINTS.search(p)), len(parts) - 1)
    base = "/".join(parts[:first_rx]) or "."
    pattern = "/".join(parts[first_rx:])
    try:
        rx = re.compile(pattern)
    except re.error:
        return path
    if "/" not in pattern:
        try:
            names = os.listdir(base)
        except OSError:  # base missing or a file (r15 property test:
            # 'a/.*' where a is a FILE raised NotADirectoryError) —
            # same contract as zero matches: FileNotFoundError below
            names = []
        matches = sorted(
            os.path.join(base, f) for f in names
            if rx.fullmatch(f) or rx.match(f))
    else:
        matches = []
        for root, _dirs, files in os.walk(base):
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), base)
                if rx.fullmatch(rel) or rx.match(rel):
                    matches.append(os.path.join(base, rel))
        matches.sort()
    if not matches:
        raise FileNotFoundError(f"no parquet files match regex {path!r}")
    return matches


def _ns_read_schema(first_file: str):
    """(spark_schema, ns_cols) for a file containing TIMESTAMP(NANOS)
    columns — Spark 4 rejects those at scan inference
    (PARQUET_TYPE_ILLEGAL) while Arrow/DuckDB read them natively.

    Fix is PER-READ, not global: build an explicit read schema from
    the parquet footer with the ns columns typed ``long`` (Spark's
    reader accepts TIMESTAMP(NANOS)->LongType when the schema is
    user-supplied), then rebuild proper timestamps with
    ``timestamp_micros(ns div 1000)`` — all JVM-side. No session conf
    (``spark.sql.legacy.parquet.nanosAsLong``) is touched, so
    unrelated ``spark.read.parquet`` calls in the same session keep
    their normal loud-error behavior instead of silently returning
    bigints. Returns (None, []) when the file has no ns columns.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_type
    from pyspark.sql.types import LongType, StructField, StructType

    try:
        schema = pq.read_schema(first_file)
    except Exception:
        return None, []
    ns_cols = [f.name for f in schema
               if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]
    if not ns_cols:
        return None, []
    fields = []
    for f in schema:
        if f.name in ns_cols:
            fields.append(StructField(f.name, LongType(), f.nullable))
        else:
            fields.append(StructField(f.name, from_arrow_type(f.type),
                                      f.nullable))
    return StructType(fields), ns_cols


def _first_parquet_file(path: str) -> str:
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                return os.path.join(path, f)
    matched = sorted(_glob.glob(path))
    return matched[0] if matched else path


def read_parquet(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Lazy parquet scan -> DataFrame (reference: eager full-column
    read, no pushdown — src/partition.cpp:812 reads ALL columns; here
    Catalyst prunes columns and pushes predicates into the scan, the
    single biggest win over the reference at 100 TB, SURVEY §4.1).

    ``merge_schema``: reconcile EVOLVED schemas across files (a table
    appended to for months grows columns): Spark unions every file
    footer's fields; files missing a column read it as null. Off by
    default — schema merging footer-reads every file at planning
    time, a real cost on 10^6-file tables; a production layout
    declares the current schema instead and relies on parquet's
    by-name column resolution.
    """
    if isinstance(path, str):
        path = _expand_regex_path(path)
    paths = [path] if isinstance(path, str) else list(path)

    # sniff every path's first file (not just the first path's): a
    # multi-path read where only a later path carries ns columns must
    # still get the explicit schema.
    ns_schema, ns_cols = None, []
    if len(paths) == 1:
        ns_schema, ns_cols = _ns_read_schema(_first_parquet_file(paths[0]))
    else:
        sniffs = [_ns_read_schema(_first_parquet_file(p)) for p in paths]
        if any(s[1] for s in sniffs):
            # one explicit read schema is only safe when every path's
            # footer agrees (a path with a different column set — or
            # the same column at micros — would mis-scan through a
            # foreign schema). Verify; fall back to per-path reads
            # unioned by name when footers differ.
            import pyarrow.parquet as pq

            try:
                footers = [pq.read_schema(_first_parquet_file(p))
                           for p in paths]
                homogeneous = all(
                    f.equals(footers[0], check_metadata=False)
                    for f in footers[1:])
            except Exception:
                homogeneous = False
            if homogeneous:
                ns_schema, ns_cols = next(s for s in sniffs if s[1])
            else:
                parts = [read_parquet(spark, p).sdf for p in paths]
                out = parts[0]
                for q in parts[1:]:
                    out = out.unionByName(q, allowMissingColumns=True)
                if columns:
                    out = out.select(*columns)
                return DataFrame(out)
    reader = spark.read
    if merge_schema and not ns_cols:
        reader = reader.option("mergeSchema", "true")
    if ns_cols:
        reader = reader.schema(ns_schema)
    sdf = reader.parquet(*paths)
    for c in ns_cols:
        if c in sdf.columns:
            sdf = sdf.withColumn(
                c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Spark 4 infers tz-less parquet timestamps as TIMESTAMP_NTZ,
    # which watermarks/unix_micros reject; normalize at ingest
    # (lossless under the UTC session tz — timestamps.py).
    sdf = ntz_to_ltz(sdf)
    if columns:
        sdf = sdf.select(*columns)
    return DataFrame(sdf)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Convenience loader for the driver testdata layout
    (``{sf_dir}/{name}.parquet``, TESTDATA.md)."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Sink (absent in the reference — SURVEY §2.1 'No sinks exist')."""
    df.to_parquet(path, mode=mode, partition_by=partition_by)


def write_clustered(
    df,
    path: str,
    cluster_by: str | list[str],
    sort_by: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
    max_records_per_file: int | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-aware parquet sink: range-repartition on ``cluster_by``
    then sort within each output file on ``sort_by`` (defaults to the
    cluster keys), so every file owns a contiguous, internally-sorted
    key range.

    Why this matters at 100 TB: parquet stores per-row-group min/max
    statistics, and readers (this engine, Trino, DuckDB, ...) skip
    row groups whose stats exclude the predicate. A hash-partitioned
    unsorted write scatters every key range across every file —
    stats cover everything, nothing prunes. After a clustered write,
    a point/range predicate on the cluster key touches ~1 file and
    ~1 row group instead of all of them. ``max_records_per_file``
    bounds file size for downstream listing/parallelism;
    ``partition_by`` composes directory-level partition pruning on
    low-cardinality keys with row-group pruning on high-cardinality
    ones (the standard date/id two-level layout).
    """
    sdf = getattr(df, "sdf", df)
    ck = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    sk = (ck if sort_by is None
          else [sort_by] if isinstance(sort_by, str) else list(sort_by))
    # no num_files: AQE sizes the range shuffle output by bytes (the
    # right default at scale). Explicit num_files pins the file count
    # (an explicit repartition count is exempt from AQE coalescing).
    if num_files is None:
        out = sdf.repartitionByRange(*ck)
    else:
        out = sdf.repartitionByRange(num_files, *ck)
    out = out.sortWithinPartitions(*sk)
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        pb = ([partition_by] if isinstance(partition_by, str)
              else list(partition_by))
        w = w.partitionBy(*pb)
    w.parquet(path)


def compact_files(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes``-sized files (copy-on-write — the rewrite
    lands at ``out_path``; the caller swaps directories after
    validating, which is also why ``out_path`` must differ from
    ``path``).

    Why it exists: streaming sinks, per-batch merges, and
    over-parallel writes leave thousands of tiny files; at 100 TB
    the *listing* alone stalls planning, and every scan pays
    per-file open/footer costs. The output file count is derived
    from the layout's actual byte size (Hadoop FileSystem content
    summary — works on HDFS/S3A/local alike), not row counts, so
    compaction converges in one pass. With ``cluster_by`` the
    rewrite range-partitions + sorts, upgrading the layout to a
    prunable one (see :func:`write_clustered`) in the same pass;
    otherwise a round-robin repartition just right-sizes files.

    Returns {files_before, bytes_before, files_after, target_files}.
    """
    import math

    if out_path == path:
        raise ValueError("compact_files is copy-on-write: out_path "
                         "must differ from path")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    def data_files(p: str) -> int:
        """Non-hidden data files only (_SUCCESS/_metadata excluded)."""
        jp = jvm.org.apache.hadoop.fs.Path(p)
        sts = jp.getFileSystem(hconf).listStatus(jp)
        return sum(1 for st in sts
                   if st.isFile()
                   and not st.getPath().getName().startswith(("_", ".")))

    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(hconf)
    summary = fs.getContentSummary(src)
    bytes_before = int(summary.getLength())
    files_before = data_files(path)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))

    df = spark.read.parquet(path)
    if cluster_by:
        ck = ([cluster_by] if isinstance(cluster_by, str)
              else list(cluster_by))
        out = (df.repartitionByRange(n_out, *ck)
                 .sortWithinPartitions(*ck))
    else:
        out = df.repartition(n_out)
    out.write.mode(mode).parquet(out_path)

    return {"files_before": files_before,
            "bytes_before": bytes_before,
            "files_after": data_files(out_path),
            "target_files": n_out}
