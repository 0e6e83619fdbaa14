"""Z-order (Morton) clustering — multi-column data layout.

``write_clustered`` (sources/parquet.py) gives perfect row-group
pruning on ONE key prefix; queries filtering on a DIFFERENT column
get nothing. Z-ordering interleaves the bits of several normalized
key columns into one Morton code and range-clusters on THAT: each
file then covers a small hyper-rectangle of the key space, so
min/max row-group stats prune usefully for predicates on ANY of the
interleaved columns (each individual column's spread within a file
shrinks like 2^-(bits_per_file/n_cols)). The same technique Delta
Lake's OPTIMIZE ZORDER BY and ClickHouse's mortonEncode expose —
here as a pure-expression composition over the open parquet format.

Everything is deterministic integer/IEEE math (scale to [0, 2^bits),
clamp, interleave with shifts) built from JVM expressions — no UDF,
no shuffle beyond the single range-repartition of the write, and a
DuckDB SQL twin generator so the key math is oracle-checkable
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

__all__ = ["zorder_key", "zorder_key_sql", "write_zordered"]


def _lit_or_col(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def zorder_key(
    cols: list,
    los: list,
    his: list,
    bits: int = 16,
) -> Column:
    """Morton code of ``cols``: each column is linearly scaled from
    its [lo, hi] range to an integer in [0, 2^bits) (clamped), then
    the columns' bits are interleaved LSB-first (column i owns output
    bit positions ``b*n + i``). ``los``/``his`` take numbers or
    Columns (pass aggregate ride-alongs for data-driven ranges).
    Requires ``len(cols) * bits <= 62`` (bigint). The scaling is
    plain IEEE double math + floor, bit-identical in DuckDB — see
    :func:`zorder_key_sql`.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError("n_cols * bits must fit a signed 64-bit key")
    maxv = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, los, his):
        c = F.col(c) if isinstance(c, str) else c
        lo, hi = _lit_or_col(lo), _lit_or_col(hi)
        span = F.greatest(hi.cast("double") - lo.cast("double"), F.lit(1.0))
        s = F.least(
            F.greatest(
                F.floor((c.cast("double") - lo.cast("double"))
                        / span * maxv).cast("bigint"),
                F.lit(0)),
            F.lit(maxv))
        scaled.append(s)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)),
                                b * n + i)
    return z


def zorder_key_sql(exprs: list[str], lo_sqls: list[str],
                   his_sqls: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — same scale/clamp/floor/
    interleave arithmetic, term for term."""
    n = len(exprs)
    maxv = (1 << bits) - 1
    scaled = []
    for e, lo, hi in zip(exprs, lo_sqls, his_sqls):
        span = f"GREATEST(CAST(({hi}) AS DOUBLE) - CAST(({lo}) AS DOUBLE), 1.0)"
        s = (f"LEAST(GREATEST(CAST(FLOOR((CAST(({e}) AS DOUBLE) - "
             f"CAST(({lo}) AS DOUBLE)) / {span} * {maxv}) AS BIGINT), "
             f"0), {maxv})")
        scaled.append(s)
    terms = []
    for b in range(bits):
        for i, s in enumerate(scaled):
            terms.append(f"((({s} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df,
    path: str,
    zorder_by: list[str],
    ranges: list[tuple] | None = None,
    bits: int = 16,
    num_files: int | None = None,
    max_records_per_file: int | None = None,
    keep_key: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on the Morton code of
    ``zorder_by``. ``ranges`` gives (lo, hi) per column; omitted, the
    ranges ride along IN-PLAN as a 1-row broadcast min/max aggregate
    (no construction-time job). ``keep_key`` retains the ``__cps_z``
    column in the files (useful for layout audits); default drops it
    after the sort, which preserves row order."""
    sdf = getattr(df, "sdf", df)
    if ranges is not None:
        los = [r[0] for r in ranges]
        his = [r[1] for r in ranges]
        keyed = sdf
    else:
        aggs = []
        for i, c in enumerate(zorder_by):
            aggs += [F.min(c).alias(f"__cps_lo{i}"),
                     F.max(c).alias(f"__cps_hi{i}")]
        rng = sdf.agg(*aggs)
        keyed = sdf.crossJoin(F.broadcast(rng))
        los = [F.col(f"__cps_lo{i}") for i in range(len(zorder_by))]
        his = [F.col(f"__cps_hi{i}") for i in range(len(zorder_by))]
    keyed = keyed.withColumn(
        "__cps_z", zorder_key(list(zorder_by), los, his, bits))
    keyed = keyed.drop(*[c for c in keyed.columns
                         if c.startswith("__cps_lo")
                         or c.startswith("__cps_hi")])
    if num_files is None:
        out = keyed.repartitionByRange("__cps_z")
    else:
        out = keyed.repartitionByRange(num_files, "__cps_z")
    out = out.sortWithinPartitions("__cps_z")
    if not keep_key:
        out = out.drop("__cps_z")
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.parquet(path)
