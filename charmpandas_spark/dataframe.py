"""Pandas-flavored DataFrame API over ``pyspark.sql``.

Reproduces the client surface of UIUC-PPL/charmpandas
(reference: charmpandas/dataframe.py) with identical observable
semantics, but every method just builds a lazy Catalyst plan — the
reference's eager per-opcode execution (src/partition.cpp:580-669)
becomes deferred lineage, and only ``get()`` / scalar reductions
force an action, which matches the reference's blocking behavior
(only fetch/reduction/barrier block on a CCS reply,
src/server.hpp:86-94).

Key semantic parity points (SURVEY.md §2):
- ``df[str]`` -> field expression (charmpandas/dataframe.py:171-173)
- ``df[field]`` -> boolean-mask filter (dataframe.py:174-178)
- ``df[name] = expr`` -> add-or-replace column (dataframe.py:180-182,
  src/operations.hpp:77-86)
- arithmetic ``+ - * /`` with int/float/datetime literals
  (charmpandas/ast.py:28-63) — int literals widen to int64 like the
  server does (src/partition.cpp:689-694; Python ints already map to
  LongType literals in Spark)
- 6 comparisons (charmpandas/ast.py:14-25)
- ``merge`` with 8 join types (charmpandas/interface.py:90-112),
  ``_l``/``_r`` collision suffixes (src/partition.cpp:1099-1102)
- ``groupby(keys)[col].sum()/.count()`` with ``sum(col)``/``count(col)``
  result naming (charmpandas/interface.py:78-82)
- ``sort_values`` (charmpandas/dataframe.py:214-225) — implemented
  correctly for multiple keys, exceeding the reference's
  first-key-only sampling (src/partition.cpp:1141)
- scalar ``df[col].sum()/.count()`` (charmpandas/dataframe.py:144-150)
- ``get()`` -> pandas via Arrow (charmpandas/interface.py:23-33)

Extensions beyond the reference (documented, not accidental):
boolean combinators ``& | ~``, ``isin``, null predicates, multi-column
select, ``head``/``limit``, ``distinct``, write-back — all natural
Spark surface the reference lacked.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

__all__ = ["DataFrame", "Field", "GroupBy", "GroupByField"]

#: join-type map — the reference supports exactly these 8 ``how``
#: strings (charmpandas/interface.py:90-112). ``right_semi`` and
#: ``right_anti`` have no Spark ``how``; we swap sides (SURVEY §2.3).
_HOW_MAP = {
    "inner": "inner",
    "left": "left",
    "left_outer": "left",
    "right": "right",
    "right_outer": "right",
    "outer": "full",
    "full_outer": "full",
    "left_semi": "left_semi",
    "left_anti": "left_anti",
}
_SWAPPED_HOW = {"right_semi": "left_semi", "right_anti": "left_anti"}


def _lit(value: Any) -> Column:
    """Literal operand; reference wire types are Field/Integer/Double/
    Timestamp (charmpandas/ast.py:7-11). Spark's ``F.lit`` covers all
    of them (datetime -> TimestampType, int -> LongType = the server's
    int64 widening at src/partition.cpp:689-694)."""
    return F.lit(value)


def _as_column(value: Any) -> Column:
    if isinstance(value, Field):
        return value.col
    if isinstance(value, Column):
        return value
    return _lit(value)


class Field:
    """A column expression bound to an owning DataFrame.

    Mirrors ``DataFrameField`` + the client AST
    (charmpandas/ast.py:28-63): the reference serializes a prefix-order
    operation tree; Spark's ``Column`` *is* that tree, built lazily and
    handed to Catalyst.
    """

    __slots__ = ("df", "col", "name")

    def __init__(self, df: "DataFrame | None", col: Column, name: str | None = None):
        self.df = df
        self.col = col
        self.name = name

    def _bin(self, other: Any, op) -> "Field":
        owner = self.df
        if isinstance(other, Field) and other.df is not None and owner is not None \
                and other.df is not owner:
            # Cross-DataFrame positional alignment
            # (reference: src/partition.cpp:677-687 fetches both named
            # tables' columns on the same chare — correct only because
            # both were block-partitioned identically at read time;
            # see examples/create_table.py:17-18). Emulated with a
            # generated contiguous row index + join; compat path only.
            lhs = _with_row_index(
                owner._sdf.select("*", self.col.alias("__cps_lhs__")), "__cps_pos__"
            )
            rhs = _with_row_index(
                other.df._sdf.select(other.col.alias("__cps_rhs__")), "__cps_pos__"
            )
            joined = lhs.join(rhs, "__cps_pos__", "left").drop("__cps_pos__")
            new_owner = DataFrame(joined)
            return Field(
                new_owner, op(F.col("__cps_lhs__"), F.col("__cps_rhs__"))
            )
        return Field(owner or (other.df if isinstance(other, Field) else None),
                     op(self.col, _as_column(other)))

    # arithmetic (charmpandas/dataframe.py:107-124; Arrow kernels
    # add/subtract/multiply/divide src/operations.hpp:33-75)
    def __add__(self, o): return self._bin(o, lambda a, b: a + b)
    def __radd__(self, o): return Field(self.df, _as_column(o) + self.col)
    def __sub__(self, o): return self._bin(o, lambda a, b: a - b)
    def __rsub__(self, o): return Field(self.df, _as_column(o) - self.col)
    def __mul__(self, o): return self._bin(o, lambda a, b: a * b)
    def __rmul__(self, o): return Field(self.df, _as_column(o) * self.col)
    def __truediv__(self, o): return self._bin(o, lambda a, b: a / b)
    def __rtruediv__(self, o): return Field(self.df, _as_column(o) / self.col)
    def __neg__(self): return Field(self.df, -self.col)

    # comparisons (charmpandas/dataframe.py:126-142; kernels
    # src/operations.hpp:49-66)
    def __lt__(self, o): return self._bin(o, lambda a, b: a < b)
    def __le__(self, o): return self._bin(o, lambda a, b: a <= b)
    def __gt__(self, o): return self._bin(o, lambda a, b: a > b)
    def __ge__(self, o): return self._bin(o, lambda a, b: a >= b)
    def __eq__(self, o): return self._bin(o, lambda a, b: a == b)  # type: ignore[override]
    def __ne__(self, o): return self._bin(o, lambda a, b: a != b)  # type: ignore[override]

    # boolean combinators — extension; the reference has none
    # (absent from charmpandas/ast.py:14-25 / src/operations.hpp:10-23)
    def __and__(self, o): return self._bin(o, lambda a, b: a & b)
    def __or__(self, o): return self._bin(o, lambda a, b: a | b)
    def __invert__(self): return Field(self.df, ~self.col)

    def __hash__(self):  # __eq__ override kills default hash
        return id(self)

    # extensions: null predicates / membership
    def isin(self, values: Iterable[Any]) -> "Field":
        return Field(self.df, self.col.isin(list(values)))

    def isna(self) -> "Field":
        return Field(self.df, self.col.isNull())

    def notna(self) -> "Field":
        return Field(self.df, self.col.isNotNull())

    def alias(self, name: str) -> "Field":
        return Field(self.df, self.col.alias(name), name)

    # scalar reductions (charmpandas/dataframe.py:144-150; Charm
    # reduction tree src/partition.cpp:66-113 -> one-row Spark action)
    def _reduce(self, agg: Column) -> Any:
        if self.df is None:
            raise ValueError("unbound field has no data to reduce")
        return self.df.sdf.agg(agg).collect()[0][0]

    def sum(self):
        return self._reduce(F.sum(self.col))

    def count(self):
        # Arrow's ``count`` kernel skips nulls (SURVEY §7.4) — so does
        # Spark's F.count(col); do NOT use count(*).
        return self._reduce(F.count(self.col))

    # extensions: reference enum had these server-side but no real
    # distributed combiner (src/reduction.hpp:102-131 falls through to
    # sum_int — SURVEY §2.4 notes min/max "effectively unimplemented").
    def min(self):
        return self._reduce(F.min(self.col))

    def max(self):
        return self._reduce(F.max(self.col))

    def mean(self):
        return self._reduce(F.avg(self.col))


class DataFrame:
    """Named distributed table (reference: integer handle +
    per-chare Arrow slice, charmpandas/dataframe.py:156,
    src/partition.hpp:251). Here: a thin mutable wrapper over a lazy
    ``pyspark.sql.DataFrame`` so ``df[c] = expr`` feels eager while
    Catalyst sees the whole pipeline (SURVEY §4.1)."""

    def __init__(self, sdf: SparkDF):
        self._sdf = sdf

    # -- plumbing ----------------------------------------------------
    @property
    def sdf(self) -> SparkDF:
        """Escape hatch: the underlying Spark DataFrame."""
        return self._sdf

    def to_spark(self) -> SparkDF:
        return self._sdf

    @property
    def columns(self) -> list[str]:
        return self._sdf.columns

    @property
    def dtypes(self):
        return self._sdf.dtypes

    # -- item access (charmpandas/dataframe.py:171-182) ---------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return Field(self, self._sdf[key], key)
        if isinstance(key, (list, tuple)):
            return DataFrame(self._sdf.select(*key))
        if isinstance(key, Field):
            # boolean-mask filter (src/partition.cpp:478-489 ->
            # arrow::compute::Filter)
            return DataFrame(self._sdf.filter(key.col))
        if isinstance(key, Column):
            return DataFrame(self._sdf.filter(key))
        raise TypeError(f"unsupported key type: {type(key)!r}")

    def __setitem__(self, name: str, value: Any):
        # add if new, replace if exists (src/operations.hpp:77-86);
        # withColumn has exactly those semantics.
        if isinstance(value, Field) and value.df is not None and value.df is not self:
            base = value.df._sdf
            keep = list(self._sdf.columns)
            if all(c in base.columns for c in keep):
                # cross-DataFrame expression that was positionally
                # aligned in Field._bin — adopt the aligned frame and
                # project back to our original columns + the new one.
                tmp = base.withColumn("__cps_set__", value.col)
                cols = [c for c in keep if c != name] + [
                    F.col("__cps_set__").alias(name)
                ]
                self._sdf = tmp.select(*cols)
                return
            # plain cross-table column assignment: df1["x"] = df2["age"]
            lhs = _with_row_index(self._sdf, "__cps_pos__")
            rhs = _with_row_index(
                base.select(value.col.alias("__cps_set__")), "__cps_pos__"
            )
            joined = lhs.join(rhs, "__cps_pos__", "left").drop("__cps_pos__")
            cols = [c for c in keep if c != name] + [
                F.col("__cps_set__").alias(name)
            ]
            self._sdf = joined.select(*cols)
            return
        self._sdf = self._sdf.withColumn(name, _as_column(value))

    # -- joins (SURVEY §2.3) -------------------------------------------
    def merge(
        self,
        other: "DataFrame",
        on: str | list[str] | None = None,
        left_on: str | list[str] | None = None,
        right_on: str | list[str] | None = None,
        how: str = "inner",
        suffixes: tuple[str, str] = ("_l", "_r"),
    ) -> "DataFrame":
        """Multi-key equi-join, 8 types (charmpandas/dataframe.py:192-209).

        The reference's xxhash32 bucket shuffle + global histogram +
        greedy least-loaded assignment + Acero hashjoin
        (src/partition.cpp:1422-1581, 1720-1729) is Spark's
        ``Exchange(hashpartitioning) -> SortMergeJoin/ShuffledHashJoin``
        with AQE skew handling; broadcast conversion is free when one
        side is small. Collision suffixes default ``_l``/``_r``
        (src/partition.cpp:1099-1102; pandas would use ``_x``/``_y``),
        and — matching the reference's observable output, not pandas —
        ``on=`` keeps BOTH key columns as ``k_l``/``k_r`` (the client
        forwards ``on`` as left_keys AND right_keys to Acero, which
        emits both sides' keys).
        """
        if how in _SWAPPED_HOW:
            # right_semi/right_anti: result = rows of RIGHT with(out) a
            # match in LEFT -> swap sides, use left_semi/left_anti.
            return other.merge(
                self,
                on=on,
                left_on=right_on,
                right_on=left_on,
                how=_SWAPPED_HOW[how],
                suffixes=suffixes,
            )
        if how not in _HOW_MAP:
            raise ValueError(f"unsupported how={how!r}; one of "
                             f"{sorted(_HOW_MAP) + sorted(_SWAPPED_HOW)}")
        spark_how = _HOW_MAP[how]

        left_sdf, right_sdf = self._sdf, other._sdf
        if on is not None:
            keys = [on] if isinstance(on, str) else list(on)
            if spark_how in ("left_semi", "left_anti"):
                # semi/anti emit only left-side columns; no collision.
                return DataFrame(
                    left_sdf.join(right_sdf, on=keys, how=spark_how))
            # Reference parity: the client passes `on` as BOTH
            # left_keys and right_keys into Acero
            # (charmpandas/dataframe.py:192-209 ->
            # src/partition.cpp:1099-1102), so both key columns
            # survive as `k_l`/`k_r` — deliberately NOT pandas'
            # single coalesced key column. Fall through to the
            # left_on/right_on path, which suffixes the collision.
            left_on, right_on = keys, keys
        elif left_on is None or right_on is None:
            raise ValueError("merge requires `on` or both `left_on`/`right_on`")
        lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        if len(lkeys) != len(rkeys):
            raise ValueError("left_on and right_on must have equal length")

        if spark_how in ("left_semi", "left_anti"):
            cond = [left_sdf[l] == right_sdf[r] for l, r in zip(lkeys, rkeys)]
            out = left_sdf.join(right_sdf, on=cond, how=spark_how)
            return DataFrame(out)

        # distinct key names: both key columns survive; suffix only
        # genuinely colliding non-key names (and colliding key names).
        left_sdf, right_sdf = _apply_suffixes(left_sdf, right_sdf, set(), suffixes)
        lmap = {k: (k if k in left_sdf.columns else k + suffixes[0]) for k in lkeys}
        rmap = {k: (k if k in right_sdf.columns else k + suffixes[1]) for k in rkeys}
        cond = [left_sdf[lmap[l]] == right_sdf[rmap[r]] for l, r in zip(lkeys, rkeys)]
        return DataFrame(left_sdf.join(right_sdf, on=cond, how=spark_how))

    def merge_asof(
        self,
        other: "DataFrame",
        on: str,
        by: str | list[str],
        value_cols: list[str] | None = None,
        suffix: str = "_asof",
        direction: str = "backward",
        tolerance_us: int | None = None,
    ) -> "DataFrame":
        """pandas-style merge_asof: temporal enrichment on timestamp
        ``on`` per ``by`` key with full pandas parity —
        ``direction`` in {backward, forward, nearest} and an optional
        ``tolerance_us`` bound (operators/asof.py — join-free window
        formulation)."""
        from .operators.asof import asof_join

        return DataFrame(asof_join(self._sdf, other.sdf, on, by,
                                   value_cols, suffix,
                                   direction=direction,
                                   tolerance_us=tolerance_us))

    # -- groupby (SURVEY §2.4) ------------------------------------------
    def groupby(self, keys: str | list[str]) -> "GroupBy":
        keys = [keys] if isinstance(keys, str) else list(keys)
        return GroupBy(self, keys)

    # -- sort (SURVEY §2.5) ----------------------------------------------
    def sort_values(
        self, by: str | list[str], ascending: bool | list[bool] = True
    ) -> "DataFrame":
        """Global sort. The reference's sample sort
        (src/partition.cpp:1108-1265) *is* Spark's RangePartitioner;
        unlike the reference we sample/sort on ALL keys, not just the
        first (src/partition.cpp:1141), and doubles are not lossily
        cast to int64 for splitters (src/partition.cpp:1161-1162).
        """
        by = [by] if isinstance(by, str) else list(by)
        if isinstance(ascending, bool):
            ascending = [ascending] * len(by)
        if len(ascending) != len(by):
            raise ValueError(
                f"ascending has {len(ascending)} entries for {len(by)} keys")
        cols = [
            (F.col(k).asc() if asc else F.col(k).desc())
            for k, asc in zip(by, ascending)
        ]
        return DataFrame(self._sdf.orderBy(*cols))

    # -- extensions: limits / distinct / set ops -------------------------
    def head(self, n: int = 5):
        return self._sdf.limit(n).toPandas()

    def limit(self, n: int) -> "DataFrame":
        return DataFrame(self._sdf.limit(n))

    def nlargest(self, n: int, columns: str | list[str]) -> "DataFrame":
        return self.sort_values(columns, ascending=False).limit(n)

    def nsmallest(self, n: int, columns: str | list[str]) -> "DataFrame":
        return self.sort_values(columns, ascending=True).limit(n)

    def distinct(self) -> "DataFrame":
        return DataFrame(self._sdf.distinct())

    def intersect(self, other: "DataFrame") -> "DataFrame":
        """Set intersection (distinct rows in both) — extension; the
        reference has no set ops beyond concat (SURVEY §2.6)."""
        return DataFrame(self._sdf.intersect(other.sdf))

    def except_(self, other: "DataFrame") -> "DataFrame":
        """Set difference (distinct rows in self not in other —
        SQL EXCEPT semantics)."""
        return DataFrame(self._sdf.subtract(other.sdf))

    def drop_duplicates(self, subset: list[str] | None = None) -> "DataFrame":
        return DataFrame(self._sdf.dropDuplicates(subset))

    def drop(self, *cols: str) -> "DataFrame":
        return DataFrame(self._sdf.drop(*cols))

    def rename(self, columns: dict[str, str]) -> "DataFrame":
        return DataFrame(self._sdf.withColumnsRenamed(columns))

    def sample(self, fraction: float, seed: int = 42) -> "DataFrame":
        return DataFrame(self._sdf.sample(fraction=fraction, seed=seed))

    def fillna(self, value, subset: list[str] | None = None) -> "DataFrame":
        return DataFrame(self._sdf.fillna(value, subset=subset))

    def dropna(self, how: str = "any",
               subset: list[str] | None = None) -> "DataFrame":
        return DataFrame(self._sdf.dropna(how=how, subset=subset))

    def astype(self, dtypes: dict[str, str]) -> "DataFrame":
        """Cast columns by name (pandas astype semantics)."""
        out = self._sdf
        for c, t in dtypes.items():
            out = out.withColumn(c, F.col(c).cast(t))
        return DataFrame(out)

    def repartition(self, num: int, *cols: str) -> "DataFrame":
        return DataFrame(self._sdf.repartition(num, *cols)
                         if cols else self._sdf.repartition(num))

    def coalesce(self, num: int) -> "DataFrame":
        return DataFrame(self._sdf.coalesce(num))

    # -- actions -----------------------------------------------------------
    def get(self):
        """Materialize to client pandas — the reference's blocking
        fetch/gather (src/partition.cpp:930-967, Arrow IPC reply
        charmpandas/interface.py:23-33). Arrow-accelerated toPandas is
        the same wire path with the driver as the gather point."""
        return self._sdf.toPandas()

    def print(self, n: int = 20):
        """Debug print (charmpandas/dataframe.py:188-190 ->
        src/partition.cpp:385-403)."""
        self._sdf.show(n)

    def count(self) -> int:
        return self._sdf.count()

    def num_rows(self) -> int:
        """Row-count probe (dead opcode fetch_size=10 in the reference,
        charmpandas/interface.py:67 / src/partition.cpp:491-500 — alive
        here)."""
        return self._sdf.count()

    def explain(self, mode: str = "formatted"):
        self._sdf.explain(mode)

    def describe(self, columns: list[str] | None = None) -> "DataFrame":
        """pandas-style profile (beyond-reference convenience): one
        row per column with count / nulls / exact distinct / min /
        max, backed by ``functions.profile.profile_columns`` — ONE
        scan, one job, hash-aggregable (no Expand/multi-distinct
        plan), regardless of column count."""
        from .functions.profile import profile_columns

        return DataFrame(profile_columns(self._sdf, columns))

    def value_counts(self, column: str, k: int | None = None
                     ) -> "DataFrame":
        """pandas-style ``value_counts`` (beyond-reference
        convenience): per-value frequencies, descending (ties by
        value), optionally top-``k``. Partial-aggregated groupBy; the
        top-k form is orderBy().limit() — per-partition top-k, the
        driver never sees more than ``k`` rows."""
        counts = (self._sdf.groupBy(column)
                  .agg(F.count(F.lit(1)).alias("count"))
                  .orderBy(F.col("count").desc(),
                           F.col(column).asc()))
        if k is not None:
            counts = counts.limit(k)
        return DataFrame(counts)

    def cache(self) -> "DataFrame":
        self._sdf.cache()
        return self

    def unpersist(self) -> "DataFrame":
        """Reference GC path: deferred deletion headers
        (charmpandas/interface.py:179-187). Spark: unpersist + Python GC."""
        self._sdf.unpersist()
        return self

    # -- sinks (absent in the reference — SURVEY §2.1 "No sinks exist") --
    def to_parquet(self, path: str, mode: str = "overwrite",
                   partition_by: str | list[str] | None = None):
        w = self._sdf.write.mode(mode)
        if partition_by:
            pb = [partition_by] if isinstance(partition_by, str) else partition_by
            w = w.partitionBy(*pb)
        w.parquet(path)

    def __repr__(self):
        return f"DataFrame[{', '.join(f'{n}: {t}' for n, t in self._sdf.dtypes)}]"


class GroupBy:
    """``df.groupby(keys)`` handle (charmpandas/dataframe.py:43-95).

    The reference's two-level partial/final hash aggregation
    (src/reduction.hpp:133-198) is Catalyst's automatic
    partial+final ``HashAggregate`` pair — map-side combine for free.
    """

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def __getitem__(self, col: str) -> "GroupByField":
        return GroupByField(self, col)

    def agg(self, spec: dict[str, str | list[str]]) -> DataFrame:
        """Sane dict aggregation — the reference's dict path is broken
        client-side (charmpandas/dataframe.py:81-95 iterates the dict
        not .items(); SURVEY §7.4 says implement the sane semantics).
        Result columns are named ``agg(col)`` to match the reference's
        naming scheme (charmpandas/interface.py:78-82)."""
        aggs = []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                aggs.append(_AGG_FNS[fn](col).alias(f"{fn}({col})"))
        return DataFrame(self._df.sdf.groupBy(*self._keys).agg(*aggs))


#: grouped aggregation kernels. sum/count are the reference's exposed
#: surface (charmpandas/interface.py:85-86); the rest mirror the
#: server-ready-but-unexposed AggregateOperation enum
#: (src/types.hpp:17-29 -> Arrow hash_* fns src/reduction.hpp:58-100).
_AGG_FNS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "mean": F.avg,
    "avg": F.avg,
    "all": lambda c: F.bool_and(F.col(c)),
    "any": lambda c: F.bool_or(F.col(c)),
    "approximate_median": lambda c: F.percentile_approx(F.col(c), 0.5),
    "median": lambda c: F.percentile(F.col(c), 0.5),
    "count_distinct": lambda c: F.countDistinct(F.col(c)),
    "distinct": lambda c: F.collect_set(F.col(c)),
    "first": F.first,
    "last": F.last,
}


class GroupByField:
    """``df.groupby(keys)[col]`` -> single-column aggregation with the
    reference's ``fn(col)`` result naming (charmpandas/interface.py:78-82).
    """

    def __init__(self, gb: GroupBy, col: str):
        self._gb = gb
        self._col = col

    def _agg(self, fn_name: str) -> DataFrame:
        agg = _AGG_FNS[fn_name](self._col).alias(f"{fn_name}({self._col})")
        return DataFrame(self._gb._df.sdf.groupBy(*self._gb._keys).agg(agg))

    def sum(self) -> DataFrame:
        return self._agg("sum")

    def count(self) -> DataFrame:
        return self._agg("count")

    def min(self) -> DataFrame:
        return self._agg("min")

    def max(self) -> DataFrame:
        return self._agg("max")

    def mean(self) -> DataFrame:
        return self._agg("mean")

    def nunique(self) -> DataFrame:
        return self._agg("count_distinct")


def _apply_suffixes(
    left: SparkDF, right: SparkDF, shared_keys: set[str], suffixes: tuple[str, str]
) -> tuple[SparkDF, SparkDF]:
    """Rename colliding non-key columns with ``_l``/``_r`` before the
    join (reference behavior: Acero HashJoinNodeOptions suffixes,
    src/partition.cpp:1099-1102)."""
    overlap = (set(left.columns) & set(right.columns)) - shared_keys
    if not overlap:
        return left, right
    left = left.withColumnsRenamed({c: c + suffixes[0] for c in overlap})
    right = right.withColumnsRenamed({c: c + suffixes[1] for c in overlap})
    return left, right


def _with_row_index(sdf: SparkDF, name: str) -> SparkDF:
    """Contiguous 0-based row index via RDD zipWithIndex (two passes;
    compat path for positional alignment only — never in hot queries).

    Positional alignment is only well-defined when the plan's row
    order is deterministic — like the reference, where both frames
    are identically-partitioned scans (partition.cpp keeps row order
    per chare). A shuffle (join/groupBy/orderBy under AQE) makes
    partition order nondeterministic and indices could pair wrong
    rows silently, so warn loudly when one is present."""
    import warnings

    from pyspark.sql.types import LongType, StructField, StructType

    import re

    # structural match: a tree-string line starts with indentation art
    # (":  +- ") followed by the node's class simple name — anchoring
    # there can't false-positive on plan text such as string literals
    # inside filter expressions ("... = 'Join me'").
    tree = sdf._jdf.queryExecution().analyzed().treeString()
    # Sort included (VERDICT r13 #6): orderBy output is a range
    # exchange whose row order among TIED keys is nondeterministic —
    # and under AQE the exchange can be re-planned between the two
    # zipWithIndex passes of an alignment, so ties may pair
    # differently on each side. Coalesce surfaces as Repartition
    # (shuffle=false) in the analyzed tree, already covered.
    shuffly = {"Join", "Aggregate", "Repartition",
               "RepartitionByExpression", "Window", "Distinct",
               "Deduplicate", "Sort"}
    nodes = {m.group(1)
             for m in re.finditer(r"^[\s:+|-]*'?(\w+)", tree, re.M)}
    hits = sorted(nodes & shuffly)
    if hits:
        warnings.warn(
            f"positional alignment over a plan containing {hits} is "
            "order-nondeterministic under shuffles/AQE; align only "
            "identically-partitioned scans (reference semantics)",
            RuntimeWarning, stacklevel=3)
    schema = StructType(list(sdf.schema.fields) + [StructField(name, LongType(), False)])
    rdd = sdf.rdd.zipWithIndex().map(lambda ri: (*ri[0], ri[1]))
    return sdf.sparkSession.createDataFrame(rdd, schema)
