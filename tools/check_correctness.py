"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on a plain
(driver-like, untuned) SparkSession and its ``oracle_sql()`` twin on
DuckDB with the testdata tables registered as views, then compares
row count, schema shape, and order-insensitive values (exact equality
after sorting; floats must match bit-for-bit because both sides round
explicitly).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _kind(s: pd.Series) -> str:
    """Dtype KIND for the strict compare: integer vs float vs bool vs
    datetime vs object. The driver's value hash distinguishes
    ``-30527120`` from ``-30527120.0`` (DuckDB HUGEINT -> float64 via
    fetchdf), so the local gate must too — no Int64 coercion, no
    check_dtype=False (the r10 blind spot)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif s.dtype == object:
            pdf[c] = s.astype(str)
    key = pdf.astype(str).agg("|".join, axis=1) if len(pdf) else None
    if key is not None:
        pdf = pdf.iloc[np.argsort(key.values, kind="stable")]
    return pdf.reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWS {len(spark_pdf)} != {len(oracle_pdf)}"
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"COLS {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    # dtype-kind gate FIRST: a value-identical int64 vs float64 pair is
    # a driver hash failure even though assert_frame_equal could be
    # coerced to pass
    for c in sorted(spark_pdf.columns):
        ks, ko = _kind(spark_pdf[c]), _kind(oracle_pdf[c])
        if ks != ko:
            return f"DTYPE {c}: spark {ks}({spark_pdf[c].dtype}) != oracle {ko}({oracle_pdf[c].dtype})"
    a, b = _norm(spark_pdf), _norm(oracle_pdf)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return "VALUES " + str(e).split("\n")[0][:200]
    return "OK"


def main():
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    only = set(sys.argv[1:])
    spark = (SparkSession.builder.master("local[8]")
             .appName("check").config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            # free MEMORY_AND_DISK pins (ANN/minhash intermediates) so
            # a 100-query session doesn't accumulate executor caches
            try:
                from charmpandas_spark.functions.dedup import release

                release(sdf)
            except Exception:
                pass
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_pdf)})")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        verdict = compare(name, spark_pdf, oracle_pdf)
        status = "OK  " if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures.append(name)
        print(f"{status} {name} ({len(spark_pdf)} rows, "
              f"{time.time()-t0:.1f}s) {'' if verdict=='OK' else verdict}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
