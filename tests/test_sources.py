"""Source/sink round-trips: parquet (regex paths), CSV, JSON."""

import os

import pytest

import charmpandas_spark as cps
from pyspark.sql import functions as F
from charmpandas_spark.sources.text_sources import (
    read_csv, read_json, write_csv, write_json)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "nation")


def test_parquet_regex_read(spark, sf_dir):
    df = cps.read_parquet(spark, os.path.join(sf_dir, r"nation\.parquet"))
    assert df.count() == 25


def test_parquet_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_pq")
    nation.to_parquet(out)
    back = cps.read_parquet(spark, out)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_parquet_partitioned_write(spark, nation, tmp_path):
    out = str(tmp_path / "nation_part")
    nation.to_parquet(out, partition_by="n_regionkey")
    # partition pruning: reading one partition dir touches one region
    sub = [d for d in os.listdir(out) if d.startswith("n_regionkey=")]
    assert len(sub) == 5
    back = cps.read_parquet(spark, out)
    assert back.count() == 25


def test_csv_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = read_csv(spark, out)
    assert back.count() == 25
    assert set(back.columns) == set(nation.columns)
    # inferSchema restores integer keys
    assert dict(back.dtypes)["n_nationkey"] == "int"


def test_json_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_json")
    write_json(nation, out)
    back = read_json(spark, out)
    assert back.count() == 25
    assert set(back.columns) == set(nation.columns)


def test_json_with_schema_skips_inference(spark, nation, tmp_path):
    out = str(tmp_path / "nation_json2")
    write_json(nation, out)
    back = read_json(spark, out, schema=nation.sdf.schema)
    assert back.sdf.schema == nation.sdf.schema


def test_partition_pruning_in_plan(spark, nation, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    at the scan (directories skipped at planning) — not a post-scan
    filter. This is the mechanism that makes date/tenant-partitioned
    100 TB layouts readable in seconds."""
    out = str(tmp_path / "nation_pruned")
    nation.to_parquet(out, partition_by="n_regionkey")
    back = cps.read_parquet(spark, out)
    flt = back[back["n_regionkey"] == 2]
    plan = flt.sdf._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "n_regionkey" in plan.split("PartitionFilters")[1][:200]
    assert flt.count() == 5


def test_regex_path_across_directories(spark, nation, tmp_path):
    """Regex paths spanning directory levels walk the tree like the
    reference's matcher (src/partition.cpp:51-63) — a partitioned
    layout is selectable with one regex."""
    out = str(tmp_path / "tree")
    nation.to_parquet(out, partition_by="n_regionkey")
    picked = cps.read_parquet(
        spark, out + r"/n_regionkey=(1|3)/.*\.parquet")
    assert picked.count() == 10
    one_level = cps.read_parquet(
        spark, out + r"/n_regionkey=2/part-.*\.parquet")
    assert one_level.count() == 5


def test_multipath_heterogeneous_ns_footers(spark, tmp_path):
    """Multi-path read where one path carries TIMESTAMP(NANOS) and
    another a DIFFERENT column set: one explicit schema cannot cover
    both, so the reader must fall back to per-path reads unioned by
    name (ADVICE r2) instead of mis-scanning path B through path A's
    footer schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1_000_000_000, 2_000_000_000],
                       pa.timestamp("ns")),
    }), a, coerce_timestamps=None)
    pq.write_table(pa.table({
        "id": pa.array([3, 4], pa.int64()),
        "extra": pa.array(["x", "y"], pa.string()),
    }), b)
    df = cps.read_parquet(spark, [a, b])
    pdf = df.get().sort_values("id").reset_index(drop=True)
    assert len(pdf) == 4
    assert {"id", "ts", "extra"} <= set(pdf.columns)
    assert str(pdf["ts"][0]) == "1970-01-01 00:00:01"  # ns decoded
    assert pdf["ts"].isna().tolist() == [False, False, True, True]
    assert pdf["extra"].tolist()[:2] == [None, None]


def test_multipath_homogeneous_ns_single_scan(spark, tmp_path):
    """Identical ns-bearing footers across paths keep the one-schema
    fast path (single multi-path scan, values decoded)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "id": pa.array([1], pa.int64()),
        "ts": pa.array([1_500_000_000], pa.timestamp("ns")),
    })
    a, b = str(tmp_path / "h1.parquet"), str(tmp_path / "h2.parquet")
    pq.write_table(t, a)
    pq.write_table(t, b)
    df = cps.read_parquet(spark, [a, b])
    pdf = df.get()
    assert len(pdf) == 2
    assert str(pdf["ts"].iloc[0]).startswith("1970-01-01 00:00:01.5")


def test_write_clustered_layout_and_roundtrip(spark, sf_dir, tmp_path):
    """Clustered sink: files own disjoint contiguous key ranges (the
    property row-group/min-max pruning needs), data round-trips
    losslessly, and maxRecordsPerFile bounds file size."""
    import glob

    import pyarrow.parquet as pq

    import charmpandas_spark as cps
    dst = str(tmp_path / "orders_clustered")
    orders = cps.read_table(spark, sf_dir, "orders")
    cps.write_clustered(orders, dst, cluster_by="o_custkey",
                        sort_by=["o_custkey", "o_orderkey"],
                        max_records_per_file=5000, num_files=6)
    files = sorted(glob.glob(dst + "/*.parquet"))
    assert len(files) > 1  # genuinely clustered across several files
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        assert md.num_rows <= 5000
        col_idx = next(i for i in range(md.num_columns)
                       if md.row_group(0).column(i).path_in_schema
                       == "o_custkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min), maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint contiguous key ranges
    # point predicate: exactly one file's range can contain the key
    probe = ranges[len(ranges) // 2][0]
    containing = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(containing) == 1
    # lossless roundtrip
    back = cps.read_parquet(spark, dst)
    assert back.sdf.count() == orders.sdf.count()
    a = orders.sdf.agg(F.sum("o_orderkey"), F.sum("o_custkey")).first()
    b = back.sdf.agg(F.sum("o_orderkey"), F.sum("o_custkey")).first()
    assert tuple(a) == tuple(b)


def _candidate_row_groups(path: str, preds: dict) -> tuple[int, int]:
    """(candidate, total) row groups under parquet min/max pruning for
    an AND of per-column [lo, hi] predicates — exactly the statistics
    test readers (Spark, DuckDB, Trino) apply before touching data. A
    row group with absent stats counts as a candidate (must be read)."""
    import glob

    import pyarrow.parquet as pq

    cand = total = 0
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.row_group(0).column(i).path_in_schema: i
               for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            total += 1
            keep = True
            for col, (lo, hi) in preds.items():
                st = md.row_group(g).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    continue
                if st.min > hi or st.max < lo:
                    keep = False
                    break
            cand += keep
    return cand, total


def test_layout_pruning_witness(spark, sf_dir, tmp_path):
    """MEASURED end-to-end pruning payoff (r6 VERDICT #5): the same
    data written unsorted vs clustered vs z-ordered, same file count,
    then candidate-row-group counts under min/max stats for point,
    range, and 2-D box predicates. The sinks' claim is that layout
    buys row-group skipping — this asserts the actual skip counts,
    and that the filtered read returns identical results on every
    layout."""
    from charmpandas_spark.operators.zorder import write_zordered

    li = cps.read_table(spark, sf_dir, "lineitem").sdf.select(
        "l_orderkey", "l_partkey", "l_quantity")
    n_files = 16
    base = str(tmp_path / "li_unsorted")
    clus = str(tmp_path / "li_clustered")
    zord = str(tmp_path / "li_zordered")
    # unsorted baseline: round-robin repartition scatters every key
    # range across every file
    li.repartition(n_files).write.mode("overwrite").parquet(base)
    cps.write_clustered(li, clus, cluster_by="l_orderkey",
                        num_files=n_files)
    write_zordered(li, zord, ["l_orderkey", "l_partkey"],
                   num_files=n_files)

    ok_lo, ok_hi = li.agg(F.min("l_orderkey"),
                          F.max("l_orderkey")).first()
    pk_lo, pk_hi = li.agg(F.min("l_partkey"),
                          F.max("l_partkey")).first()
    probe = (ok_lo + ok_hi) // 2

    # --- point predicate on the cluster key ---
    point = {"l_orderkey": (probe, probe)}
    c_base = _candidate_row_groups(base, point)
    c_clus = _candidate_row_groups(clus, point)
    assert c_base[0] == c_base[1], "unsorted must not prune"
    assert c_clus[0] <= 2, f"clustered point read {c_clus}"

    # --- narrow range predicate (~3% of the key domain) ---
    span = max((ok_hi - ok_lo) // 32, 1)
    rng = {"l_orderkey": (probe, probe + span)}
    r_base = _candidate_row_groups(base, rng)
    r_clus = _candidate_row_groups(clus, rng)
    assert r_base[0] == r_base[1]
    assert r_clus[0] * 4 <= r_clus[1], f"range prune weak: {r_clus}"

    # --- 2-D box: z-order prunes BOTH dims; a single-key cluster
    #     cannot prune the second dim at all ---
    box = {"l_orderkey": (probe, probe + span),
           "l_partkey": (pk_lo, pk_lo + max((pk_hi - pk_lo) // 32, 1))}
    b_base = _candidate_row_groups(base, box)
    b_clus = _candidate_row_groups(clus, box)
    b_zord = _candidate_row_groups(zord, box)
    assert b_base[0] == b_base[1]
    assert b_zord[0] * 2 <= b_zord[1], f"z-order box prune: {b_zord}"
    # partkey-only predicate: invisible to the l_orderkey clustering,
    # but the Morton interleave gives partkey usable stats too
    pk_only = {"l_partkey": box["l_partkey"]}
    p_clus = _candidate_row_groups(clus, pk_only)
    p_zord = _candidate_row_groups(zord, pk_only)
    assert p_clus[0] == p_clus[1], "sort prefix can't prune dim 2"
    assert p_zord[0] * 2 <= p_zord[1], f"z pk-only prune: {p_zord}"

    # identical query results on every layout (pruning is lossless)
    expect = (spark.read.parquet(base)
              .filter((F.col("l_orderkey") >= probe)
                      & (F.col("l_orderkey") <= probe + span))
              .agg(F.sum("l_quantity").alias("s"),
                   F.count(F.lit(1)).alias("n")).first())
    for path in (clus, zord):
        got = (spark.read.parquet(path)
               .filter((F.col("l_orderkey") >= probe)
                       & (F.col("l_orderkey") <= probe + span))
               .agg(F.sum("l_quantity").alias("s"),
                    F.count(F.lit(1)).alias("n")).first())
        assert tuple(got) == tuple(expect)

    # numbers for SCALING.md (pytest -s shows them)
    print(f"\nlayout-prune witness (candidate/total row groups): "
          f"point base={c_base} clustered={c_clus}; "
          f"range base={r_base} clustered={r_clus}; "
          f"box base={b_base} clustered={b_clus} zorder={b_zord}; "
          f"pk-only clustered={p_clus} zorder={p_zord}")


def test_write_zordered_layout(spark, sf_dir, tmp_path):
    """Z-ordered sink: the Morton key matches a python reference, and
    files own disjoint z-ranges — so BOTH interleaved columns get
    usable min/max pruning, not just a sort prefix."""
    import glob

    import pyarrow.parquet as pq

    import charmpandas_spark as cps
    from charmpandas_spark.operators.zorder import (
        write_zordered, zorder_key)

    li = cps.read_table(spark, sf_dir, "lineitem")
    # key math vs python reference on a literal-range sample
    bits = 8
    sample = (li.sdf.select("l_orderkey", "l_partkey").limit(200)
              .withColumn("z", zorder_key(
                  ["l_orderkey", "l_partkey"], [0, 0],
                  [6000, 200], bits=bits))
              .toPandas())

    def ref(a, b):
        maxv = (1 << bits) - 1
        sa = min(max(int((float(a) - 0) / 6000 * maxv), 0), maxv)
        sb = min(max(int(float(b) / 200 * maxv), 0), maxv)
        z = 0
        for k in range(bits):
            z |= ((sa >> k) & 1) << (2 * k)
            z |= ((sb >> k) & 1) << (2 * k + 1)
        return z

    for r in sample.itertuples():
        assert r.z == ref(r.l_orderkey, r.l_partkey), r

    dst = str(tmp_path / "li_z")
    write_zordered(li, dst, ["l_orderkey", "l_partkey"],
                   num_files=5, keep_key=True)
    files = sorted(glob.glob(dst + "/*.parquet"))
    assert len(files) == 5
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ci = next(i for i in range(md.num_columns)
                  if md.row_group(0).column(i).path_in_schema == "__cps_z")
        st = [md.row_group(g).column(ci).statistics
              for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in st), max(s.max for s in st)))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2  # disjoint z ranges
    # dropped-key default: files carry no layout column
    dst2 = str(tmp_path / "li_z2")
    write_zordered(li, dst2, ["l_orderkey", "l_partkey"], num_files=3)
    back = cps.read_parquet(spark, dst2)
    assert "__cps_z" not in back.sdf.columns
    assert back.sdf.count() == li.sdf.count()


def test_orc_roundtrip_and_pushdown(spark, sf_dir):
    """ORC sink/source round-trip preserves values bit-exactly, and a
    predicate on the read-back reaches the ORC scan as a pushed
    filter (stripe-level pruning at scale)."""
    import os
    import tempfile

    from charmpandas_spark.sources.orc import read_orc, write_orc
    import charmpandas_spark as cps
    c = cps.read_table(spark, sf_dir, "customer")
    path = os.path.join(tempfile.gettempdir(),
                        f"cps_test_orc_{os.getpid()}")
    write_orc(c, path)
    back = read_orc(spark, path)
    a = c.sdf.orderBy("c_custkey").toPandas()
    b = back.sdf.orderBy("c_custkey").toPandas()[a.columns.tolist()]
    assert a.equals(b)
    filtered = back.sdf.filter(back.sdf.c_custkey > 100)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(c_custkey), GreaterThan(c_custkey," \
        in plan


def test_read_parquet_merge_schema_evolution(spark, tmp_path):
    """A table appended to over time grows columns; merge_schema=True
    reconciles the evolved footers (old files read the new column as
    null), while the default single-schema read stays cheap."""
    import charmpandas_spark as cps

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, v string") \
        .write.parquet(path)
    spark.createDataFrame([(2, "b", 9.5)],
                          "id bigint, v string, score double") \
        .write.mode("append").parquet(path)
    got = cps.read_parquet(spark, path, merge_schema=True).get() \
        .sort_values("id").reset_index(drop=True)
    assert list(got.columns) == ["id", "v", "score"]
    assert got["score"].isna().tolist() == [True, False]
    assert got["score"].iloc[1] == 9.5


def test_schema_evolution_backfills_nulls(spark, sf_dir, tmp_path):
    """mergeSchema union: gen-1 files lack the new column; reading
    both generations back-fills exactly the gen-1 rows with NULL."""
    import __spark_entry__ as e

    out = e.queries()["source_schema_evolution"](spark, sf_dir)
    rows = out.collect()
    nulls = [r for r in rows if r.n_regionkey is None]
    assert nulls and all(r.n_nationkey % 2 == 0 for r in nulls)
    assert all(r.n_regionkey is not None
               for r in rows if r.n_nationkey % 2 == 1)


def test_csv_malformed_quarantined_not_dropped(spark, sf_dir):
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    row = e.queries()["source_csv_malformed"](spark, sf_dir).collect()[0]
    n = e._t(spark, sf_dir, "nation").sdf
    n_rows = n.count()
    key_sum = n.agg(F.sum("n_nationkey")).collect()[0][0]
    assert row.n_good == n_rows          # no good row lost
    assert row.n_bad == (n_rows + 4) // 5  # every bad row quarantined
    assert row.key_sum == key_sum        # values parsed intact
