"""Source/sink round-trips: parquet (regex paths), CSV, JSON."""

import os

import pytest

import charmpandas_spark as cps
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
