"""Regression pins for the bench harness itself.

The r12 round found that BOTH bench session warmups had silently
no-opped since they were written: under bench.py's ``from __future__
import annotations``, the pandas_udf in ``_mini_warm`` saw the STRING
annotation ``'_pd.Series'`` (whose ``_pd`` is a function-local import,
unresolvable from module globals), raised UNSUPPORTED_SIGNATURE inside
the best-effort ``try``, and every "warm" probe first-run paid ~32
Python worker-pool spawns instead. Eleven rounds of committed scaling
numbers carried that noise. These tests make the failure loud.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_mini_warm_actually_runs(spark, capfd):
    """_mini_warm must exercise the shuffle + pandas_udf ->
    mapInPandas chain without tripping its own best-effort except
    (which would print '# mini-warm failed' and silently skip the
    pool warmup — the r12 bug class)."""
    import bench

    bench._mini_warm(spark)
    err = capfd.readouterr().err
    assert "mini-warm failed" not in err, err


def test_load_prior_timings_ignores_flagged_drift_entries():
    """The relative noise-retry prior table must ingest only bare
    numeric timings: drift-flagged dict entries ({"sec", "expected",
    "drift_x"}) and error entries are measurement rejects, not
    priors."""
    import json
    import tempfile

    import bench

    with tempfile.TemporaryDirectory() as td:
        doc = {"queries": {"q_ok": 1.5,
                           "q_drift": {"sec": 9.9, "expected": 1.0,
                                       "drift_x": 9.9},
                           "q_err": {"err": "boom"}}}
        with open(os.path.join(td, "BENCH_FULL.json"), "w") as fh:
            json.dump(doc, fh)
        # point the loader at the temp artifact dir
        real = os.path.dirname(os.path.abspath(bench.__file__))
        orig = bench.os.path.dirname
        try:
            bench.os.path.dirname = lambda p: td if p.endswith(
                "bench.py") else orig(p)
            prior = bench._load_prior_timings()
        finally:
            bench.os.path.dirname = orig
        assert prior.get("q_ok") == 1.5
        assert "q_drift" not in prior
        assert "q_err" not in prior
        assert real  # silence unused warning


def test_sf1_and_sf5_expected_tables_are_sane():
    """Every probe band is a positive float and every probe name is a
    registry query or a documented override — a typo'd name would
    silently drop a probe from the committed artifact."""
    import __spark_entry__ as entry_mod
    import bench

    qs = set(entry_mod.queries())
    for table in (bench.SF1_QUERIES, bench.SF5_QUERIES):
        for name, expected in table.items():
            assert isinstance(expected, (int, float)) and expected > 0
            assert name in qs or name in bench.SF1_OVERRIDES, name
