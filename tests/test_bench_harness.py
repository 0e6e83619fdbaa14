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
    """The relative noise-retry prior table must never ingest a
    drift-flagged SEC reading or an error entry as a timing — but a
    flagged dict's ``expected`` (the committed best that tripped the
    flag) must survive as the prior, else one flagged sweep erases a
    query's relative bar and the next contended reading can commit
    bare under the absolute fallback (observed r13: three flagged
    entries, no other artifact carried their priors)."""
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
        # inject the artifact dir (ADVICE r12: the old version
        # monkeypatched os.path.dirname module-globally)
        prior = bench._load_prior_timings(artifact_dir=td)
        assert prior.get("q_ok") == 1.5
        assert prior.get("q_drift") == 1.0  # expected, never 9.9
        assert "q_err" not in prior


def test_sf5_fixture_cache_requires_success_sentinel(tmp_path,
                                                     monkeypatch):
    """ADVICE r12 (medium): a partial sf5 fixture — dest dirs exist
    but generation was interrupted before all 50 COPYs — must NOT be
    accepted as cached. Cache validity is keyed on the _SUCCESS
    sentinel written after the final COPY."""
    import bench

    fake = tmp_path / "bench_sf5"
    for t in ("documents", "embeddings"):
        (fake / f"{t}.parquet").mkdir(parents=True)  # partial: no parts
    monkeypatch.setattr(bench, "SF5_DIR", str(fake))
    # no sentinel -> the cache check must fall through to a rebuild;
    # intercept duckdb.connect to prove the generation path was taken
    # without actually generating 30 MB in a unit test.
    import duckdb

    called = {}

    def _boom():
        called["rebuild"] = True
        raise RuntimeError("rebuild path reached")

    monkeypatch.setattr(duckdb, "connect", _boom)
    try:
        bench._ensure_sf5("/root/testdata/sf0.1")
    except RuntimeError:
        pass
    assert called.get("rebuild"), \
        "partial fixture (no _SUCCESS) was accepted as cached"
    # and with the sentinel + dirs present, the cache short-circuits
    for t in ("documents", "embeddings"):
        (fake / f"{t}.parquet").mkdir(exist_ok=True)
    (fake / "_SUCCESS").write_text("ok\n")
    called.clear()
    assert bench._ensure_sf5("/root/testdata/sf0.1") is True
    assert not called


def test_sf5_events_fixture_cache_requires_success_sentinel(
        tmp_path, monkeypatch):
    """Same ADVICE-r12 contract for the r13 events slice: a dest dir
    without the _SUCCESS_EVENTS sentinel must rebuild, and sentinel +
    dir must short-circuit without touching duckdb."""
    import bench

    fake = tmp_path / "bench_sf5"
    (fake / "events.parquet").mkdir(parents=True)  # partial: no parts
    monkeypatch.setattr(bench, "SF5_DIR", str(fake))
    import duckdb

    called = {}

    def _boom():
        called["rebuild"] = True
        raise RuntimeError("rebuild path reached")

    monkeypatch.setattr(duckdb, "connect", _boom)
    try:
        bench._ensure_sf5_events("/root/testdata/sf0.1")
    except RuntimeError:
        pass
    assert called.get("rebuild"), \
        "partial events fixture (no _SUCCESS_EVENTS) accepted as cached"
    (fake / "events.parquet").mkdir(exist_ok=True)
    (fake / "_SUCCESS_EVENTS").write_text("ok\n")
    called.clear()
    assert bench._ensure_sf5_events("/root/testdata/sf0.1") is True
    assert not called


def test_main_sweep_flags_not_commits_drift():
    """VERDICT r12 #1b: the main-sweep recording logic must turn a
    post-retry reading still above the relative bar into a flagged
    dict, never a bare number. The logic is inline in main(), so pin
    the contract at the source level: the drift branch exists and
    produces the same {sec, expected, drift_x} shape the sf1/sf5
    blocks use (which _load_prior_timings provably ignores)."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert "drift_x" in src and "x committed best" in src, \
        "main() lost the flag-not-commit drift branch"
    # and the final JSON line is the last output: spark.stop() and a
    # stderr flush must precede the flush=True print of the line.
    tail = src[src.index("spark.stop()"):]
    assert "sys.stderr.flush()" in tail
    assert "print(line, flush=True)" in tail


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


def test_host_load_marker_shape():
    """VERDICT r13 #2: the contention marker must parse /proc/loadavg
    into load1/load5 + running/tasks (adjudication evidence riding
    every flagged drift dict), and never raise."""
    import bench

    m = bench._host_load()
    assert isinstance(m.get("load1"), float) and m["load1"] >= 0.0
    assert isinstance(m.get("load5"), float)
    # Linux path: the kernel's running/total task counts
    assert m.get("running", 0) >= 1 and m.get("tasks", 0) > 1


def test_main_sweep_attaches_load_to_flagged_dicts():
    """The main sweep's flag branch and the sf1/sf5 probes must all
    carry the marker — a flagged dict without `load` can't
    self-adjudicate and costs a manual re-witness. Asserts on the
    PARSED AST, not substring counts (ADVICE r14: a comment
    mentioning load could keep a raw count balanced while a real
    flag site lost its marker): every dict literal whose keys
    include "drift_x" must also key "load"."""
    import ast
    import inspect
    import textwrap

    import bench

    for fn in (bench.main, bench.run_sf1_probe, bench.run_sf5_probe):
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        flag_dicts = [
            node for node in ast.walk(tree)
            if isinstance(node, ast.Dict)
            and any(isinstance(k, ast.Constant) and k.value == "drift_x"
                    for k in node.keys)]
        assert flag_dicts, f"{fn.__name__}: no drift_x flag dict found"
        for d in flag_dicts:
            keys = {k.value for k in d.keys
                    if isinstance(k, ast.Constant)}
            assert "load" in keys, (
                f"{fn.__name__}: a drift_x flag dict lost its load "
                f"marker (keys={sorted(keys)})")


def test_plan_drift_gate(tmp_path):
    """VERDICT r13 #7: unexplained >30% exchange drift on a
    CONTRACTED query must be a gate violation; explained drift and
    non-contracted queries pass."""
    import sys

    sys.path.insert(0, "tools")
    from plan_audit import contracted_queries, gate_violations

    cq = contracted_queries()
    assert "dsir_select" in cq and len(cq) >= 15
    base = {"plans": {"dsir_select": {"exchanges": 15},
                      "dedup_spans": {"exchanges": 6},
                      "not_contracted": {"exchanges": 5}}}
    cur = {"plans": {"dsir_select": {"exchanges": 21},
                     "dedup_spans": {"exchanges": 7},
                     "not_contracted": {"exchanges": 50}}}
    v = gate_violations(base, cur, {})
    assert len(v) == 1 and v[0].startswith("dsir_select")
    assert gate_violations(
        base, cur, {"dsir_select": "totals rewrite"}) == []


def test_sweep_health_arithmetic():
    """VERDICT r14 #3: the sweep-health header's median-vs-prior,
    >1.5x mover census, and load1 profile — computed from a stubbed
    sweep with a flagged dict, an unshared query, and a zero prior."""
    import bench

    timings = {
        "a": 1.0,                       # prior 1.0 -> ratio 1.0
        "b": 2.0,                       # prior 1.0 -> ratio 2.0 (mover)
        "c": {"sec": 3.0, "expected": 2.0, "drift_x": 1.5,
              "load": {}},              # flagged: sec/prior = 1.5 (not >)
        "new": 9.9,                     # no prior -> excluded
        "z": 5.0,                       # prior 0 -> excluded
    }
    prior = {"a": 1.0, "b": 1.0, "c": 2.0, "z": 0.0}
    h = bench._sweep_health(timings, prior, {"a": 2.0, "b": 8.0})
    assert h["shared_with_prior"] == 3
    assert h["median_ratio_vs_prior"] == 1.5   # median(1.0, 1.5, 2.0)
    assert h["movers_gt_1_5x"] == 1 and h["mover_names"] == ["b"]
    assert h["load1"] == {"min": 2.0, "median": 5.0, "max": 8.0}
    # empty sweep must not raise (fresh checkout: prior == {})
    empty = bench._sweep_health({}, {}, {})
    assert empty["shared_with_prior"] == 0
    assert empty["median_ratio_vs_prior"] is None
    assert empty["load1"]["median"] is None


def test_sweep_health_in_result(monkeypatch):
    """main() must attach sweep_health to the full result — pinned
    structurally: the result-dict literal in main's source keys it."""
    import ast
    import inspect
    import textwrap

    import bench

    tree = ast.parse(textwrap.dedent(inspect.getsource(bench.main)))
    result_dicts = [
        node for node in ast.walk(tree)
        if isinstance(node, ast.Dict)
        and any(isinstance(k, ast.Constant) and k.value == "metric"
                for k in node.keys)]
    assert result_dicts, "main(): result dict literal not found"
    keys = {k.value for d in result_dicts for k in d.keys
            if isinstance(k, ast.Constant)}
    assert "sweep_health" in keys
