"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line. The headline metric mirrors the reference's only published
number (BASELINE.md): shuffle join + groupby-count + fetch-to-client
(examples/Demo.ipynb, 10.72 s on 2x2M rows / 32 PEs) — here
lineitem ⋈ orders → groupby(o_orderpriority).count → toPandas.

Contention protocol (VERDICT r12 #1b / r13 #2): every timing block
(main sweep, sf1, sf5) retries a reading >2x its committed best once,
and a post-retry reading still over the bar is recorded as a FLAGGED
dict ``{"sec", "expected", "drift_x", "load"}`` — never a bare
number, never adopted into the next round's expected table
(``_load_prior_timings`` refuses dicts). ``load`` is a
``_host_load()`` sample taken at read time (loadavg + kernel
running-task count); the artifact also carries ``result["load1"]``,
one sample per committed main-sweep reading. Adjudication rule: a
flag with load1 well above this process's own steady-state (~2-5 on
this host for a local[32] data pass; see _host_load's docstring) is
host contention — confirm with tools/solo_witness.py; a flag at
idle load is a real regression and must be root-caused, not re-based.

Sweep health (VERDICT r14 #3): ``BENCH_FULL.json["sweep_health"]``
is one sweep-level line computed at sweep end by
:func:`_sweep_health` — median ratio of this sweep's committed
readings vs ``_load_prior_timings`` over the shared queries, the
count (and names) of >1.5x movers, and the sweep's per-reading load1
min/median/max. A uniformly contended rerun (like r14's driver rerun:
median ratio 1.18, four 1.8-2.2x sub-second bare entries) now
self-identifies at the artifact level the same way flagged dicts do
per-query, without judge archaeology.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: committed-median baseline anchor (rounds 13-16, anchor code
#: unchanged since r10) — the reference point the sweep-total
#: normalization divides by (VERDICT r17 #4). Re-pin only if the
#: anchor workload itself ever changes.
ANCHOR_REF_SEC = 1.63

from charmpandas_spark.functions.dedup import release  # noqa: E402


def _host_load() -> dict:
    """One-sample host-contention marker (VERDICT r13 #2): 1- and
    5-minute loadavg plus the kernel's running-task count, read from
    /proc/loadavg in one syscall. Attached to every FLAGGED drift
    dict (and summarized per committed reading in the artifact's
    ``load1`` map) so a 2-3x reading carries the evidence needed to
    adjudicate contention-vs-regression in place, instead of costing
    a builder round and a judge session each (three rounds running:
    r11 sf1 drifters, r12's four contended sf0.1 entries, r13's 15
    driver flags — all ultimately host noise).

    Reading the marker: this process runs Spark local[32], so ~32 is
    the self-load of a busy data pass; ``load1`` far above the
    machine's core count, or ``running`` well beyond our own worker
    threads, at the moment a slow reading lands is external
    contention. A flagged dict with ``load`` near idle is the signal
    that actually deserves investigation."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        running, tasks = parts[3].split("/")
        return {"load1": float(parts[0]), "load5": float(parts[1]),
                "running": int(running), "tasks": int(tasks)}
    except Exception:
        try:
            l1, l5, _ = os.getloadavg()
            return {"load1": round(l1, 2), "load5": round(l5, 2)}
        except OSError:
            return {}


def _cleanup_entry(spark):
    """Reclaim per-query temp state between timed queries: the sink /
    round-trip / stream-replay queries leave parquet dirs in /tmp and
    memory-sink temp views in the catalog; across a 70-query sweep
    that accumulation made the tail queries 4-5x slower in the r6
    driver run (VERDICT #2)."""
    try:
        import __spark_entry__ as entry_mod

        entry_mod.cleanup_temp_sinks(spark)
    except Exception:
        pass  # hygiene is best-effort, never fatal to the bench
    # drop lingering Python refs so the ContextCleaner can reclaim
    # localCheckpoint/persist blocks between queries — the iterative
    # queries (pagerank, CC) otherwise accumulate storage blocks
    # across a 170-query sweep and the tail runs 2-3x slower (r9:
    # sf1 pagerank read 23 s in-sweep vs 5-8 s solo)
    import gc

    gc.collect()


def bench_queries(spark, sf_dir):
    """name -> callable returning a materialized (fetched) result."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # headline first: the BASELINE-equivalent pipeline
    names = [
        "flagship_join_groupby_count",
        "filter_expr",
        "groupby_sum",
        "groupby_extended",
        "join_inner",
        "sort_topk",
        "datetime_filter",
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        # r7: the three sink/layout queries moved from positions 68-70
        # to here (right after the TPC-H warm block). In the r6 driver
        # sweep they ran 4-5x slower at the END of the 70-query sweep
        # than solo (7-8 s vs 1.6-2.4 s, retry included) — accumulated
        # /tmp writes + memory-sink state was the suspected cause.
        # Running them EARLY, plus cleanup_temp_sinks() between every
        # query (below), separates position effects from plan cost;
        # SCALING.md records the before/after.
        "url_domain_filter",
        "sink_clustered_roundtrip",
        "zorder_key",
        "window_rank",
        "window_rolling",
        "events_json",
        "text_quality",
        "text_lang_id",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash",
        # NOTE (r8): dedup_minhash_fast became the recall-witness join
        # (word-3-gram LSH + exact truth set) when its rows-only
        # oracle was retired — not comparable to BENCH_r0{4..7}.
        "dedup_minhash_fast",
        "dedup_simhash",
        # NOTE (r3): dedup_embedding_cosine switched to a documented
        # deterministic 50% hash-sample contract in round 3 — its
        # timings under this key are NOT comparable to BENCH_r01/r02
        # (which ran all-pairs). Same key kept because the QUERY's
        # contract changed, not the bench harness.
        "dedup_embedding_cosine",
        "dedup_embedding_cosine_ann",
        "sim_topk",
        "sim_ann_lsh",
        "multimodal_frames",
        "multimodal_decode",
        "events_window",
        "events_sliding_window",
        "events_sessionize",
        "tpch_q2",
        "tpch_q16",
        "tpch_q18",
        "tpch_q13",
        "tpch_q17",
        "tpch_q19",
        "tpch_q21",
        "tpch_q22",
        "tpch_q7",
        "tpch_q10",
        "tpch_q15",
        "dedup_clusters",
        "window_range_frame",
        "datetime_parts",
        "text_vocab",
        "text_tfidf",
        "sample_hash",
        "dataset_split",
        "events_interval_join",
        "dedup_contamination",
        "events_histogram",
        # r4 additions (streaming twins excluded: their wall-clock is
        # micro-batch replay overhead, not engine throughput)
        "tpch_q8",
        "tpch_q9",
        "tpch_q11",
        "tpch_q20",
        "events_merge_asof",
        "dedup_simhash_pairs",
        "sim_knn_join",
        "text_chunks",
        "text_redact_pii",
        "dedup_embedding_leakage",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "text_repetition",
        # r6 additions (url_domain_filter / sink_clustered_roundtrip /
        # zorder_key moved to the front block in r7 — see note above)
        "text_pack",
        "text_pack_greedy",
        "stratified_sample",
        "text_token_stats",
        # r7 additions
        "text_bpe_tokens",
        "multimodal_bmp",
        "quality_gopher",
        "quality_c4",
        "embedding_kmeans",
        "source_orc_roundtrip",
        "corpus_percentiles",
        "corpus_weighted_quantiles",
        "dedup_semantic",
        "mixture_sample",
        "negative_sample",
        "quality_quantile_keep",
        "multimodal_resize",
        "multimodal_wav",
        # r7 wave 2
        "text_line_dedup",
        "quality_expectations",
        "merge_upsert",
        "shard_assignment",
        "sink_compacted_roundtrip",
        "text_phrase_search",
        "sim_sparse_topk",
        "dedup_spans",
        "table_diff",
        "events_funnel",
        "quality_classifier",
        "sparse_postings_lookup",
        "dedup_jaccard_prefix",
        "events_resample",
        # r7 wave 3
        "quality_lm_score",
        "hybrid_rrf",
        "table_profile",
        "histogram_value",
        "decontam_ngrams",
        "graph_pagerank",
        "curation_report",
        "events_trend",
        "embedding_quantize",
        "dedup_incremental",
        "events_transitions",
        "mixture_token_budget",
        "unpivot",
        "quality_lm_external",
        "sim_quantized_topk",
        "events_props_typed",
        "curation_funnel",
        "lineitem_corr",
        "url_canonicalize",
        "events_ab_welch",
        "text_token_drift",
        "pii_scan",
        "join_blowup",
        "events_asof_nearest",
        "histogram_equidepth",
        "dedup_editdist",
        "sim_bm25",
        "hybrid_rrf3",
        # r8 additions (streaming_stream_join_full excluded like the
        # other streaming replays: wall-clock there is micro-batch
        # replay overhead, not engine throughput)
        "dedup_span_removal",
        "corpus_percentiles_approx",
        "histogram_equidepth_approx",
        "distinct_count_approx",
        "decontam_bloom",
        "dedup_minhash_incremental",
        # r13: the index-compaction round-trip joins the sweep
        "dedup_index_compact",
        "sim_pq_topk",
        # r9 additions: the rest of the registry joins the sweep so
        # every oracle query has a committed timing prior for the
        # relative noise-retry (VERDICT r8 #7). Only the 7 streaming
        # replays stay excluded (their wall-clock is micro-batch
        # replay overhead, not engine throughput).
        "sim_ivfpq_topk",
        # r9 wave-3: warehouse/product-analytics composites + CMS
        "events_cohort_retention",
        "cdc_apply",
        "scd2_history",
        "cdc_survivorship",
        "impute_median",
        "rollup_incremental",
        "heavy_hitters_cms",
        "events_attribution",
        "graph_triangles",
        "leakage_safe_split",
        "events_ewm",
        "events_anomaly_mad",
        "graph_kcore",
        "audience_overlap",
        "events_attribution_linear",
        "er_jaro_winkler",
        "source_schema_evolution",
        "source_csv_malformed",
        "dedup_keep_best",
        "multimodal_png",
        # r12: the JPEG codec query joins the sweep (VERDICT r11 #3)
        "multimodal_jpeg",
        "dsir_weights",
        "dsir_select",
        "multimodal_dhash",
        "multimodal_audiohash",
        "multimodal_video_dhash",
        "dedup_images",
        "scan_project",
        "scalar_reduction",
        "int_literal_widening",
        "groupby_count",
        "groupby_bool",
        "groupby_ts_key",
        "groupby_cube",
        "groupby_rollup",
        "pivot",
        "window_lag",
        "join_full",
        "join_left",
        "join_right",
        "join_left_semi",
        "join_left_anti",
        "join_right_semi",
        "join_right_anti",
        "join_multikey",
        "join_timestamp_key",
        "concat",
        "intersect",
        "except",
        "distinct",
        "string_functions",
        "case_when",
        "text_token_count",
        "text_fingerprint",
        "tpch_q4",
        "tpch_q6",
        "tpch_q12",
        "tpch_q14",
        "sim_ivf",
        "sim_ivf_incremental",
        "dedup_corpus",
        "curation_pipeline",
        "multimodal_meta",
        "events_asof_join",
        # r9 wave-4: feature encoding / sequence / temporal family
        "target_encode",
        "target_encode_loo",
        "standard_scale",
        "group_topk",
        "markov_transitions",
        "locf_fill",
        "temporal_split",
        "coreset_kcenter",
        "embedding_pca",
        "keyword_topk",
        "group_topk_incremental",
        "purged_kfold",
        "window_ntile",
        "embedding_pca_incremental",
        "embedding_drift",
        # r9 wave-5: itemsets / series diagnostics / featsel /
        # grouping sets / line-text source
        "events_basket_rules",
        "events_seasonal",
        "events_changepoint",
        "chi2_source_terms",
        "grouping_sets",
        "source_text_lines",
        "classifier_calibration",
        "events_top_paths",
        "sim_ivfpq_rerank",
        "events_quantiles_by_group",
        "join_salted",
        # r9 wave-7: sampling / preprocessing / audit family
        "events_anomaly_seasonal",
        "weighted_sample",
        "winsorize_value",
        "quality_kappa",
        "vocab_oov",
        "source_concentration",
    ]
    return {n: qs[n] for n in names if n in qs}


# ---------------------------------------------------------------------------
# sf1 scaling probe: 10x the sf0.1 data (generated once, locally) and
# re-run a representative slice — catches anything super-linear
# (driver-side loops, persist-size cliffs) that sf0.1 hides.
# ---------------------------------------------------------------------------

SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_sf1")
# name -> expected solo seconds (min observed across committed solo
# runs, r5/r6). The probe retries any first run that exceeds
# 2x expected: the r6 DRIVER artifact recorded embedding-ANN sf1 at
# 165.9 s where the committed solo run said 26.0 s — single-shot
# probes on a timeshared host record phantom regressions on exactly
# the queries where scaling evidence matters most (r6 VERDICT #1).
SF1_QUERIES = {
    # r9 solo re-measure (VERDICT r8 #4): 2.06-2.25 s warm on the
    # 10x-population events fixture; the old 1.0 s predates it
    "flagship_join_groupby_count": 1.8,
    "tpch_q1": 1.1,
    # r13 re-base: the exact-sum refactor (functions/exact.py — the
    # decimal(28,6) agg buffer became two long accumulators) put the
    # solo floor at 1.37 s; the old 3.0 predates it
    "tpch_q18": 1.4,
    "dedup_ngram_jaccard": 4.5,
    # r8 contract change: dedup_minhash_fast became the recall-witness
    # join (xxhash64 LSH on WORD 3-grams + the exact truth set) when
    # its rows-only oracle was retired — word shingles are ~10x fewer
    # than the old char-5-gram config, so timings under this key are
    # NOT comparable to BENCH_r0{4..7}.
    "dedup_minhash_fast": 5.3,
    "sim_ann_lsh": 0.95,
    # CC driver loop + bipartite contamination join: the two
    # operators whose scaling the probe didn't witness before
    "dedup_clusters": 6.5,
    "dedup_contamination": 4.0,
    # r4: witness the adaptive-plane ANN path's ~linear candidate
    # growth (VERDICT r3 #1). r8: re-based to the rotated-copy
    # embedding fixture (per-copy isometry — see _ensure_sf1).
    # r9 solo re-measure (VERDICT r8 #4): warm steady state is
    # 4.2-4.3 s (3 consecutive solo runs); the 11-13 s sweep readings
    # were the FIRST-touch cost (page-cache-cold 10-file fixture +
    # JIT) landing exactly at the old 2x gate (13.0), so the retry
    # flapped. Expected = warm min per the doctrine; the cold first
    # run now always trips the retry and the min is recorded.
    # r12 solo re-measure (VERDICT r11 #1): fresh-process 4-run probe
    # = 15.6/6.4/5.2/5.5 — warm floor ~5.2, confirming 4.5 as the
    # honest expected; the r11 sweep's 9.7 and a same-process
    # 8-probe-batch reading of 25.8 were accumulated-JVM noise, which
    # the new drift tripwire now flags instead of committing
    "dedup_embedding_cosine_ann": 4.5,
    # r7 wave-2 ops (warm best-of-2 minima, multi-file sf1 layout)
    "text_line_dedup": 2.0,
    "sim_sparse_topk": 5.1,
    # r12 solo re-measure: 17.5(cold)/6.6 — the r11 sweep's 11.7 was
    # contention; 6.6 warm is 1.4x the r10 floor, inside the band
    "dedup_spans": 4.8,
    # r12 re-base: flagged by the new drift tripwire in BOTH r12
    # bench runs (1.58/1.68 min-of-2) and confirmed solo
    # (6.5 cold/1.98/2.14) — the r7-era 0.7 floor is not reproducible
    # on the current fixture; expected = today's repeatable min
    "shard_assignment": 1.6,
    # r7 wave-3 (clean solo-run minima; a first 47 s pagerank reading
    # was contention from a concurrently-running pipeline demo — the
    # idle-host figure is ~8 s). The sf1 fixture reuses the customer
    # table, so the 10x orders densify the bipartite graph instead of
    # growing the node set; 3 iterations over the denser edge list is
    # the honest iterative-scaling witness.
    # r17 re-base (int64 node ids — custkey*2/suppkey*2+1 replace
    # string keys in every exchange): min-of-3 idle-start 5.25
    "graph_pagerank": 5.3,
    "quality_lm_score": 4.6,
    "decontam_ngrams": 2.7,
    # r8 (VERDICT r7 #6): the heavy r7 analytics ops join the probe.
    # Expected = best-of-2 committed solo runs on the rotated-copy
    # fixture; all land at 1.8-3.4x their sf0.1 sweep time on 10x
    # data — sub-linear across the board.
    # r9: PPJoin length + positional filters in the candidate join
    # (lossless prunes; oracle unchanged) — solo sf1 30.1 -> ~13 s.
    # r9 solo re-measure: 16.9-20.3 s across sweep + 2 idle-host solo
    # runs — the ~13 s figure was a best-case; re-based to the
    # repeatable floor
    # r17 re-base (fused candidate stage: sz in the prefix-rank
    # window exchange, sizes ride the candidate rows): min-of-3
    # idle-start 12.1
    "dedup_jaccard_prefix": 12.1,
    "sim_bm25": 8.5,
    "hybrid_rrf3": 4.3,
    # r13 re-base (one-buffer array percentile): 2.02 / 1.85 across
    # the two final-sweep probes; the 7.4 was the 5-buffer form
    "corpus_percentiles": 1.9,
    # NEW late-r13 operator (weighted quantiles): solo min-of-3
    # fresh-session 0.89 at sf1 (sf0.1 0.83, sf5 1.49 — the window
    # cumulative is overhead-dominated at these scales)
    "corpus_weighted_quantiles": 0.9,
    "histogram_equidepth": 4.4,
    "embedding_kmeans": 3.2,
    # SemDeDup at its published operating point (threshold 0.6,
    # k grown with n so clusters stay ~250 vectors): 46.7 s at sf1 vs
    # 13.1 s at sf0.1 — sub-linear. The REGISTRY config (k=8,
    # threshold 0.25) is oracle-pinned and its OUTPUT is quadratic by
    # definition (~2.3% of random unit-vector pairs pass cos >= 0.25,
    # so pair count grows n^2: measured 1.0M rows at sf1 vs ~10k at
    # sf0.1) — probing it witnesses output explosion, not engine
    # scaling, hence the scaled override below.
    # r9 solo re-measure: 15.9 (sweep) / 20.2 / 32.4 (solo) — the
    # iterative Lloyd passes are the most host-noise-sensitive probe.
    # r12 variance protocol CLOSED (VERDICT r11 #5 / r10 #6): 3
    # consecutive fresh-process solo runs = 30.7(cold)/18.29/18.33 —
    # warm spread 0.04 s; expected re-based to the warm floor
    "dedup_semantic_scaled": 18.3,
    # r9 ops: sampled training makes PQ/IVF-PQ sub-linear (sf0.1 ->
    # sf1 is 3.3 -> 4.7 s and 5.2 -> 7.0 s on 10x data: the Lloyd
    # passes are capped at 256 vectors, only encode/search scale);
    # the PNG codec is scan-local Arrow-batched Python.
    # r13 re-base (capped training now runs driver-side in numpy —
    # the old figures carried iters x m Spark jobs of pure overhead):
    # pq 2.32 / 3.03, ivfpq 3.53 / 4.37 across the two final sweeps
    "sim_pq_topk": 2.8,
    "sim_ivfpq_topk": 4.0,
    "multimodal_png": 1.4,
    # r13 (VERDICT r12 #5): the other two codec tiers at sf1 — jpeg
    # is the heaviest decoder (entropy decode + IDCT per block), zlib
    # the lightest. Measured solo 3-run minima (idle host):
    # jpeg 26.1/23.4/22.2 = 7.5x its sf0.1 sweep time on 10x data
    # (sub-linear: the Arrow batch + worker-pool overhead amortizes);
    # decode 1.37 = 1.9x on 10x data (overhead-dominated).
    "multimodal_jpeg": 22.2,
    "multimodal_decode": 1.4,
    # r9 wave-3 ops (solo sf1, idle host): triangles/k-core ride the
    # Jaccard pair join (same scaling family as dedup_ngram_jaccard);
    # CMS is shuffle-bytes-independent-of-N by construction; the
    # events composites are one-exchange window/agg pipelines over
    # the 10x-population events fixture
    "graph_triangles": 8.7,
    # r9 wave-4 (best-of-2 solo, idle host): k-center = k bounded
    # scan aggregates + assignment; PCA = one mapInPandas statistics
    # pass (warm 1.2 s — the cold 12.9 s is Python-pool first touch);
    # keyword_topk = explode + tf/df joins + doc-keyed window;
    # group_topk = two bounded aggregations.
    # r13 re-base (selection now a numpy loop on the collected
    # 256-row sample; the 6.5 was 7 Spark jobs of per-round plan
    # compile): 2.12 / 2.25 across the two final sweeps
    "coreset_kcenter": 2.3,
    "embedding_pca": 1.1,
    "keyword_topk": 3.0,
    "group_topk": 1.3,
    # r12 re-base (VERDICT r11 #1): r9's 3.2 was a best-case never
    # reproduced since (r10 6.2, r11 8.1; r12 solo fresh-process
    # 4 runs = 12.3/7.0/7.6/5.7) — expected = the repeatable warm
    # floor from the committed 4-run probe, not the one-off best
    "graph_kcore": 5.7,
    "heavy_hitters_cms": 2.7,
    "cdc_apply": 1.5,
    "events_cohort_retention": 0.9,
    "events_ewm": 0.8,
    # r13: the persisted-index family, measured AFTER the sidecar
    # FileSystem-write fix (solo min at sf1; sf0.1 floors 1.69 /
    # 6.55 / 4.0 s -> exponents ~0.28 / 0.27 / ~0 over the 10x leg —
    # probe I/O rides the batch's bucket coverage, and the compaction
    # round-trip is write-overhead-dominated, flat in corpus size)
    "dedup_incremental": 3.2,
    "dedup_minhash_incremental": 12.2,
    "dedup_index_compact": 4.2,
}


def _sf1_dedup_semantic_scaled(spark, sf_dir: str):
    """SemDeDup (Abbas et al. 2023) at its web-scale operating point:
    high threshold (sparse survivors) and k ~ n/250 so per-cluster
    pair work stays constant as the corpus grows — the configuration
    a 100 TB run would use. See the SF1_QUERIES comment for why the
    oracle-pinned registry config cannot serve as a scaling witness."""
    import charmpandas_spark as cps
    from charmpandas_spark.functions.kmeans import semantic_near_dup

    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    n = emb.count()
    return semantic_near_dup(emb, "embedding", "vec_id",
                             k=max(8, -(-n // 250)), iters=3,
                             threshold=0.6)


#: probe names that are NOT registry queries: scale-parameterized
#: variants of oracle-pinned configs.
SF1_OVERRIDES = {
    "dedup_semantic_scaled": _sf1_dedup_semantic_scaled,
}


def _sweep_health(timings: dict, prior: dict,
                  sweep_load1: dict) -> dict:
    """Sweep-level contention summary (VERDICT r14 #3): one dict
    computed at sweep end so a uniformly slow rerun self-identifies
    in the artifact instead of needing per-query archaeology.

    - ``median_ratio_vs_prior``: median of (this sweep's reading /
      committed best) over queries present in both — flagged dicts
      contribute their ``sec``. 1.0 = in band; ~1.2 across 200+
      queries = the whole sweep ran on a loaded host.
    - ``movers_gt_1_5x``: count + names (ALL of them since r17 — the
      floor adjudication covers every mover, VERDICT r16 #2) of
      shared queries over 1.5x their prior — catches the sub-second
      entries the per-query flag floor (max(2x, 1.0 s)) deliberately
      ignores.
    - ``load1``: min/median/max of the per-reading load1 samples.
    """
    def _sec(v):
        return v["sec"] if isinstance(v, dict) else v

    ratios = sorted(
        _sec(v) / prior[k] for k, v in timings.items()
        if k in prior and prior[k] > 0
        and isinstance(_sec(v), (int, float)))
    movers = sorted(
        (k for k, v in timings.items()
         if k in prior and prior[k] > 0
         and isinstance(_sec(v), (int, float))
         and _sec(v) / prior[k] > 1.5),
        key=lambda k: -(_sec(timings[k]) / prior[k]))

    def _med(xs):
        n = len(xs)
        if not n:
            return None
        return round((xs[n // 2] if n % 2 else
                      (xs[n // 2 - 1] + xs[n // 2]) / 2), 3)

    loads = sorted(sweep_load1.values())
    return {
        "shared_with_prior": len(ratios),
        "median_ratio_vs_prior": _med(ratios),
        "movers_gt_1_5x": len(movers),
        "mover_names": movers,
        "load1": {"min": round(loads[0], 2) if loads else None,
                  "median": _med(loads),
                  "max": round(loads[-1], 2) if loads else None},
    }


def _run_solo_witness(names: list[str], runs: int,
                      timeout: float) -> dict:
    """One fresh-process ``tools/solo_witness.py`` invocation;
    returns its ``results`` map ({} on failure)."""
    import subprocess
    import tempfile

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "solo_witness.py")
    with tempfile.NamedTemporaryFile(suffix=".json") as fh:
        subprocess.run([sys.executable, tool, "--runs", str(runs),
                        "--out", fh.name] + names,
                       timeout=timeout, capture_output=True)
        try:
            with open(fh.name) as rfh:
                return json.load(rfh).get("results", {})
        except (OSError, ValueError):
            return {}


def _mover_floors(movers: list[str], prior: dict,
                  max_prior_sec: float = 25.0) -> dict:
    """Auto-adjudicate sweep movers (VERDICT r15 #8 / r16 #2): run
    ``tools/solo_witness.py`` in a FRESH process (after the sweep JVM
    stops — ADVICE r16) for EVERY >1.5x mover, so no mover ships
    unadjudicated. First pass is min-of-2; any floor still >1.15x its
    committed prior escalates to two more runs (>=4 total, min over
    all) before the figure is recorded — a 2-run floor under residual
    load must not be mistaken for a plan regression. Movers whose
    committed prior exceeds ``max_prior_sec`` are covered by the
    dedicated sf-probe/solo protocols; they get a ``skipped`` entry
    carrying the exact solo_witness command line to run by hand.
    ``contention: true`` means the solo floor is within 1.3x of the
    committed prior — the sweep reading was load, not a regression.
    Disable with SPARK_GRAFT_BENCH_SOLO=0."""
    out = {}
    picked = []
    for m in movers:
        if prior.get(m, 0) > max_prior_sec:
            out[m] = {"skipped": f"prior>{max_prior_sec}s",
                      "cmd": f"python tools/solo_witness.py "
                             f"--runs 3 {m}"}
        else:
            picked.append(m)
    if not picked:
        return out
    # ~20 s session spin-up per query + generous per-run headroom
    budget = 60.0 * len(picked) + 8.0 * sum(
        prior.get(m, 5.0) for m in picked)
    res = _run_solo_witness(picked, 2, max(1200.0, 2 * budget))
    escalate = []
    for name, row in res.items():
        if isinstance(row.get("min"), (int, float)):
            p = prior.get(name)
            if p and row["min"] > 1.15 * p:
                escalate.append(name)
    res2 = (_run_solo_witness(escalate, 2, max(1200.0, 2 * budget))
            if escalate else {})
    for name, row in res.items():
        if not isinstance(row.get("min"), (int, float)):
            continue
        p = prior.get(name)
        all_runs = list(row["runs"])
        row2 = res2.get(name, {})
        if isinstance(row2.get("min"), (int, float)):
            all_runs += list(row2["runs"])
        floor = min(all_runs)
        entry = {"floor": floor, "runs": all_runs, "prior": p,
                 "contention": bool(p and floor <= 1.3 * p)}
        if floor < 1.0:
            # sub-second floors sit inside per-reading jitter
            # (session startup, GC, page cache); a floor >1.3x a
            # min-across-3-artifacts prior is not evidence of a
            # plan regression at this magnitude
            entry["subsecond"] = True
        out[name] = entry
    return out


def _load_prior_timings(artifact_dir: str | None = None) -> dict:
    """Per-query expected seconds for the RELATIVE noise-retry
    trigger: the min across the last three committed per-round bench
    artifacts plus ``BENCH_FULL.json`` — min, because each artifact
    is itself a noisy single sweep and the best committed figure is
    the honest solo cost (same doctrine as ``SF1_QUERIES``). The
    driver's ``BENCH_r*.json`` wraps the bench's JSON line under
    ``parsed`` and keeps only a curated query subset there; the full
    125-query map is this repo's own committed ``BENCH_FULL.json``.
    Returns {} when no artifacts exist (fresh checkout) — every query
    then falls back to the absolute bar. ``artifact_dir`` overrides
    the repo root (tests inject a temp dir instead of monkeypatching
    ``os.path.dirname`` module-globally — ADVICE r12)."""
    import glob
    import json

    here = artifact_dir or os.path.dirname(os.path.abspath(__file__))
    best: dict = {}
    files = (sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))[-3:]
             + [os.path.join(here, "BENCH_FULL.json")])
    for f in files:
        try:
            with open(f) as fh:
                doc = json.load(fh)
        except Exception:
            continue
        for qd in (doc.get("queries"),
                   (doc.get("parsed") or {}).get("queries")):
            for k, v in (qd or {}).items():
                if isinstance(v, (int, float)) and v > 0:
                    best[k] = min(best.get(k, v), v)
                elif isinstance(v, dict) and v.get("expected"):
                    # a flagged drift dict is not a timing, but its
                    # ``expected`` IS the committed best that tripped
                    # the flag — keep it as the prior, else a query
                    # flagged once loses its relative bar entirely
                    # (r13: three flagged entries would have fallen
                    # back to the absolute 5 s bar next sweep, letting
                    # a 4.9 s contended reading commit bare)
                    e = v["expected"]
                    if isinstance(e, (int, float)) and e > 0:
                        best[k] = min(best.get(k, e), e)
    return best


SF5_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_sf5")


def _ensure_sf5(src_dir: str) -> bool:
    """Materialize ~sf5 ``documents``/``embeddings`` ONLY into
    ``bench_sf5/`` (50 key-shifted copies of the sf0.1 tables — same
    token-suffix / cyclic-dimension-shift recipe as
    :func:`_ensure_sf1`, see the rationale there) for the dedup
    family's third scaling point (VERDICT r11 #7): sf0.1 -> sf1 ->
    sf5 turns the "sub-linear" claims into an observed exponent.
    Only the two document-side tables: the dedup/ANN probes touch
    nothing else, and 50 lineitem copies would be ~900 MB of unused
    fixture. ~30 MB total, cached across runs.

    Cache validity is keyed on a ``_SUCCESS`` sentinel written AFTER
    the last COPY (ADVICE r12): directory existence alone would
    accept an interrupted generation's partial fixture forever, and
    sf5 timings on a truncated corpus would commit as real scaling
    numbers (the drift tripwire only catches SLOW readings)."""
    import shutil

    sentinel = os.path.join(SF5_DIR, "_SUCCESS")
    paths = [os.path.join(SF5_DIR, f"{t}.parquet")
             for t in ("documents", "embeddings")]
    if os.path.isfile(sentinel) and all(os.path.isdir(p) for p in paths):
        return True
    import duckdb

    shutil.rmtree(SF5_DIR, ignore_errors=True)  # partial => rebuild
    os.makedirs(SF5_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(src_dir, t + '.parquet')}'")
    did = con.execute("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
    vid = con.execute("SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0]
    copies = {
        "documents": f"SELECT s.* REPLACE (s.doc_id + t.i * {did} AS "
                     f"doc_id, regexp_replace(s.text, '(\\S+)', "
                     f"'\\1' || t.i, 'g') AS text) FROM documents s "
                     f"CROSS JOIN range({{lo}}, {{hi}}) t(i)",
        # gcd(7, 64) = 1, so the 50 per-copy cyclic shifts are all
        # distinct — within-copy geometry exact, cross-copy cosine
        # noise, exactly as at sf1
        "embeddings": f"SELECT s.* REPLACE (s.vec_id + t.i * {vid} AS "
                      f"vec_id, list_concat("
                      f"s.embedding[(t.i * 7) % 64 + 1 :], "
                      f"s.embedding[1 : (t.i * 7) % 64]) AS embedding) "
                      f"FROM embeddings s CROSS JOIN "
                      f"range({{lo}}, {{hi}}) t(i)",
    }
    for t, sql in copies.items():
        dest = os.path.join(SF5_DIR, t + ".parquet")
        os.makedirs(dest, exist_ok=True)
        for j in range(50):
            con.execute(
                f"COPY ({sql.format(lo=j, hi=j + 1)}) TO "
                f"'{os.path.join(dest, f'part-{j:02d}.parquet')}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 250000)")
    with open(sentinel, "w") as fh:
        fh.write("ok\n")
    return True


def _ensure_sf5_tpch(src_dir: str) -> bool:
    """Materialize the sf5 TPC-H slice (``lineitem``/``orders`` as 50
    orderkey-lockstep-shifted copies + the unshifted ``customer``)
    that ``graph_pagerank`` needs for its third scaling point
    (VERDICT r12 #3). Split from :func:`_ensure_sf5` behind its OWN
    sentinel because it is ~25x the document-side fixture (~700 MB):
    a doc-only sf5 run should not pay the TPC-H generation, and an
    interrupted TPC-H build must not invalidate the (complete)
    document fixture. Same densification axis as sf1: custkeys are
    NOT shifted, so the bipartite trading graph gains 50x edge
    multiplicity on a fixed node set — the iterative-join cost axis —
    exactly as the sf1 comment documents for the 10x case."""
    sentinel = os.path.join(SF5_DIR, "_SUCCESS_TPCH")
    tables = ("lineitem", "orders", "customer", "part")
    paths = [os.path.join(SF5_DIR, f"{t}.parquet") for t in tables]
    if os.path.isfile(sentinel) and all(os.path.isdir(p) for p in paths):
        return True
    import shutil

    import duckdb

    for p in paths:  # partial => rebuild (doc-side fixture untouched)
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(SF5_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(src_dir, t + '.parquet')}'")
    ok = con.execute("SELECT max(l_orderkey) + 1 FROM lineitem").fetchone()[0]
    pk = con.execute("SELECT max(p_partkey) + 1 FROM part").fetchone()[0]
    copies = {
        "lineitem": f"SELECT s.* REPLACE (s.l_orderkey + t.i * {ok} "
                    f"AS l_orderkey) FROM lineitem s CROSS JOIN "
                    f"range({{lo}}, {{hi}}) t(i)",
        "orders": f"SELECT s.* REPLACE (s.o_orderkey + t.i * {ok} "
                  f"AS o_orderkey) FROM orders s CROSS JOIN "
                  f"range({{lo}}, {{hi}}) t(i)",
        "customer": "SELECT * FROM customer",
        # ER densification: suffix the TRAILING noun (the blocking
        # key) per copy — 50x more distinct entities in 50x more
        # blocks of UNCHANGED size, so blocked-pair work scales with
        # population. A bare partkey shift would collapse under the
        # query's distinct() (identical names); an unsuffixed 50x
        # name multiplication would blow each block up 50x and the
        # pair count 2500x — a fixture artifact, not workload
        # scaling (same lesson as dedup_semantic's cyclic shift).
        "part": f"SELECT s.* REPLACE (s.p_partkey + t.i * {pk} AS "
                f"p_partkey, regexp_replace(s.p_name, '(\\S+)$', "
                f"'\\1' || t.i) AS p_name) FROM part s CROSS JOIN "
                f"range({{lo}}, {{hi}}) t(i)",
    }
    for t, sql in copies.items():
        dest = os.path.join(SF5_DIR, t + ".parquet")
        os.makedirs(dest, exist_ok=True)
        shards = [(0, 1)] if "{lo}" not in sql else \
            [(i, i + 1) for i in range(50)]
        for j, (lo, hi) in enumerate(shards):
            part = sql.format(lo=lo, hi=hi) if "{lo}" in sql else sql
            con.execute(
                f"COPY ({part}) TO "
                f"'{os.path.join(dest, f'part-{j:02d}.parquet')}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 250000)")
    with open(sentinel, "w") as fh:
        fh.write("ok\n")
    return True


#: the scaling slice probed at sf5 (VERDICT r11 #7: dedup family;
#: VERDICT r12 #3: similarity, graph, and one streaming drain join
#: it so the 3-point curves cover every family whose sub-linearity
#: the 100 TB claims rest on). expected = committed warm solo minima
#: (SCALING.md has the full curves); the same >2x drift tripwire
#: applies so a contended reading gets flagged, never committed bare.
SF5_QUERIES = {
    # r13 band re-bases (bands are committed warm solo minima — the
    # drift tripwire is 2x the band, so a stale-HIGH band weakens
    # it; each re-base below is this round's sweep/solo minimum):
    # minhash 9.6->8.9 (solo), ngram 24->13.8 (sweep), bm25
    # 25.6->20.2 (sweep), ivfpq 18.2->10.5 (sweep), pagerank
    # 13.3->12.4 (sweep).
    "dedup_minhash": 8.9,
    # NEW late-r13 operator: solo min-of-3 1.49 (see the sf1 note)
    "corpus_weighted_quantiles": 1.5,
    # ngram re-based BACK UP 13.8 -> 20.0 (late-r13): the 13.8 was a
    # single sweep reading never reproduced — this session's solo
    # min-of-3 fresh-session runs read 25.2/20.0/40.1 and the final
    # clean sweep read 28.3, all consistent with the pre-re-base
    # 23.9-24 s history (SCALING.md's committed curve row). Band =
    # the solo min.
    "dedup_ngram_jaccard": 20.0,
    "dedup_spans": 16.4,
    "dedup_clusters": 18.1,
    # r13 (VERDICT r12 #3) — measured warm min-of-2 solo (idle host,
    # fresh session each, probe protocol itself): observed exponents
    # over the committed sf1->sf5 leg are bm25 0.77, ivfpq 0.62,
    # triangles 0.93, pagerank 0.42; streaming_dedup 0.19 over the
    # 50x sf0.1->sf5 leg (drain floor amortizes). SCALING.md r13
    # refresh has the full 3-point curves.
    "sim_bm25": 20.2,
    # r13 re-base (driver-side capped training): 8.65 / 9.53 across
    # the two final sweeps
    "sim_ivfpq_topk": 8.7,
    "graph_triangles": 14.9,
    # r17 re-base (int64 node ids): min-of-3 idle-start 10.0 —
    # e(sf1->sf5) 0.40 on the new floors (5.25 -> 10.0)
    "graph_pagerank": 10.0,
    "streaming_dedup": 10.0,
    # r14 (VERDICT r13 #5): the recurring stream-stream sf5 point —
    # solo min-of-2 26.45 s (runs 37.3/26.5, load1 7.4/6.4;
    # STREAMING_BUDGET_SF5_r14.json). streaming_sessionize's sf5
    # curve is committed there too (drain 133 s, e 0.61/0.74 by leg)
    # but deliberately NOT probed per-round: two ~145 s runs would
    # dominate the probe budget for a curve that is already pinned.
    "streaming_stream_join_outer": 26.5,
    # k-means/coreset family third points (same protocol). kcenter
    # r13 re-base 32.1 -> 7.8: the first sf5 reading was itself
    # contended (sweep 7.56 + solo 7.75/8.9/11.9 confirm the floor);
    # the honest curve is FLAT through sf5 — cost is k driver
    # round-trips x job latency, the per-round data term is not yet
    # visible at this scale (at 100 TB it dominates and the
    # documented cap/sample applies). k-means sampled training 0.29.
    # Late-r13 re-base 7.8 -> 3.1 (driver-side numpy selection —
    # the k driver round-trips are gone): 3.04 / 3.15 across the two
    # final sweeps.
    "coreset_kcenter": 3.1,
    "embedding_kmeans": 4.9,
    # relational-core third points (r13): the FIRST sf5 probe of
    # tpch_q1 read 13.8 s solo-warm — sf1->sf5 exponent 1.41,
    # SUPER-linear — which root-caused to the exact-decimal agg
    # buffer (decimal(28,6) exceeds Spark's 18-digit long-backed
    # Decimal, so every row update allocated a BigDecimal; the cliff
    # is invisible at sf0.1/sf1 where session overhead dominates).
    # functions/exact.py replaced the buffer with two long
    # accumulators, same per-row quantization: q1 2.89 s (e 0.62),
    # q18 3.42 s (e 0.57) — measured min-of-3 solo warm.
    "tpch_q1": 2.9,
    "tpch_q18": 3.4,
    # text / quality / sketch family third points (r13, documents
    # fixture only — no TPC-H slice needed): solo min-of-3 floors.
    # line-dedup e(sf1->sf5) 0.46 (normalize+explode+groupBy rides
    # partial agg), gopher 0.20 over the 50x sf0.1->sf5 leg
    # (scan-local HOFs, overhead-dominated), CMS 0.42 (mergeable
    # sketch monoid — shuffle volume is sketch-width, not rows).
    "text_line_dedup": 4.7,
    "quality_gopher": 1.6,
    "heavy_hitters_cms": 5.8,
    # product-analytics third points (r13, events slice — 50 copies
    # shifting event_id+user_id, population densification): all
    # strongly sub-linear over the 50x sf0.1->sf5 leg (sessionize
    # e 0.09, as-of 0.23, funnel 0.21) — per-user windows scale by
    # population, so the one-exchange bucketed plans ride partial
    # agg and the fixed time range keeps per-key series flat.
    "events_sessionize": 1.2,
    "events_asof_join": 1.3,
    "events_funnel": 1.6,
    # sampling / ER / warehouse / multimodal third points (r13) —
    # with these, EVERY SCALING.md family has an observed 3-point
    # curve. dsir 0.35 over 50x (hash-feature scan + one broadcast
    # of the 10k-bucket target histogram); er FLAT with the pair
    # count scaling exactly 50x (trailing-noun suffix densification
    # — 50x blocks of unchanged size, see _ensure_sf5_tpch); merge
    # 0.46 (rank-by-seq dedup rides partial agg); decode 0.19
    # (Arrow batch + worker-pool overhead amortizes).
    "dsir_weights": 23.0,
    "er_jaro_winkler": 1.0,
    "merge_upsert": 5.3,
    "multimodal_decode": 1.4,
    # r13 (post sidecar-write fix): the persisted-index family's
    # third point — solo min-of-3 4.87 s; with sf0.1 1.69 / sf1 2.30
    # the curve is e(sf1->sf5, 5x) = 0.47 (the index build is the
    # linear part; the probe rides the batch's bucket coverage)
    "dedup_incremental": 4.9,
    # r16 (VERDICT r15 #5): incremental IVF's third point — first
    # probe readings 5.55 (committed sweep) / 8.26 (loaded rerun);
    # band = the committed-sweep minimum (the first fresh-session
    # min-of-2 protocol run read 8.99 on a busy host — stale-HIGH
    # bands weaken the tripwire, so the 5.6 figure is the pin).
    # sf0.1 solo floor 2.65, sf1 4.85: e(sf1->sf5) ~0.07 at the
    # 5.55 reading (KMeans fit + job overhead amortize; the
    # appended-scan search stays partition-pruned). Its sibling
    # streaming_dedup_neardup's 3-point curve (17.5 / 33.6 / 85.6 s,
    # e 0.41 over 50x) is pinned in SCALING.md but deliberately NOT
    # probed per-round — two ~90 s drains would eat the probe budget
    # for a curve that is already committed (the sessionize
    # precedent).
    "sim_ivf_incremental": 5.6,
}

#: sf5 entries that need the TPC-H slice of the fixture (everything
#: else is document/embedding-side).
SF5_TPCH_QUERIES = {"graph_pagerank", "tpch_q1", "tpch_q18",
                    "er_jaro_winkler", "merge_upsert"}

#: sf5 probes that need the events slice (lazily built, own sentinel)
SF5_EVENTS_QUERIES = {"streaming_stream_join_outer",
                      "events_sessionize", "events_asof_join",
                      "events_funnel"}


def _ensure_sf5_events(src_dir: str) -> bool:
    """Materialize the sf5 ``events`` slice (50 copies shifting BOTH
    event_id and user_id — population densification, the real
    product-analytics workload axis, same rationale as the sf1
    events recipe) behind its OWN sentinel so doc-only and TPC-H-only
    sf5 runs never pay for it and an interrupted build can't poison
    the other slices. ~40 MB; timestamps are untouched, so the time
    range stays fixed while per-window populations grow 50x."""
    sentinel = os.path.join(SF5_DIR, "_SUCCESS_EVENTS")
    dest = os.path.join(SF5_DIR, "events.parquet")
    if os.path.isfile(sentinel) and os.path.isdir(dest):
        return True
    import shutil

    import duckdb

    shutil.rmtree(dest, ignore_errors=True)  # partial => rebuild
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(src_dir, 'events.parquet')}'")
    eid = con.execute("SELECT max(event_id) + 1 FROM events").fetchone()[0]
    uid = con.execute("SELECT max(user_id) + 1 FROM events").fetchone()[0]
    sql = (f"SELECT s.* REPLACE (s.event_id + t.i * {eid} AS event_id, "
           f"s.user_id + t.i * {uid} AS user_id) FROM events s "
           f"CROSS JOIN range({{lo}}, {{hi}}) t(i)")
    for j in range(50):
        con.execute(
            f"COPY ({sql.format(lo=j, hi=j + 1)}) TO "
            f"'{os.path.join(dest, f'part-{j:02d}.parquet')}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 250000)")
    with open(sentinel, "w") as fh:
        fh.write("ok\n")
    return True


def run_sf5_probe(spark, budget_sec: float = 1300.0):
    # budget raised 900 -> 1300 in r13: the block grew from 9 to 22
    # entries (~216 s of bands x min-of-2 + ~22 fresh sessions);
    # 900 s would silently skip the tail families on a noisy run —
    # exactly the entries added to complete the per-family coverage.
    """Fresh session + warm + unconditional min-of-2 per sf5 query
    (the same solo protocol as the heavy sf1 probes: first touches of
    the 55 MB fixture are page-cache-cold, and the r12 dry runs
    showed single-shot readings varying 1.4-1.9x), then the standard
    drift tripwire — one more fresh-session run if the min is still
    >2x the committed band, flagged if it stays there. Returns
    ``(timings, spark)`` — caller adopts the returned session.

    Bounded like the sf1 probe: no NEW probe query starts after
    ``budget_sec`` (override: ``SPARK_GRAFT_SF5_BUDGET``) — the r13
    slice adds five multi-ten-second entries, and an unbounded block
    could eat the whole sweep on a contended host. TPC-H-side entries
    (``SF5_TPCH_QUERIES``) lazily generate their fixture slice here
    so a budget-exhausted run never pays the ~700 MB build."""
    import __spark_entry__ as entry_mod

    budget_sec = float(os.environ.get("SPARK_GRAFT_SF5_BUDGET",
                                      budget_sec))
    start = time.time()
    out = {}
    qs = entry_mod.queries()

    def _one(spark, name):
        t0 = time.time()
        df = qs[name](spark, SF5_DIR)
        n = len(df.toPandas())
        dt = round(time.time() - t0, 4)
        release(df)
        spark.catalog.clearCache()
        _cleanup_entry(spark)
        return dt, n

    for name, expected in SF5_QUERIES.items():
        if time.time() - start > budget_sec:
            print(f"# sf5 probe budget ({budget_sec:.0f}s) exhausted "
                  f"before {name}; skipping the rest", file=sys.stderr)
            break
        if name in SF5_TPCH_QUERIES:
            try:
                _ensure_sf5_tpch(SF_DIR)
            except Exception as exc:
                out[name] = {"err": f"sf5 tpch fixture: {exc}"[:200]}
                continue
        if name in SF5_EVENTS_QUERIES:
            try:
                _ensure_sf5_events(SF_DIR)
            except Exception as exc:
                out[name] = {"err": f"sf5 events fixture: {exc}"[:200]}
                continue
        spark = _fresh_session(spark)
        _mini_warm(spark)
        best, n = None, 0
        for attempt in range(2):
            try:
                dt, n = _one(spark, name)
                best = dt if best is None else min(best, dt)
            except Exception as exc:
                if best is None:
                    out[name] = {"err":
                                 f"{type(exc).__name__}: {exc}"[:200]}
                    print(f"# sf5 {name}: FAILED {out[name]['err']}",
                          file=sys.stderr)
                break
        if (best is not None and best > 2.0 * expected
                and time.time() - start <= budget_sec):
            print(f"# sf5 {name}: {best:.2f}s > 2x band "
                  f"{expected:.2f}s — drift retry (fresh session)",
                  file=sys.stderr)
            spark = _fresh_session(spark)
            _mini_warm(spark)
            try:
                dt, n = _one(spark, name)
                best = min(best, dt)
            except Exception as exc:
                print(f"# sf5 {name}: drift retry failed "
                      f"({type(exc).__name__}); keeping {best:.2f}s",
                      file=sys.stderr)
        if best is not None:
            if best > 2.0 * expected:
                out[name] = {"sec": best, "expected": expected,
                             "drift_x": round(best / expected, 2),
                             "load": _host_load()}
                print(f"# sf5 {name}: {best:.2f}s — DRIFT "
                      f"{best / expected:.1f}x band (flagged)",
                      file=sys.stderr)
            else:
                out[name] = best
                print(f"# sf5 {name}: {best:.2f}s min2 ({n} rows)",
                      file=sys.stderr)
    return out, spark


def _ensure_sf1(src_dir: str) -> bool:
    """Materialize ~sf1 tables into ``bench_sf1/`` from the sf0.1
    parquet: 10 key-shifted copies (referential integrity preserved:
    lineitem and orders shift orderkeys in lockstep). Document text is
    token-suffixed per copy so shingle document-frequency stays flat —
    dedup work then scales linearly with the corpus, as it would on
    real data, instead of quadratically on artificial 10x exact dupes.
    Cached across runs; DuckDB does the generation in seconds.
    Cache validity is keyed on a ``_SUCCESS`` sentinel written AFTER
    the last COPY (ADVICE r12, same latent pattern as ``_ensure_sf5``:
    directory existence would accept an interrupted generation's
    partial fixture as cached forever)."""
    tables = ["lineitem", "orders", "customer", "documents", "embeddings",
              "events"]
    sentinel = os.path.join(SF1_DIR, "_SUCCESS")
    paths = [os.path.join(SF1_DIR, f"{t}.parquet") for t in tables]
    if os.path.isfile(sentinel) and all(os.path.isdir(p) for p in paths):
        return True
    import shutil

    import duckdb

    for p in paths:  # drop stale single-file (pre-r7) / partial layouts
        if os.path.isfile(p):
            os.unlink(p)
        elif os.path.isdir(p):
            shutil.rmtree(p)
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(src_dir, t + '.parquet')}'")
    ok = con.execute("SELECT max(l_orderkey) + 1 FROM lineitem").fetchone()[0]
    eid = con.execute("SELECT max(event_id) + 1 FROM events").fetchone()[0]
    uid = con.execute("SELECT max(user_id) + 1 FROM events").fetchone()[0]
    did = con.execute("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
    vid = con.execute("SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0]
    copies = {
        "lineitem": f"SELECT s.* REPLACE (s.l_orderkey + t.i * {ok} "
                    f"AS l_orderkey) FROM lineitem s CROSS JOIN "
                    f"range({{lo}}, {{hi}}) t(i)",
        "orders": f"SELECT s.* REPLACE (s.o_orderkey + t.i * {ok} "
                  f"AS o_orderkey) FROM orders s CROSS JOIN "
                  f"range({{lo}}, {{hi}}) t(i)",
        "customer": "SELECT * FROM customer",
        "documents": f"SELECT s.* REPLACE (s.doc_id + t.i * {did} AS "
                     f"doc_id, regexp_replace(s.text, '(\\S+)', "
                     f"'\\1' || t.i, 'g') AS text) FROM documents s "
                     f"CROSS JOIN range({{lo}}, {{hi}}) t(i)",
        # each copy's embeddings get a per-copy CYCLIC DIMENSION
        # SHIFT — an isometry, so within-copy geometry (norms, every
        # pairwise cosine, cluster structure) is EXACTLY the
        # original's, while cross-copy cosine of the same vector
        # drops to noise (measured mean |cos| ~0.10 at shift 7).
        # Plain id-shifted copies made every vector an exact
        # 10-way duplicate: dedup_semantic at sf1 emitted 1.2M
        # artifact pairs (45 self-pairs per vector x threshold
        # neighborhoods) — a fixture artifact, not workload scaling,
        # same reasoning as the token-suffixed document text above.
        # events copies shift BOTH ids: distinct users grow 10x, so
        # per-user windows/cohorts scale by population (the real
        # workload axis), not by artificially deeper per-user series
        "events": f"SELECT s.* REPLACE (s.event_id + t.i * {eid} AS "
                  f"event_id, s.user_id + t.i * {uid} AS user_id) "
                  f"FROM events s CROSS JOIN range({{lo}}, {{hi}}) t(i)",
        "embeddings": f"SELECT s.* REPLACE (s.vec_id + t.i * {vid} AS "
                      f"vec_id, list_concat("
                      f"s.embedding[(t.i * 7) % 64 + 1 :], "
                      f"s.embedding[1 : (t.i * 7) % 64]) AS embedding) "
                      f"FROM embeddings s CROSS JOIN "
                      f"range({{lo}}, {{hi}}) t(i)",
    }
    for t, sql in copies.items():
        # ``<table>.parquet`` is a DIRECTORY of one file per key-shift
        # copy, not one monolith: a single ~110 MB lineitem file under
        # the session's 128 MB maxPartitionBytes is ONE scan task,
        # which serializes every scan-bound sf1 probe (observed:
        # tpch_q1 18.2 s single-file vs ~3 s multi-file — a fixture
        # artifact, not a plan cost; real 100 TB layouts are many
        # files >> one split each).
        dest = os.path.join(SF1_DIR, t + ".parquet")
        os.makedirs(dest, exist_ok=True)
        shards = [(0, 1)] if "{lo}" not in sql else \
            [(i, i + 1) for i in range(10)]
        for j, (lo, hi) in enumerate(shards):
            part = sql.format(lo=lo, hi=hi) if "{lo}" in sql else sql
            con.execute(
                f"COPY ({part}) TO "
                f"'{os.path.join(dest, f'part-{j:02d}.parquet')}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 250000)")
    with open(sentinel, "w") as fh:
        fh.write("ok\n")
    return True


#: probes whose expected solo time is above this run in their OWN
#: fresh SparkSession with an unconditional warm min-of-2 (VERDICT
#: r9 #4): in the r9 sweep, 36 co-scheduled probes sharing one
#: session made every heavy number contention-noisy (1.3-2.8x drift
#: vs committed solo runs) — accumulated storage blocks, GC debt and
#: temp state from EARLIER probes polluted LATER ones, so a real
#: regression was indistinguishable from sweep position. A fresh
#: session per heavy probe (same warm JVM — stop()/getOrCreate()
#: keeps the py4j gateway and JIT caches) resets executor state; the
#: mini-warmup re-spawns the Python worker pool so the first timed
#: run is not paying pool-spawn either.
HEAVY_PROBE_SEC = 4.0


def _fresh_session(spark):
    """Stop ``spark`` and build an identically-configured successor
    in the same JVM. Used between heavy sf1 probes (isolation) and
    before the main sweep (so probes can't pollute it)."""
    from charmpandas_spark.session import get_spark

    spark.stop()
    return get_spark(app_name="cps-bench",
                     extra_conf={"spark.ui.enabled": "true"})


def _mini_warm(spark):
    """Per-fresh-session warmup: shuffle path + the Python daemon
    worker pool (pandas_udf -> mapInPandas chain), so pool-spawn
    never lands inside a timed probe. ~1-2 s on a warm JVM."""
    try:
        from pyspark.sql import functions as _F
        from pyspark.sql.functions import pandas_udf as _pudf
        import pandas as _pd

        # NO type annotations here: under this module's
        # `from __future__ import annotations` they stringify to
        # '_pd.Series', which pandas_udf cannot resolve (module
        # globals lack the function-local `_pd`) and the WHOLE warmup
        # silently no-ops — fresh-session probes then paid the 32
        # python-worker pool spawns inside their first timed run
        # (found r12 while chasing the sf1 drift).
        @_pudf("binary")
        def _warm_bin(s):
            return s.map(lambda v: str(v).encode())

        (spark.range(0, 3200, 1, 32)
         .select(_warm_bin(_F.col("id")).alias("b"))
         .mapInPandas(lambda it: it, "b binary").count())
    except Exception as exc:
        print(f"# mini-warm failed: {exc}", file=sys.stderr)


def run_sf1_probe(spark, budget_sec: float = 900.0):
    # budget raised 780 -> 900 in r13: the block grew 38 -> 41
    # entries (persisted-index family), and the old budget was
    # already ~700 s full — the tail additions would have been
    # silently skipped on any slow run.
    """Returns ``(timings, spark)`` — heavy probes replace the
    session, so the caller must adopt the returned one.

    Bounded: stops starting new probe queries once ``budget_sec``
    has elapsed, so a noisy host can't starve the main bench output.

    Protocol (VERDICT r9 #4): probes with expected solo time >=
    ``HEAVY_PROBE_SEC`` each get a FRESH session + mini-warmup + an
    unconditional min-of-2 — the solo conditions their expected
    table was derived under, so sweep numbers are attributable.
    Cheap probes stay batched in one shared session with the r6
    conditional-retry rule (first run > 2x expected -> one re-run,
    min recorded). One clean pass is ~2x150 s of heavy work + ~30 s
    cheap, hence the 780 s default budget. Overridable via
    ``SPARK_GRAFT_SF1_BUDGET``."""
    import __spark_entry__ as entry_mod

    budget_sec = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET",
                                      budget_sec))
    out = {}
    start = time.time()

    def _one_run(spark, name):
        qs = entry_mod.queries()
        fn = SF1_OVERRIDES.get(name) or qs[name]
        t0 = time.time()
        df = fn(spark, SF1_DIR)
        n = len(df.toPandas())
        dt = round(time.time() - t0, 4)
        release(df)
        spark.catalog.clearCache()
        _cleanup_entry(spark)
        return dt, n

    # ---- heavy probes: fresh session each, warm min-of-2 ----
    heavy = [(k, v) for k, v in SF1_QUERIES.items()
             if v >= HEAVY_PROBE_SEC]
    cheap = [(k, v) for k, v in SF1_QUERIES.items()
             if v < HEAVY_PROBE_SEC]
    for name, expected in heavy:
        if time.time() - start > budget_sec:
            print(f"# sf1 budget exhausted before {name}",
                  file=sys.stderr)
            break
        spark = _fresh_session(spark)
        _mini_warm(spark)
        best, n = None, 0
        for attempt in range(2):
            try:
                dt, n = _one_run(spark, name)
                best = dt if best is None else min(best, dt)
            except Exception as exc:
                if best is None:
                    out[name] = {"err":
                                 f"{type(exc).__name__}: {exc}"[:200]}
                    print(f"# sf1 {name}: FAILED {out[name]['err']}",
                          file=sys.stderr)
                break
            if time.time() - start > budget_sec:
                break  # keep the single-run figure; no budget left
        # drift tripwire (VERDICT r11 #1): a min-of-2 still >2x the
        # committed expected gets ONE extra fresh-session run — the
        # r11 artifact committed 2.4-2.5x host-contention readings as
        # if they were scaling numbers. If the min STAYS >2x, the
        # figure is recorded FLAGGED (a dict carrying drift_x), so a
        # contended probe can never again masquerade as a bare
        # scaling number in a committed artifact.
        if (best is not None and best > 2.0 * expected
                and time.time() - start <= budget_sec):
            print(f"# sf1 {name}: {best:.2f}s > 2x expected "
                  f"{expected:.2f}s — drift retry (fresh session)",
                  file=sys.stderr)
            spark = _fresh_session(spark)
            _mini_warm(spark)
            try:
                dt, n = _one_run(spark, name)
                best = min(best, dt)
            except Exception as exc:
                print(f"# sf1 {name}: drift retry failed "
                      f"({type(exc).__name__}); keeping "
                      f"{best:.2f}s", file=sys.stderr)
        if best is not None:
            if best > 2.0 * expected:
                out[name] = {"sec": best, "expected": expected,
                             "drift_x": round(best / expected, 2),
                             "load": _host_load()}
                print(f"# sf1 {name}: {best:.2f}s solo — DRIFT "
                      f"{best / expected:.1f}x expected "
                      f"{expected:.2f}s (flagged, not a scaling "
                      f"number)", file=sys.stderr)
            else:
                out[name] = best
                print(f"# sf1 {name}: {best:.2f}s solo-min2 "
                      f"({n} rows)", file=sys.stderr)

    # ---- cheap probes: one shared session, unconditional min-of-2
    # (the r10 dry run showed the shared-session TAIL still drifting
    # 1.5-3x under a conditional retry — a second run is ~35 s total
    # for the whole cheap block and removes the gating judgment) ----
    spark = _fresh_session(spark)
    _mini_warm(spark)
    for name, expected in cheap:
        if time.time() - start > budget_sec:
            print(f"# sf1 budget exhausted before {name}",
                  file=sys.stderr)
            break
        best, n = None, 0
        for attempt in range(2):
            try:
                dt, n = _one_run(spark, name)
                best = dt if best is None else min(best, dt)
            except Exception as exc:  # fault-isolate (r5 lesson);
                # a failed RETRY must not discard a valid first-run
                # timing (r6 ADVICE)
                if best is None:
                    out[name] = {"err":
                                 f"{type(exc).__name__}: {exc}"[:200]}
                    print(f"# sf1 {name}: FAILED {out[name]['err']}",
                          file=sys.stderr)
                break
            if time.time() - start > budget_sec:
                break  # no second-run budget left
        if best is not None:
            if (best > 2.0 * expected
                    and time.time() - start <= budget_sec):
                # same tripwire as the heavy block, with two honest
                # differences (ADVICE r12): the retry respects the
                # probe budget, and it reruns in the SAME shared
                # session (no _fresh_session/_mini_warm — a full
                # session rebuild per cheap probe would dominate the
                # block), so a flag here can still reflect
                # accumulated-session state; the flag output says so.
                try:
                    dt, n = _one_run(spark, name)
                    best = min(best, dt)
                except Exception:
                    pass
            if best > 2.0 * expected:
                out[name] = {"sec": best, "expected": expected,
                             "drift_x": round(best / expected, 2),
                             "retry": "same-session",
                             "load": _host_load()}
                print(f"# sf1 {name}: {best:.2f}s — DRIFT "
                      f"{best / expected:.1f}x expected "
                      f"{expected:.2f}s (flagged; cheap-block retry "
                      f"is same-session)", file=sys.stderr)
            else:
                out[name] = best
                print(f"# sf1 {name}: {best:.2f}s min2 ({n} rows)",
                      file=sys.stderr)
    return out, spark


#: the streaming replays (one per registry streaming query),
#: excluded from the batch sweep since r4
#: (their wall-clock is micro-batch replay overhead, not engine
#: throughput) — timed in their OWN result block instead (VERDICT
#: r9 #9) so every registry entry has a committed number.
STREAMING_NAMES = [
    "streaming_dedup", "streaming_sessionize",
    "streaming_running_totals", "streaming_stream_join",
    "streaming_stream_join_outer", "streaming_stream_join_full",
    "streaming_static_join", "streaming_cdc_apply",
    "streaming_late_data", "streaming_group_topk",
    # r15: foreachBatch near-dup-at-ingestion over the persisted LSH
    # index. r17 (VERDICT r16 #1a): the recorded figure is the ENGINE
    # leg (index build + 2-batch drain + sink read); the exact
    # truth-join the recall oracle needs rides the _legs sidecar.
    "streaming_dedup_neardup",
]


def run_streaming_block(spark, sf_dir: str) -> dict:
    """End-to-end micro-batch DRAIN time per streaming query: source
    replay -> watermark/state machinery -> sink, fetched. These are
    latency-of-the-harness numbers (each query replays its input as
    micro-batches and blocks on processAllAvailable), reported in a
    separate block so they are never read as batch throughput."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in STREAMING_NAMES:
        t0 = time.time()
        legs: dict = {}
        try:
            if name == "streaming_dedup_neardup":
                # VERDICT r16 #1a: the recall-witness oracle's exact
                # cross_corpus_pairs truth join is ~40% of this
                # query's wall-clock and is NOT engine work — the
                # recorded figure is the ENGINE leg (index write +
                # 2-batch drain + sink read); the oracle leg rides a
                # sidecar entry so the split is committed, the way
                # minhash_inc_legs splits build/probe.
                df = entry_mod.q_streaming_dedup_neardup(
                    spark, sf_dir, _legs=legs)
            else:
                df = qs[name](spark, sf_dir)
            n = len(df.toPandas())
            total = round(time.time() - t0, 4)
            if "engine" in legs:
                out[name] = legs["engine"]
                out[name + "_legs"] = {
                    "engine": legs["engine"],
                    "oracle_truth_join":
                        round(total - legs["engine"], 4),
                    "total": total}
                print(f"# streaming {name}: {legs['engine']:.2f}s "
                      f"engine + "
                      f"{total - legs['engine']:.2f}s oracle truth "
                      f"join ({n} rows)", file=sys.stderr)
            else:
                out[name] = total
                print(f"# streaming {name}: {out[name]:.2f}s drain "
                      f"({n} rows)", file=sys.stderr)
        except Exception as exc:
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"# streaming {name}: FAILED {out[name]['err']}",
                  file=sys.stderr)
        finally:
            spark.catalog.clearCache()
            _cleanup_entry(spark)
    return out


def run_minhash_legs(spark, sf_dir: str) -> dict:
    """VERDICT r9 #6: split ``dedup_minhash_incremental``'s cost into
    its BUILD leg (one-time banded-index write + Bloom sidecar — a
    real pipeline amortizes this across every later batch) and its
    PROBE leg (what each arriving batch actually pays: bucket-pruned
    index read + banded candidate join + exact verify). The registry
    query times both plus a truth-set recall join in one number,
    which hides which leg dominates."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import charmpandas_spark as cps
    from charmpandas_spark.functions.dedup import (
        minhash_dedup_incremental, minhash_index_write)

    docs = cps.read_table(spark, sf_dir, "documents").sdf
    hist = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="cps_bench_mh_")
    out = {}
    try:
        # r18: legs mirror the REGISTRY query's configuration
        # (16 hashes re-banded 8x2 — the gate's hardened geometry)
        # instead of the library defaults (4 bands) they measured
        # through r17; a legs split that times a different config
        # than the query it attributes is not attribution. DECLARED
        # basis change — old-basis continuity: r17 committed build
        # 2.9351 / probe 2.1172, r18 pre-change build 2.5064 /
        # probe 2.9918.
        t0 = time.time()
        minhash_index_write(hist, "text", "doc_id", path,
                            num_hashes=16, bands=8, num_buckets=16)
        out["build"] = round(time.time() - t0, 4)
        # warm min-of-2 on the probe leg: it is the steady-state cost
        for _ in range(2):
            t0 = time.time()
            n = (minhash_dedup_incremental(spark, batch, path, "text",
                                           "doc_id", threshold=0.7,
                                           num_hashes=16, bands=8,
                                           num_buckets=16)
                 .count())
            dt = round(time.time() - t0, 4)
            out["probe"] = min(out.get("probe", dt), dt)
        out["probe_pairs"] = n
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.catalog.clearCache()
    print(f"# minhash_inc_legs: {out}", file=sys.stderr)
    return out


def _stage_max_task_ms(spark, since_epoch_ms: float):
    """Straggler witness: max single-task duration (ms) across stages
    completed since ``since_epoch_ms``, via the local UI REST API
    (taskSummary quantiles=1.0). Returns None if the UI is disabled or
    any call fails — the demo's timings stand on their own."""
    try:
        import datetime as dt
        import json as js
        from urllib.request import urlopen

        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app = spark.sparkContext.applicationId
        stages = js.load(urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10))
        mx = 0.0
        for st in stages:
            ct = st.get("completionTime")
            if not ct:
                continue
            t = dt.datetime.strptime(
                ct.replace("GMT", "+0000"),
                "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000
            if t < since_epoch_ms:
                continue
            q = js.load(urlopen(
                f"{base}/api/v1/applications/{app}/stages/"
                f"{st['stageId']}/{st['attemptId']}/taskSummary"
                f"?quantiles=1.0", timeout=10))
            mx = max(mx, float(q["duration"][0]))
        return round(mx)
    except Exception:
        return None


def run_baseline_anchor(spark) -> float:
    """The reference's ONLY published number — Demo.ipynb's 2x2M-row
    string-key join + groupby-count + fetch, 10.72 s on 32 PEs
    (BASELINE.md) — as a committed per-round artifact instead of an
    ad-hoc judge run (VERDICT r10 #7: judges measured 3.9-4.1 s each
    round by hand). Delegates to examples/demo_join_groupby.py's
    ``run_workload`` (one source of truth: same generator, same
    warmup shape, same timed region), with the demo's join-strategy
    confs set around the call — equal-size sides, so shuffle-hash
    beats both a 2M-row broadcast build and SMJ (see the demo's
    docstring for the measured comparison and the cluster-scale
    argument)."""
    import importlib.util

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "demo_join_groupby",
        os.path.join(here, "examples", "demo_join_groupby.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.join.preferSortMergeJoin")
    prev = {k: spark.conf.get(k) for k in keys}
    spark.conf.set(keys[0], "-1")
    spark.conf.set(keys[1], "false")
    try:
        elapsed = demo.run_workload(spark)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    print(f"# baseline_anchor: {elapsed:.2f}s vs reference 10.72s "
          f"({elapsed / 10.72:.2f}x)", file=sys.stderr)
    return round(elapsed, 3)


def run_skew_demo(spark, sf_dir: str) -> dict:
    """Measured skew-mitigation delta on a 10M-row fact keyed by
    events.user_id with one amplified hot key (95% of rows — one
    reducer owns 9.5M of 10M rows, so the straggler DOMINATES the
    stage): skew-blind shuffle join vs AQE's skew-join split vs
    explicit salted_join, each with the per-run max single-task time
    as the straggler witness. (The raw sf0.1 events table is uniform
    on user_id, so the hot key is synthesized over the real key
    domain.) Broadcast is disabled so the join genuinely shuffles, as
    it would when both sides are big.

    What the demo demonstrates (r10, VERDICT r9 #5): the HONEST
    crossover, not a salted win. Expected ordering — salted beats
    skew-BLIND on both wall-clock and max-task; AQE's runtime split
    beats salted on wall-clock while matching it on max-task,
    because salting pays the ×salt build replication and an extra
    exchange for the same straggler relief. Verified to hold even
    with a same-key aggregation stacked on the join (AQE's split is
    not blocked: partial agg collapses the hot key pre-shuffle).
    The full crossover analysis — when salting IS the right tool —
    lives in ``operators/skew.py``'s module docstring."""
    from pyspark.sql import functions as F

    import charmpandas_spark as cps
    from charmpandas_spark.operators.skew import salted_join

    ev = cps.read_table(spark, sf_dir, "events").sdf
    fact = (ev.select("user_id", "value", "event_type")
              .crossJoin(spark.range(100).withColumnRenamed("id", "rep"))
              .withColumn("user_id",
                          F.when(F.rand(7) < 0.95, F.lit(342))
                           .otherwise(F.col("user_id")))
              .drop("rep"))
    dim = ev.groupBy("user_id").agg(F.avg("value").alias("u_avg"))
    fact.persist(), dim.persist()
    fact.count(), dim.count()

    def run(j, label):
        t0 = time.time()
        (j.groupBy("event_type")
          .agg(F.sum(F.col("value") * F.col("u_avg")).alias("s"))
          .collect())
        out[label] = round(time.time() - t0, 4)
        mx = _stage_max_task_ms(spark, t0 * 1000)
        if mx is not None:
            out[label + "_max_task_ms"] = mx

    out = {}
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run(fact.join(dim, "user_id"), "plain_skew_blind")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        run(fact.join(dim, "user_id"), "plain_aqe_skewjoin")
        # salting leaves no hot key for AQE to split; disabled anyway
        # so the run measures the salt alone
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run(salted_join(fact, dim, "user_id", salt=32).sdf,
            "salted_join")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        fact.unpersist(), dim.unpersist()
    print(f"# skew_demo: {out}", file=sys.stderr)
    return out


def main():
    from charmpandas_spark.session import get_spark

    # UI on: the skew demo reads max-task-time (straggler witness)
    # from the REST API; measured overhead is nil at this scale
    spark = get_spark(app_name="cps-bench",
                      extra_conf={"spark.ui.enabled": "true"})
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    # warm the JVM/codegen/shuffle paths so we measure steady-state, as
    # the reference's notebook timing did (cluster already up, prior
    # cells executed). Uses the small dimension tables only — no data
    # from the measured queries is cached.
    try:
        nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
        region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
        (nation.join(region, nation.n_regionkey == region.r_regionkey)
         .groupBy("r_name").count().toPandas())
        # pre-warm the Python daemon worker pool too (one worker per
        # core spawns lazily, ~6-8 s across 32 partitions — a fixed
        # session cost that would otherwise land entirely on the first
        # pandas_udf/mapInPandas query measured).
        spark.range(0, 3200, 1, 32).mapInPandas(
            lambda it: it, "id long").count()
        # ...and the CHAINED python-operator shape (pandas_udf feeding
        # mapInPandas in one stage needs a second worker per core —
        # another ~32 lazy spawns that would otherwise all land on
        # multimodal_decode, the only chained-python query; r5 local
        # profile showed it as a ~6 s first-hit cost).
        from pyspark.sql import functions as _F
        from pyspark.sql.functions import pandas_udf as _pudf
        import pandas as _pd

        # NO type annotations here: under this module's
        # `from __future__ import annotations` they stringify to
        # '_pd.Series', which pandas_udf cannot resolve (module
        # globals lack the function-local `_pd`) and the WHOLE warmup
        # silently no-ops — fresh-session probes then paid the 32
        # python-worker pool spawns inside their first timed run
        # (found r12 while chasing the sf1 drift).
        @_pudf("binary")
        def _warm_bin(s):
            return s.map(lambda v: str(v).encode())

        (spark.range(0, 3200, 1, 32)
         .select(_warm_bin(_F.col("id")).alias("b"))
         .mapInPandas(lambda it: it, "b binary").count())
    except Exception as exc:  # warmup is best-effort, never fatal
        print(f"# warmup failed: {exc}", file=sys.stderr)

    # sf1 probe FIRST (r9): its expected table is derived from solo
    # runs on a fresh session, so measuring it after the 170-query
    # sweep conflated engine scaling with accumulated-JVM noise
    # (pagerank read 23 s in-sweep, 5-8 s solo). Running it here —
    # warm JVM, empty storage — matches the expecteds' conditions;
    # the main sweep below then runs extra-warm, which is the
    # steady-state the headline has always modeled.
    sf1_result = None
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0":
        try:
            _ensure_sf1(SF_DIR)
            # heavy probes run solo in fresh sessions (VERDICT r9
            # #4); adopt the final session and re-run the full
            # warmup so the main sweep doesn't pay pool-spawn.
            sf1_result, spark = run_sf1_probe(spark)
            try:
                nation = spark.read.parquet(
                    os.path.join(SF_DIR, "nation.parquet"))
                region = spark.read.parquet(
                    os.path.join(SF_DIR, "region.parquet"))
                (nation.join(region,
                             nation.n_regionkey == region.r_regionkey)
                 .groupBy("r_name").count().toPandas())
                spark.range(0, 3200, 1, 32).mapInPandas(
                    lambda it: it, "id long").count()
            except Exception as exc:
                print(f"# post-probe warmup failed: {exc}",
                      file=sys.stderr)
        except Exception as exc:  # probe must never sink the bench
            print(f"# sf1 probe failed: {exc}", file=sys.stderr)
            # ADVICE r10: run_sf1_probe stops/replaces the session
            # between heavy probes — if it raised mid-probe, `spark`
            # may be a STOPPED session and the whole main sweep below
            # would silently fail. Re-acquire one.
            try:
                spark.range(1).count()
            except Exception:
                print("# sf1 probe left a dead session; rebuilding",
                      file=sys.stderr)
                spark = _fresh_session(spark)
                _mini_warm(spark)

    # sf5 dedup-family curve (VERDICT r11 #7): a third scaling point
    # so sf0.1 -> sf1 -> sf5 gives an observed exponent, not a
    # two-point line. Fresh sessions inside, like the sf1 heavies.
    sf5_result = None
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_BENCH_SF5", "1") != "0":
        try:
            _ensure_sf5(SF_DIR)
            sf5_result, spark = run_sf5_probe(spark)
        except Exception as exc:
            print(f"# sf5 probe failed: {exc}", file=sys.stderr)
            try:
                spark.range(1).count()
            except Exception:
                spark = _fresh_session(spark)
        # re-warm for the main sweep regardless of probe outcome
        _mini_warm(spark)

    qs = bench_queries(spark, SF_DIR)
    timings, errors = {}, {}
    # the host's vCPUs are timeshared: observed up to 15x single-run
    # noise spikes (sim_topk 8.4s in one sweep, 0.67s solo). The
    # headline always gets best-of-2; any other query whose first run
    # exceeds the retry threshold gets ONE re-run and the min — noise
    # insurance bounded to the slow tail, ~tens of seconds worst case.
    # r8 (VERDICT r7 #3): the trigger is RELATIVE — 2x the query's own
    # best committed per-round timing (same rule as the sf1 block's
    # expected table) — so a 1 s query ballooning to 4 s retries
    # instead of hiding under an absolute 5 s bar, and a genuinely
    # 6 s query doesn't re-run every sweep. The absolute bar survives
    # only as the fallback for queries with no committed history.
    NOISE_RETRY_FALLBACK_SEC = 5.0
    prior = _load_prior_timings()
    # VERDICT r13 #2: per-reading contention markers. `load_mark` is
    # the sample taken right after the reading that will be recorded
    # (retries overwrite it); `sweep_load1` keeps one load1 float per
    # COMMITTED number too, emitted as result["load1"], so next
    # round's drift adjudication can see the whole sweep's load
    # profile, not just the flagged tail.
    sweep_load1: dict[str, float] = {}
    for name, fn in qs.items():
        runs = 2 if name == "flagship_join_groupby_count" else 1
        retry_above = (max(2.0 * prior[name], 1.0) if name in prior
                       else NOISE_RETRY_FALLBACK_SEC)
        best, n = None, 0
        load_mark: dict = {}
        try:
            for attempt in range(2):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = len(df.toPandas())  # fetch included, like get()
                dt = round(time.time() - t0, 4)
                if best is None or dt <= best:
                    load_mark = _host_load()
                best = dt if best is None else min(best, dt)
                # hygiene: the dedup/tfidf pipelines pin intermediates
                # behind their exchanges; freeing them between timed
                # queries keeps 50 queries' worth of blocks from
                # accumulating/evicting and polluting later timings.
                release(df)
                spark.catalog.clearCache()
                _cleanup_entry(spark)
                if attempt + 1 >= runs and best <= retry_above:
                    break
                if attempt == 0 and best > retry_above:
                    print(f"# {name}: {best:.2f}s > retry bar "
                          f"{retry_above:.2f}s — retrying once",
                          file=sys.stderr)
        except Exception as exc:
            # Per-query fault isolation (r5: one AnalysisException
            # zeroed the whole round's bench artifact). Record the
            # error, keep going, ALWAYS reach the final JSON line.
            # A failed noise-insurance RETRY must not discard a valid
            # first-run timing (r6 ADVICE): keep `best` if it exists.
            spark.catalog.clearCache()
            _cleanup_entry(spark)
            if best is None:
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"# {name}: FAILED {errors[name]}",
                      file=sys.stderr)
                continue
            print(f"# {name}: retry failed "
                  f"({type(exc).__name__}: {exc}"[:200] +
                  f"); keeping first-run {best:.2f}s", file=sys.stderr)
        # VERDICT r12 #1b: the main sweep was the last block allowed
        # to commit a retry-still-high reading as a bare number
        # (r12's join_inner landed 2.10 s, 2.47x its committed best).
        # Same protocol as the sf1/sf5 blocks now: a post-retry best
        # still over the relative bar is recorded as a FLAGGED dict —
        # visibly contended, never a scaling/throughput claim — and
        # _load_prior_timings already refuses dicts, so a flagged
        # sweep can't loosen the next round's bar either. Queries
        # with no committed history keep the bare number (there is no
        # band to drift from).
        if name in prior and best > retry_above:
            timings[name] = {"sec": best,
                             "expected": round(prior[name], 4),
                             "drift_x": round(best / prior[name], 2),
                             "load": load_mark}
            print(f"# {name}: {best:.2f}s — DRIFT "
                  f"{best / prior[name]:.1f}x committed best "
                  f"{prior[name]:.2f}s (flagged; load1="
                  f"{load_mark.get('load1', '?')})", file=sys.stderr)
        else:
            timings[name] = best
            print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr)
        if load_mark.get("load1") is not None:
            sweep_load1[name] = load_mark["load1"]

    def _sec(v):  # flagged dicts carry their reading under "sec"
        return v["sec"] if isinstance(v, dict) else v

    headline = _sec(timings.get("flagship_join_groupby_count", 0.0))
    result = {
        "metric": "join_groupby_fetch_sec",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # one load1 sample per committed reading (VERDICT r13 #2) —
        # full markers ride the flagged dicts under "load"
        "load1": sweep_load1,
        # VERDICT r14 #3: sweep-level contention self-identification
        "sweep_health": _sweep_health(timings, prior, sweep_load1),
    }
    if errors:
        result["errors"] = errors
    # extras only on the canonical sf0.1 run (the driver's round bench);
    # disable with SPARK_GRAFT_BENCH_SF1=0 / SPARK_GRAFT_BENCH_SKEW=0.
    if sf == 0.1:
        if sf1_result is not None:
            result["sf1"] = sf1_result  # measured before the sweep
        if sf5_result is not None:
            result["sf5"] = sf5_result  # dedup-family curve point
        if os.environ.get("SPARK_GRAFT_BENCH_SKEW", "1") != "0":
            try:
                result["skew_demo"] = run_skew_demo(spark, SF_DIR)
            except Exception as exc:
                print(f"# skew demo failed: {exc}", file=sys.stderr)
        try:  # VERDICT r9 #6: build/probe attribution
            result["minhash_inc_legs"] = run_minhash_legs(spark,
                                                          SF_DIR)
        except Exception as exc:
            print(f"# minhash legs failed: {exc}", file=sys.stderr)
        if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
            try:  # VERDICT r9 #9: streaming drain block
                result["streaming"] = run_streaming_block(spark,
                                                          SF_DIR)
            except Exception as exc:
                print(f"# streaming block failed: {exc}",
                      file=sys.stderr)
        if os.environ.get("SPARK_GRAFT_BENCH_ANCHOR", "1") != "0":
            try:  # VERDICT r10 #7: committed baseline-anchor artifact
                result["baseline_anchor_sec"] = run_baseline_anchor(
                    spark)
            except Exception as exc:
                print(f"# baseline anchor failed: {exc}",
                      file=sys.stderr)
    # VERDICT r17 #4: anchor-normalized sweep-total protocol. Host
    # drift kept invalidating the raw-total target (r17: 292.3 s raw
    # vs the <=265 s bar on a host measured 1.15x slower on untouched
    # queries), so the committed artifact now carries BOTH figures:
    # the raw sweep total and the total divided by the baseline
    # anchor's drift against its committed reference band. The anchor
    # (examples/demo_join_groupby.py via run_baseline_anchor) has been
    # code-unchanged since r10, so its ratio vs ANCHOR_REF_SEC is a
    # pure host-speed witness; ANCHOR_REF_SEC = 1.63 is the median of
    # the committed r13-r16 anchors (1.595 / 1.712 / 1.601 / 1.658).
    # The target restated in normalized form: <=265 s at ratio 1.0.
    sweep_total = round(sum(
        _sec(v) for v in timings.values()
        if isinstance(_sec(v), (int, float))), 2)
    result["sweep_total_sec"] = sweep_total
    print(f"# sweep total (raw, {len(timings)} entries): "
          f"{sweep_total}s", file=sys.stderr)
    if isinstance(result.get("baseline_anchor_sec"), (int, float)):
        anchor_ratio = round(
            result["baseline_anchor_sec"] / ANCHOR_REF_SEC, 3)
        result["anchor_ratio_vs_ref"] = anchor_ratio
        if anchor_ratio > 0:
            result["sweep_total_anchor_normalized_sec"] = round(
                sweep_total / anchor_ratio, 2)
            print(f"# sweep total anchor-normalized: "
                  f"{result['sweep_total_anchor_normalized_sec']}s "
                  f"(anchor {result['baseline_anchor_sec']}s / ref "
                  f"{ANCHOR_REF_SEC}s = {anchor_ratio}x host)",
                  file=sys.stderr)
    # The driver captures the TAIL of the MERGED stdout+stderr
    # (~2.2 kB; r4 lost the line to stdout truncation, r12 lost it to
    # the staleness block printing AFTER it on stderr — the merged
    # tail no longer ended with the JSON). So: EVERYTHING informative
    # (full result, staleness suggestion, plan-audit drift) prints
    # first, the session is stopped (no trailing JVM log lines), both
    # streams are flushed, and the compact JSON line is the absolute
    # LAST thing this process emits.
    #
    # The sweep session stops HERE (ADVICE r16): the mover-floor
    # adjudication below spawns fresh solo_witness processes, and
    # measuring "fresh-session floors" with the multi-GB sweep JVM
    # still resident skewed the floors high (biasing against
    # contention=true). Nothing after this point needs the session.
    spark.stop()
    if (sf == 0.1
            and os.environ.get("SPARK_GRAFT_BENCH_SOLO", "1") != "0"):
        movers = result["sweep_health"].get("mover_names", [])
        if movers:
            try:  # VERDICT r15 #8 / r16 #2: ALL movers adjudicated
                floors = _mover_floors(movers, prior)
                if floors:
                    result["sweep_health"]["mover_floors"] = floors
                    print(f"# mover floors (solo, fresh process, "
                          f"sweep JVM stopped): {floors}",
                          file=sys.stderr)
            except Exception as exc:
                print(f"# mover floor adjudication failed: {exc}",
                      file=sys.stderr)
    try:  # VERDICT r11 #8 / r12 #1: next-round window rotation — now
        # emitted BEFORE the JSON line and persisted into
        # BENCH_FULL.json, so losing the stdout tail can never lose
        # the rotation list again.
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from staleness import window_suggestion

        suggestion = window_suggestion(50)
        result["next_window"] = suggestion
        print("# next-window suggestion (tools/staleness.py, "
              "stalest 50):", file=sys.stderr)
        for entry in suggestion:
            print(f"#   {entry}", file=sys.stderr)
    except Exception as exc:
        print(f"# staleness report failed: {exc}", file=sys.stderr)
    try:  # VERDICT r12 #7: mechanical plan drift vs last committed
        # audit — one summary line, well before the JSON line.
        from plan_audit import drift_summary

        drift = drift_summary()
        if drift:
            result["plan_drift"] = drift
        print(f"# plan-audit drift vs committed baseline: "
              f"{drift if drift else 'none'}", file=sys.stderr)
    except Exception as exc:
        print(f"# plan-audit drift check failed: {exc}", file=sys.stderr)
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    try:
        with open(full_path, "w") as fh:
            json.dump(result, fh, indent=2)
    except OSError as exc:
        print(f"# BENCH_FULL.json write failed: {exc}", file=sys.stderr)
    print("# full result: " + json.dumps(result), file=sys.stderr)

    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": sf,
        # headline subset only — the full 60+ query map lives in
        # BENCH_FULL.json; keep this line comfortably under 1.5 kB.
        "queries": {k: timings[k] for k in (
            "flagship_join_groupby_count", "scan_project", "groupby_sum",
            "join_inner", "sort_topk", "tpch_q1", "tpch_q10", "tpch_q15",
            "tpch_q18", "dedup_minhash", "dedup_simhash_pairs",
            "dedup_embedding_cosine_ann", "dedup_clusters", "sim_topk",
            "text_tfidf", "window_range_frame", "multimodal_decode",
        ) if k in timings},
        "full": "BENCH_FULL.json",
    }
    if errors:  # visible in the compact line, details in BENCH_FULL
        compact["errors"] = sorted(errors)[:8]
    if "baseline_anchor_sec" in result:
        compact["baseline_anchor_sec"] = result["baseline_anchor_sec"]
    if "sf1" in result:
        compact["sf1"] = result["sf1"]
    if "skew_demo" in result:
        sd = result["skew_demo"]
        compact["skew_demo"] = {k: sd[k] for k in (
            "plain_skew_blind", "plain_aqe_skewjoin", "salted_join")
            if k in sd}
    line = json.dumps(compact)
    if len(line) > 1800:  # belt-and-braces: never outgrow the capture
        compact.pop("sf1", None)
        compact.pop("skew_demo", None)
        line = json.dumps(compact)
    # (Spark already stopped above, before the mover-floor block —
    # nothing is allowed to log after the JSON line.)
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
