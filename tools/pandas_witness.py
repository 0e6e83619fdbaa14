"""Third-engine witness: re-check oracle queries against an
INDEPENDENT pandas/numpy replay (VERDICT r12 #8; extended r13 #4 to
~60, r14 to 236, r15 to ALL registry queries — the four
engine-internal approx-sketch gates joined in BOUNDS-MODE: their
exact anchors are replayed independently and the in-query envelope
boolean is asserted, since the sketch values themselves come from
Spark's own HLL/approx-percentile implementations and are
bounds-gated, not exactly replayable by design).

The driver's correctness gate compares Spark against DuckDB. Both
engines could in principle share a blind spot (same IEEE double
semantics, same SQL-ish floor conventions) — a pandas/numpy replay
written from the query SEMANTICS (not from either engine's SQL) is a
third, structurally different witness. Coverage now spans every
operator family: the integer-doctrine exact-stats core, all 22 TPC-H
composites, all 8 join types, text/quality regex scoring, warehouse
CDC/SCD2/MERGE, the dedup stack end-to-end (exact, n-gram jaccard,
prefix-filter, MinHash LSH with md5 permutations, SimHash pigeonhole,
spans, clusters via union-find, semantic via replayed k-means),
similarity (brute-force, hyperplane LSH with the splitmix64 plane
generator reimplemented, IVF identity, PQ / IVF-PQ codebook training
replayed step-for-step), sampling (md5 buckets, integer ticket
races), product analytics (pandas merge_asof as the as-of engine),
the whole streaming family against batch-derived state semantics,
and the multimodal codecs from plaintext byte geometry.

Lessons the witness itself surfaced (kept as replay doctrine):
percentile lerp forms differ one ulp between numpy and the engines;
BLAS pairwise dot summation can flip a floor at the self-pair 1.0
boundary (use _seq_dot left-to-right chains near floor boundaries);
Spark `div` truncates toward zero while Python // floors.

Comparison mirrors the driver: columns sorted by name, rows sorted by
every column, exact value equality (int64/float64-normalized).
Float-summing queries are safe to compare exactly because BOTH sides
quantize with the repo's ``floor(x*100)/100`` doctrine before
emitting.

Usage:
    python tools/pandas_witness.py [--sf-dir DIR] [--out FILE]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: Java/Spark \s is ASCII-only; Python re \s is unicode-wide on str.
#: Replays use the explicit ASCII class so the engines agree on e.g.
#: NBSP bytes in document text.
_WS = r"[ \t\n\r\f\x0b]"
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f\x0b]")


def _read(sf_dir: str, table: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _floor2(s):
    return np.floor(np.asarray(s, dtype=np.float64) * 100) / 100


def _dsum(s: pd.Series) -> float:
    """Replay of the registry's ``_dsum`` doctrine: DECIMAL(18,6)
    accumulation (exact, order-independent), surfaced as double.
    This is load-bearing: the first witness run summed
    l_extendedprice as float64 (pairwise) and got ...271.6299996 ->
    floor .62, while the decimal-exact sum is ...271.63 — the
    engines only agree BECAUSE both accumulate in decimal, which is
    precisely the doctrine this third engine is here to witness.
    Spark's cast(double as decimal) goes through the double's
    shortest string repr (java BigDecimal.valueOf), hence
    ``Decimal(repr(x))``."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    tot = sum((Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP)
               for v in s if pd.notna(v)), Decimal(0))
    return float(tot)


def _normalize_text(s: pd.Series) -> pd.Series:
    return (s.str.lower()
             .str.replace(_WS + "+", " ", regex=True)
             .str.strip())


def _md5_hash64(val: str, seed: int = 0) -> int:
    """Python twin of dedup.hash64(..., hash_fn='md5')."""
    return int(hashlib.md5(f"{seed}:{val}".encode()).hexdigest()[:15],
               16)


# --------------------------------------------------------------------
# replays: each returns a pandas DataFrame with the SAME column names
# as the registry query
# --------------------------------------------------------------------

def r_groupby_sum(sf_dir):
    li = _read(sf_dir, "lineitem")
    g = (li.groupby(["l_returnflag", "l_linestatus"], as_index=False)
           ["l_quantity"].agg(_dsum))
    g["sum(l_quantity)"] = _floor2(g.pop("l_quantity"))
    return g


def r_scalar_reduction(sf_dir):
    li = _read(sf_dir, "lineitem")
    return pd.DataFrame({
        "sum_qty": [_floor2(_dsum(li["l_quantity"]))[()]],
        "count_qty": [int(li["l_quantity"].notna().sum())],
        "sum_price": [_floor2(_dsum(li["l_extendedprice"]))[()]],
    })


def r_filter_expr(sf_dir):
    li = _read(sf_dir, "lineitem")
    rev = li["l_extendedprice"] * (1 - li["l_discount"])
    keep = li[rev > 45000.0]
    return pd.DataFrame({
        "l_orderkey": keep["l_orderkey"],
        "l_linenumber": keep["l_linenumber"],
        "revenue": _floor2(rev[rev > 45000.0]),
    })


def r_sort_topk(sf_dir):
    o = _read(sf_dir, "orders")
    top = o.sort_values(["o_totalprice", "o_orderkey"],
                        ascending=[False, True]).head(10)
    return pd.DataFrame({
        "o_orderkey": top["o_orderkey"],
        "o_totalprice": _floor2(top["o_totalprice"]),
    })


def r_window_rank(sf_dir):
    o = _read(sf_dir, "orders").sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True])
    o["rn"] = o.groupby("o_orderpriority").cumcount() + 1
    top = o[o["rn"] <= 3]
    return pd.DataFrame({
        "o_orderpriority": top["o_orderpriority"],
        "o_orderkey": top["o_orderkey"],
        "o_totalprice": _floor2(top["o_totalprice"]),
        "rn": top["rn"].astype(np.int32),
    })


def r_dedup_exact(sf_dir):
    d = _read(sf_dir, "documents")
    fp = _normalize_text(d["text"]).map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    g = (pd.DataFrame({"fp": fp, "doc_id": d["doc_id"]})
         .groupby("fp", as_index=False)
         .agg(survivor_id=("doc_id", "min"),
              n_copies=("doc_id", "size")))
    g["n_copies"] = g["n_copies"].astype(np.int64)
    return g


def r_text_token_count(sf_dir):
    d = _read(sf_dir, "documents")
    trimmed = d["text"].str.strip()
    ws = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t)))
    return pd.DataFrame({
        "doc_id": d["doc_id"],
        "ws_tokens": ws.astype(np.int32),
        "re_tokens": d["text"].map(
            lambda t: len(_TOKEN_RE.findall(t))).astype(np.int32),
    })


def r_embedding_quantize(sf_dir):
    e = _read(sf_dir, "embeddings")
    mat = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    span = hi - lo
    with np.errstate(divide="ignore", invalid="ignore"):
        # same associativity as the Spark expression:
        # ((x - lo) * 255.0) / (hi - lo), then floor, then clamp
        raw = np.floor((mat - lo) * 255.0 / span)
    codes = np.clip(raw, 0, 255)
    codes[:, span == 0] = 0
    n, d = codes.shape
    return pd.DataFrame({
        "vec_id": np.repeat(e["vec_id"].to_numpy(), d),
        "d": np.tile(np.arange(d, dtype=np.int32), n),
        "code": codes.astype(np.int32).ravel(),
    })


def r_graph_pagerank(sf_dir):
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_suppkey"]]
    o = _read(sf_dir, "orders")[["o_orderkey", "o_custkey"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    c = (j["o_custkey"].astype(np.int64) * 2)
    s = (j["l_suppkey"].astype(np.int64) * 2 + 1)
    fwd = pd.DataFrame({"src": c, "dst": s})
    e = (pd.concat([fwd, fwd.rename(columns={"src": "dst",
                                             "dst": "src"})])
           .drop_duplicates())
    nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique(),
                     name="node")
    deg = e.groupby("src").size().rename("deg")
    ed = e.merge(deg, left_on="src", right_index=True)
    MICRO, dn, dd = 1_000_000, 17, 20
    base = ((dd - dn) * MICRO) // dd
    ranks = pd.Series(np.int64(MICRO), index=nodes, name="rank_micro")
    for _ in range(3):
        m = ed.merge(ranks.rename("r"), left_on="src",
                     right_index=True)
        contrib = (m["r"].to_numpy(np.int64)
                   // m["deg"].to_numpy(np.int64))
        srt = (pd.DataFrame({"dst": m["dst"], "c": contrib})
               .groupby("dst")["c"].sum())
        srt = srt.reindex(nodes, fill_value=0).astype(np.int64)
        ranks = pd.Series(
            base + (dn * srt.to_numpy(np.int64)) // dd,
            index=nodes, name="rank_micro")
    out = ranks.reset_index()
    out.columns = ["node", "rank_micro"]
    # r18 (VERDICT r17 #1): declared output restores the round-16
    # string node ids at the boundary — int64 keys stay in-loop
    ids = out["node"].to_numpy(np.int64)
    out["node"] = np.where(
        ids % 2 == 0,
        np.char.add("c", (ids // 2).astype(str)),
        np.char.add("s", ((ids - 1) // 2).astype(str)))
    return out


def r_coreset_kcenter(sf_dir, k=8, scale=1000, train_cap=256):
    e = _read(sf_dir, "embeddings")
    ids = e["vec_id"].to_numpy(np.int64)
    q = np.floor(
        np.stack(e["embedding"].to_numpy()).astype(np.float64)
        * scale).astype(np.int64)
    hkey = np.fromiter((_md5_hash64(str(i)) for i in ids),
                       dtype=np.int64, count=len(ids))
    order = np.lexsort((ids, hkey))[:train_cap]
    sel_ids, sel_q = ids[order], q[order]
    seed_pos = int(np.argmin(sel_ids))
    centers = [(int(sel_ids[seed_pos]), sel_q[seed_pos])]
    sel_r2 = [0]
    for _ in range(1, k):
        d2 = np.min(np.stack([
            ((sel_q - c) ** 2).sum(axis=1) for _, c in centers]),
            axis=0)
        # argmax by (distance, then SMALLEST id)
        best = np.lexsort((sel_ids, -d2))[0]
        centers.append((int(sel_ids[best]), sel_q[best]))
        sel_r2.append(int(d2[best]))
    dall = np.stack([((q - c) ** 2).sum(axis=1) for _, c in centers])
    rank = np.argmin(dall, axis=0)  # ties -> earliest rank, like
    # least(struct(d, rank)) lexicographic
    dmin = dall[rank, np.arange(q.shape[0])]
    rows = []
    for r, (cid, _) in enumerate(centers):
        mask = rank == r
        rows.append((r, cid, sel_r2[r], int(mask.sum()),
                     int(dmin[mask].max()) if mask.any() else 0))
    return pd.DataFrame(rows, columns=[
        "rank", "center_id", "sel_r2", "n_assigned", "max_r2"])


def r_flagship_join_groupby_count(sf_dir):
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_quantity"]]
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = (j.groupby("o_orderpriority", as_index=False)["l_quantity"]
          .agg(lambda s: int(s.notna().sum())))
    g["count(l_quantity)"] = g.pop("l_quantity").astype(np.int64)
    return g


def r_join_inner(sf_dir):
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    li = _read(sf_dir, "lineitem")[
        ["l_orderkey", "l_linenumber", "l_quantity"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    return j[["o_orderkey", "o_orderpriority", "l_orderkey",
              "l_linenumber", "l_quantity"]]


def r_concat(sf_dir):
    li = _read(sf_dir, "lineitem")
    hi = li[li["l_quantity"] > 45.0][["l_orderkey", "l_linenumber"]]
    lo = li[li["l_quantity"] < 3.0][["l_orderkey", "l_linenumber"]]
    return pd.concat([hi, lo], ignore_index=True)


def r_tpch_q1(sf_dir):
    from decimal import ROUND_HALF_UP, Decimal

    li = _read(sf_dir, "lineitem")
    li = li[li["l_shipdate"] <= pd.Timestamp("1999-09-02")]
    q6 = Decimal("0.000001")

    def _rowdec(arr):
        """per-row CAST(double AS DECIMAL(18,6)) then exact sum —
        the multiplication itself happens in IEEE double first, as
        in both engines' expressions."""
        return sum((Decimal(repr(float(v))).quantize(q6, ROUND_HALF_UP)
                    for v in arr), Decimal(0))

    rows = []
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        n = len(g)
        dq = _dsum(g["l_quantity"])
        dp = _dsum(g["l_extendedprice"])
        disc = (g["l_extendedprice"].to_numpy(np.float64)
                * (1 - g["l_discount"].to_numpy(np.float64)))
        charge = disc * (1 + g["l_tax"].to_numpy(np.float64))
        rows.append({
            "l_returnflag": rf, "l_linestatus": ls,
            "sum_qty": np.floor(dq * 100) / 100,
            "sum_base_price": np.floor(dp * 100) / 100,
            "sum_disc_price": np.floor(float(_rowdec(disc)) * 100) / 100,
            "sum_charge": np.floor(float(_rowdec(charge)) * 100) / 100,
            "avg_qty": np.floor(dq / n * 100) / 100,
            "avg_disc": np.floor(_dsum(g["l_discount"]) / n * 10000)
            / 10000,
            "count_order": np.int64(n),
        })
    return pd.DataFrame(rows)


def r_histogram_value(sf_dir):
    ev = _read(sf_dir, "events")
    x = ev["value"].dropna().to_numpy(np.float64)
    b_lo, b_hi = float(x.min()), float(x.max())
    if b_hi == b_lo:
        bins = np.zeros(len(x), dtype=np.int64)
    else:
        bins = np.minimum(
            19, np.floor((x - b_lo) * 20.0 / (b_hi - b_lo))
        ).astype(np.int64)
    counts = pd.Series(bins).value_counts()
    b = np.arange(20, dtype=np.int64)
    return pd.DataFrame({
        "bin": b.astype(np.int32),
        "lo": b_lo + (b * (b_hi - b_lo)) / 20.0,
        "hi": b_lo + ((b + 1) * (b_hi - b_lo)) / 20.0,
        "n": counts.reindex(b, fill_value=0).to_numpy(np.int64),
    })


def r_events_sessionize(sf_dir):
    ev = _read(sf_dir, "events")[["user_id", "ts"]].sort_values(
        ["user_id", "ts"], kind="mergesort")
    gap = ev.groupby("user_id")["ts"].diff()
    new_s = gap.isna() | (gap >= pd.Timedelta(hours=4))
    out = (pd.DataFrame({"user_id": ev["user_id"], "new_s": new_s})
           .groupby("user_id", as_index=False)
           .agg(n_sessions=("new_s", "sum"), n_events=("new_s", "size")))
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


def _shingles(text: str, n: int = 3) -> set:
    toks = re.sub(_WS + "+", " ", text.lower()).strip().split(" ")
    return {" ".join(toks[i:i + n])
            for i in range(max(len(toks) - n, 0) + 1)}


def r_dedup_ngram_jaccard(sf_dir):
    d = _read(sf_dir, "documents")
    sh = {int(i): _shingles(t)
          for i, t in zip(d["doc_id"], d["text"])}
    n_docs = len(d)
    cap = max(100, int(np.ceil(0.01 * n_docs)))
    df_count: dict = {}
    for s in sh.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    inv: dict = {}
    for i, s in sh.items():
        for g in s:
            if df_count[g] <= cap:
                inv.setdefault(g, []).append(i)
    common: dict = {}
    for ids in inv.values():
        ids.sort()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                k = (ids[ai], ids[bi])
                common[k] = common.get(k, 0) + 1
    rows = []
    for (a, b), c in common.items():
        jac = np.floor(
            float(c) / (len(sh[a]) + len(sh[b]) - c) * 10000) / 10000
        if jac >= 0.5:
            rows.append((a, b, jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def r_streaming_running_totals(sf_dir):
    """Replay of the STREAMING stateful running-totals query's final
    state: the registered result is the max-n_events row per user,
    which (state surviving every micro-batch boundary) must equal the
    plain per-user totals over all events. value is quantized to
    integer micro-units BEFORE streaming (exact decimal(18,6) cast),
    so the Python-side accumulation the state store carries is exact
    integer arithmetic — as is this replay's."""
    from decimal import ROUND_HALF_UP, Decimal

    ev = _read(sf_dir, "events")[["user_id", "value"]]
    q6 = Decimal("0.000001")
    micros = ev["value"].map(
        lambda v: int(Decimal(repr(float(v))).quantize(
            q6, ROUND_HALF_UP) * 1_000_000))
    g = (pd.DataFrame({"user_id": ev["user_id"], "m": micros})
         .groupby("user_id", as_index=False)
         .agg(n_events=("m", "size"), total_micros=("m", "sum"),
              max_micros=("m", "max")))
    for c in ("n_events", "total_micros", "max_micros"):
        g[c] = g[c].astype(np.int64)
    return g


def r_text_chunks(sf_dir, size=32, stride=28):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.sub(_WS + "+", " ", t.lower()).strip().split(" ")
        n, k = len(toks), 0
        while k * stride <= max(n - 1, 0):
            s = k * stride
            e = min(s + size, n)
            rows.append((int(i), k, " ".join(toks[s:e]), e - s))
            k += 1
    return pd.DataFrame(rows, columns=[
        "doc", "chunk_idx", "chunk_text", "n_tokens"]).astype(
        {"chunk_idx": np.int32, "n_tokens": np.int32})


def r_dsir_weights(sf_dir, n=2, B=512):
    """Replay of q_dsir_weights (integer micro-ratio doctrine): word
    bigrams WITH multiplicity over normalized text, md5-hashed to B
    buckets, Laplace-smoothed integer micro-probabilities, and the
    count-weighted integer-mean weight — all python-int exact, so any
    disagreement is a doctrine break, not rounding. Guards the r13
    ReuseExchange totals rewrite (dsir.py) with a third engine."""
    d = _read(sf_dir, "documents")
    norm = _normalize_text(d["text"])
    is_tgt = d["source"].isin(["src0", "src1"])

    def feats(text: str) -> list[int]:
        words = text.split(" ")
        # Spark _ngrams: i in 0..max(L-n, 0), slice truncates at end
        grams = [" ".join(words[i:i + n])
                 for i in range(max(len(words) - n, 0) + 1)]
        return [_md5_hash64(g) % B for g in grams if g != ""]

    tcnt: dict = {}
    nt = 0
    rdoc: dict = {}
    rcnt: dict = {}
    nr = 0
    for doc, text, tgt in zip(d["doc_id"], norm, is_tgt):
        fs = feats(text)
        if tgt:
            nt += len(fs)
            for f in fs:
                tcnt[f] = tcnt.get(f, 0) + 1
        else:
            nr += len(fs)
            cnts: dict = {}
            for f in fs:
                cnts[f] = cnts.get(f, 0) + 1
            if cnts:
                rdoc[int(doc)] = cnts
                for f, c in cnts.items():
                    rcnt[f] = rcnt.get(f, 0) + c
    ratio = {}
    for f, nrf in rcnt.items():
        pt = (tcnt.get(f, 0) + 1) * 1_000_000 // (nt + B) + 1
        pr = (nrf + 1) * 1_000_000 // (nr + B) + 1
        ratio[f] = pt * 1_000_000 // pr
    rows = []
    for doc, cnts in rdoc.items():
        tot = sum(cnts.values())
        num = sum(c * ratio[f] for f, c in cnts.items())
        rows.append((doc, tot, num // tot))
    return pd.DataFrame(rows,
                        columns=["doc", "n_ngrams", "weight_micro"])


def _quantile_cont(v: np.ndarray, p: float) -> float:
    """The Spark-percentile / DuckDB-quantile_cont interpolation:
    position ``p*(n-1)``, value ``(1-g)*lower + g*higher``. NOT
    np.quantile: numpy's 'linear' lerps ``lower + (higher-lower)*g``
    — one ulp apart (measured: p25 of the sf0.01 N-flag group is
    26965.02 in both engines vs ...019999999997 in numpy), and the
    floor doctrine AMPLIFIES the ulp into a visible cent."""
    v = np.sort(v)
    pos = p * (len(v) - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    g = pos - lo
    return (1 - g) * v[lo] + g * v[hi]


def r_corpus_percentiles(sf_dir):
    """Exact interpolated per-group percentiles — witnesses the
    one-buffer array-percentage form the query switched to in r13
    (same interpolation either way; see :func:`_quantile_cont` for
    the formula-choice trap)."""
    li = _read(sf_dir, "lineitem")
    ps = [0.25, 0.5, 0.75, 0.95, 0.99]
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        v = g["l_extendedprice"].to_numpy(dtype=np.float64)
        rows.append({"l_returnflag": flag, "n": np.int64(len(v)),
                     **{f"p{int(p * 100)}":
                        np.floor(_quantile_cont(v, p) * 100) / 100
                        for p in ps}})
    return pd.DataFrame(rows)


def r_events_quantiles_by_group(sf_dir):
    """group_quantiles over integer event cents (p50/p90/p99),
    floor-1e4 — same interpolation note as r_corpus_percentiles."""
    ev = _read(sf_dir, "events")
    cents = np.floor(
        ev["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
    df = pd.DataFrame({"event_type": ev["event_type"], "c": cents})
    ps = [0.5, 0.9, 0.99]
    rows = []
    for et, g in df.groupby("event_type"):
        v = g["c"].to_numpy(dtype=np.float64)
        rows.append({"event_type": et, "n": np.int64(len(g)),
                     **{f"q_{int(p * 10000)}":
                        np.floor(_quantile_cont(v, p) * 10000) / 10000
                        for p in ps}})
    return pd.DataFrame(rows)


def r_heavy_hitters_cms(sf_dir, k=10, depth=4, width=2048,
                        slack_num=8):
    """Count-min heavy-hitters gate (sketches.cms_heavy_check): build
    the same md5-bucketed CMS over whitespace tokens, probe the exact
    top-k, and re-derive the never-undercount + slacked-expectation
    ``ok`` bound — the sketch family's first third-engine witness."""
    from collections import Counter

    docs = _read(sf_dir, "documents")
    toks = []
    for t in _normalize_text(docs["text"]):
        toks.extend(w for w in t.split(" ") if w != "")
    freq = Counter(toks)
    total = len(toks)
    # CMS cells: depth rows x width buckets, summed counts
    cells = [Counter() for _ in range(depth)]
    for term, f in freq.items():
        for r in range(depth):
            cells[r][_md5_hash64(term, r) % width] += f
    topk = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    slack = slack_num * -(-total // width)  # ceil
    rows = []
    for term, f in topk:
        est = min(cells[r][_md5_hash64(term, r) % width]
                  for r in range(depth))
        rows.append({"term": term, "freq": np.int64(f),
                     "est": np.int64(est),
                     "ok": bool(f <= est <= f + slack)})
    return pd.DataFrame(rows)


def r_scd2_history(sf_dir):
    """SCD Type-2 intervals from the deterministic orders-derived CDC
    fixture (insert at seq 1; %3==0 price update at seq 2; %7==0
    delete at seq 3): per-key lead over (seq, op-rank I<U<D), deletes
    close the predecessor without emitting a row — the warehouse
    family's first third-engine witness."""
    o = _read(sf_dir, "orders")
    price_c = np.floor(
        o["o_totalprice"].to_numpy(dtype=np.float64) * 100
    ).astype(np.int64)
    base = pd.DataFrame({"o_orderkey": o["o_orderkey"],
                         "o_custkey": o["o_custkey"],
                         "price_c": price_c})
    ins = base.assign(seq=np.int64(1), op="I")
    upd = (base[base["o_orderkey"] % 3 == 0]
           .assign(price_c=lambda d: d["price_c"] + 1000,
                   seq=np.int64(2), op="U"))
    dele = (base[base["o_orderkey"] % 7 == 0]
            .assign(seq=np.int64(3), op="D"))
    log = pd.concat([ins, upd, dele], ignore_index=True)
    log["__rank"] = log["op"].map({"I": 0, "U": 1, "D": 2})
    log = log.sort_values(["o_orderkey", "seq", "__rank"])
    log["valid_to"] = log.groupby("o_orderkey")["seq"].shift(-1)
    out = log[log["op"] != "D"].copy()
    out["valid_from"] = out["seq"]
    out["is_current"] = out["valid_to"].isna()
    return out[["o_orderkey", "o_custkey", "price_c",
                "valid_from", "valid_to", "is_current"]]


def r_multimodal_bmp(sf_dir):
    """BMP decode gate, recomputed from the PLAINTEXT (the oracle's
    own shortcut): width is the fixed 16, height ceil(bytes/48),
    byte-class counts over the text with the zero pad landing in
    n_other. The Spark side decodes REAL 24-bit BMPs (header parse +
    bottom-up pixel rows), so a codec bug diverges from this replay
    — the multimodal family's first third-engine witness."""
    docs = _read(sf_dir, "documents")
    rows = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        blen = len(t.encode("utf-8"))
        h = max(-(-blen // 48), 1)
        n_lower = sum(1 for ch in t if "a" <= ch <= "z")
        n_digit = sum(1 for ch in t if "0" <= ch <= "9")
        n_space = t.count(" ")
        rows.append({"doc_id": doc_id, "width": np.int64(16),
                     "height": np.int64(h),
                     "n_lower": np.int64(n_lower),
                     "n_digit": np.int64(n_digit),
                     "n_other": np.int64(48 * h - n_lower - n_digit
                                         - n_space)})
    return pd.DataFrame(rows)


def r_corpus_weighted_quantiles(sf_dir, ps=(0.5, 0.9, 0.99),
                                micro=1_000_000):
    """Token-weighted per-source n_chars quantiles (type-1 weighted
    quantile: smallest x whose cumulative weight reaches p of the
    total) — exact int64 threshold compare, replayed over the same
    trim+whitespace-split token count."""
    docs = _read(sf_dir, "documents")
    rows = []
    for src, g in docs.groupby("source"):
        pairs = []
        for t, nc in zip(g["text"], g["n_chars"]):
            # Spark trim / DuckDB trim strip SPACES only, and Java /
            # RE2 \s is ASCII — replicate both exactly (see _WS note)
            ts = t.strip(" ")
            w = 0 if ts == "" else len(re.split(_WS + "+", ts))
            if w > 0:
                pairs.append((int(nc), w))
        pairs.sort()
        tot = sum(w for _, w in pairs)
        out = {"source": src, "n": np.int64(len(pairs)),
               "total_w": np.int64(tot)}
        for p in ps:
            pn = int(round(p * micro))
            cum = 0
            for x, w in pairs:
                cum += w
                if cum * micro >= pn * tot:
                    out[f"wq_{pn}"] = np.int64(x)
                    break
        rows.append(out)
    return pd.DataFrame(rows)


def _jw(a: str, b: str) -> float:
    """Jaro-Winkler written fresh from the published definition
    (match window max(l)/2-1, transposition halving over the matched
    sequences, 4-char-capped prefix bonus gated at jaro > 0.7) —
    independent of linkage.py's scorer and of DuckDB's native
    function."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    w = max(max(la, lb) // 2 - 1, 0)
    ma, mb = [False] * la, [False] * lb
    for i in range(la):
        for j in range(max(0, i - w), min(lb, i + w + 1)):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                break
    m = sum(ma)
    if m == 0:
        return 0.0
    sa = [a[i] for i in range(la) if ma[i]]
    sb = [b[j] for j in range(lb) if mb[j]]
    t = sum(x != y for x, y in zip(sa, sb)) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3
    if jaro <= 0.7:
        return jaro
    p = 0
    while p < min(4, la, lb) and a[p] == b[p]:
        p += 1
    return jaro + 0.1 * p * (1 - jaro)


def r_er_jaro_winkler(sf_dir, threshold_bp=80):
    """Blocked ER on distinct part names (block = last literal-space
    token, matching F.split's empty-preserving behavior), scored by
    the independent _jw above, floor-100 basis points, kept >=
    threshold — the entity-resolution family's first third-engine
    witness."""
    from collections import defaultdict

    part = _read(sf_dir, "part")
    names = sorted(set(part["p_name"]))
    blocks = defaultdict(list)
    for nm in names:
        blocks[nm.split(" ")[-1]].append(nm)
    rows = []
    for ns in blocks.values():
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                bp = int(np.floor(_jw(ns[i], ns[j]) * 100))
                if bp >= threshold_bp:
                    rows.append({"name_a": ns[i], "name_b": ns[j],
                                 "jw_bp": np.int64(bp)})
    return pd.DataFrame(rows)


def r_sim_topk(sf_dir, k=10):
    """Brute-force cosine top-10 vs the vec_id=0 embedding: the dot
    and both norms accumulate LEFT-FOLDED in element-index order
    (F.aggregate's association — the same formula-choice trap as
    _quantile_cont), division as dot/(na*nb), floor-1e4, ties to the
    smaller id, nulls (zero norms) last."""
    emb = _read(sf_dir, "embeddings")
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    q = vecs[ids == 0][0]
    dim = vecs.shape[1]
    dot = np.zeros(len(vecs))
    na2 = np.zeros(len(vecs))
    q2 = 0.0
    for d in range(dim):  # index order = the engines' fold order
        dot += vecs[:, d] * q[d]
        na2 += vecs[:, d] * vecs[:, d]
        q2 = q2 + q[d] * q[d]
    na, nq = np.sqrt(na2), np.sqrt(q2)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = np.where((na == 0.0) | (nq == 0.0), np.nan,
                       dot / (na * nq))
    cosf = np.floor(cos * 10000) / 10000
    order = sorted(range(len(ids)),
                   key=lambda i: (np.isnan(cosf[i]), -cosf[i]
                                  if not np.isnan(cosf[i]) else 0,
                                  ids[i]))[:k]
    return pd.DataFrame({"vec_id": [np.int64(ids[i]) for i in order],
                         "cosine": [float(cosf[i]) for i in order]})


# --------------------------------------------------------------------
# r14 extension (VERDICT r13 #4): ~60-oracle coverage, prioritizing
# the families where DuckDB shares the most machinery with Spark —
# text/quality regex scoring, warehouse CDC/SCD2 rank-dedup, URL
# canonicalization — i.e. where a shared-blind-spot bug would live.
# Every replay below is written from the QUERY SEMANTICS (the
# registry docstrings + published rule sets), not from either
# engine's SQL.
# --------------------------------------------------------------------

_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it",
           "with", "was", "on", "are", "this"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu",
           "den", "von", "mit", "sich", "auf", "für"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "que", "pour",
           "dans", "qui", "pas", "sur", "avec"],
    "es": ["el", "los", "las", "y", "que", "en", "un", "es", "por",
           "con", "una", "para", "del", "se"],
}
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")
#: ASCII \S (Java regex semantics)
_NWS = r"[^ \t\n\r\f\x0b]"


def _micros(s: pd.Series) -> pd.Series:
    """Per-value decimal(18,6) quantization to int micro-units (the
    exact_sum / micro_parts doctrine: HALF_UP through the double's
    shortest repr)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    return s.map(lambda v: int(Decimal(repr(float(v))).quantize(
        q, ROUND_HALF_UP) * 1_000_000))


def _floorn(x, unit: int):
    return np.floor(np.asarray(x, dtype=np.float64) * unit) / unit


def _ws_words(t: str) -> list:
    return [w for w in re.split(_WS + "+", t) if w != ""]


def r_groupby_count(sf_dir):
    ev = _read(sf_dir, "events")
    g = (ev.groupby("event_type", as_index=False)["value"]
           .agg(lambda s: int(s.notna().sum())))
    g["count(value)"] = g.pop("value").astype(np.int64)
    return g


def r_groupby_extended(sf_dir):
    li = _read(sf_dir, "lineitem")
    rows = []
    for rf, grp in li.groupby("l_returnflag"):
        rows.append({
            "l_returnflag": rf,
            "min_qty": _floorn(grp["l_quantity"].min(), 100)[()],
            "max_qty": _floorn(grp["l_quantity"].max(), 100)[()],
            "avg_price": _floorn(
                _dsum(grp["l_extendedprice"])
                / int(grp["l_extendedprice"].notna().sum()), 100)[()],
            # Spark F.percentile == linear-interpolated exact quantile
            "median_qty": _floorn(
                np.percentile(grp["l_quantity"].to_numpy(), 50,
                              method="linear"), 100)[()],
            "distinct_orders": np.int64(grp["l_orderkey"].nunique()),
        })
    return pd.DataFrame(rows)


def r_groupby_bool(sf_dir):
    ev = _read(sf_dir, "events")
    hi = ev["value"] > 50.0
    ext = ev["value"] > 99.99
    g = (pd.DataFrame({"event_type": ev["event_type"], "hi": hi,
                       "ext": ext})
         .groupby("event_type", as_index=False)
         .agg(all_hi=("hi", "all"), any_hi=("hi", "any"),
              any_extreme=("ext", "any")))
    return g


def _grouping_sets(df, keys, combos, val_fn):
    """CUBE/ROLLUP replay: aggregate each grouping set, None-fill the
    collapsed keys (object dtype so canon stringifies like Spark's
    null strings)."""
    outs = []
    for combo in combos:
        if combo:
            g = df.groupby(list(combo), dropna=False)
            rows = [dict(zip(combo, (k if isinstance(k, tuple) else (k,))),
                         **val_fn(sub)) for k, sub in g]
        else:
            rows = [val_fn(df)]
        part = pd.DataFrame(rows)
        for k in keys:
            if k not in part.columns:
                part[k] = None
        outs.append(part)
    out = pd.concat(outs, ignore_index=True)
    for k in keys:
        out[k] = out[k].astype(object).where(out[k].notna(), None)
    return out[keys + [c for c in out.columns if c not in keys]]


def r_groupby_cube(sf_dir):
    li = _read(sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    combos = [("l_returnflag", "l_linestatus"), ("l_returnflag",),
              ("l_linestatus",), ()]
    return _grouping_sets(
        li, keys, combos,
        lambda sub: {"sum_qty": _floorn(_dsum(sub["l_quantity"]),
                                        100)[()],
                     "n": np.int64(len(sub))})


def r_groupby_rollup(sf_dir):
    o = _read(sf_dir, "orders")
    keys = ["o_orderpriority", "o_orderstatus"]
    combos = [("o_orderpriority", "o_orderstatus"),
              ("o_orderpriority",), ()]
    return _grouping_sets(
        o, keys, combos,
        lambda sub: {"sum_price": _floorn(_dsum(sub["o_totalprice"]),
                                          100)[()],
                     "n": np.int64(len(sub))})


def r_pivot(sf_dir):
    ev = _read(sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    m = pd.DataFrame({"user_id": ev["user_id"],
                      "event_type": ev["event_type"],
                      "mi": _micros(ev["value"])})
    g = (m.groupby(["user_id", "event_type"])["mi"].sum()
          .unstack("event_type"))
    out = pd.DataFrame({"user_id": g.index.to_numpy()})
    for t in types:
        col = g[t] if t in g.columns else pd.Series(np.nan,
                                                    index=g.index)
        out[t] = _floorn(col.to_numpy(dtype=np.float64) / 1e6, 10000)
    return out


def r_join_full(sf_dir):
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_linenumber",
                                    "l_quantity"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey",
                how="outer")
    return j[["o_orderkey", "o_orderpriority", "l_orderkey",
              "l_linenumber", "l_quantity"]]


def r_join_timestamp_key(sf_dir):
    ev = _read(sf_dir, "events")
    a = ev[["ts", "event_id"]]
    b = ev[["ts", "user_id"]]
    j = a.merge(b, on="ts")
    return pd.DataFrame({"ts_l": j["ts"], "ts_r": j["ts"],
                         "event_id": j["event_id"],
                         "user_id": j["user_id"]})


def r_int_literal_widening(sf_dir):
    p = _read(sf_dir, "part")
    size2 = p["p_size"].astype(np.int64) * 2 + 1
    keep = size2 > 60
    return pd.DataFrame({"p_partkey": p["p_partkey"][keep],
                         "size2": size2[keep]})


def r_datetime_filter(sf_dir):
    o = _read(sf_dir, "orders")
    keep = o[o["o_orderdate"] >= pd.Timestamp("1995-01-01")]
    month = keep["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    g = (pd.DataFrame({"month": month,
                       "k": keep["o_orderkey"]})
         .groupby("month", as_index=False)
         .agg(n_orders=("k", lambda s: int(s.notna().sum()))))
    g["n_orders"] = g["n_orders"].astype(np.int64)
    return g


def r_datetime_parts(sf_dir):
    ev = _read(sf_dir, "events")
    df = pd.DataFrame({"y": ev["ts"].dt.year, "m": ev["ts"].dt.month,
                       "d": ev["ts"].dt.day, "h": ev["ts"].dt.hour,
                       "mi": _micros(ev["value"])})
    g = (df.groupby(["y", "m", "d", "h"], as_index=False)
           .agg(n_events=("mi", "size"), s=("mi", "sum")))
    g["n_events"] = g["n_events"].astype(np.int64)
    g["sum_value"] = _floorn(g.pop("s").to_numpy() / 1e6, 10000)
    return g


def r_window_lag(sf_dir):
    o = _read(sf_dir, "orders").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
    prev = o.groupby("o_custkey")["o_orderdate"].shift()
    days = (o["o_orderdate"].dt.normalize()
            - prev.dt.normalize()).dt.days
    return pd.DataFrame({"o_custkey": o["o_custkey"],
                         "o_orderkey": o["o_orderkey"],
                         "days_since_prev": days})


def r_window_rolling(sf_dir):
    o = _read(sf_dir, "orders").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
    mi = pd.Series(_micros(o["o_totalprice"]).to_numpy(),
                   index=o.index)
    roll = (mi.groupby(o["o_custkey"])
              .rolling(3, min_periods=1).sum()
              .reset_index(level=0, drop=True))
    return pd.DataFrame({
        "o_custkey": o["o_custkey"], "o_orderkey": o["o_orderkey"],
        "rolling_spend": _floorn(roll.to_numpy() / 1e6, 100)})


def r_tpch_q3(sf_dir):
    cut = pd.Timestamp("1998-01-01")
    c = _read(sf_dir, "customer")
    c = c[c["c_mktsegment"] == "BUILDING"]
    o = _read(sf_dir, "orders")
    o = o[o["o_orderdate"] < cut]
    li = _read(sf_dir, "lineitem")
    li = li[li["l_shipdate"] > cut]
    j = (c.merge(o, left_on="c_custkey", right_on="o_custkey")
          .merge(li, left_on="o_orderkey", right_on="l_orderkey"))
    j = j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    g = (j.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"],
                   as_index=False)["rev"].agg(_dsum))
    g["revenue"] = _floorn(g.pop("rev"), 100)
    return g.sort_values(["revenue", "o_orderkey"],
                         ascending=[False, True]).head(10)


def r_tpch_q5(sf_dir):
    r = _read(sf_dir, "region")
    r = r[r["r_name"] == "ASIA"]
    n = _read(sf_dir, "nation")
    c = _read(sf_dir, "customer")
    o = _read(sf_dir, "orders")
    o = o[o["o_orderdate"] >= pd.Timestamp("1996-01-01")]
    li = _read(sf_dir, "lineitem")
    j = (r.merge(n, left_on="r_regionkey", right_on="n_regionkey")
          .merge(c, left_on="n_nationkey", right_on="c_nationkey")
          .merge(o, left_on="c_custkey", right_on="o_custkey")
          .merge(li, left_on="o_orderkey", right_on="l_orderkey"))
    j = j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    g = j.groupby("n_name", as_index=False)["rev"].agg(_dsum)
    g["revenue"] = _floorn(g.pop("rev"), 100)
    return g


def r_tpch_q6(sf_dir):
    li = _read(sf_dir, "lineitem")
    keep = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
              & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))
              & (li["l_discount"] >= 0.02) & (li["l_discount"] <= 0.06)
              & (li["l_quantity"] < 24.0)]
    rev = keep["l_extendedprice"] * keep["l_discount"]
    return pd.DataFrame({"revenue": [_floorn(_dsum(rev), 100)[()]],
                         "n_rows": [np.int64(len(keep))]})


def r_tpch_q13(sf_dir):
    c = _read(sf_dir, "customer")[["c_custkey"]]
    o = _read(sf_dir, "orders")
    o = o[o["o_orderpriority"] != "1-URGENT"][["o_custkey",
                                               "o_orderkey"]]
    j = c.merge(o, left_on="c_custkey", right_on="o_custkey",
                how="left")
    per = (j.groupby("c_custkey", as_index=False)
            .agg(c_count=("o_orderkey",
                          lambda s: int(s.notna().sum()))))
    g = (per.groupby("c_count", as_index=False)
            .agg(custdist=("c_count", "size")))
    g["c_count"] = g["c_count"].astype(np.int64)
    g["custdist"] = g["custdist"].astype(np.int64)
    return g


def _md5_bucket(key) -> int:
    return _md5_hash64(str(key)) % 10_000


def r_sample_hash(sf_dir):
    d = _read(sf_dir, "documents")
    keep = d["doc_id"].map(_md5_bucket) < 2500
    return d.loc[keep, ["doc_id", "source", "n_chars"]]


def r_dataset_split(sf_dir):
    d = _read(sf_dir, "documents")
    b = d["doc_id"].map(_md5_bucket)
    split = np.where(b < 8000, "train", np.where(b < 9000, "val",
                                                 "test"))
    g = (pd.DataFrame({"split": split})
         .groupby("split", as_index=False)
         .agg(n_docs=("split", "size")))
    g["n_docs"] = g["n_docs"].astype(np.int64)
    return g


def r_text_lang_id(sf_dir):
    d = _read(sf_dir, "documents")
    pats = {lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b")
            for lang, ws in _LANG_STOPWORDS.items()}

    def lid(t: str) -> str:
        low = t.lower()
        scores = {lang: len(p.findall(low)) for lang, p in pats.items()}
        best = max(scores.values())
        if best == 0:
            return "und"
        # tie-break: first language in declaration order wins
        for lang in _LANG_STOPWORDS:
            if scores[lang] == best:
                return lang

    return pd.DataFrame({"doc_id": d["doc_id"],
                         "lang_pred": d["text"].map(lid)})


def r_text_quality(sf_dir):
    d = _read(sf_dir, "documents")
    en_pat = re.compile(r"\b(?:" + "|".join(_LANG_STOPWORDS["en"])
                        + r")\b")

    def score(t: str) -> float:
        n = len(t)
        if n == 0:
            return 0.0
        safe_n = float(n)
        alpha = len(re.sub(r"[^A-Za-z]", "", t)) / safe_n
        tr = t.strip()
        words = 0 if tr == "" else len(re.split(_WS + "+", tr))
        safe_w = float(words if words else 1)
        mean_wlen = len(re.sub(_WS, "", t)) / safe_w
        wlen_term = max(0.0, 1.0 - abs(mean_wlen - 5.0) / 10.0)
        stop_term = min(1.0, len(en_pat.findall(t.lower())) / 8.0)
        len_term = min(1.0, n / 500.0)
        raw = (0.35 * alpha + 0.25 * stop_term + 0.2 * wlen_term
               + 0.2 * len_term)
        return np.floor(raw * 10000) / 10000

    return pd.DataFrame({"doc_id": d["doc_id"],
                         "quality": d["text"].map(score)})


def r_text_repetition(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.sub(_WS + "+", " ", t.lower()).strip().split(" ")
        n_toks, n_dist = len(toks), len(set(toks))
        if n_toks < 2:
            rows.append((i, np.int64(0), None, None))
            continue
        counts: dict = {}
        for a, b in zip(toks, toks[1:]):
            g = a + " " + b
            counts[g] = counts.get(g, 0) + 1
        total = n_toks - 1
        rows.append((
            i, np.int64(total),
            np.floor(max(counts.values()) / total * 1e6) / 1e6,
            np.floor(n_dist / n_toks * 1e6) / 1e6))
    return pd.DataFrame(rows, columns=["doc", "n_bigrams",
                                       "top_bigram_frac",
                                       "distinct_token_frac"])


_PII_REPLAY = [
    (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
     "<EMAIL>"),
    (re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
    (re.compile(r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"), "<PHONE>"),
]


def r_text_redact_pii(sf_dir):
    d = _read(sf_dir, "documents")

    def redact(row) -> str:
        i, t = int(row["doc_id"]), row["text"]
        s = (f"user{i}@corp.example.com ip 10.0.{i % 256}.7 "
             f"tel 555-123-4567 " + t[:60])
        for pat, tag in _PII_REPLAY:
            s = pat.sub(tag, s)
        return s

    return pd.DataFrame({"doc_id": d["doc_id"],
                         "redacted": d.apply(redact, axis=1)})


def r_quality_gopher(sf_dir):
    d = _read(sf_dir, "documents")
    bullet = re.compile("^" + _WS + r"*[-*•‣▪]")
    ell_end = re.compile(r"(\.\.\.|…)" + _WS + "*$")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        words = _ws_words(t)
        n_words = len(words)
        safe_w = float(n_words if n_words else 1)
        char_sum = len(re.sub(_WS, "", t))
        alpha_words = sum(1 for w in words
                          if re.search("[A-Za-z]", w))
        lowered = {w.lower() for w in words}
        stop_hits = sum(1 for s in _GOPHER_STOPWORDS if s in lowered)
        n_sym = t.count("#") + t.count("...")
        lines = t.split("\n")
        safe_l = float(len(lines) if lines else 1)
        n_bullet = sum(1 for ln in lines if bullet.search(ln))
        n_ell = sum(1 for ln in lines if ell_end.search(ln))
        f4 = lambda x: np.floor(x * 10000) / 10000  # noqa: E731
        mean_wl = f4(char_sum / safe_w)
        alpha_f = f4(alpha_words / safe_w)
        sym_r = f4(n_sym / safe_w)
        bul_f = f4(n_bullet / safe_l)
        ell_f = f4(n_ell / safe_l)
        keep = int(50 <= n_words <= 100_000 and 3 <= mean_wl <= 10
                   and sym_r <= 0.1 and bul_f <= 0.9 and ell_f <= 0.3
                   and alpha_f >= 0.8 and stop_hits >= 2)
        rows.append((i, np.int64(n_words), mean_wl, alpha_f,
                     np.int64(stop_hits), sym_r, bul_f, ell_f,
                     np.int64(keep)))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "mean_word_len", "alpha_word_frac",
        "stopword_hits", "symbol_word_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "keep"])


def r_quality_c4(sf_dir):
    d = _read(sf_dir, "documents")
    term = re.compile(r'[.!?"]' + _WS + "*$")
    js = re.compile(r"\bjavascript\b")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        t2 = t.replace(" table ", ".\n")
        lines = t2.split("\n")
        kept = [ln for ln in lines
                if term.search(ln) and len(_ws_words(ln)) >= 5
                and not js.search(ln.lower())]
        clean = "\n".join(kept)
        sentences = len(re.findall(r"[.!?]", clean))
        page_keep = int("lorem ipsum" not in clean.lower()
                        and "{" not in clean and sentences >= 3)
        rows.append((i, np.int64(len(lines)), np.int64(len(kept)),
                     clean, np.int64(page_keep)))
    return pd.DataFrame(rows, columns=["doc_id", "n_lines",
                                       "n_kept_lines", "clean_text",
                                       "page_keep"])


def r_url_canonicalize(sf_dir):
    # semantic expectation, constructed directly from (source,
    # doc_id): tracking params stripped, survivors sorted, fragment
    # and trailing slash dropped, scheme+host lowercased, path case
    # preserved
    d = _read(sf_dir, "documents")
    canon = [
        (f"https://www.{src}.com/d/{i}/page" if i % 3 == 2
         else f"https://www.{src}.com/d/{i}?a=1&b=2")
        for i, src in zip(d["doc_id"], d["source"])]
    return pd.DataFrame({"doc_id": d["doc_id"], "canonical": canon})


def _cdc_base(sf_dir):
    o = _read(sf_dir, "orders")
    return pd.DataFrame({
        "o_orderkey": o["o_orderkey"],
        "o_custkey": o["o_custkey"],
        "price_c": np.floor(o["o_totalprice"] * 100).astype(np.int64),
    })


def r_cdc_apply(sf_dir):
    b = _cdc_base(sf_dir)
    k = b["o_orderkey"]
    surv = b[k % 7 != 0].copy()
    upd = surv["o_orderkey"] % 3 == 0
    surv.loc[upd, "price_c"] += 1000
    surv["seq"] = np.where(upd, 2, 1).astype(np.int64)
    return surv


def r_cdc_survivorship(sf_dir):
    b = _cdc_base(sf_dir)
    k = b["o_orderkey"]
    has2, has3 = (k % 3 == 0), (k % 5 == 0)
    return pd.DataFrame({
        "o_orderkey": k,
        "last_seq": np.where(has3, 3, np.where(has2, 2, 1))
                      .astype(np.int64),
        "cust": np.where(has3, b["o_custkey"] + 100,
                         b["o_custkey"]).astype(np.int64),
        "price_c": np.where(has2, b["price_c"] + 1000,
                            b["price_c"]).astype(np.int64),
    })


def r_table_diff(sf_dir):
    o = _read(sf_dir, "orders")
    k = o["o_orderkey"].to_numpy()
    p0 = _floor2(o["o_totalprice"])
    p1 = np.where(k % 7 == 0, np.floor(p0 * 1.05 * 100) / 100, p0)
    rows = []
    for key, old_p, new_p in zip(k, p0, p1):
        if key % 13 == 0:
            rows.append((int(key), "delete"))
        elif new_p != old_p:
            rows.append((int(key), "update"))
    for j in range(5):
        rows.append((900000000 + j, "insert"))
    out = pd.DataFrame(rows, columns=["o_orderkey", "change_type"])
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    return out


def r_table_profile(sf_dir):
    li = _read(sf_dir, "lineitem")
    rows = []
    for col in ["l_orderkey", "l_quantity", "l_extendedprice",
                "l_returnflag", "l_linestatus"]:
        s = li[col]
        numeric = s.dtype.kind in "if"  # noqa: E721 — dtype kind test
        rows.append({
            "column": col,
            "n_rows": np.int64(len(s)),
            "n_null": np.int64(s.isna().sum()),
            "n_distinct": np.int64(s.nunique()),
            "min_num": float(s.min()) if numeric else np.nan,
            "max_num": float(s.max()) if numeric else np.nan,
            "min_str": None if numeric else str(s.min()),
            "max_str": None if numeric else str(s.max()),
        })
    out = pd.DataFrame(rows)
    out["min_str"] = out["min_str"].astype(object).where(
        out["min_str"].notna(), None)
    out["max_str"] = out["max_str"].astype(object).where(
        out["max_str"].notna(), None)
    return out


def _cluster_map(sf_dir, threshold=0.5, n=3):
    """Union-find over exact n-gram-Jaccard pairs (the same pair
    semantics r_dedup_ngram_jaccard witnesses) with MIN-id component
    labels — dedup_clusters' fixed point."""
    d = _read(sf_dir, "documents")
    sh = {int(i): _shingles(t, n)
          for i, t in zip(d["doc_id"], d["text"])}
    cap = max(100, int(np.ceil(0.01 * len(d))))
    df_count: dict = {}
    for s in sh.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    inv: dict = {}
    for i, s in sh.items():
        for g in s:
            if df_count[g] <= cap:
                inv.setdefault(g, []).append(i)
    common: dict = {}
    for ids in inv.values():
        ids.sort()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                kk = (ids[ai], ids[bi])
                common[kk] = common.get(kk, 0) + 1
    parent = {int(i): int(i) for i in d["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), c in common.items():
        jac = np.floor(c / (len(sh[a]) + len(sh[b]) - c) * 10000) / 10000
        if jac >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:  # min-label: smaller root wins
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    return d, {i: find(i) for i in parent}


def r_dedup_clusters(sf_dir):
    d, comp = _cluster_map(sf_dir)
    return pd.DataFrame({
        "doc": d["doc_id"],
        "cluster": d["doc_id"].map(comp).astype(np.int64)})


def r_dedup_keep_best(sf_dir):
    d, comp = _cluster_map(sf_dir)
    j = pd.DataFrame({"doc_id": d["doc_id"],
                      "cluster": d["doc_id"].map(comp),
                      "n_chars": d["n_chars"]})
    j = j.sort_values(["cluster", "n_chars", "doc_id"],
                      ascending=[True, False, True], kind="mergesort")
    best = j.groupby("cluster", as_index=False).head(1).copy()
    best["cluster"] = best["cluster"].astype(np.int64)
    return best[["doc_id", "cluster", "n_chars"]]


def r_text_line_dedup(sf_dir):
    d = _read(sf_dir, "documents")
    seg = re.compile(r"((?:" + _NWS + r"+ ){2}" + _NWS + r"+) ")
    docs = {int(i): seg.sub(r"\1\n", t)
            for i, t in zip(d["doc_id"], d["text"])}
    keys_per_doc = {}
    doc_freq: dict = {}
    for i, t in docs.items():
        lines = t.split("\n")
        keys = [ln.strip(" ").lower() for ln in lines]
        keys_per_doc[i] = (lines, keys)
        for kk in set(k for k in keys if k != ""):
            doc_freq[kk] = doc_freq.get(kk, 0) + 1
    boiler = {k for k, c in doc_freq.items() if c >= 2}
    rows = []
    for i, (lines, keys) in keys_per_doc.items():
        kept = [ln for ln, kk in zip(lines, keys) if kk not in boiler]
        rows.append((i, "\n".join(kept), np.int64(len(lines)),
                     np.int64(len(lines) - len(kept))))
    return pd.DataFrame(rows, columns=["doc", "text", "n_lines",
                                       "n_dropped"])


def r_text_phrase_search(sf_dir, phrase=("batch", "batch")):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.sub(_WS + "+", " ", t.lower()).strip().split(" ")
        m = len(phrase)
        n = sum(1 for j in range(len(toks) - m + 1)
                if tuple(toks[j:j + m]) == phrase)  # overlapping
        if n > 0:
            rows.append((i, np.int64(n)))
    return pd.DataFrame(rows, columns=["doc", "n_matches"])


def r_events_window(sf_dir):
    ev = _read(sf_dir, "events")
    df = pd.DataFrame({"window_start": ev["ts"].dt.floor("h"),
                       "event_type": ev["event_type"],
                       "mi": _micros(ev["value"])})
    g = (df.groupby(["window_start", "event_type"], as_index=False)
           .agg(n_events=("mi", "size"), s=("mi", "sum")))
    g["n_events"] = g["n_events"].astype(np.int64)
    g["sum_value"] = _floorn(g.pop("s").to_numpy() / 1e6, 10000)
    return g


# --------------------------------------------------------------------
# r14 batch 2: product analytics (as-of family, attribution, cohort,
# EWM, MAD, interval/sliding windows) + remaining TPC-H composites.
# pandas.merge_asof IS an independent third implementation of the
# as-of operator — semantics from the operator docstrings, not from
# either engine's SQL.
# --------------------------------------------------------------------

def _ev_split(sf_dir, etype, cols):
    ev = _read(sf_dir, "events")
    return ev.loc[ev["event_type"] == etype, cols].copy()


def _asof_backward(left, right, value_col, tol_us=None):
    """pandas merge_asof backward on (user_id, ts); returns left +
    <value_col> from the latest at-or-before right row."""
    kw = {}
    if tol_us is not None:
        kw["tolerance"] = pd.Timedelta(microseconds=tol_us)
    return pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="user_id", direction="backward", **kw)


def r_events_asof_join(sf_dir):
    clicks = _ev_split(sf_dir, "click", ["event_id", "user_id", "ts"])
    purch = _ev_split(sf_dir, "purchase", ["user_id", "ts", "value"])
    m = _asof_backward(clicks, purch, "value")
    return pd.DataFrame({"event_id": m["event_id"],
                         "user_id": m["user_id"], "ts": m["ts"],
                         "value_asof": m["value"]})


def r_events_merge_asof(sf_dir):
    views = _ev_split(sf_dir, "view", ["event_id", "user_id", "ts"])
    purch = _ev_split(sf_dir, "purchase", ["user_id", "ts", "value"])
    m = _asof_backward(views, purch, "value")
    return pd.DataFrame({"event_id": m["event_id"],
                         "user_id": m["user_id"], "ts": m["ts"],
                         "value_asof": m["value"]})


def r_events_asof_nearest(sf_dir, tol_us=2 * 3600 * 1_000_000):
    # direction=nearest with tolerance, ties backward: composed from
    # one backward and one forward merge_asof with the matched ts
    # carried, then a distance compare (strictly-closer forward wins)
    clicks = _ev_split(sf_dir, "click", ["event_id", "user_id", "ts"])
    purch = _ev_split(sf_dir, "purchase", ["user_id", "ts", "value"])
    b2 = pd.merge_asof(
        clicks.sort_values("ts", kind="mergesort"),
        purch.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "mts", "value": "bval"}),
        left_on="ts", right_on="mts", by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(microseconds=tol_us))
    f2 = pd.merge_asof(
        clicks.sort_values("ts", kind="mergesort"),
        purch.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "mts", "value": "fval"}),
        left_on="ts", right_on="mts", by="user_id",
        direction="forward",
        tolerance=pd.Timedelta(microseconds=tol_us))
    m = b2.merge(f2[["event_id", "mts", "fval"]], on="event_id",
                 suffixes=("_b", "_f"))
    db = (m["ts"] - m["mts_b"]).dt.total_seconds()
    df_ = (m["mts_f"] - m["ts"]).dt.total_seconds()
    pick_f = m["mts_b"].isna() | (m["mts_f"].notna() & (df_ < db))
    val = np.where(pick_f, m["fval"], m["bval"])
    out = pd.DataFrame({"event_id": m["event_id"],
                        "user_id": m["user_id"],
                        "value_asof": _floorn(val, 100)})
    out.loc[m["mts_b"].isna() & m["mts_f"].isna(),
            "value_asof"] = np.nan
    return out


def r_events_attribution(sf_dir):
    conv = _ev_split(sf_dir, "purchase",
                     ["event_id", "user_id", "ts", "value"])
    ev = _read(sf_dir, "events")
    touch = (ev[ev["event_type"].isin(["view", "click"])]
             .groupby(["user_id", "ts"], as_index=False)
             .agg(channel=("event_type", "max")))
    m = _asof_backward(conv, touch, "channel",
                       tol_us=7 * 24 * 3600 * 1_000_000)
    m["channel"] = m["channel"].fillna("direct")
    m["rc"] = np.floor(m["value"] * 100).astype(np.int64)
    g = (m.groupby("channel", as_index=False)
         .agg(n_conversions=("rc", "size"), revenue_c=("rc", "sum")))
    g["n_conversions"] = g["n_conversions"].astype(np.int64)
    g["revenue_c"] = g["revenue_c"].astype(np.int64)
    return g


def r_events_attribution_linear(sf_dir,
                                win_us=7 * 24 * 3600 * 1_000_000):
    conv = _ev_split(sf_dir, "purchase",
                     ["event_id", "user_id", "ts", "value"])
    conv["cents"] = np.floor(conv["value"] * 100).astype(np.int64)
    ev = _read(sf_dir, "events")
    touch = ev.loc[ev["event_type"].isin(["view", "click"]),
                   ["user_id", "ts", "event_type"]].rename(
        columns={"ts": "tts", "event_type": "channel"})
    hit = conv.merge(touch, on="user_id")
    win = pd.Timedelta(microseconds=win_us)
    hit = hit[(hit["tts"] <= hit["ts"])
              & (hit["ts"] - hit["tts"] <= win)]
    k = hit.groupby("event_id")["channel"].transform("size")
    hit = hit.assign(k=k)
    g = (hit.groupby("channel", as_index=False)
         .apply(lambda s: pd.Series({
             "credit_micro": int((1_000_000 // s["k"]).sum()),
             "revenue_micro": int(((s["cents"] * 1_000_000)
                                   // s["k"]).sum())}),
             include_groups=False))
    touched_ids = set(hit["event_id"])
    direct = conv[~conv["event_id"].isin(touched_ids)]
    g = pd.concat([g, pd.DataFrame([{
        "channel": "direct",
        "credit_micro": len(direct) * 1_000_000,
        "revenue_micro": int(direct["cents"].sum()) * 1_000_000,
    }])], ignore_index=True)
    g["credit_micro"] = g["credit_micro"].astype(np.int64)
    g["revenue_micro"] = g["revenue_micro"].astype(np.int64)
    return g


def r_events_cohort_retention(sf_dir, period_us=7 * 24 * 3600
                              * 1_000_000):
    ev = _read(sf_dir, "events")
    p = (ev["ts"].astype("int64") // period_us).astype(np.int64)
    up = pd.DataFrame({"u": ev["user_id"], "p": p}).drop_duplicates()
    cohort = up.groupby("u")["p"].min().rename("cohort")
    up = up.merge(cohort, left_on="u", right_index=True)
    cells = (up.assign(week_offset=up["p"] - up["cohort"])
               .groupby(["cohort", "week_offset"], as_index=False)
               .agg(n_active=("u", "size")))
    size = cells.loc[cells["week_offset"] == 0,
                     ["cohort", "n_active"]].rename(
        columns={"n_active": "cohort_size"})
    out = cells.merge(size, on="cohort")
    out["retention_bp"] = ((10_000 * out["n_active"])
                           // out["cohort_size"]).astype(np.int64)
    for c in ("cohort", "week_offset", "n_active", "cohort_size"):
        out[c] = out[c].astype(np.int64)
    return out


def r_events_ewm(sf_dir, alpha=0.2, terms=16):
    ev = _read(sf_dir, "events")
    base = pd.DataFrame({
        "event_id": ev["event_id"], "user_id": ev["user_id"],
        "ts": ev["ts"],
        "cents": np.floor(ev["value"] * 100).astype(np.int64)})
    ws = [round((1.0 - alpha) ** k * 1_000_000) for k in range(terms)]
    base = base.sort_values(["user_id", "ts", "cents"],
                            kind="mergesort")
    ewm = np.empty(len(base), dtype=np.int64)
    i = 0
    for _, grp in base.groupby("user_id", sort=False):
        x = grp["cents"].to_numpy()
        for t in range(len(x)):
            num = den = 0
            for k in range(min(terms, t + 1)):
                num += int(x[t - k]) * ws[k]
                den += ws[k]
            ewm[i] = num // den
            i += 1
    out = base[["event_id", "user_id", "cents"]].copy()
    out["ewm"] = ewm
    return out


def r_events_anomaly_mad(sf_dir, k=3.0):
    ev = _read(sf_dir, "events")
    base = pd.DataFrame({
        "event_type": ev["event_type"],
        "x": np.floor(ev["value"] * 100).astype(np.int64)})
    rows = []
    for et, grp in base.groupby("event_type"):
        x = grp["x"].to_numpy(dtype=np.float64)
        med = np.percentile(x, 50, method="linear")
        dev = np.abs(x - med)
        mad = np.percentile(dev, 50, method="linear")
        rows.append({"event_type": et, "n": np.int64(len(x)),
                     "med": med, "mad": mad,
                     "n_outliers": np.int64((dev > k * mad).sum())})
    return pd.DataFrame(rows)


def r_events_interval_join(sf_dir):
    clicks = _ev_split(sf_dir, "click", ["event_id", "user_id", "ts"])
    errors = _ev_split(sf_dir, "error",
                       ["event_id", "user_id", "ts"]).rename(
        columns={"event_id": "error_id", "ts": "ets"})
    j = clicks.merge(errors, on="user_id")
    j = j[(j["ts"] >= j["ets"])
          & (j["ts"] <= j["ets"] + pd.Timedelta(hours=24))]
    return j[["event_id", "error_id"]]


def r_events_sliding_window(sf_dir, hop_min=15, k_max=4):
    ev = _read(sf_dir, "events")
    parts = []
    base = ev["ts"].dt.floor(f"{hop_min}min")
    for k in range(k_max):
        parts.append(pd.DataFrame({
            "window_start": base - pd.Timedelta(minutes=hop_min * k),
            "event_type": ev["event_type"],
            "mi": _micros(ev["value"])}))
    df = pd.concat(parts, ignore_index=True)
    g = (df.groupby(["window_start", "event_type"], as_index=False)
           .agg(n_events=("mi", "size"), s=("mi", "sum")))
    g["n_events"] = g["n_events"].astype(np.int64)
    g["sum_value"] = _floorn(g.pop("s").to_numpy() / 1e6, 10000)
    return g


def r_events_json(sf_dir):
    import json as _json

    ev = _read(sf_dir, "events")

    def getk(p):
        try:
            v = _json.loads(p).get("k")
            return None if v is None else int(v)
        except Exception:
            return None

    ks = ev["props"].map(getk)
    g = (pd.DataFrame({"event_type": ev["event_type"], "k": ks})
         .groupby("event_type", as_index=False)
         .agg(sum_k=("k", lambda s: int(s.dropna().sum())),
              n=("k", lambda s: int(s.notna().sum()))))
    g["sum_k"] = g["sum_k"].astype(np.int64)
    g["n"] = g["n"].astype(np.int64)
    return g


def r_window_range_frame(sf_dir, window_us=3_600_000_000):
    ev = _read(sf_dir, "events").sort_values(["event_type", "ts"],
                                             kind="mergesort")
    out_roll = np.empty(len(ev), dtype=np.float64)
    i = 0
    for _, grp in ev.groupby("event_type", sort=False):
        ts = grp["ts"].astype("int64").to_numpy()
        mi = _micros(grp["value"]).to_numpy()
        pref = np.concatenate([[0], np.cumsum(mi)])
        lo = np.searchsorted(ts, ts - window_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")  # RANGE: all ties
        out_roll[i:i + len(grp)] = (pref[hi] - pref[lo]) / 1e6
        i += len(grp)
    return pd.DataFrame({
        "event_id": ev["event_id"].to_numpy(),
        "event_type": ev["event_type"].to_numpy(),
        "roll_1h": _floorn(out_roll, 10000)})


def r_text_vocab(sf_dir, top_k=100):
    d = _read(sf_dir, "documents")
    counts: dict = {}
    for t in d["text"]:
        for tok in re.sub(_WS + "+", " ", t.lower()).strip().split(" "):
            if tok != "":
                counts[tok] = counts.get(tok, 0) + 1
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(rows[:top_k], columns=["token", "freq"]) \
        .astype({"freq": np.int64})


def r_curation_funnel(sf_dir):
    d = _read(sf_dir, "documents")
    trimmed = d["text"].str.strip()
    words = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t)))
    fails = {
        "min_words": ~(words >= 10),
        "is_en": ~(d["lang"] == "en"),
        "max_chars": ~(d["n_chars"] <= 800),
        "no_brace": d["text"].str.contains("{", regex=False),
    }
    rows, prior = [], None
    for name, f in fails.items():
        first = f if prior is None else (~prior & f)
        rows.append((name, np.int64(f.sum()), np.int64(first.sum())))
        prior = f if prior is None else (prior | f)
    rows.append(("__total__", np.int64(len(d)), np.int64(len(d))))
    kept = np.int64((~prior).sum())
    rows.append(("__kept__", kept, kept))
    return pd.DataFrame(rows, columns=["rule", "n_failed",
                                       "n_first_failed"])


def r_groupby_ts_key(sf_dir):
    ev = _read(sf_dir, "events")
    g = (ev.groupby("ts", as_index=False)["value"]
           .agg(lambda s: int(s.notna().sum())))
    g["count(value)"] = g.pop("value").astype(np.int64)
    return g


def r_tpch_q4(sf_dir):
    o = _read(sf_dir, "orders")
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_shipdate"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    hit = j[j["l_shipdate"]
            > j["o_orderdate"] + pd.Timedelta(days=60)]
    sel = o[o["o_orderkey"].isin(set(hit["o_orderkey"]))]
    g = (sel.groupby("o_orderpriority", as_index=False)
            .agg(n_orders=("o_orderkey", "size")))
    g["n_orders"] = g["n_orders"].astype(np.int64)
    return g


def r_tpch_q12(sf_dir):
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_linestatus"]]
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    urgent = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    g = (pd.DataFrame({"l_linestatus": j["l_linestatus"],
                       "hi": urgent.astype(np.int64)})
         .groupby("l_linestatus", as_index=False)
         .agg(high_line_count=("hi", "sum"), low=("hi", "size")))
    g["low_line_count"] = (g.pop("low")
                           - g["high_line_count"]).astype(np.int64)
    g["high_line_count"] = g["high_line_count"].astype(np.int64)
    return g


def r_tpch_q14(sf_dir):
    li = _read(sf_dir, "lineitem")
    li = li[(li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-04-01"))]
    p = _read(sf_dir, "part")[["p_partkey", "p_type"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    promo = rev.where(j["p_type"].str.startswith("PROMO"), 0.0)
    ratio = np.floor(_dsum(promo) / _dsum(rev) * 1_000_000) / 1_000_000
    return pd.DataFrame({"promo_ratio": [ratio],
                         "n_rows": [np.int64(len(j))]})


# --------------------------------------------------------------------
# r14 batch 3: the dedup/decontamination core (cross-corpus pairs,
# n-gram hits, duplicated spans), exact-stats profiling (correlation,
# equi-depth histogram, imputation), lexical ranking (TF-cosine,
# rational BM25, TF-IDF), and the warehouse/funnel remainder.
# --------------------------------------------------------------------

def _norm_tokens(t: str) -> list:
    return re.sub(_WS + "+", " ", t.lower()).strip().split(" ")


def _spans(toks: list, n: int) -> list:
    """ALL rolling n-token spans (clamped like list_slice: a doc
    shorter than n yields one span = the whole doc)."""
    return [" ".join(toks[i:i + n])
            for i in range(max(len(toks) - n, 0) + 1)]


def _bipartite_jaccard(sf_dir, n, threshold, side_a):
    """Bipartite exact-Jaccard truth pairs with per-side auto df caps
    (the cross_corpus_pairs contract); ``side_a`` maps a doc id to
    the a-side (b-side = complement)."""
    d = _read(sf_dir, "documents")
    sh = {int(i): set(_spans(_norm_tokens(t), n))
          for i, t in zip(d["doc_id"], d["text"])}
    sides = {0: [i for i in sh if side_a(i)],
             1: [i for i in sh if not side_a(i)]}
    inv = {0: {}, 1: {}}
    for side, ids in sides.items():
        cap = max(100, int(np.ceil(0.01 * len(ids))))
        dfc: dict = {}
        for i in ids:
            for g in sh[i]:
                dfc[g] = dfc.get(g, 0) + 1
        for i in ids:
            for g in sh[i]:
                if dfc[g] <= cap:
                    inv[side].setdefault(g, []).append(i)
    common: dict = {}
    for g, a_ids in inv[0].items():
        for b in inv[1].get(g, ()):  # bipartite only
            for a in a_ids:
                k = (a, b)
                common[k] = common.get(k, 0) + 1
    rows = []
    for (a, b), c in common.items():
        jac = np.floor(c / (len(sh[a]) + len(sh[b]) - c) * 10000) \
            / 10000
        if jac >= threshold:
            rows.append((a, b, jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def r_dedup_contamination(sf_dir, n=3, threshold=0.5):
    return _bipartite_jaccard(sf_dir, n, threshold,
                              side_a=lambda i: i % 2 == 0)


def _banded_probe_replay(sf_dir, hist_pred, batch_preds,
                         bands=8, rows_per_band=2, threshold=0.7):
    """Full independent replay of the incremental banded-index probe
    composition (r16, VERDICT r15 #9): build the md5-minhash banded
    index over the hist slice, then feed the remaining docs through
    in sequential batches — each batch doc probes the CURRENT index
    (hist + prior batches' novel appends), a pair is detected iff it
    shares >= 1 band AND exact-verifies at >= threshold, and each
    batch's UNMATCHED docs append their band rows (matched docs are
    not indexed — the survivor represents the cluster). Returns the
    set of (index_doc, batch_doc) detected pairs. The bucket
    partitioning and bloom tier in the Spark path only prune I/O
    (no false negatives), so this replays the full match semantics."""
    d = _read(sf_dir, "documents")
    sh = {int(i): set(_spans(_norm_tokens(t), 3))
          for i, t in zip(d["doc_id"], d["text"])}
    sig = {}
    for i, s in sh.items():
        if not s:
            continue
        hs = [_md5_hash64(g) % _MH_P for g in s]
        sig[i] = [min((a * h + c) % _MH_P for h in hs)
                  for a, c in _MH_PARAMS]

    def bkeys(m):
        return [(b, tuple(m[b * rows_per_band:
                            (b + 1) * rows_per_band]))
                for b in range(bands)]

    index: dict = {}
    for i in sorted(i for i in sig if hist_pred(i)):
        for kk in bkeys(sig[i]):
            index.setdefault(kk, set()).add(i)
    found = set()
    for pred in batch_preds:
        batch = sorted(i for i in sig if pred(i))
        novel = []
        for i in batch:
            cands = set()
            for kk in bkeys(sig[i]):
                cands |= index.get(kk, set())
            matched = False
            for j in cands:
                inter = len(sh[i] & sh[j])
                jac = np.floor(inter / (len(sh[i]) + len(sh[j])
                                        - inter) * 10000) / 10000
                if jac >= threshold:
                    found.add((j, i))
                    matched = True
            if not matched:
                novel.append(i)
        for i in novel:
            for kk in bkeys(sig[i]):
                index.setdefault(kk, set()).add(i)
    return found


def r_streaming_dedup_neardup(sf_dir):
    # hist (id%3==0) x streamed-rest truth pairs at >= 0.7, with the
    # recall flag INDEPENDENTLY replayed (r16): found_stream = pair
    # detected by the pandas banded-probe replay over the same two
    # ordered micro-batches, OR jaccard below the 0.8 assertion
    # margin (forced true on all three engines).
    out = _bipartite_jaccard(sf_dir, n=3, threshold=0.7,
                             side_a=lambda i: i % 3 == 0)
    found = _banded_probe_replay(
        sf_dir, lambda i: i % 3 == 0,
        batch_preds=(lambda i: i % 3 == 1, lambda i: i % 3 == 2))
    out["found_stream"] = [
        (j < 0.8) or ((a, b) in found)
        for a, b, j in zip(out["doc_a"], out["doc_b"],
                           out["jaccard"])]
    return out


def r_decontam_ngrams(sf_dir, n=5):
    d = _read(sf_dir, "documents")
    bench = d["source"].isin(["src0", "src1"])
    bset = set()
    for t in d.loc[bench, "text"]:
        bset.update(_spans(_norm_tokens(t), n))
    rows = []
    for i, t in zip(d.loc[~bench, "doc_id"], d.loc[~bench, "text"]):
        grams = set(_spans(_norm_tokens(t), n))
        hits = sum(1 for g in grams if g in bset)
        rows.append((int(i), np.int64(len(grams)), np.int64(hits),
                     np.int64(hits * 1_000_000 // len(grams))))
    return pd.DataFrame(rows, columns=["doc", "n_ngrams", "n_hits",
                                       "hit_micro_frac"])


def r_dedup_spans(sf_dir, k=4, min_docs=2):
    d = _read(sf_dir, "documents")
    per_doc = {int(i): _spans(_norm_tokens(t), k)
               for i, t in zip(d["doc_id"], d["text"])}
    docs_of: dict = {}
    for i, sp in per_doc.items():
        for g in set(sp):
            docs_of[g] = docs_of.get(g, 0) + 1
    dup = {g for g, c in docs_of.items() if c >= min_docs}
    rows = []
    for i, sp in per_doc.items():
        nd = sum(1 for g in sp if g in dup)
        rows.append((i, np.int64(len(sp)), np.int64(nd),
                     np.floor(1_000_000 * nd / len(sp)) / 1_000_000))
    return pd.DataFrame(rows, columns=["doc", "n_spans",
                                       "n_dup_spans", "dup_frac"])


def r_impute_median(sf_dir):
    ev = _read(sf_dir, "events")
    cents = np.floor(ev["value"] * 100)
    cents = pd.Series(np.where(ev["event_id"] % 11 == 0, np.nan,
                               cents))
    base = pd.DataFrame({"event_id": ev["event_id"],
                         "event_type": ev["event_type"],
                         "cents": cents})
    med = base.groupby("event_type")["cents"].transform(
        lambda s: np.percentile(s.dropna().to_numpy(), 50,
                                method="linear"))
    return pd.DataFrame({"event_id": base["event_id"],
                         "event_type": base["event_type"],
                         "cents_filled": base["cents"].fillna(med)})


def r_events_funnel(sf_dir, within_us=7 * 24 * 3600 * 1_000_000):
    ev = _read(sf_dir, "events")
    t = ev["ts"].astype("int64")
    e = pd.DataFrame({"u": ev["user_id"], "et": ev["event_type"],
                      "t": t})
    s0 = e[e["et"] == "view"].groupby("u")["t"].min()
    c = e[e["et"] == "click"].merge(s0.rename("t0"), left_on="u",
                                    right_index=True)
    s1 = (c[(c["t"] >= c["t0"]) & (c["t"] <= c["t0"] + within_us)]
          .groupby("u")["t"].min())
    p = e[e["et"] == "purchase"].merge(s1.rename("t1"), left_on="u",
                                       right_index=True)
    s2 = (p[(p["t"] >= p["t1"]) & (p["t"] <= p["t1"] + within_us)]
          .groupby("u")["t"].min())
    nv, nc, np_ = len(s0), len(s1), len(s2)
    return pd.DataFrame({
        "n_view": [np.int64(nv)], "n_click": [np.int64(nc)],
        "n_purchase": [np.int64(np_)],
        "conversion": [np.floor(1_000_000 * np_ / nv) / 1_000_000]})


def r_events_resample(sf_dir, bucket_us=3600 * 1_000_000):
    ev = _read(sf_dir, "events")
    bucket = (ev["ts"].astype("int64") // bucket_us).astype(np.int64)
    df = pd.DataFrame({"event_type": ev["event_type"],
                       "bucket": bucket,
                       "mi": _micros(ev["value"])})
    a = (df.groupby(["event_type", "bucket"], as_index=False)
           .agg(n_events=("mi", "size"), s=("mi", "sum")))
    a["total"] = _floorn(a.pop("s").to_numpy() / 1e6, 100)
    lo, hi = int(bucket.min()), int(bucket.max())
    scaffold = pd.MultiIndex.from_product(
        [sorted(df["event_type"].unique()), range(lo, hi + 1)],
        names=["event_type", "bucket"]).to_frame(index=False)
    out = scaffold.merge(a, on=["event_type", "bucket"], how="left")
    out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
    out["total"] = out["total"].fillna(0.0)
    out["bucket"] = out["bucket"].astype(np.int64)
    return out


def r_lineitem_corr(sf_dir):
    li = _read(sf_dir, "lineitem")
    x = li["l_quantity"].astype(np.int64)
    y = np.floor(li["l_extendedprice"] * 100).astype(np.int64)
    rows = []
    for rf, idx in li.groupby("l_returnflag").groups.items():
        xi, yi = x[idx].to_numpy(), y[idx].to_numpy()
        n = len(xi)
        sx, sy = int(xi.sum()), int(yi.sum())
        sxy = int((xi * yi).sum())
        sxx, syy = int((xi * xi).sum()), int((yi * yi).sum())
        vx = float(n) * float(sxx) - float(sx) * float(sx)
        vy = float(n) * float(syy) - float(sy) * float(sy)
        corr = (None if vx <= 0 or vy <= 0 else
                np.int64(np.floor(
                    1_000_000 * (float(n) * float(sxy)
                                 - float(sx) * float(sy))
                    / (np.sqrt(vx) * np.sqrt(vy)))))
        rows.append((rf, np.int64(n), corr))
    return pd.DataFrame(rows, columns=["l_returnflag", "n",
                                       "corr_micro"])


def r_histogram_equidepth(sf_dir, bins=8):
    li = _read(sf_dir, "lineitem")
    x = li["l_extendedprice"].dropna().to_numpy(dtype=np.float64)
    ps = [100 * i / bins for i in range(1, bins)]
    bs = [np.percentile(x, p, method="linear") for p in ps]
    blo, bhi = x.min(), x.max()
    bucket = np.sum(x[:, None] > np.asarray(bs)[None, :], axis=1)
    rows = []
    for b in sorted(set(bucket.tolist())):
        lo = blo if b == 0 else bs[b - 1]
        hi = bhi if b == bins - 1 else bs[b]
        rows.append((np.int64(b), np.floor(lo * 10000) / 10000,
                     np.floor(hi * 10000) / 10000,
                     np.int64((bucket == b).sum())))
    return pd.DataFrame(rows, columns=["bucket", "lo", "hi", "n"])


def r_group_topk(sf_dir, k=3):
    o = _read(sf_dir, "orders")
    df = pd.DataFrame({
        "o_orderpriority": o["o_orderpriority"],
        "ord": np.floor(o["o_totalprice"] * 100).astype(np.int64),
        "id": o["o_orderkey"].astype(np.int64)})
    df = df.sort_values(["o_orderpriority", "ord", "id"],
                        ascending=[True, False, True],
                        kind="mergesort")
    df["rank"] = (df.groupby("o_orderpriority").cumcount() + 1) \
        .astype(np.int64)
    return df[df["rank"] <= k][["o_orderpriority", "rank", "id",
                                "ord"]]


def r_shard_assignment(sf_dir, tokens_per_shard=2000):
    d = _read(sf_dir, "documents").sort_values("doc_id",
                                               kind="mergesort")
    trimmed = d["text"].str.strip()
    n_tok = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t))) \
        .to_numpy(dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    shard = start // tokens_per_shard
    g = (pd.DataFrame({"shard": shard.astype(np.int64),
                       "n_tok": n_tok})
         .groupby("shard", as_index=False)
         .agg(n_docs=("n_tok", "size"), tokens=("n_tok", "sum")))
    g["n_docs"] = g["n_docs"].astype(np.int64)
    g["tokens"] = g["tokens"].astype(np.int64)
    return g


def r_merge_upsert(sf_dir):
    o = _read(sf_dir, "orders")
    t = pd.DataFrame({
        "o_orderkey": o["o_orderkey"].astype(np.int64),
        "o_custkey": o["o_custkey"].astype(np.int64),
        "o_totalprice": _floor2(o["o_totalprice"]),
        "o_orderstatus": o["o_orderstatus"]})
    upd = t[t["o_orderkey"] % 10 == 0].copy()
    upd["o_totalprice"] = np.floor(upd["o_totalprice"] * 1.1 * 100) \
        / 100
    upd["o_orderstatus"] = "U"
    new = t[t["o_orderkey"] % 97 == 0].copy()
    new["o_orderkey"] = new["o_orderkey"] + 100_000_000
    new["o_totalprice"] = 42.0
    new["o_orderstatus"] = "N"
    src = pd.concat([upd, new], ignore_index=True)
    src["batch_tag"] = "b1"
    out = t.merge(src, on="o_orderkey", how="outer",
                  suffixes=("", "_s"), indicator=True)
    hit = out["_merge"] != "left_only"
    for c in ("o_custkey", "o_totalprice", "o_orderstatus"):
        out[c] = out[c + "_s"].where(hit, out[c])
    out["batch_tag"] = out["batch_tag"].where(hit, None)
    out["o_custkey"] = out["o_custkey"].astype(np.int64)
    return out[["o_orderkey", "o_custkey", "o_totalprice",
                "o_orderstatus", "batch_tag"]]


def r_quality_expectations(sf_dir):
    o = _read(sf_dir, "orders")
    c = _read(sf_dir, "customer")
    total = np.int64(len(o))
    pri_ok = o["o_orderpriority"].str.match("^[1-5]-")
    rows = [
        ("not_null:o_custkey", int(o["o_custkey"].isna().sum())),
        ("range:o_totalprice",
         int((o["o_totalprice"].isna() | (o["o_totalprice"] < 0.0)
              | (o["o_totalprice"] > 100000.0)).sum())),
        ("regex:o_orderpriority",
         int((o["o_orderpriority"].isna() | ~pri_ok).sum())),
        ("in_set:o_orderstatus",
         int((o["o_orderstatus"].isna()
              | ~o["o_orderstatus"].isin(["O", "F", "P"])).sum())),
        ("unique:o_orderkey",
         int(o["o_orderkey"].notna().sum()
             - o["o_orderkey"].nunique())),
        ("fk:o_custkey",
         int((o["o_custkey"].notna()
              & ~o["o_custkey"].isin(set(c["c_custkey"]))).sum())),
    ]
    return pd.DataFrame(
        [(r, np.int64(v), total, v == 0) for r, v in rows],
        columns=["rule", "violations", "total", "ok"])


def r_pii_scan(sf_dir):
    d = _read(sf_dir, "documents")
    contact = [
        (f"reach me: user{i}@corp.example.com or 10.0.0.{i % 256}"
         if i % 5 == 0 else "no contact info")
        for i in d["doc_id"]]
    cols = {"text": d["text"].tolist(), "contact": contact}
    rows = []
    for name, vals in cols.items():
        rec = {"column": name, "n_rows": np.int64(len(vals))}
        for tag, (pat, _) in zip(("email", "ipv4", "phone"),
                                 _PII_REPLAY):
            hits = [len(pat.findall(v)) for v in vals]
            rec[f"{tag}_rows"] = np.int64(sum(1 for h in hits if h))
            rec[f"{tag}_hits"] = np.int64(sum(hits))
        rows.append(rec)
    return pd.DataFrame(rows)


def _postings(sf_dir):
    """(doc -> {term: tf}) over non-empty normalized tokens."""
    d = _read(sf_dir, "documents")
    p = {}
    for i, t in zip(d["doc_id"], d["text"]):
        tfs: dict = {}
        for tok in _norm_tokens(t):
            if tok != "":
                tfs[tok] = tfs.get(tok, 0) + 1
        p[int(i)] = tfs
    return d, p


def r_sim_sparse_topk(sf_dir, k=5):
    d, p = _postings(sf_dir)
    n2 = {i: sum(v * v for v in tfs.values()) for i, tfs in p.items()}
    inv: dict = {}
    for i, tfs in p.items():
        for term, tf in tfs.items():
            inv.setdefault(term, []).append((i, tf))
    rows = []
    for q in [i for i in p if i % 101 == 0]:
        dots: dict = {}
        for term, tfq in p[q].items():
            for cdoc, tfc in inv[term]:
                if cdoc != q:
                    dots[cdoc] = dots.get(cdoc, 0) + tfq * tfc
        scored = sorted(
            ((float(dot * dot) / float(n2[q] * n2[c]), c, dot)
             for c, dot in dots.items()),
            key=lambda s: (-s[0], s[1]))
        for rk, (score, c, dot) in enumerate(scored[:k], 1):
            rows.append((q, c, np.int64(dot),
                         np.floor(score * 1_000_000) / 1_000_000,
                         np.int64(rk)))
    return pd.DataFrame(rows, columns=["q_doc", "c_doc", "dot",
                                       "score", "rank"])


def r_sim_bm25(sf_dir, k=5):
    d, p = _postings(sf_dir)
    dl = {i: sum(tfs.values()) for i, tfs in p.items()}
    n_docs = len(dl)
    total_len = sum(dl.values())
    df: dict = {}
    inv: dict = {}
    for i, tfs in p.items():
        for term in tfs:
            df[term] = df.get(term, 0) + 1
            inv.setdefault(term, []).append(i)
    rows = []
    for q in [i for i in p if i % 101 == 0]:
        scores: dict = {}
        for term in p[q]:
            f = df[term]
            for c in inv[term]:
                if c == q:
                    continue
                tf = p[c][term]
                # rational BM25 (k1=1.2, b=0.75 folded into integer
                # coefficients), per-term micro contribution
                contrib = int(np.floor(
                    1_000_000.0
                    * (float(2 * n_docs - 2 * f + 1)
                       * float(22 * tf * total_len))
                    / (float(2 * f + 1)
                       * float(10 * tf * total_len + 3 * total_len
                               + 9 * dl[c] * n_docs))))
                scores[c] = scores.get(c, 0) + contrib
        ranked = sorted(scores.items(), key=lambda s: (-s[1], s[0]))
        for rk, (c, s) in enumerate(ranked[:k], 1):
            rows.append((q, c, np.int64(s), np.int64(rk)))
    return pd.DataFrame(rows, columns=["q_doc", "c_doc",
                                       "bm25_micro", "rank"])


def r_text_tfidf(sf_dir):
    d, p = _postings(sf_dir)
    dl = {i: sum(tfs.values()) for i, tfs in p.items()}
    df: dict = {}
    for tfs in p.values():
        for term in tfs:
            df[term] = df.get(term, 0) + 1
    n = len(d)  # ALL documents, including token-less ones
    rows = [(i, term,
             np.floor((cnt / dl[i]) * (n / df[term]) * 1_000_000)
             / 1_000_000)
            for i, tfs in p.items() for term, cnt in tfs.items()]
    return pd.DataFrame(rows, columns=["doc", "term", "weight"])


# --------------------------------------------------------------------
# r14 batch 4: the TPC-H remainder (the full 22 are now witnessed)
# + token packing, bigram LM scoring, Welch A/B, LOO target
# encoding, Z-order keys.
# --------------------------------------------------------------------

def r_tpch_q7(sf_dir):
    li = _read(sf_dir, "lineitem")
    o = _read(sf_dir, "orders")[["o_orderkey", "o_custkey"]]
    c = _read(sf_dir, "customer")[["c_custkey", "c_nationkey"]]
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_nationkey"]]
    n = _read(sf_dir, "nation")[["n_nationkey", "n_name"]]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(n.rename(columns={"n_nationkey": "sk",
                                    "n_name": "supp_nation"}),
                  left_on="s_nationkey", right_on="sk")
           .merge(n.rename(columns={"n_nationkey": "ck",
                                    "n_name": "cust_nation"}),
                  left_on="c_nationkey", right_on="ck"))
    keep = (((j["supp_nation"] == "NATION_1")
             & (j["cust_nation"] == "NATION_2"))
            | ((j["supp_nation"] == "NATION_2")
               & (j["cust_nation"] == "NATION_1")))
    j = j[keep]
    j = j.assign(l_year=j["l_shipdate"].dt.year.astype(np.int64),
                 rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    g = (j.groupby(["supp_nation", "cust_nation", "l_year"],
                   as_index=False)["rev"].agg(_dsum))
    g["revenue"] = _floorn(g.pop("rev"), 100)
    return g


def r_tpch_q9(sf_dir):
    li = _read(sf_dir, "lineitem")
    p = _read(sf_dir, "part")[["p_partkey", "p_name",
                               "p_retailprice"]]
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_nationkey"]]
    n = _read(sf_dir, "nation")[["n_nationkey", "n_name"]]
    j = (li.merge(p, left_on="l_partkey", right_on="p_partkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(n, left_on="s_nationkey", right_on="n_nationkey"))
    j = j[j["p_name"].str.contains("gear", regex=False)]
    amount = (j["l_extendedprice"] * (1 - j["l_discount"])
              - j["p_retailprice"] * 0.2 * j["l_quantity"])
    g = (pd.DataFrame({"nation": j["n_name"],
                       "o_year": j["l_shipdate"].dt.year
                       .astype(np.int32),
                       "a": amount})
         .groupby(["nation", "o_year"], as_index=False)["a"]
         .agg(_dsum))
    g["profit"] = _floorn(g.pop("a"), 100)
    return g


def r_tpch_q10(sf_dir):
    li = _read(sf_dir, "lineitem")
    li = li[li["l_returnflag"] == "R"]
    o = _read(sf_dir, "orders")[["o_orderkey", "o_custkey"]]
    c = _read(sf_dir, "customer")[["c_custkey", "c_name",
                                   "c_mktsegment"]]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey"))
    j = j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    g = (j.groupby(["c_custkey", "c_name", "c_mktsegment"],
                   as_index=False)["rev"].agg(_dsum))
    g["revenue"] = _floorn(g.pop("rev"), 100)
    return g.sort_values(["revenue", "c_custkey"],
                         ascending=[False, True]).head(20)


def r_tpch_q11(sf_dir):
    from decimal import ROUND_HALF_UP, Decimal

    li = _read(sf_dir, "lineitem")
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_nationkey"]]
    n = _read(sf_dir, "nation")[["n_nationkey", "n_name"]]
    j = (li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(n, left_on="s_nationkey", right_on="n_nationkey"))
    j = j[j["n_name"] == "NATION_3"]
    q = Decimal("0.000001")
    v = (j["l_extendedprice"] * j["l_quantity"]).map(
        lambda x: Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))
    agg = pd.DataFrame({"l_partkey": j["l_partkey"], "v": v}) \
        .groupby("l_partkey")["v"].agg(lambda s_: sum(s_, Decimal(0)))
    tot = float(sum(agg, Decimal(0)))
    keep = agg[agg.map(float) > 0.002 * tot]
    return pd.DataFrame({
        "l_partkey": keep.index.to_numpy(),
        "value": _floorn([float(x) for x in keep], 100)})


def r_tpch_q15(sf_dir):
    li = _read(sf_dir, "lineitem")
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))]
    rev = li.assign(r=li["l_extendedprice"] * (1 - li["l_discount"])) \
        .groupby("l_suppkey")["r"].agg(_dsum)
    rev = pd.Series(_floorn(rev.to_numpy(), 100), index=rev.index)
    best = rev[rev == rev.max()]
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_name"]]
    out = s[s["s_suppkey"].isin(set(best.index))].copy()
    out["total_revenue"] = out["s_suppkey"].map(best)
    return out


def r_tpch_q16(sf_dir):
    li = _read(sf_dir, "lineitem")[["l_partkey", "l_suppkey"]]
    p = _read(sf_dir, "part")
    p = p[(p["p_brand"] != "Brand#1") & (p["p_size"] <= 25)]
    s = _read(sf_dir, "supplier")
    bad = set(s.loc[s["s_acctbal"] < 0, "s_suppkey"])
    j = li[~li["l_suppkey"].isin(bad)].merge(
        p[["p_partkey", "p_brand", "p_type", "p_size"]],
        left_on="l_partkey", right_on="p_partkey")
    g = (j.groupby(["p_brand", "p_type", "p_size"], as_index=False)
          .agg(supplier_cnt=("l_suppkey", "nunique")))
    g["supplier_cnt"] = g["supplier_cnt"].astype(np.int64)
    return g


def r_tpch_q17(sf_dir):
    li = _read(sf_dir, "lineitem")
    avg = (li.groupby("l_partkey")["l_quantity"]
             .agg(lambda s: _dsum(s) / int(s.notna().sum())))
    p = _read(sf_dir, "part")
    brand = set(p.loc[p["p_brand"] == "Brand#3", "p_partkey"])
    keep = li[li["l_partkey"].isin(brand)].copy()
    keep = keep[keep["l_quantity"]
                < 0.2 * keep["l_partkey"].map(avg)]
    return pd.DataFrame({
        "avg_yearly": [np.floor(_dsum(keep["l_extendedprice"])
                                / 7.0 * 100) / 100],
        "n_rows": [np.int64(len(keep))]})


def r_tpch_q18(sf_dir):
    li = _read(sf_dir, "lineitem")
    per = li.groupby("l_orderkey")["l_quantity"].agg(_dsum)
    big = set(per[per > 250].index)
    o = _read(sf_dir, "orders")
    o = o[o["o_orderkey"].isin(big)]
    c = _read(sf_dir, "customer")[["c_custkey", "c_name"]]
    j = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
          .merge(li[["l_orderkey", "l_quantity"]],
                 left_on="o_orderkey", right_on="l_orderkey"))
    g = (j.groupby(["c_name", "c_custkey", "o_orderkey",
                    "o_orderdate", "o_totalprice"], as_index=False)
          ["l_quantity"].agg(_dsum))
    g["sum_qty"] = _floorn(g.pop("l_quantity"), 100)
    return g.sort_values(["o_totalprice", "o_orderkey"],
                         ascending=[False, True]).head(100)


def r_tpch_q19(sf_dir):
    li = _read(sf_dir, "lineitem")
    p = _read(sf_dir, "part")[["p_partkey", "p_brand", "p_size"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    q, sz, br = j["l_quantity"], j["p_size"], j["p_brand"]
    keep = (((br == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
            | ((br == "Brand#2") & q.between(10, 20)
               & sz.between(1, 10))
            | ((br == "Brand#3") & q.between(20, 30)
               & sz.between(1, 15)))
    j = j[keep]
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    return pd.DataFrame({"revenue": [_floorn(_dsum(rev), 100)[()]],
                         "n_rows": [np.int64(len(j))]})


def r_tpch_q20(sf_dir):
    li = _read(sf_dir, "lineitem")
    p = _read(sf_dir, "part")
    small = set(p.loc[p["p_name"].str.startswith("small"),
                      "p_partkey"])
    w = li[li["l_partkey"].isin(small)
           & (li["l_shipdate"] >= pd.Timestamp("1998-01-01"))
           & (li["l_shipdate"] < pd.Timestamp("1999-01-01"))]
    q98 = (w.groupby(["l_suppkey", "l_partkey"])["l_quantity"]
            .agg(_dsum))
    qall = li.groupby("l_partkey")["l_quantity"].agg(_dsum)
    hit = {sk for (sk, pk), v in q98.items()
           if v > 0.1 * qall[pk]}
    s = _read(sf_dir, "supplier")
    out = s[s["s_suppkey"].isin(hit)][["s_suppkey", "s_name",
                                       "s_acctbal"]].copy()
    out["s_acctbal"] = _floorn(out["s_acctbal"], 100)
    return out


def r_tpch_q21(sf_dir):
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_suppkey",
                                    "l_shipdate"]]
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderdate"]]
    lines = li[["l_orderkey", "l_suppkey"]].drop_duplicates()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late = j[j["l_shipdate"]
             > j["o_orderdate"] + pd.Timedelta(days=60)][
        ["l_orderkey", "l_suppkey"]].drop_duplicates()
    n_sup = lines.groupby("l_orderkey")["l_suppkey"].nunique()
    n_late = late.groupby("l_orderkey")["l_suppkey"].nunique()
    alone = late[late["l_orderkey"].map(n_sup).gt(1)
                 & late["l_orderkey"].map(n_late).eq(1)]
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_name"]]
    g = (alone.merge(s, left_on="l_suppkey", right_on="s_suppkey")
              .groupby("s_name", as_index=False)
              .agg(numwait=("l_orderkey", "size")))
    g["numwait"] = g["numwait"].astype(np.int64)
    return g.sort_values(["numwait", "s_name"],
                         ascending=[False, True]).head(10)


def r_tpch_q22(sf_dir):
    c = _read(sf_dir, "customer")
    pos = c[c["c_acctbal"] > 0]
    avg_bal = _dsum(pos["c_acctbal"]) / len(pos)
    o = _read(sf_dir, "orders")
    big = set(o.loc[o["o_totalprice"] > 400000, "o_custkey"])
    keep = c[(c["c_acctbal"] > avg_bal)
             & ~c["c_custkey"].isin(big)]
    g = (keep.groupby("c_mktsegment", as_index=False)
             .agg(numcust=("c_custkey", "size"),
                  tot=("c_acctbal", _dsum)))
    g["numcust"] = g["numcust"].astype(np.int64)
    g["totacctbal"] = _floorn(g.pop("tot"), 100)
    return g


def r_tpch_q2(sf_dir):
    li = _read(sf_dir, "lineitem")
    mins = li.groupby("l_partkey")["l_extendedprice"].min()
    best = li[li["l_extendedprice"]
              == li["l_partkey"].map(mins)]
    p = _read(sf_dir, "part")[["p_partkey", "p_name", "p_size"]]
    p = p[p["p_size"] <= 15]
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_name"]]
    j = (best.merge(p, left_on="l_partkey", right_on="p_partkey")
             .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    return pd.DataFrame({
        "p_partkey": j["p_partkey"], "p_name": j["p_name"],
        "s_name": j["s_name"],
        "min_price": _floorn(j["l_extendedprice"], 100)})


def _chunks(sf_dir, size=32, stride=28):
    """(doc, chunk_idx, chunk_text, n_tokens) — the text_chunks
    contract (also the packing input): windows of `size` tokens every
    `stride` while the window start is within the doc."""
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        tk = _norm_tokens(t)
        n = len(tk)
        k = 0
        while k * stride <= max(n - 1, 0):
            s = k * stride
            e = min(s + size, n)
            rows.append((int(i), k, " ".join(tk[s:e]), e - s))
            k += 1
    return pd.DataFrame(rows, columns=["doc", "chunk_idx",
                                       "chunk_text", "n_tokens"])


def r_text_pack(sf_dir, seq_len=100):
    ch = _chunks(sf_dir).sort_values(["doc", "chunk_idx"],
                                     kind="mergesort")
    n = ch["n_tokens"].to_numpy(dtype=np.int64)
    st = np.concatenate([[0], np.cumsum(n)[:-1]])
    ch = ch.reset_index(drop=True)
    ch["seq_id"] = (st // seq_len).astype(np.int64)
    ch["seq_offset"] = (st % seq_len).astype(np.int64)
    ch["n_seqs"] = ((st + np.maximum(n, 1) - 1) // seq_len
                    - st // seq_len + 1).astype(np.int32)
    ch["n_tokens"] = ch["n_tokens"].astype(np.int32)
    return ch


def r_text_pack_greedy(sf_dir, cap=100, n_groups=64):
    ch = _chunks(sf_dir)
    ch["grp"] = (ch["doc"] % n_groups).astype(np.int64)
    ch = ch.sort_values(["grp", "doc", "chunk_idx"],
                        kind="mergesort").reset_index(drop=True)
    bins = np.empty(len(ch), dtype=np.int64)
    fills = np.empty(len(ch), dtype=np.int64)
    i = 0
    for _, grp in ch.groupby("grp", sort=False):
        local_bin, fill = 0, 0
        first = True
        for n in grp["n_tokens"]:
            if first:
                fill = int(n)
                first = False
            elif fill > 0 and fill + n > cap:
                local_bin += 1
                fill = int(n)
            else:
                fill += int(n)
            bins[i], fills[i] = local_bin, fill
            i += 1
    ch["bin_id"] = ch["grp"] * 4294967296 + bins
    ch["bin_fill"] = fills
    ch["overflow"] = ch["n_tokens"] > cap
    ch["n_tokens"] = ch["n_tokens"].astype(np.int32)
    return ch[["doc", "chunk_idx", "chunk_text", "n_tokens", "grp",
               "bin_id", "bin_fill", "overflow"]]


def r_quality_lm_score(sf_dir):
    d = _read(sf_dir, "documents")
    per_doc = {}
    bigrams: dict = {}
    contexts: dict = {}
    vocab = set()
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _norm_tokens(t)
        bg = [(a, b) for a, b in zip(toks, toks[1:])
              if a != "" and b != ""]
        per_doc[int(i)] = bg
        for a, b in bg:
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
            contexts[a] = contexts.get(a, 0) + 1
            vocab.add(a)
            vocab.add(b)
    v = len(vocab)
    rows = []
    for i, bg in per_doc.items():
        if not bg:
            continue
        mps = [int(np.floor((bigrams[(a, b)] + 1) * 1_000_000.0
                            / (contexts[a] + v))) for a, b in bg]
        rows.append((i, np.int64(len(mps)), np.int64(sum(mps)),
                     np.int64(sum(mps) // len(mps))))
    return pd.DataFrame(rows, columns=["doc", "n_bigrams",
                                       "sum_micro_p", "avg_micro_p"])


def r_events_ab_welch(sf_dir):
    ev = _read(sf_dir, "events")
    ev = ev[ev["value"].notna()]
    cents = np.floor(ev["value"] * 100).astype(np.int64)
    va = (ev["user_id"] % 2 == 0).to_numpy()
    rows = []
    for et, idx in ev.groupby("event_type").groups.items():
        m = ev.index.isin(idx)
        ca, cb = cents[m & va], cents[m & ~va]
        n_a, n_b = len(ca), len(cb)
        sa, sb = int(ca.sum()), int(cb.sum())
        qa = int((ca.astype(object) * ca.astype(object)).sum())
        qb = int((cb.astype(object) * cb.astype(object)).sum())
        mean_a = np.int64(np.floor(1_000_000 * float(sa) / n_a))
        mean_b = np.int64(np.floor(1_000_000 * float(sb) / n_b))
        se2 = None
        if n_a >= 2 and n_b >= 2:
            va_ = (float(qa) - float(sa) * float(sa) / n_a) / (n_a - 1)
            vb_ = (float(qb) - float(sb) * float(sb) / n_b) / (n_b - 1)
            se2 = va_ / n_a + vb_ / n_b
        t = (None if se2 is None or se2 <= 0 else
             np.int64(np.floor(1_000_000
                               * (float(sa) / n_a - float(sb) / n_b)
                               / np.sqrt(se2))))
        rows.append((et, np.int64(n_a), np.int64(n_b), mean_a,
                     mean_b, t))
    return pd.DataFrame(rows, columns=["event_type", "n_a", "n_b",
                                       "mean_a_micro", "mean_b_micro",
                                       "t_micro"])


def r_target_encode_loo(sf_dir):
    o = _read(sf_dir, "orders")
    y = np.floor(o["o_totalprice"] * 100).astype(np.int64)
    df = pd.DataFrame({"id": o["o_orderkey"].astype(np.int64),
                       "cat": o["o_orderpriority"], "y": y})
    g = df.groupby("cat")["y"]
    n = g.transform("size").astype(object)
    sy = g.transform("sum").astype(object)
    enc = [(1_000_000 * (int(s) - int(v))) // (int(c) - 1)
           if c > 1 else None
           for s, v, c in zip(sy, df["y"], n)]
    # Spark emits a non-null long column on this fixture (every
    # priority has >1 row); only fall back to float64 when a
    # singleton category actually produces a null
    df["enc_loo_micro"] = (np.asarray(enc, dtype=np.int64)
                           if all(e is not None for e in enc)
                           else pd.array(enc, dtype="Int64")
                           .astype("float64"))
    return df


def r_zorder_key(sf_dir, bits=16):
    li = _read(sf_dir, "lineitem")

    def norm(col):
        x = li[col].to_numpy(dtype=np.float64)
        lo, hi = x.min(), x.max()
        span = max(hi - lo, 1.0)
        return np.clip(np.floor((x - lo) / span * 65535),
                       0, 65535).astype(np.int64)

    a, b = norm("l_orderkey"), norm("l_partkey")
    z = np.zeros(len(li), dtype=np.int64)
    for k in range(bits):
        z += ((a >> k) & 1) << (2 * k)
        z += ((b >> k) & 1) << (2 * k + 1)
    return pd.DataFrame({"l_orderkey": li["l_orderkey"],
                         "l_linenumber": li["l_linenumber"],
                         "zkey": z})


# --------------------------------------------------------------------
# r14 batch 5: the relational core remainder (all 8 join types, set
# ops, reshapes, window ranks) + feature engineering (LOCF,
# winsorize, z-score, smoothed target encoding, temporal split,
# Markov) + the last text/curation profiles.
# --------------------------------------------------------------------

def _orders_lineitem(sf_dir, how):
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_linenumber",
                                    "l_quantity"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey",
                how=how)
    return j[["o_orderkey", "o_orderpriority", "l_orderkey",
              "l_linenumber", "l_quantity"]]


def r_join_left(sf_dir):
    return _orders_lineitem(sf_dir, "left")


def r_join_right(sf_dir):
    # lineitem RIGHT JOIN orders == orders LEFT JOIN lineitem
    return _orders_lineitem(sf_dir, "left")


def _orders_with_lineitems(sf_dir, semi):
    o = _read(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    keys = set(_read(sf_dir, "lineitem")["l_orderkey"])
    m = o["o_orderkey"].isin(keys)
    return o[m if semi else ~m]


def r_join_left_semi(sf_dir):
    return _orders_with_lineitems(sf_dir, True)


def r_join_left_anti(sf_dir):
    return _orders_with_lineitems(sf_dir, False)


def r_join_right_semi(sf_dir):
    return _orders_with_lineitems(sf_dir, True)


def r_join_right_anti(sf_dir):
    return _orders_with_lineitems(sf_dir, False)


def r_join_multikey(sf_dir):
    li = _read(sf_dir, "lineitem")[["l_orderkey", "l_linenumber",
                                    "l_quantity"]]
    j = li.merge(li, on=["l_orderkey", "l_linenumber"],
                 suffixes=("_a", "_b"))
    return pd.DataFrame({
        "l_orderkey_l": j["l_orderkey"],
        "l_orderkey_r": j["l_orderkey"],
        "l_linenumber_l": j["l_linenumber"],
        "l_linenumber_r": j["l_linenumber"],
        "qty_l": _floorn(j["l_quantity_a"], 100),
        "qty_r": _floorn(j["l_quantity_b"], 100)})


def r_scan_project(sf_dir):
    return _read(sf_dir, "lineitem")[["l_orderkey", "l_extendedprice",
                                      "l_shipdate"]]


def r_distinct(sf_dir):
    return _read(sf_dir, "customer")[["c_mktsegment",
                                      "c_nationkey"]].drop_duplicates()


def r_intersect(sf_dir):
    c = set(_read(sf_dir, "customer")["c_nationkey"])
    s = set(_read(sf_dir, "supplier")["s_nationkey"])
    return pd.DataFrame({"nationkey": sorted(c & s)})


def r_except(sf_dir):
    c = set(_read(sf_dir, "customer")["c_nationkey"])
    s = set(_read(sf_dir, "supplier")["s_nationkey"])
    return pd.DataFrame({"nationkey": sorted(c - s)}).astype(
        {"nationkey": np.int64})


def r_case_when(sf_dir):
    o = _read(sf_dir, "orders")
    bucket = np.where(o["o_totalprice"] > 300000.0, "high",
                      np.where(o["o_totalprice"] > 100000.0, "mid",
                               "low"))
    status = o["o_orderstatus"].fillna("?")
    g = (pd.DataFrame({"price_bucket": bucket, "status": status})
         .groupby(["price_bucket", "status"], as_index=False)
         .agg(n=("status", "size")))
    g["n"] = g["n"].astype(np.int64)
    return g


def r_string_functions(sf_dir):
    c = _read(sf_dir, "customer")
    return pd.DataFrame({
        "c_custkey": c["c_custkey"],
        "seg_upper": c["c_mktsegment"].str.upper(),
        "name_prefix": c["c_name"].str[:10],
        "name_len": c["c_name"].str.len().astype(np.int32),
        "joined": c["c_mktsegment"] + "|" + c["c_name"],
        "has_42": c["c_name"].str.contains("0042", regex=False)})


def r_unpivot(sf_dir):
    li = _read(sf_dir, "lineitem")
    parts = [pd.DataFrame({"l_orderkey": li["l_orderkey"],
                           "l_linenumber": li["l_linenumber"],
                           "measure": m, "value": li[m]})
             for m in ("l_quantity", "l_extendedprice", "l_discount")]
    return pd.concat(parts, ignore_index=True)


def r_grouping_sets(sf_dir):
    # GROUPING SETS ((rf,ls),(rf),(ls),()) == CUBE(rf,ls)
    return r_groupby_cube(sf_dir)


def r_window_ntile(sf_dir, tiles=4):
    ev = _read(sf_dir, "events")
    df = pd.DataFrame({
        "event_id": ev["event_id"], "event_type": ev["event_type"],
        "cents": np.floor(ev["value"] * 100).astype(np.int64)})
    df = df.sort_values(["event_type", "cents", "event_id"],
                        kind="mergesort").reset_index(drop=True)
    q = np.empty(len(df), dtype=np.int32)
    cume = np.empty(len(df), dtype=np.int64)
    pr = np.empty(len(df), dtype=np.int64)
    i = 0
    for _, grp in df.groupby("event_type", sort=False):
        n = len(grp)
        base, extra = divmod(n, tiles)
        tile = np.repeat(np.arange(1, tiles + 1),
                         [base + (1 if t < extra else 0)
                          for t in range(tiles)])
        rn = np.arange(1, n + 1)
        q[i:i + n] = tile[:n]
        # full order is unique (event_id tie-break) -> no peers
        cume[i:i + n] = np.floor(rn / n * 10000).astype(np.int64)
        pr[i:i + n] = (np.floor((rn - 1) / (n - 1) * 10000)
                       .astype(np.int64) if n > 1
                       else np.zeros(n, dtype=np.int64))
        i += n
    df["quartile"], df["cume_bp"], df["pr_bp"] = q, cume, pr
    return df


def r_events_histogram(sf_dir):
    ev = _read(sf_dir, "events")
    df = pd.DataFrame({
        "bucket": np.floor(ev["value"] / 10).astype(np.int64),
        "mi": _micros(ev["value"])})
    g = (df.groupby("bucket", as_index=False)
           .agg(n=("mi", "size"), s=("mi", "sum")))
    g["n"] = g["n"].astype(np.int64)
    g["sum_value"] = _floorn(g.pop("s").to_numpy() / 1e6, 10000)
    return g


def r_text_fingerprint(sf_dir):
    d = _read(sf_dir, "documents")
    fp = _normalize_text(d["text"]).map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    return pd.DataFrame({"doc_id": d["doc_id"], "fp": fp})


def r_vocab_oov(sf_dir, top_k=100):
    d = _read(sf_dir, "documents")
    counts: dict = {}
    for t in d.loc[d["source"] == "src0", "text"]:
        for tok in _norm_tokens(t):
            if tok != "":
                counts[tok] = counts.get(tok, 0) + 1
    vocab = {t for t, _ in sorted(counts.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:top_k]}
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = [tok for tok in _norm_tokens(t) if tok != ""]
        oov = sum(1 for tok in toks if tok not in vocab)
        rows.append((int(i), np.int64(len(toks)), np.int64(oov),
                     np.int64(np.floor(1_000_000.0 * oov
                                       / len(toks)))
                     if toks else None))
    out = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_oov",
                                      "oov_micro"])
    if out["oov_micro"].notna().all():
        out["oov_micro"] = out["oov_micro"].astype(np.int64)
    return out


def r_text_token_stats(sf_dir):
    d = _read(sf_dir, "documents")
    per_doc = {int(i): [t for t in _norm_tokens(t) if t != ""]
               for i, t in zip(d["doc_id"], d["text"])}
    tc: dict = {}
    for toks in per_doc.values():
        for t in toks:
            tc[t] = tc.get(t, 0) + 1
    tot = sum(tc.values())
    rows = []
    for i, toks in per_doc.items():
        if not toks:
            continue
        cnt = len(toks)
        sum_tc = sum(tc[t] for t in toks)
        rare = sum(1 for t in toks if tc[t] <= 2)
        rows.append((
            i, np.int64(cnt),
            np.floor(float(sum_tc) / cnt / tot * 100_000_000)
            / 100_000_000,
            np.floor(float(rare) / cnt * 1_000_000) / 1_000_000))
    return pd.DataFrame(rows, columns=["doc", "n_tokens",
                                       "mean_tok_freq", "rare_frac"])


def r_locf_fill(sf_dir):
    ev = _read(sf_dir, "events")
    vm = np.floor(ev["value"] * 1_000_000)
    knocked = ev["event_id"].map(
        lambda i: _md5_hash64(str(i)) % 5 == 0)
    v = pd.Series(np.where(knocked, np.nan, vm), index=ev.index)
    df = pd.DataFrame({"event_id": ev["event_id"],
                       "user_id": ev["user_id"], "ts": ev["ts"],
                       "v": v})
    df = df.sort_values(["user_id", "ts", "event_id"],
                        kind="mergesort")
    df["filled"] = df.groupby("user_id")["v"].ffill()
    return df[["event_id", "user_id", "v", "filled"]]


def r_winsorize_value(sf_dir, lo=0.05, hi=0.95):
    ev = _read(sf_dir, "events")
    x = np.floor(ev["value"] * 1_000_000).astype(np.int64)
    df = pd.DataFrame({"event_type": ev["event_type"], "x": x})
    rows = []
    for et, grp in df.groupby("event_type"):
        xs = np.sort(grp["x"].to_numpy())
        n = len(xs)
        blo = xs[max(int(np.ceil(lo * n)), 1) - 1]
        bhi = xs[max(int(np.ceil(hi * n)), 1) - 1]
        w = np.clip(grp["x"].to_numpy(), blo, bhi)
        rows.append(pd.DataFrame({"event_type": et, "x": grp["x"],
                                  "vm_w": w}))
    return pd.concat(rows, ignore_index=True)


def r_standard_scale(sf_dir):
    ev = _read(sf_dir, "events")
    x = np.floor(ev["value"] * 1_000_000).astype(np.int64)
    df = pd.DataFrame({"event_type": ev["event_type"], "x": x})
    out = []
    for et, grp in df.groupby("event_type"):
        xs = grp["x"].to_numpy()
        n = len(xs)
        s = int(xs.sum())
        qsum = sum(int(v) * int(v) for v in xs)  # exact (HUGEINT)
        var_term = float(n * qsum - s * s)
        z = [np.int64(np.floor(1_000_000.0 * float(n * int(v) - s)
                               / np.sqrt(var_term)))
             if n >= 2 and var_term > 0 else None for v in xs]
        out.append(pd.DataFrame({"event_type": et, "x": xs,
                                 "z_micro": z}))
    res = pd.concat(out, ignore_index=True)
    if res["z_micro"].notna().all():
        res["z_micro"] = res["z_micro"].astype(np.int64)
    return res


def r_target_encode(sf_dir, m=50):
    o = _read(sf_dir, "orders")
    cents = np.floor(o["o_totalprice"] * 100).astype(np.int64)
    df = pd.DataFrame({"cat": o["o_orderpriority"], "y": cents})
    gn, gsy = len(df), int(df["y"].sum())
    g = df.groupby("cat", as_index=False).agg(n=("y", "size"),
                                              sy=("y", "sum"))
    g["mean_micro"] = [
        np.int64((1_000_000 * (int(sy) * gn + m * gsy))
                 // (gn * (int(n) + m)))
        for n, sy in zip(g["n"], g["sy"])]
    g["n"] = g["n"].astype(np.int64)
    return g[["cat", "n", "mean_micro"]]


def r_temporal_split(sf_dir, embargo_us=3600 * 1_000_000):
    ev = _read(sf_dir, "events")
    us = ev["ts"].astype("int64")
    cut = int(np.floor(np.percentile(us.to_numpy(), 80,
                                     method="linear")))
    split = np.where(us >= cut, "test",
                     np.where(us < cut - embargo_us, "train",
                              "embargo"))
    g = (pd.DataFrame({"split": split, "us": us,
                       "user_id": ev["user_id"]})
         .groupby("split", as_index=False)
         .agg(n=("us", "size"), n_users=("user_id", "nunique"),
              min_us=("us", "min"), max_us=("us", "max")))
    for c in ("n", "n_users", "min_us", "max_us"):
        g[c] = g[c].astype(np.int64)
    return g


def r_markov_transitions(sf_dir):
    ev = _read(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort")
    dst = ev.groupby("user_id")["event_type"].shift(-1)
    df = pd.DataFrame({"src": ev["event_type"], "dst": dst}).dropna()
    cnt = (df.groupby(["src", "dst"], as_index=False)
             .agg(n=("dst", "size")))
    tot = cnt.groupby("src")["n"].transform("sum")
    cnt["n"] = cnt["n"].astype(np.int64)
    cnt["p_micro"] = ((1_000_000 * cnt["n"]) // tot).astype(np.int64)
    return cnt


def r_tpch_q8(sf_dir):
    li = _read(sf_dir, "lineitem")
    p = _read(sf_dir, "part")
    p = p[p["p_type"] == "ECONOMY"][["p_partkey"]]
    o = _read(sf_dir, "orders")
    o = o[(o["o_orderdate"] >= pd.Timestamp("1995-01-01"))
          & (o["o_orderdate"] <= pd.Timestamp("1996-12-31"))]
    c = _read(sf_dir, "customer")[["c_custkey", "c_nationkey"]]
    n = _read(sf_dir, "nation")
    r = _read(sf_dir, "region")
    asia = set(r.loc[r["r_name"] == "ASIA", "r_regionkey"])
    nc = n[n["n_regionkey"].isin(asia)][["n_nationkey"]]
    s = _read(sf_dir, "supplier")[["s_suppkey", "s_nationkey"]]
    ns = n[["n_nationkey", "n_name"]].rename(
        columns={"n_nationkey": "sk", "n_name": "supp_nation"})
    j = (li.merge(p, left_on="l_partkey", right_on="p_partkey")
           .merge(o[["o_orderkey", "o_custkey", "o_orderdate"]],
                  left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(nc, left_on="c_nationkey", right_on="n_nationkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(ns, left_on="s_nationkey", right_on="sk"))
    vol = j["l_extendedprice"] * (1 - j["l_discount"])
    df = pd.DataFrame({
        "o_year": j["o_orderdate"].dt.year.astype(np.int64),
        "vol": vol,
        "n1": vol.where(j["supp_nation"] == "NATION_1", 0.0)})
    g = df.groupby("o_year", as_index=False).agg(
        num=("n1", _dsum), den=("vol", _dsum))
    g["mkt_share"] = _floorn(g["num"] / g["den"], 10000)
    return g[["o_year", "mkt_share"]]


def r_dedup_jaccard_prefix(sf_dir, threshold=0.6, n=3):
    d = _read(sf_dir, "documents")
    sh = {int(i): {g for g in _spans(_norm_tokens(t), n) if g != ""}
          for i, t in zip(d["doc_id"], d["text"])}
    inv: dict = {}
    for i, s in sh.items():
        for g in s:
            inv.setdefault(g, []).append(i)
    common: dict = {}
    for ids in inv.values():
        ids.sort()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                kk = (ids[ai], ids[bi])
                common[kk] = common.get(kk, 0) + 1
    rows = []
    for (a, b), c in common.items():
        union = len(sh[a]) + len(sh[b]) - c
        if c / union >= threshold:
            rows.append((a, b,
                         np.floor(1_000_000 * c / union) / 1_000_000))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jacc"])


def r_curation_report(sf_dir):
    d = _read(sf_dir, "documents")
    trimmed = d["text"].str.strip()
    words = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t)))
    rules = [
        ("min_words", words >= 10),
        ("is_en", d["lang"] == "en"),
        ("max_chars", d["n_chars"] <= 800),
        ("no_brace", ~d["text"].str.contains("{", regex=False)),
    ]
    reasons = [[name for name, ok in rules
                if not bool(ok.iloc[i])] for i in range(len(d))]
    return pd.DataFrame({
        "doc_id": d["doc_id"],
        "keep": [len(r) == 0 for r in reasons],
        "n_failed": np.asarray([len(r) for r in reasons],
                               dtype=np.int32),
        "fail_reasons": [",".join(r) for r in reasons]})


# --------------------------------------------------------------------
# r14 batch 6: md5-deterministic sampling family, sequence mining,
# OLS trend, purged CV, edit-distance dedup, end-to-end corpus dedup,
# embedding cosine baselines, incremental rollup/leaderboard, salted
# join neutrality, keyword extraction, concentration audit.
# --------------------------------------------------------------------

def r_events_top_paths(sf_dir, k=20):
    ev = _read(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort")
    g = ev.groupby("user_id")["event_type"]
    df = pd.DataFrame({"s1": ev["event_type"], "s2": g.shift(-1),
                       "s3": g.shift(-2)}).dropna()
    cnt = (df.groupby(["s1", "s2", "s3"], as_index=False)
             .agg(n=("s1", "size")))
    cnt["n"] = cnt["n"].astype(np.int64)
    return cnt.sort_values(["n", "s1", "s2", "s3"],
                           ascending=[False, True, True, True],
                           kind="mergesort").head(k)


def r_events_transitions(sf_dir):
    ev = _read(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort")
    prev = ev.groupby("user_id")["event_type"].shift(1)
    df = pd.DataFrame({"prev_type": prev,
                       "event_type": ev["event_type"]}).dropna()
    g = (df.groupby(["prev_type", "event_type"], as_index=False)
           .agg(n=("event_type", "size")))
    g["n"] = g["n"].astype(np.int64)
    return g


def r_events_trend(sf_dir):
    ev = _read(sf_dir, "events")
    ev = ev[ev["value"].notna() & ev["ts"].notna()]
    us = ev["ts"].astype("int64")
    t0 = int(us.min())
    x = ((us - t0) // 1_000_000).astype(np.int64)
    y = np.floor(ev["value"] * 100).astype(np.int64)
    rows = []
    for et, idx in ev.groupby("event_type").groups.items():
        xi = x[idx].to_numpy()
        yi = y[idx].to_numpy()
        n = len(xi)
        sx, sy = int(xi.sum()), int(yi.sum())
        sxy = int((xi * yi).sum())
        sxx = sum(int(v) * int(v) for v in xi)  # exact
        den = float(n) * float(sxx) - float(sx) * float(sx)
        slope = inter = None
        if den != 0:
            slope = np.int64(np.floor(
                1_000_000 * (float(n) * float(sxy)
                             - float(sx) * float(sy)) / den))
            inter = np.int64(np.floor(
                1_000_000 * (float(sy) * float(sxx)
                             - float(sx) * float(sxy)) / den))
        rows.append((et, np.int64(n), slope, inter))
    return pd.DataFrame(rows, columns=["event_type", "n",
                                       "slope_micro",
                                       "intercept_micro"])


def r_mixture_sample(sf_dir):
    d = _read(sf_dir, "documents")
    rates = {"src1": 2500, "src3": 0, "src5": 7500}
    cut = d["source"].map(lambda s: rates.get(s, 5000))
    keep = d["doc_id"].map(_md5_bucket) < cut
    return d.loc[keep, ["doc_id", "source"]]


def r_stratified_sample(sf_dir, n_per_group=5):
    d = _read(sf_dir, "documents").copy()
    d["hv"] = d["doc_id"].map(lambda i: _md5_hash64(str(i)))
    d = d.sort_values(["source", "hv", "doc_id"], kind="mergesort")
    out = d.groupby("source").head(n_per_group)
    return out[["doc_id", "source"]]


def r_weighted_sample(sf_dir, k=10, max_weight=32):
    d = _read(sf_dir, "documents")
    trimmed = d["text"].str.strip()
    w = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t))) \
        .astype(np.int32)
    tickets = [
        min(_md5_hash64(f"{i}#{t}")
            for t in range(1, max(min(int(ww), max_weight), 1) + 1))
        for i, ww in zip(d["doc_id"], w)]
    df = pd.DataFrame({"doc_id": d["doc_id"], "source": d["source"],
                       "w": w, "tk": tickets})
    df = df.sort_values(["source", "tk", "doc_id"], kind="mergesort")
    return df.groupby("source").head(k)[["doc_id", "source", "w"]]


def r_negative_sample(sf_dir, k=2, buckets=64):
    d = _read(sf_dir, "documents")
    ids = d["doc_id"].astype(int).tolist()
    cand_bucket: dict = {}
    for c in ids:
        cand_bucket.setdefault(
            _md5_hash64(str(c), seed=1) % buckets, []).append(c)
    rows = []
    for a in ids:
        for slot in range(k):
            b = _md5_hash64(f"{a}#{slot}") % buckets
            cands = [c for c in cand_bucket.get(b, ()) if c != a]
            if not cands:
                continue
            best = min(cands, key=lambda c: (
                _md5_hash64(f"{a}#{slot}#{c}", seed=2), c))
            rows.append((a, slot, best))
    return pd.DataFrame(rows, columns=["anchor_id", "slot",
                                       "neg_id"]).astype(np.int64)


def r_purged_kfold(sf_dir, folds=5, embargo_us=3600 * 1_000_000):
    ev = _read(sf_dir, "events")
    us = ev["ts"].astype("int64").to_numpy()
    cs = [int(np.floor(np.percentile(us, 100 * q / folds,
                                     method="linear")))
          for q in range(1, folds)]
    fold = np.sum(us[:, None] >= np.asarray(cs)[None, :], axis=1)
    rows = []
    for eid, u, f in zip(ev["event_id"], us, fold):
        for cv in range(folds):
            f_lo = None if cv == 0 else cs[cv - 1]
            f_hi = None if cv == folds - 1 else cs[cv]
            if f == cv:
                role = "test"
            elif ((f_lo is None or u >= f_lo - embargo_us)
                  and (f_hi is None or u < f_hi + embargo_us)):
                role = "purged"
            else:
                role = "train"
            rows.append((int(eid), int(f), cv, role))
    out = pd.DataFrame(rows, columns=["event_id", "fold", "cv_fold",
                                      "role"])
    for c in ("event_id", "fold", "cv_fold"):
        out[c] = out[c].astype(np.int64)
    return out


def _lev_le_1(a: str, b: str) -> bool:
    """Levenshtein(a, b) <= 1, O(len) specialized check."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # one insertion into a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def r_dedup_editdist(sf_dir, max_dist=1):
    p = _read(sf_dir, "part")
    names = sorted(set(p["p_name"]))
    norm = {nm: re.sub(_WS + "+", " ", nm.lower()).strip()
            for nm in names}
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if abs(len(norm[a]) - len(norm[b])) <= max_dist \
                    and _lev_le_1(norm[a], norm[b]):
                dist = 0 if norm[a] == norm[b] else 1
                rows.append((a, b, np.int32(dist)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "dist"])


def _capped_jaccard_pairs(sf_dir, n=3, threshold=0.5):
    """(doc_a < doc_b, floored-1e4 jaccard >= threshold) with the
    whole-corpus max_df stop-shingle cap — dedup_corpus' pair set."""
    d = _read(sf_dir, "documents")
    sh = {int(i): set(_spans(_norm_tokens(t), n))
          for i, t in zip(d["doc_id"], d["text"])}
    cap = max(100, int(np.ceil(0.01 * len(d))))
    dfc: dict = {}
    for s in sh.values():
        for g in s:
            dfc[g] = dfc.get(g, 0) + 1
    inv: dict = {}
    for i, s in sh.items():
        for g in s:
            if dfc[g] <= cap:
                inv.setdefault(g, []).append(i)
    common: dict = {}
    for ids in inv.values():
        ids.sort()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                kk = (ids[ai], ids[bi])
                common[kk] = common.get(kk, 0) + 1
    pairs = []
    for (a, b), c in common.items():
        jac = np.floor(c / (len(sh[a]) + len(sh[b]) - c) * 10000) \
            / 10000
        if jac >= threshold:
            pairs.append((a, b))
    return d, pairs


def r_dedup_corpus(sf_dir):
    d, pairs = _capped_jaccard_pairs(sf_dir)
    losers = {b for _, b in pairs}
    keep = ~d["doc_id"].isin(losers)
    return d.loc[keep, ["doc_id", "source", "n_chars"]]


def _cosine_mat(e: pd.DataFrame):
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    return m, np.sqrt((m * m).sum(axis=1))


def r_dedup_embedding_cosine(sf_dir, threshold=0.4):
    e = _read(sf_dir, "embeddings")
    keep = e["vec_id"].map(_md5_bucket) < 5000
    e = e[keep].reset_index(drop=True)
    m, nrm = _cosine_mat(e)
    ids = e["vec_id"].to_numpy()
    rows = []
    for i in range(len(e)):
        dots = m[i + 1:] @ m[i]
        cos = np.floor(dots / (nrm[i] * nrm[i + 1:]) * 10000) / 10000
        for j in np.nonzero(cos >= threshold)[0]:
            rows.append((int(ids[i]), int(ids[i + 1 + j]), cos[j]))
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])
    # the SQL pairs on vec_id < vec_id; our row order isn't id-sorted,
    # so normalize each pair
    flip = out["id_a"] > out["id_b"]
    out.loc[flip, ["id_a", "id_b"]] = \
        out.loc[flip, ["id_b", "id_a"]].to_numpy()
    return out


def r_sim_knn_join(sf_dir, k=3):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m, nrm = _cosine_mat(e)
    ids = e["vec_id"].to_numpy()
    qmask = e["vec_id"].map(_md5_bucket) < 2500
    rows = []
    for qi in np.nonzero(qmask.to_numpy())[0]:
        cos = np.floor(m @ m[qi] / (nrm * nrm[qi]) * 10000) / 10000
        order = sorted(((float(-cos[j]), int(ids[j]), j)
                        for j in range(len(e)) if j != qi))
        for rk, (_, nid, j) in enumerate(order[:k], 1):
            rows.append((int(ids[qi]), nid, cos[j], np.int32(rk)))
    return pd.DataFrame(rows, columns=["qid", "nid", "cosine",
                                       "rank"])


def r_keyword_topk(sf_dir, k=3):
    d, p = _postings(sf_dir)
    df: dict = {}
    for tfs in p.values():
        for term in tfs:
            df[term] = df.get(term, 0) + 1
    n = len(d)
    rows = []
    for i, tfs in p.items():
        scored = sorted(
            ((tf * ((1_000_000 * n) // df[term]), term)
             for term, tf in tfs.items()),
            key=lambda s: (-s[0], s[1]))
        for rk, (score, term) in enumerate(scored[:k], 1):
            rows.append((i, np.int32(rk), term, np.int64(score)))
    return pd.DataFrame(rows, columns=["doc_id", "rank", "term",
                                       "score_micro"])


def r_source_concentration(sf_dir, top_frac=0.1):
    d = _read(sf_dir, "documents").sort_values(
        ["source", "n_chars", "doc_id"], kind="mergesort")
    rows = []
    for src, grp in d.groupby("source", sort=False):
        x = grp["n_chars"].to_numpy(dtype=object)
        n = len(x)
        r = np.arange(1, n + 1, dtype=object)
        tt = int(sum(x))
        rx = int(sum(r * x))
        topn = int(np.ceil(top_frac * n))
        topx = int(sum(v for rr, v in zip(r, x) if rr > n - topn))
        gini = (np.int64(np.floor(1_000_000.0
                                  * float(2 * rx - (n + 1) * tt)
                                  / float(n * tt)))
                if tt > 0 else None)
        share = (np.int64(np.floor(1_000_000.0 * float(topx)
                                   / float(tt)))
                 if tt > 0 else None)
        rows.append((src, np.int64(n), np.int64(tt), gini, share))
    return pd.DataFrame(rows, columns=["source", "n_docs",
                                       "total_size", "gini_micro",
                                       "top_share_micro"])


def r_rollup_incremental(sf_dir):
    ev = _read(sf_dir, "events")
    cents = np.floor(ev["value"] * 100).astype(np.int64)
    df = pd.DataFrame({
        "event_type": ev["event_type"],
        "day": (ev["ts"].astype("int64")
                // 86_400_000_000).astype(np.int64),
        "c": cents})
    g = (df.groupby(["event_type", "day"], as_index=False)
           .agg(n=("c", "size"), total=("c", "sum"),
                vmin=("c", "min"), vmax=("c", "max")))
    for c in ("n", "total", "vmin", "vmax"):
        g[c] = g[c].astype(np.int64)
    return g


def r_group_topk_incremental(sf_dir):
    # the incremental leaderboard's fixed point IS the from-scratch
    # top-k — same replay
    return r_group_topk(sf_dir)


def r_join_salted(sf_dir):
    ev = _read(sf_dir, "events")
    k = np.where(ev["user_id"] % 5 != 0, 0, ev["user_id"])
    df = pd.DataFrame({"k": k.astype(np.int64)})
    g = df.groupby("k", as_index=False).agg(n=("k", "size"))
    g["n"] = g["n"].astype(np.int64)
    g["label_sum"] = (g["k"] % 7) * g["n"]
    return g


# --------------------------------------------------------------------
# r14 batch 7: graph analytics over the near-dup pair graph, seasonal
# decomposition / changepoint / anomaly, classifier scoring +
# calibration + kappa, chi-square drift, DSIR selection, token
# budgets, typed JSON.
# --------------------------------------------------------------------

def r_graph_triangles(sf_dir):
    _, pairs = _capped_jaccard_pairs(sf_dir)
    edges = set(pairs)  # (a < b)
    nodes = {v for e in edges for v in e}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    tri = sum(1 for a, b in edges
              for c in adj.get(b, ()) if c in adj.get(a, ()))
    return pd.DataFrame({"n_nodes": [np.int64(len(nodes))],
                         "n_edges": [np.int64(len(edges))],
                         "n_triangles": [np.int64(tri)]})


def r_graph_kcore(sf_dir, k=2, iterations=6):
    _, pairs = _capped_jaccard_pairs(sf_dir)
    edges = set(pairs)
    for _ in range(iterations):
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        edges = {(a, b) for a, b in edges
                 if deg[a] >= k and deg[b] >= k}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    converged = min(deg.values()) >= k if deg else True
    return pd.DataFrame({"n_nodes": [np.int64(len(deg))],
                         "n_edges": [np.int64(len(edges))],
                         "converged": [converged]})


def r_leakage_safe_split(sf_dir):
    d, comp = _cluster_map(sf_dir)
    cl = pd.DataFrame({"doc": d["doc_id"],
                       "cluster": d["doc_id"].map(comp)})
    b = cl["cluster"].map(_md5_bucket)
    cl["split"] = np.where(b < 8000, "train",
                           np.where(b < 9000, "val", "test"))
    strad = np.int64((cl.groupby("cluster")["split"]
                        .nunique() > 1).sum())
    g = (cl.groupby("split", as_index=False)
           .agg(n_docs=("doc", "size"),
                n_clusters=("cluster", "nunique")))
    g["n_docs"] = g["n_docs"].astype(np.int64)
    g["n_clusters"] = g["n_clusters"].astype(np.int64)
    g["straddling_clusters"] = strad
    return g


def r_quality_quantile_keep(sf_dir, frac=0.4):
    q = r_text_quality(sf_dir)
    d = _read(sf_dir, "documents")[["doc_id", "source"]]
    df = q.merge(d, on="doc_id").sort_values(
        ["source", "quality", "doc_id"],
        ascending=[True, False, True], kind="mergesort")
    out = []
    for _, grp in df.groupby("source", sort=False):
        n = len(grp)
        pr = (np.arange(n) / (n - 1)) if n > 1 else np.zeros(n)
        out.append(grp[pr <= frac])
    return pd.concat(out)[["doc_id", "source", "quality"]]


_CLS_W = {"data": 500000, "query": 400000, "table": 300000,
          "spark": 250000, "join": 200000, "slow": -400000,
          "error": -500000, "dup": -600000, "batch": 100000,
          "stream": 150000}


def _classifier_scores(sf_dir):
    _, p = _postings(sf_dir)
    return {i: -1_000_000 + sum(tf * _CLS_W.get(t, 0)
                                for t, tf in tfs.items())
            for i, tfs in p.items() if tfs}


def r_quality_classifier(sf_dir):
    s = _classifier_scores(sf_dir)
    return pd.DataFrame({
        "doc": list(s.keys()),
        "score_micro": np.asarray(list(s.values()), dtype=np.int64),
        "keep": [v >= 2_000_000 for v in s.values()]})


def r_classifier_calibration(sf_dir):
    s = _classifier_scores(sf_dir)
    d = _read(sf_dir, "documents")
    ybm = dict(zip(d["doc_id"].astype(int),
                   d["source"].isin(["src0", "src1"]).astype(int)))
    sm = np.asarray(list(s.values()), dtype=np.int64)
    y = np.asarray([ybm[i] for i in s], dtype=np.int64)
    sd = sm.astype(np.float64)
    bs = [np.percentile(sd, p, method="linear")
          for p in range(10, 100, 10)]
    bucket = np.sum(sd[:, None] > np.asarray(bs)[None, :], axis=1)
    rows = []
    for b in sorted(set(bucket.tolist())):
        m = bucket == b
        n = int(m.sum())
        pos = int(y[m].sum())
        ssum = int(sm[m].sum())
        # Spark `div` truncates toward zero (unlike Python //)
        mean_trunc = abs(ssum) // n * (1 if ssum >= 0 else -1)
        rows.append((np.int64(b), np.int64(n), np.int64(pos),
                     np.int64((1_000_000 * pos) // n),
                     np.int64(mean_trunc)))
    return pd.DataFrame(rows, columns=["bucket", "n", "pos",
                                       "pos_rate_micro",
                                       "mean_score_micro"])


def _gopher_keep(sf_dir, min_words, min_stopwords):
    g = r_quality_gopher(sf_dir)
    keep = ((g["n_words"] >= min_words) & (g["n_words"] <= 100_000)
            & (g["mean_word_len"] >= 3) & (g["mean_word_len"] <= 10)
            & (g["symbol_word_ratio"] <= 0.1)
            & (g["bullet_line_frac"] <= 0.9)
            & (g["ellipsis_line_frac"] <= 0.3)
            & (g["alpha_word_frac"] >= 0.8)
            & (g["stopword_hits"] >= min_stopwords))
    return dict(zip(g["doc_id"], keep.astype(int)))


def r_quality_kappa(sf_dir):
    # the kappa entry rates with RELAXED Gopher thresholds
    # (min_words=20, min_stopwords=1) against the C4 page filter
    a = _gopher_keep(sf_dir, min_words=20, min_stopwords=1)
    c4 = r_quality_c4(sf_dir)
    b = dict(zip(c4["doc_id"], c4["page_keep"]))
    n = n11 = n10 = n01 = n00 = 0
    for i, ra in a.items():
        rb = b[i]
        n += 1
        n11 += int(ra and rb)
        n10 += int(ra and not rb)
        n01 += int((not ra) and rb)
        n00 += int((not ra) and (not rb))
    e = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    kappa = (np.int64(np.floor(1_000_000.0 * (n * (n11 + n00) - e)
                               / (n * n - e)))
             if n * n != e else None)
    return pd.DataFrame({
        "n": [np.int64(n)], "n11": [np.int64(n11)],
        "n10": [np.int64(n10)], "n01": [np.int64(n01)],
        "n00": [np.int64(n00)],
        "po_micro": [np.int64(np.floor(1_000_000.0 * (n11 + n00)
                                       / n))],
        "kappa_micro": [kappa]})


def r_chi2_source_terms(sf_dir, k=5, min_df=2):
    d = _read(sf_dir, "documents")
    cell: dict = {}
    tok_n: dict = {}
    for src, t in zip(d["source"], d["text"]):
        for tok in {x for x in _norm_tokens(t) if x != ""}:
            cell[(tok, src)] = cell.get((tok, src), 0) + 1
            tok_n[tok] = tok_n.get(tok, 0) + 1
    lab_n = d.groupby("source").size().to_dict()
    big_n = len(d)
    rows = []
    for (tok, lab), n11 in cell.items():
        if tok_n[tok] < min_df:
            continue
        n10 = tok_n[tok] - n11
        n01 = lab_n[lab] - n11
        n00 = big_n - tok_n[tok] - lab_n[lab] + n11
        diff = n11 * n00 - n10 * n01
        den = float((n11 + n10) * (n01 + n00)) \
            * float((n11 + n01) * (n10 + n00))
        if den == 0.0:
            continue
        chi = np.int64(np.floor(
            1000.0 * (float(big_n) * float(diff) * float(diff))
            / den))
        rows.append((lab, tok, np.int64(n11), np.int64(n10),
                     np.int64(n01), np.int64(n00), chi))
    df = pd.DataFrame(rows, columns=["label", "token", "n11", "n10",
                                     "n01", "n00", "chi2_milli"])
    df = df.sort_values(["label", "chi2_milli", "token"],
                        ascending=[True, False, True],
                        kind="mergesort")
    df["rank"] = (df.groupby("label").cumcount() + 1) \
        .astype(np.int32)
    return df[df["rank"] <= k]


def r_text_token_drift(sf_dir, min_total=5):
    d = _read(sf_dir, "documents")
    oa: dict = {}
    ob: dict = {}
    for src, t in zip(d["source"], d["text"]):
        tgt = oa if src != "src0" else ob
        for tok in _norm_tokens(t):
            if tok != "":
                tgt[tok] = tgt.get(tok, 0) + 1
    ta, tb = sum(oa.values()), sum(ob.values())
    rows = []
    for tok in set(oa) | set(ob):
        a, b = oa.get(tok, 0), ob.get(tok, 0)
        if a + b < min_total:
            continue
        frac = (a + b) / float(ta + tb)
        ea, eb = ta * frac, tb * frac
        chi = (np.floor(1_000_000 * (a - ea) * (a - ea) / ea)
               + np.floor(1_000_000 * (b - eb) * (b - eb) / eb))
        rows.append((tok, np.int64(a), np.int64(b), np.int64(chi)))
    return pd.DataFrame(rows, columns=["token", "o_a", "o_b",
                                       "chi_micro"])


def _hourly_series(sf_dir):
    ev = _read(sf_dir, "events")
    bucket = (ev["ts"].astype("int64") // 3_600_000_000) \
        .astype(np.int64)
    s = (pd.DataFrame({"event_type": ev["event_type"],
                       "bucket": bucket})
         .groupby(["event_type", "bucket"], as_index=False)
         .agg(n=("bucket", "size")))
    s["n"] = s["n"].astype(np.int64)
    return s


def r_events_seasonal(sf_dir, period=24):
    s = _hourly_series(sf_dir)
    s["phase"] = (s["bucket"] % period).astype(np.int64)
    seas = (s.groupby(["event_type", "phase"])["n"]
             .apply(lambda x: (1_000_000 * int(x.sum())) // len(x))
             .rename("seasonal_micro"))
    lvl = (s.groupby("event_type")["n"]
            .apply(lambda x: (1_000_000 * int(x.sum())) // len(x))
            .rename("level_micro"))
    out = (s.merge(seas, left_on=["event_type", "phase"],
                   right_index=True)
            .merge(lvl, left_on="event_type", right_index=True))
    out["resid_micro"] = (1_000_000 * out["n"]
                          - out["seasonal_micro"]).astype(np.int64)
    out["seasonal_micro"] = out["seasonal_micro"].astype(np.int64)
    out["level_micro"] = out["level_micro"].astype(np.int64)
    return out


def r_events_anomaly_seasonal(sf_dir, k=3.0):
    s = r_events_seasonal(sf_dir)
    rows = []
    for et, grp in s.groupby("event_type"):
        r = grp["resid_micro"].to_numpy(dtype=np.float64)
        med = np.percentile(r, 50, method="linear")
        adev = np.abs(r - med)
        mad = np.percentile(adev, 50, method="linear")
        for b, n, rm, ad in zip(grp["bucket"], grp["n"],
                                grp["resid_micro"], adev):
            rows.append((et, b, n, rm, med, mad, ad > k * mad))
    return pd.DataFrame(rows, columns=["event_type", "bucket", "n",
                                       "resid_micro", "med", "mad",
                                       "is_anomaly"])


def r_events_changepoint(sf_dir):
    s = _hourly_series(sf_dir).sort_values(["event_type", "bucket"],
                                           kind="mergesort")
    rows = []
    for et, grp in s.groupby("event_type", sort=False):
        n = grp["n"].to_numpy()
        mean_micro = (1_000_000 * int(n.sum())) // len(n)
        cum = np.cumsum(1_000_000 * n - mean_micro)
        order = sorted(range(len(cum)),
                       key=lambda i: (-abs(int(cum[i])),
                                      grp["bucket"].iloc[i]))
        i = order[0]
        rows.append((et, np.int64(grp["bucket"].iloc[i]),
                     np.int64(cum[i]), np.int64(mean_micro),
                     np.int64(len(n))))
    return pd.DataFrame(rows, columns=["event_type", "cp_bucket",
                                       "s_micro", "mean_micro",
                                       "n_buckets"])


def r_source_text_lines(sf_dir):
    d = _read(sf_dir, "documents")
    norm = _normalize_text(d["text"])
    return pd.DataFrame({
        "doc_id": d["doc_id"],
        "n_chars_norm": norm.str.len().astype(np.int64),
        "fp": norm.map(lambda t: hashlib.md5(t.encode()).hexdigest())})


def r_mixture_token_budget(sf_dir):
    d = _read(sf_dir, "documents")
    trimmed = d["text"].str.strip()
    n_tok = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t))) \
        .astype(np.int32)
    df = pd.DataFrame({"doc_id": d["doc_id"], "source": d["source"],
                       "n_tok": n_tok,
                       "hb": d["doc_id"].map(_md5_bucket)})
    budgets = {"src0": 300, "src1": 500}
    df = df.sort_values(["source", "hb", "doc_id"], kind="mergesort")
    prev = (df.groupby("source")["n_tok"].cumsum()
            - df["n_tok"]).astype(np.int64)
    b = df["source"].map(budgets)
    keep = b.isna() | (prev < b)
    return df.loc[keep, ["doc_id", "source", "n_tok"]]


def r_events_props_typed(sf_dir):
    import json as _json

    ev = _read(sf_dir, "events")

    def getk(p):
        try:
            v = _json.loads(p).get("k")
            return None if v is None else int(v)
        except Exception:
            return None

    ks = ev["props"].map(getk)
    g = (pd.DataFrame({"event_type": ev["event_type"], "k": ks})
         .groupby("event_type", as_index=False)
         .agg(n_k=("k", lambda s: int(s.notna().sum())),
              sum_k=("k", lambda s: int(s.dropna().sum())),
              min_k=("k", "min"), max_k=("k", "max")))
    for c in ("n_k", "sum_k"):
        g[c] = g[c].astype(np.int64)
    for c in ("min_k", "max_k"):
        g[c] = g[c].astype(np.int32)
    return g


def r_dsir_select(sf_dir, cut_micro=400000):
    w = r_dsir_weights(sf_dir)
    mean_micro = int(w["weight_micro"].astype(object).sum()) \
        // len(w)
    hv = w["doc"].map(lambda i: _md5_hash64(str(i), seed=1)
                      % 1_000_000)
    keep = hv * mean_micro < cut_micro * w["weight_micro"]
    return w[keep]


def r_sparse_postings_lookup(sf_dir, terms=("data", "join")):
    _, p = _postings(sf_dir)
    rows = [(i, t, np.int64(tf))
            for i, tfs in p.items()
            for t, tf in tfs.items() if t in terms]
    return pd.DataFrame(rows, columns=["doc", "term", "tf"])


# --------------------------------------------------------------------
# r14 batch 8: the streaming family's batch twins (state semantics
# re-derived from event time, independent of Structured Streaming),
# source round-trips, md5 MinHash+LSH end-to-end, hybrid RRF fusion,
# int8 quantized ranking, BPE segmentation, PSL domain filtering,
# basket rules, span removal, the composed curation pipeline.
# --------------------------------------------------------------------

def r_source_csv_roundtrip(sf_dir):
    return _read(sf_dir, "nation")[["n_nationkey", "n_name",
                                    "n_regionkey"]]


def r_source_json_roundtrip(sf_dir):
    s = _read(sf_dir, "supplier")
    return pd.DataFrame({
        "s_suppkey": s["s_suppkey"], "s_name": s["s_name"],
        "s_nationkey": s["s_nationkey"],
        "s_acctbal": _floor2(s["s_acctbal"])})


def r_source_orc_roundtrip(sf_dir):
    return _read(sf_dir, "customer")[["c_custkey", "c_name",
                                      "c_nationkey", "c_acctbal"]]


def r_streaming_dedup(sf_dir):
    d = r_dedup_exact(sf_dir)
    return pd.DataFrame({"fp": d["fp"],
                         "n_kept": np.ones(len(d), dtype=np.int64)})


def r_streaming_static_join(sf_dir):
    e = _ev_split(sf_dir, "purchase", ["event_id", "user_id"])
    c = _read(sf_dir, "customer")[["c_custkey", "c_name",
                                   "c_mktsegment"]]
    j = e.merge(c, left_on="user_id", right_on="c_custkey",
                how="left")
    return j[["event_id", "user_id", "c_name", "c_mktsegment"]]


def r_streaming_cdc_apply(sf_dir):
    return r_cdc_apply(sf_dir)


def r_streaming_group_topk(sf_dir):
    return r_group_topk(sf_dir)


def r_streaming_late_data(sf_dir):
    ev = _read(sf_dir, "events")
    us = ev["ts"].astype("int64")
    hr = (us // 3_600_000_000).astype(np.int64)
    h0, hmax, wm = int(hr.min()), int(hr.max()), int(us.max())
    r1 = (hmax - h0 + 1) // 4
    dropped = (hr - h0 < r1) & (ev["event_id"] % 2 == 1)
    complete = (hr + 1) * 3_600_000_000 <= wm
    keep = ~dropped & complete
    g = (pd.DataFrame({"ws_us": (hr[keep] * 3_600_000_000)
                       .astype(np.int64),
                       "event_type": ev.loc[keep, "event_type"]})
         .groupby(["ws_us", "event_type"], as_index=False)
         .agg(n_events=("event_type", "size")))
    g["n_events"] = g["n_events"].astype(np.int64)
    return g


def r_streaming_sessionize(sf_dir, gap_ms=4 * 3600 * 1000):
    ev = _read(sf_dir, "events")
    df = pd.DataFrame({"user_id": ev["user_id"],
                       "ts_ms": (ev["ts"].astype("int64") // 1000)
                       .astype(np.int64)})
    df = df.sort_values(["user_id", "ts_ms"], kind="mergesort")
    gap = df.groupby("user_id")["ts_ms"].diff()
    new_s = (gap.isna() | (gap > gap_ms)).astype(int)
    sess = new_s.groupby(df["user_id"]).cumsum()
    g = (df.assign(sess=sess)
           .groupby(["user_id", "sess"], as_index=False)
           .agg(start_ms=("ts_ms", "min"), end_ms=("ts_ms", "max"),
                n_events=("ts_ms", "size")))
    g["n_events"] = g["n_events"].astype(np.int64)
    return g[["user_id", "start_ms", "end_ms", "n_events"]]


def _click_purchase_window(sf_dir):
    c = _ev_split(sf_dir, "click", ["event_id", "user_id", "ts"]) \
        .rename(columns={"event_id": "click_id"})
    p = _ev_split(sf_dir, "purchase", ["event_id", "user_id", "ts"]) \
        .rename(columns={"event_id": "purchase_id", "ts": "pts"})
    j = c.merge(p, on="user_id")
    hit = j[(j["pts"] <= j["ts"])
            & (j["pts"] >= j["ts"] - pd.Timedelta(hours=1))]
    return c, p, hit


def r_streaming_stream_join(sf_dir):
    _, _, hit = _click_purchase_window(sf_dir)
    return hit[["click_id", "purchase_id"]]


def r_streaming_stream_join_outer(sf_dir):
    c, _, hit = _click_purchase_window(sf_dir)
    matched = set(hit["click_id"])
    un = c[~c["click_id"].isin(matched)][["click_id"]].copy()
    un["purchase_id"] = np.nan
    out = pd.concat([hit[["click_id", "purchase_id"]], un],
                    ignore_index=True)
    out["purchase_id"] = out["purchase_id"].astype(np.float64)
    return out


def r_streaming_stream_join_full(sf_dir):
    c, p, hit = _click_purchase_window(sf_dir)
    mc, mp = set(hit["click_id"]), set(hit["purchase_id"])
    un_c = c[~c["click_id"].isin(mc)][["click_id"]].copy()
    un_c["purchase_id"] = np.nan
    un_p = p[~p["purchase_id"].isin(mp)][["purchase_id"]].copy()
    un_p["click_id"] = np.nan
    out = pd.concat([hit[["click_id", "purchase_id"]], un_c,
                     un_p[["click_id", "purchase_id"]]],
                    ignore_index=True)
    for col in ("click_id", "purchase_id"):
        out[col] = out[col].astype(np.float64)
    return out


_MH_PARAMS = [(12345, 7), (506964459, 40510), (1013916573, 81013),
              (1520868687, 121516), (2027820801, 162019),
              (387289268, 202522), (894241382, 243025),
              (1401193496, 283528), (1908145610, 324031),
              (267614077, 364534), (774566191, 405037),
              (1281518305, 445540), (1788470419, 486043),
              (147938886, 526546), (654891000, 567049),
              (1161843114, 607552)]
_MH_P = 2147483647


def r_dedup_minhash(sf_dir, bands=4, rows_per_band=4,
                    sig_agree=0.49999999999999994, threshold=0.7):
    d = _read(sf_dir, "documents")
    sh = {int(i): set(_spans(_norm_tokens(t), 3))
          for i, t in zip(d["doc_id"], d["text"])}
    sig = {}
    for i, s in sh.items():
        hs = [_md5_hash64(g) % _MH_P for g in s]
        sig[i] = [min((a * h + c) % _MH_P for h in hs)
                  for a, c in _MH_PARAMS]
    buckets: dict = {}
    for i, m in sig.items():
        for b in range(bands):
            key = (b, tuple(m[b * rows_per_band:
                              (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(i)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                cand.add((ids[ai], ids[bi]))
    rows = []
    for a, b in cand:
        agree = sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
        if agree / 16.0 < sig_agree:
            continue
        inter = len(sh[a] & sh[b])
        jac = np.floor(inter / (len(sh[a]) + len(sh[b]) - inter)
                       * 10000) / 10000
        if jac >= threshold:
            rows.append((a, b, jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def _dense_leg(sf_dir, q_cut=10, k=10):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m, nrm = _cosine_mat(e)
    ids = e["vec_id"].to_numpy()
    legs = []
    for qi in np.nonzero(ids < q_cut)[0]:
        cos = np.floor(m @ m[qi] / (nrm * nrm[qi]) * 10000) / 10000
        order = sorted(((float(-cos[j]), int(ids[j]))
                        for j in range(len(e)) if j != qi))
        legs += [(int(ids[qi]), iid, rk)
                 for rk, (_, iid) in enumerate(order[:k], 1)]
    return legs


def _sparse_leg(sf_dir, q_cut=10, k=10):
    _, p = _postings(sf_dir)
    n2 = {i: sum(v * v for v in tfs.values()) for i, tfs in p.items()}
    inv: dict = {}
    for i, tfs in p.items():
        for term, tf in tfs.items():
            inv.setdefault(term, []).append((i, tf))
    legs = []
    for q in [i for i in p if i < q_cut]:
        dots: dict = {}
        for term, tfq in p[q].items():
            for cdoc, tfc in inv[term]:
                if cdoc != q:
                    dots[cdoc] = dots.get(cdoc, 0) + tfq * tfc
        scored = sorted(((float(dot * dot) / float(n2[q] * n2[c]), c)
                         for c, dot in dots.items()),
                        key=lambda s: (-s[0], s[1]))
        legs += [(q, c, rk) for rk, (_, c) in enumerate(scored[:k], 1)]
    return legs


def _bm25_leg(sf_dir, q_cut=10, k=10):
    _, p = _postings(sf_dir)
    dl = {i: sum(tfs.values()) for i, tfs in p.items()}
    n_docs, total_len = len(dl), sum(dl.values())
    df: dict = {}
    inv: dict = {}
    for i, tfs in p.items():
        for term in tfs:
            df[term] = df.get(term, 0) + 1
            inv.setdefault(term, []).append(i)
    legs = []
    for q in [i for i in p if i < q_cut]:
        scores: dict = {}
        for term in p[q]:
            f = df[term]
            for c in inv[term]:
                if c == q:
                    continue
                tf = p[c][term]
                scores[c] = scores.get(c, 0) + int(np.floor(
                    1_000_000.0
                    * (float(2 * n_docs - 2 * f + 1)
                       * float(22 * tf * total_len))
                    / (float(2 * f + 1)
                       * float(10 * tf * total_len + 3 * total_len
                               + 9 * dl[c] * n_docs))))
        ranked = sorted(scores.items(), key=lambda s: (-s[1], s[0]))
        legs += [(q, c, rk) for rk, (c, _) in enumerate(ranked[:k], 1)]
    return legs


def _rrf(legs_list, k=10, k_rrf=60.0):
    fused: dict = {}
    for legs in legs_list:
        for q, item, rnk in legs:
            cur = fused.setdefault((q, item), [0, 0])
            cur[0] += 1
            cur[1] += int(np.floor(1_000_000 / (k_rrf + rnk)))
    df = pd.DataFrame(
        [(q, i, np.int64(n), np.int64(s))
         for (q, i), (n, s) in fused.items()],
        columns=["q_id", "item_id", "n_legs", "rrf_micro"])
    df = df.sort_values(["q_id", "rrf_micro", "item_id"],
                        ascending=[True, False, True],
                        kind="mergesort")
    df["fused_rank"] = (df.groupby("q_id").cumcount() + 1) \
        .astype(np.int32)
    return df[df["fused_rank"] <= k]


def r_hybrid_rrf(sf_dir):
    return _rrf([_dense_leg(sf_dir), _sparse_leg(sf_dir)])


def r_hybrid_rrf3(sf_dir):
    return _rrf([_dense_leg(sf_dir), _sparse_leg(sf_dir),
                 _bm25_leg(sf_dir)])


def r_sim_quantized_topk(sf_dir, q_cut=5, k=10):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    mx = np.abs(m).max(axis=0)
    codes = np.where(mx == 0, 0.0,
                     np.clip(np.floor(m * 127.0
                                      / np.where(mx == 0, 1.0, mx)),
                             -127, 127)).astype(np.int64)
    ids = e["vec_id"].to_numpy()
    rows = []
    for qi in np.nonzero(ids < q_cut)[0]:
        dots = codes @ codes[qi]
        order = sorted(((-int(dots[j]), int(ids[j]))
                        for j in range(len(e)) if j != qi))
        rows += [(int(ids[qi]), iid, np.int64(-nd), np.int32(rk))
                 for rk, (nd, iid) in enumerate(order[:k], 1)]
    return pd.DataFrame(rows, columns=["q_id", "item_id", "dot",
                                       "rank"])


_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("t", "a"), ("a", "b"), ("ta", "b"),
    ("l", "e"), ("tab", "le"), ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("v", "a"), ("va", "l"), ("u", "e"), ("val", "ue"), ("w", "i"),
    ("n", "d"), ("wi", "nd"), ("o", "w"), ("wind", "ow"), ("e", "r"),
    ("q", "u"), ("qu", "er"), ("quer", "y"), ("a", "a"), ("r", "o"),
    ("ro", "w"), ("f", "a"), ("fa", "st"), ("s", "t"), ("d", "at"),
    ("a", "t"), ("dat", "a"),
]


def _bpe_count(word: str, ranks: dict) -> int:
    toks = list(word)
    while len(toks) > 1:
        best, best_i = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i  # lowest rank, LEFTMOST occurrence
        if best is None:
            break
        toks[best_i:best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return len(toks)


def r_text_bpe_tokens(sf_dir):
    d = _read(sf_dir, "documents")
    ranks = {pair: i for i, pair in enumerate(_BPE_MERGES)}
    memo: dict = {}
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        words = [w for w in t.lower().split(" ") if w != ""]
        n_bpe = 0
        for w in words:
            if w not in memo:
                memo[w] = _bpe_count(w, ranks)
            n_bpe += memo[w]
        rows.append((int(i), np.int32(len(words)), np.int32(n_bpe)))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "n_bpe"])


def r_events_basket_rules(sf_dir, min_support_micro=1000):
    ev = _read(sf_dir, "events")
    items = ev[["user_id", "event_type"]].drop_duplicates()
    n_baskets = items["user_id"].nunique()
    item_n = items.groupby("event_type").size().to_dict()
    j = items.merge(items, on="user_id")
    j = j[j["event_type_x"] != j["event_type_y"]]
    pair_n = (j.groupby(["event_type_x", "event_type_y"])
               .size().to_dict())
    rows = []
    for (a, c), n_ab in pair_n.items():
        support = (1_000_000 * n_ab) // n_baskets
        if support < min_support_micro:
            continue
        conf = (1_000_000 * n_ab) // item_n[a]
        lift = (conf * n_baskets) // item_n[c]
        rows.append((a, c, np.int64(n_ab), np.int64(support),
                     np.int64(conf), np.int64(lift)))
    return pd.DataFrame(rows, columns=["antecedent", "consequent",
                                       "n_ab", "support_micro",
                                       "confidence_micro",
                                       "lift_micro"])


def r_dedup_span_removal(sf_dir, k=4, min_docs=2):
    d = _read(sf_dir, "documents")
    words_of = {int(i): _norm_tokens(t)
                for i, t in zip(d["doc_id"], d["text"])}
    occs: dict = {}
    for i, ws in words_of.items():
        for pos in range(max(len(ws) - k, 0) + 1):
            span = " ".join(ws[pos:pos + k])
            occs.setdefault(span, []).append((i, pos))
    rows = []
    covered: dict = {i: set() for i in words_of}
    for span, lst in occs.items():
        if len({i for i, _ in lst}) < min_docs:
            continue
        first = min(lst)
        for i, pos in lst:
            if (i, pos) == first:
                continue
            n = len(words_of[i])
            covered[i].update(range(pos, min(pos + k, n)))
    for i, ws in words_of.items():
        cov = covered[i]
        kept = [w for tp, w in enumerate(ws) if tp not in cov]
        rows.append((i, " ".join(kept), np.int64(len(ws)),
                     np.int64(len(cov))))
    return pd.DataFrame(rows, columns=["doc", "text", "n_tokens",
                                       "n_removed"])


def r_curation_pipeline(sf_dir):
    d = _read(sf_dir, "documents")
    lid = r_text_lang_id(sf_dir).set_index("doc_id")["lang_pred"]
    q = r_text_quality(sf_dir).set_index("doc_id")["quality"]
    trimmed = d["text"].str.strip()
    n_tok = trimmed.map(
        lambda t: 0 if t == "" else len(re.split(_WS + "+", t))) \
        .astype(np.int32)
    out = pd.DataFrame({
        "doc_id": d["doc_id"],
        "lang_pred": d["doc_id"].map(lid),
        "quality": d["doc_id"].map(q),
        "n_tokens": n_tok})
    return out[(out["lang_pred"] == "en") & (out["quality"] >= 0.5)
               & (out["n_tokens"] >= 20)]


def _psl_rules():
    """Parse the RAW rule strings (publicsuffix.org syntax) with a
    standalone parser — only ``PSL_RULES`` (pure data) is imported;
    the engine's ``_compile_psl`` key/ps encoding is deliberately NOT
    used (ADVICE r14: sharing it would let a compile bug hide from
    the third-engine witness). Returns ``[(is_exception, labels)]``."""
    from charmpandas_spark.functions.psl_data import PSL_RULES

    rules = []
    for raw in PSL_RULES:
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        exc = r.startswith("!")
        rules.append((exc, r.lstrip("!").split(".")))
    return rules


def _registrable(host: str, rules: list) -> str:
    """Spec-direct PSL lookup (publicsuffix.org algorithm): match
    every rule right-to-left against the host's labels (``*`` matches
    any one label), exception rules win outright (their public suffix
    is the rule minus its leftmost label), otherwise the matching
    rule with the most labels prevails, default rule ``*`` (ps=1)."""
    labels = host.split(".")
    ps, exc_ps = 1, None  # default rule "*": TLD is 1 label
    for exc, rl in rules:
        if len(rl) > len(labels):
            continue
        if any(rp != "*" and rp != hl
               for rp, hl in zip(rl, labels[-len(rl):])):
            continue
        if exc:
            exc_ps = len(rl) - 1
        else:
            ps = max(ps, len(rl))
    if exc_ps is not None:
        ps = exc_ps
    n = ps + 1
    return ".".join(labels[-n:]) if len(labels) >= n else host


def r_url_domain_filter(sf_dir):
    d = _read(sf_dir, "documents")
    rules = _psl_rules()
    blocked = {"src3.com", "src7.org", "src11.com", "src5.co.uk",
               "src12.com.au"}
    ad_path = re.compile(r"^/docs/[0-9]+/ads/")
    rows = []
    for i, src in zip(d["doc_id"], d["source"]):
        i = int(i)
        suffix = (".co.uk" if i % 5 == 0 else
                  ".com.au" if i % 5 == 1 else
                  ".org" if i % 3 == 0 else ".com")
        host = ("cdn." if i % 4 == 0 else "") + src + suffix
        path = f"/docs/{i}" + ("/ads/banner" if i % 7 == 0
                               else "/body")
        dom = _registrable(host, rules)
        if dom in blocked or ad_path.match(path):
            continue
        rows.append((i, host, dom, path))
    return pd.DataFrame(rows, columns=["doc_id", "url_host",
                                       "url_domain", "url_path"])


# --------------------------------------------------------------------
# r14 batch 9: hyperplane-LSH ANN legs (planes regenerated from the
# splitmix64 mix — a second independent implementation of the
# deterministic plane generator), IVF full-probe == exact top-k,
# sink round-trips, incremental persisted-index dedup fixed points,
# multimodal metadata.
# --------------------------------------------------------------------

def _plane_comp(p: int, d: int, seed: int = 71) -> float:
    """Independent reimplementation of the deterministic hyperplane
    component (splitmix64-style (p, d) mix -> [-1, 1))."""
    mask = (1 << 64) - 1
    x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + seed) \
        & mask
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & mask
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & mask
    x ^= x >> 31
    return (x / 2 ** 63) - 1.0


def _planes(num_planes: int, dims: int, seed: int = 71) -> np.ndarray:
    return np.array([[_plane_comp(p, d, seed) for d in range(dims)]
                     for p in range(num_planes)])


def _seq_dot(a, b) -> float:
    """Strict left-to-right float accumulation — the engines'
    list_inner_product / zip_with-aggregate order. BLAS pairwise
    summation can land one ulp away, which flips the floor exactly
    at the self-pair's 1.0 boundary."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def r_sim_ivf(sf_dir, k=10):
    # full-probe IVF == exact brute-force top-k (the oracle-checkable
    # identity the query exists to pin). Self-pair included, so the
    # cosine must be computed with the engines' sequential order.
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    nrm = np.array([np.sqrt(_seq_dot(v, v)) for v in m])
    qi = int(np.nonzero(e["vec_id"].to_numpy() == 1)[0][0])
    cos = np.floor(np.array([_seq_dot(v, m[qi]) for v in m])
                   / (nrm * nrm[qi]) * 10000) / 10000
    ids = e["vec_id"].to_numpy()
    order = sorted(range(len(e)),
                   key=lambda j: (-cos[j], int(ids[j])))
    return pd.DataFrame({
        "vec_id": [int(ids[j]) for j in order[:k]],
        "cosine": [cos[j] for j in order[:k]]})


def r_sim_ann_lsh(sf_dir, k=10, num_planes=6):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    # sequential dots: the query vector sits in its own bucket, so
    # the self-pair's 1.0 floor boundary is in play (see r_sim_ivf)
    nrm = np.array([np.sqrt(_seq_dot(v, v)) for v in m])
    ids = e["vec_id"].to_numpy()
    pl = _planes(num_planes, m.shape[1])
    bits = (m @ pl.T >= 0).astype(np.int64)
    bucket = (bits * (1 << np.arange(num_planes))).sum(axis=1)
    qi = int(np.nonzero(ids == 0)[0][0])
    qb = int(bucket[qi])
    probe = {qb} | {qb ^ (1 << p) for p in range(num_planes)}
    cand = [j for j in range(len(e)) if int(bucket[j]) in probe]
    cos = np.floor(np.array([_seq_dot(m[j], m[qi]) for j in cand])
                   / (nrm[cand] * nrm[qi]) * 10000) / 10000
    order = sorted(range(len(cand)),
                   key=lambda x: (-cos[x], int(ids[cand[x]])))
    return pd.DataFrame({
        "vec_id": [int(ids[cand[x]]) for x in order[:k]],
        "cosine": [cos[x] for x in order[:k]]})


def _banded_candidates(m, num_tables=12, num_planes=8, seed=71):
    """(table, bucket) -> row indices under the multi-table
    hyperplane index."""
    buckets = []
    for t in range(num_tables):
        pl = _planes(num_planes, m.shape[1], seed + 101 * t)
        bits = (m @ pl.T >= 0).astype(np.int64)
        buckets.append((bits * (1 << np.arange(num_planes)))
                       .sum(axis=1))
    return buckets


def r_dedup_embedding_cosine_ann(sf_dir, threshold=0.4):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m, nrm = _cosine_mat(e)
    ids = e["vec_id"].to_numpy()
    cand = set()
    for bucket in _banded_candidates(m):
        groups: dict = {}
        for j, b in enumerate(bucket):
            groups.setdefault(int(b), []).append(j)
        for g in groups.values():
            for x in range(len(g)):
                for y in range(x + 1, len(g)):
                    a, b2 = int(ids[g[x]]), int(ids[g[y]])
                    cand.add((min(a, b2), max(a, b2),
                              min(g[x], g[y]), max(g[x], g[y])))
    rows = []
    for a, b, ja, jb in cand:
        cos = np.floor(float(m[ja] @ m[jb]) / (nrm[ja] * nrm[jb])
                       * 10000) / 10000
        if cos >= threshold:
            rows.append((a, b, cos))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])


def r_dedup_embedding_leakage(sf_dir, threshold=0.4):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    m, nrm = _cosine_mat(e)
    ids = e["vec_id"].to_numpy()
    is_train = e["vec_id"].map(_md5_bucket) < 5000
    tr = is_train.to_numpy()
    cand = set()
    for bucket in _banded_candidates(m):
        groups: dict = {}
        for j, b in enumerate(bucket):
            groups.setdefault(int(b), []).append(j)
        for g in groups.values():
            a_side = [j for j in g if tr[j]]
            b_side = [j for j in g if not tr[j]]
            for ja in a_side:
                for jb in b_side:
                    cand.add((ja, jb))
    rows = []
    for ja, jb in cand:
        cos = np.floor(float(m[ja] @ m[jb]) / (nrm[ja] * nrm[jb])
                       * 10000) / 10000
        if cos >= threshold:
            rows.append((int(ids[ja]), int(ids[jb]), cos))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])


def r_sink_clustered_roundtrip(sf_dir):
    o = _read(sf_dir, "orders")
    return pd.DataFrame({
        "o_orderkey": o["o_orderkey"], "o_custkey": o["o_custkey"],
        "o_totalprice": _floor2(o["o_totalprice"])})


def r_sink_compacted_roundtrip(sf_dir):
    return _read(sf_dir, "documents")[["doc_id", "source",
                                       "n_chars"]]


def r_source_csv_malformed(sf_dir):
    n = _read(sf_dir, "nation")
    return pd.DataFrame({
        "n_good": [np.int64(len(n))],
        "n_bad": [np.int64((len(n) + 4) // 5)],
        "key_sum": [np.int64(n["n_nationkey"].sum())]})


def r_source_schema_evolution(sf_dir):
    n = _read(sf_dir, "nation")
    even = n[n["n_nationkey"] % 2 == 0].copy()
    even["n_regionkey"] = np.nan
    odd = n[n["n_nationkey"] % 2 == 1].copy()
    odd["n_regionkey"] = odd["n_regionkey"].astype(np.float64)
    return pd.concat([even, odd], ignore_index=True)[
        ["n_nationkey", "n_name", "n_regionkey"]]


def _fp_not_in_index(sf_dir, index_pred, batch_pred):
    d = _read(sf_dir, "documents")
    fp = _normalize_text(d["text"]).map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    idx = set(fp[index_pred(d)])
    b = (pd.DataFrame({"fp": fp[batch_pred(d)],
                       "doc_id": d.loc[batch_pred(d), "doc_id"]})
         .groupby("fp", as_index=False)
         .agg(doc=("doc_id", "min")))
    out = b[~b["fp"].isin(idx)]
    return pd.DataFrame({"doc": out["doc"].astype(np.int64),
                         "fp": out["fp"]})


def r_dedup_incremental(sf_dir):
    return _fp_not_in_index(sf_dir,
                            lambda d: d["source"] != "src0",
                            lambda d: d["source"] == "src0")


def r_dedup_index_compact(sf_dir):
    return _fp_not_in_index(
        sf_dir, lambda d: d["source"].isin(["src1", "src2"]),
        lambda d: d["source"] == "src0")


def r_dedup_minhash_incremental(sf_dir, threshold=0.7):
    # bipartite even/odd exact-jaccard truth pairs at >= 0.7 with
    # per-side df caps, recall flag INDEPENDENTLY replayed (r16):
    # found_incremental = detected by the pandas banded-probe replay
    # (one batch: all odd ids vs the even-id index), OR jaccard
    # below the 0.8 assertion margin (forced true on all engines).
    out = r_dedup_contamination(sf_dir, threshold=threshold)
    found = _banded_probe_replay(sf_dir, lambda i: i % 2 == 0,
                                 batch_preds=(lambda i: i % 2 == 1,))
    out["found_incremental"] = [
        (j < 0.8) or ((a, b) in found)
        for a, b, j in zip(out["doc_a"], out["doc_b"],
                           out["jaccard"])]
    return out


def r_multimodal_meta(sf_dir):
    d = _read(sf_dir, "documents")
    return pd.DataFrame({
        "doc_id": d["doc_id"],
        "n_bytes": d["text"].map(
            lambda t: len(t.encode("utf-8"))).astype(np.int64),
        "content_hash": d["text"].map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())})


# --------------------------------------------------------------------
# r14 batch 10: the md5 SimHash family + the xxhash64 MinHash path's
# recall-witness truth set.
# --------------------------------------------------------------------

def _simhash_sigs(sf_dir, bits):
    d = _read(sf_dir, "documents")
    sigs = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = [x for x in _norm_tokens(t) if x != ""]
        votes = [0] * bits
        for tok in toks:
            h = _md5_hash64(tok)
            for b in range(bits):
                votes[b] += 1 if (h >> b) & 1 else -1
        if toks:
            sigs[int(i)] = sum((1 << b) for b in range(bits)
                               if votes[b] > 0)
    return sigs


def r_dedup_simhash(sf_dir, bits=32):
    s = _simhash_sigs(sf_dir, bits)
    return pd.DataFrame({"doc": list(s.keys()),
                         "simhash": np.asarray(list(s.values()),
                                               dtype=np.int64)})


def r_dedup_simhash_pairs(sf_dir, bits=48, max_hamming=3):
    s = _simhash_sigs(sf_dir, bits)
    ids = sorted(s)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin(s[a] ^ s[b]).count("1")
            if ham <= max_hamming:
                rows.append((a, b, np.int32(ham)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


def r_dedup_minhash_fast(sf_dir, threshold=0.7):
    # the registered output is the DETERMINISTIC exact truth set
    # (capped-jaccard pairs >= 0.7) with the xxhash64 LSH path's
    # found_fast recall witness — true at the gate SFs (same
    # assertion as the DuckDB oracle; a recall miss fails the hash)
    d, pairs = _capped_jaccard_pairs(sf_dir, threshold=threshold)
    sh = {int(i): set(_spans(_norm_tokens(t), 3))
          for i, t in zip(d["doc_id"], d["text"])}
    rows = []
    for a, b in pairs:
        inter = len(sh[a] & sh[b])
        jac = np.floor(inter / (len(sh[a]) + len(sh[b]) - inter)
                       * 10000) / 10000
        rows.append((a, b, jac, True))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard",
                                       "found_fast"])


# --------------------------------------------------------------------
# r14 batch 11: the multimodal codec family, replayed from the
# plaintext byte geometry (the fixtures are deterministic renderings
# of the document text; each oracle's recipe re-derives features,
# perceptual hashes, and frame strides directly from the bytes —
# codec correctness is checked because any encode/decode bug flips
# the match). Plus the Bloom decontamination gate and the
# external-reference bigram LM.
# --------------------------------------------------------------------

def _char_classes(t: str):
    n_lower = len(re.sub(r"[^a-z]", "", t))
    n_digit = len(re.sub(r"[^0-9]", "", t))
    n_space = t.count(" ")
    return n_lower, n_digit, n_space


def r_multimodal_decode(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        nl, nd, ns = _char_classes(t)
        w = len(t.encode("utf-8"))
        rows.append((int(i), np.int32(w), np.int32(ns),
                     np.int64(nl), np.int64(nd),
                     np.int64(w - nl - nd - ns)))
    return pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                       "n_lower", "n_digit",
                                       "n_other"])


def r_multimodal_png(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        nl, nd, ns = _char_classes(t)
        ln = len(t.encode("utf-8"))
        h = max((ln + 15) // 16, 1)
        rows.append((int(i), np.int32(16), np.int32(h),
                     np.int64(nl), np.int64(nd),
                     np.int64(16 * h - nl - nd - ns)))
    return pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                       "n_lower", "n_digit",
                                       "n_other"])


def r_multimodal_jpeg(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        nl, nd, ns = _char_classes(t)
        ln = len(t.encode("utf-8"))
        blocks = max((ln + 1) // 2, 1)
        rows.append((int(i), np.int32(16), np.int32(8 * blocks),
                     np.int64(64 * nl), np.int64(64 * nd),
                     np.int64(128 * blocks - 64 * (nl + nd + ns))))
    return pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                       "n_lower", "n_digit",
                                       "n_other"])


def _pcm_samples(t: str):
    ln = len(t)
    return [ord(t[2 * i]) + 256 * (ord(t[2 * i + 1])
                                   if 2 * i + 1 < ln else 0)
            for i in range((ln + 1) // 2)]


def r_multimodal_wav(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        vals = _pcm_samples(t)
        mx = max(vals) if vals else 0
        rows.append((int(i), np.int32(8000), np.int64(len(vals)),
                     np.int64(sum(vals)),
                     np.int64(sum(1 for v in vals if v == mx))))
    return pd.DataFrame(rows, columns=["doc_id", "sample_rate",
                                       "n_samples", "sum_abs",
                                       "n_peak"])


def r_multimodal_resize(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        ln = len(t)
        h = max((ln + 47) // 48, 1)
        kept = [p for p in range(48 * h)
                if (p // 48) % 2 == 0 and ((p % 48) // 3) % 2 == 0]
        nl = sum(1 for p in kept if p < ln and 97 <= ord(t[p]) <= 122)
        nd = sum(1 for p in kept if p < ln and 48 <= ord(t[p]) <= 57)
        known = sum(1 for p in kept if p < ln
                    and (ord(t[p]) == 32 or 97 <= ord(t[p]) <= 122
                         or 48 <= ord(t[p]) <= 57))
        rows.append((int(i), np.int32(8), np.int32((h + 1) // 2),
                     np.int64(nl), np.int64(nd),
                     np.int64(len(kept) - known)))
    return pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                       "n_lower", "n_digit",
                                       "n_other"])


def r_multimodal_frames(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        nf = min(max(len(t.encode("utf-8")) // 64, 1), 8)
        for f in range(nf):
            chunk = t[f * 64:f * 64 + 64]
            rows.append((int(i), np.int32(f),
                         hashlib.md5(chunk.encode()).hexdigest()))
    return pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                       "frame_hash"])


def _dhash_bits(pixel, w: int, h: int, grid: int = 8) -> int:
    """dHash (Krawetz 2013): nearest-neighbor grid x (grid+1)
    downsample, one bit per horizontal neighbor pair."""
    bits = 0
    for r in range(grid):
        sr = r * h // grid
        row = [pixel(sr, (c * w) // (grid + 1))
               for c in range(grid + 1)]
        for c in range(grid):
            if row[c] < row[c + 1]:
                bits |= 1 << (r * grid + c)
    return bits


def _text_image_dhash(t: str):
    b = t.encode("utf-8")
    ln = len(b)
    h = max((ln + 15) // 16, 1)

    def pixel(r, c):
        p = r * 16 + c
        return b[p] if p < ln else 0

    bits = _dhash_bits(pixel, 16, h)
    return bits >> 32, bits & 0xFFFFFFFF


def r_multimodal_dhash(sf_dir):
    d = _read(sf_dir, "documents")
    rows = [(int(i), *(np.int64(x) for x in _text_image_dhash(t)))
            for i, t in zip(d["doc_id"], d["text"])]
    return pd.DataFrame(rows, columns=["doc_id", "dhash_hi",
                                       "dhash_lo"])


def r_dedup_images(sf_dir, max_hamming=6):
    d = _read(sf_dir, "documents")
    sig = {int(i): _text_image_dhash(t)
           for i, t in zip(d["doc_id"], d["text"])}
    ids = sorted(sig)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = (bin(sig[a][0] ^ sig[b][0]).count("1")
                   + bin(sig[a][1] ^ sig[b][1]).count("1"))
            if ham <= max_hamming:
                rows.append((a, b, np.int32(ham)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


def r_multimodal_audiohash(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        smp = _pcm_samples(t)
        n = len(smp)
        nf = max(n // 4, 1)
        eng = [sum(smp[4 * k + j] for j in range(4)
                   if 4 * k + j < n) for k in range(nf)]
        bits = [1 if eng[(j * nf) // 65] < eng[((j + 1) * nf) // 65]
                else 0 for j in range(64)]
        hi = sum(bits[j] << (j - 32) for j in range(32, 64))
        lo = sum(bits[j] << j for j in range(32))
        rows.append((int(i), np.int64(hi), np.int64(lo)))
    return pd.DataFrame(rows, columns=["doc_id", "ahash_hi",
                                       "ahash_lo"])


def r_multimodal_video_dhash(sf_dir):
    d = _read(sf_dir, "documents")
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        b = t.encode("utf-8")
        ln = len(b)
        nf = max((ln + 127) // 128, 1)
        for f in range(nf):
            def pixel(r, c, base=f * 128):
                p = base + r * 16 + c
                return b[p] if p < ln else 0

            bits = _dhash_bits(pixel, 16, 8)
            rows.append((int(i), np.int32(f),
                         np.int64(bits >> 32),
                         np.int64(bits & 0xFFFFFFFF)))
    return pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                       "dhash_hi", "dhash_lo"])


def r_decontam_bloom(sf_dir):
    # the gate's expected table: exact decontamination hits with the
    # no-false-negative bloom flag asserted (same strength as the
    # DuckDB oracle — a Bloom false negative fails the match)
    out = r_decontam_ngrams(sf_dir)
    out = out[out["n_hits"] > 0][["doc", "n_ngrams", "n_hits"]].copy()
    out["bloom_ok"] = True
    return out


def r_quality_lm_external(sf_dir):
    d = _read(sf_dir, "documents")
    learn = d["source"] != "src0"
    bigrams: dict = {}
    contexts: dict = {}
    vocab = set()
    score_docs = {}
    for i, t, ln in zip(d["doc_id"], d["text"], learn):
        toks = _norm_tokens(t)
        bg = [(a, b) for a, b in zip(toks, toks[1:])
              if a != "" and b != ""]
        if ln:
            for a, b in bg:
                bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
                contexts[a] = contexts.get(a, 0) + 1
                vocab.add(a)
                vocab.add(b)
        else:
            score_docs[int(i)] = bg
    v = len(vocab)
    rows = []
    for i, bg in score_docs.items():
        if not bg:
            continue
        mps = [int(np.floor((bigrams.get((a, b), 0) + 1)
                            * 1_000_000.0
                            / (contexts.get(a, 0) + v)))
               for a, b in bg]
        rows.append((i, np.int64(len(mps)), np.int64(sum(mps)),
                     np.int64(sum(mps) // len(mps))))
    return pd.DataFrame(rows, columns=["doc", "n_bigrams",
                                       "sum_micro_p", "avg_micro_p"])


# --------------------------------------------------------------------
# r14 batch 12: the trained-structure family — deterministic Lloyd
# k-means (integer quantization, first-k init, empty-cluster
# carry-over), SemDeDup's cluster-bounded pairing, and the exact
# integer power-iteration PCA with its drift histogram. Every step
# re-derived from the documented recipes with python ints (the
# HUGEINT doctrine) and sequential float chains.
# --------------------------------------------------------------------

def _kmeans_assign(sf_dir, k=8, iters=3):
    """(ids, cluster) under the pinned deterministic Lloyd recipe:
    q = floor(x*1000) ints, init = first k rows by id, squared
    distance as a left-associated double chain, ties to the smaller
    centroid index, empty clusters keep their previous centroid."""
    e = _read(sf_dir, "embeddings").sort_values("vec_id") \
        .reset_index(drop=True)
    q = np.floor(np.stack(e["embedding"].to_numpy())
                 .astype(np.float64) * 1000).astype(np.int64)
    ids = e["vec_id"].to_numpy()
    cents = [q[i].astype(np.float64) for i in range(k)]

    def dist(row, c):
        s = 0.0
        for d in range(len(row)):
            t = float(row[d]) - c[d]
            s += t * t
        return s

    def assign():
        out = np.empty(len(q), dtype=np.int64)
        for i in range(len(q)):
            best, bj = None, 0
            for j in range(k):
                dd = dist(q[i], cents[j])
                if best is None or dd < best:
                    best, bj = dd, j
            out[i] = bj
        return out

    for _ in range(iters):
        cl = assign()
        for j in range(k):
            m = cl == j
            if m.any():
                cents[j] = q[m].sum(axis=0).astype(np.float64) \
                    / int(m.sum())
    return ids, assign()


def r_embedding_kmeans(sf_dir):
    ids, cl = _kmeans_assign(sf_dir)
    return pd.DataFrame({"vec_id": ids,
                         "cluster": cl.astype(np.int32)})


def r_dedup_semantic(sf_dir, threshold=0.25):
    e = _read(sf_dir, "embeddings").sort_values("vec_id") \
        .reset_index(drop=True)
    ids, cl = _kmeans_assign(sf_dir)
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    nrm = np.array([np.sqrt(_seq_dot(v, v)) for v in m])
    by_cluster: dict = {}
    for i, c in enumerate(cl):
        by_cluster.setdefault(int(c), []).append(i)
    rows = []
    for c, members in by_cluster.items():
        members.sort(key=lambda i: int(ids[i]))
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                cos = np.floor(_seq_dot(m[a], m[b])
                               / (nrm[a] * nrm[b]) * 10000) / 10000
                if cos >= threshold:
                    rows.append((int(ids[a]), int(ids[b]),
                                 np.int64(c), cos))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cluster",
                                       "cosine"])


def _pca_projection(sf_dir, iters=12):
    """Exact integer power iteration (the HUGEINT doctrine): cov =
    n*X'X - s s' on q=floor(x*1000); v normalized per step to
    sign(w)*((|w|*1e6)//max|w|); projection truncated toward zero."""
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    q = np.floor(np.stack(e["embedding"].to_numpy())
                 .astype(np.float64) * 1000).astype(object)
    q = np.vectorize(int)(q)
    n = len(e)
    s = q.sum(axis=0)  # python ints (object) — exact
    dims = q.shape[1]
    xtx = [[int(sum(int(q[r][i]) * int(q[r][j]) for r in range(n)))
            for j in range(dims)] for i in range(dims)]
    cov = [[n * xtx[i][j] - int(s[i]) * int(s[j])
            for j in range(dims)] for i in range(dims)]
    v = [1_000_000 if d == 0 else 0 for d in range(dims)]
    for _ in range(iters):
        w = [sum(cov[i][j] * v[j] for j in range(dims))
             for i in range(dims)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            break
        v = [(abs(x) * 1_000_000 // mx) * (1 if x >= 0 else -1)
             for x in w]
    proj = []
    for r in range(n):
        raw = sum((n * int(q[r][d]) - int(s[d])) * v[d]
                  for d in range(dims))
        den = n * 1_000_000
        proj.append(abs(raw) // den * (1 if raw >= 0 else -1))
    return e, proj


def r_embedding_pca(sf_dir):
    e, proj = _pca_projection(sf_dir)
    return pd.DataFrame({"vec_id": e["vec_id"],
                         "proj": np.asarray(proj, dtype=np.int64)})


def r_embedding_pca_incremental(sf_dir):
    # the incremental X'X fold's fixed point IS the one-shot PCA
    return r_embedding_pca(sf_dir)


def r_embedding_drift(sf_dir, bins=8):
    e, proj = _pca_projection(sf_dir)
    proj = np.asarray(proj, dtype=np.int64)
    side = (e["label"].astype(np.int64) % 2).to_numpy()
    mn, mx = int(proj.min()), int(proj.max())
    b = ((proj - mn) * bins) // (mx - mn + 1)
    df = pd.DataFrame({"bin": b.astype(np.int32), "side": side})
    g = (df.groupby("bin", as_index=False)
           .agg(n_a=("side", lambda x: int((x == 0).sum())),
                n_b=("side", lambda x: int((x == 1).sum()))))
    ta, tb = int(g["n_a"].sum()), int(g["n_b"].sum())
    g["n_a"] = g["n_a"].astype(np.int64)
    g["n_b"] = g["n_b"].astype(np.int64)
    g["pa_bp"] = ((10_000 * g["n_a"]) // ta).astype(np.int64)
    g["pb_bp"] = ((10_000 * g["n_b"]) // tb).astype(np.int64)
    return g


# --------------------------------------------------------------------
# r14 batch 13: the PQ / IVF-PQ codebook triple — md5-capped
# training order, per-subspace Lloyd (k=16, 2 iterations, first-k
# init, empty-cluster carry-over), residual quantization, ADC lookup
# tables, nprobe=3 coarse probing, exact rerank. Plus join_blowup.
# --------------------------------------------------------------------

def _seq_sqdist(row, cent) -> float:
    s = 0.0
    for d in range(len(row)):
        t = float(row[d]) - cent[d]
        s += t * t
    return s


def _lloyd_train(train, k, iters):
    """Centroids from the pinned Lloyd recipe over integer rows
    (already in training order): init = first k rows, assignment by
    left-associated double distance chains with smaller-index
    tie-break, mean update with empty-cluster carry-over."""
    cents = [train[i].astype(np.float64) for i in range(k)]
    for _ in range(iters):
        cl = np.array([min(range(k),
                           key=lambda j: (_seq_sqdist(r, cents[j]), j))
                       for r in train])
        for j in range(k):
            m = cl == j
            if m.any():
                cents[j] = train[m].sum(axis=0).astype(np.float64) \
                    / int(m.sum())
    return cents


def _argmin_cent(row, cents):
    return min(range(len(cents)),
               key=lambda j: (_seq_sqdist(row, cents[j]), j))


def _md5_train_order(ids):
    return sorted(range(len(ids)),
                  key=lambda i: (_md5_hash64(str(int(ids[i]))),
                                 int(ids[i])))


def r_sim_pq_topk(sf_dir, m_sub=8, d_sub=8, k_cb=16, iters=2,
                  train_cap=256, q_cut=5, topk=10):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    ids = e["vec_id"].to_numpy()
    q = np.floor(np.stack(e["embedding"].to_numpy())
                 .astype(np.float64) * 1000).astype(np.int64)
    order = _md5_train_order(ids)[:train_cap]
    train_rows = sorted(order, key=lambda i: int(ids[i]))  # init by id
    cbs, codes = [], []
    for s in range(m_sub):
        sub = q[:, s * d_sub:(s + 1) * d_sub]
        tr = sub[train_rows]
        cents = _lloyd_train(tr, k_cb, iters)
        cbs.append(cents)
        codes.append([_argmin_cent(r, cents) for r in sub])
    rows = []
    for qi in range(len(e)):
        if int(ids[qi]) >= q_cut:
            continue
        luts = [[_seq_sqdist(q[qi, s * d_sub:(s + 1) * d_sub],
                             cbs[s][c]) for c in range(k_cb)]
                for s in range(m_sub)]
        scored = []
        for it in range(len(e)):
            if it == qi:
                continue
            adc = sum(luts[s][codes[s][it]] for s in range(m_sub))
            scored.append((int(np.floor(adc * 1_000_000)),
                           int(ids[it])))
        scored.sort()
        rows += [(int(ids[qi]), iid, np.int64(adc), np.int32(rk))
                 for rk, (adc, iid) in enumerate(scored[:topk], 1)]
    return pd.DataFrame(rows, columns=["q_id", "item_id",
                                       "adc_micro", "rank"])


def _ivfpq_state(sf_dir, coarse_k=8, m_sub=8, d_sub=8, k_cb=16,
                 iters=2, train_cap=256):
    e = _read(sf_dir, "embeddings").reset_index(drop=True)
    ids = e["vec_id"].to_numpy()
    q = np.floor(np.stack(e["embedding"].to_numpy())
                 .astype(np.float64) * 1000).astype(np.int64)
    order = _md5_train_order(ids)[:train_cap]
    tr_rows = sorted(order, key=lambda i: int(ids[i]))
    coarse = _lloyd_train(q[tr_rows], coarse_k, iters)
    cl = np.array([_argmin_cent(r, coarse) for r in q])
    resid = q.astype(np.float64) - np.stack([coarse[c] for c in cl])
    # PQ on FLOORED residuals; train cap re-applied on the corpus
    rq = np.floor(resid).astype(np.int64)
    cbs, codes = [], []
    for s in range(m_sub):
        sub = rq[:, s * d_sub:(s + 1) * d_sub]
        cents = _lloyd_train(sub[tr_rows], k_cb, iters)
        cbs.append(cents)
        codes.append([_argmin_cent(r, cents) for r in sub])
    return e, ids, q, coarse, cl, cbs, codes


def _ivfpq_adc(sf_dir, q_cut=5, nprobe=3, topk=10):
    (e, ids, q, coarse, cl, cbs,
     codes) = _ivfpq_state(sf_dir)
    m_sub, d_sub, k_cb = 8, 8, 16
    out = {}
    for qi in range(len(e)):
        if int(ids[qi]) >= q_cut:
            continue
        probes = sorted(range(len(coarse)),
                        key=lambda j: (_seq_sqdist(q[qi], coarse[j]),
                                       j))[:nprobe]
        scored = []
        for pc in probes:
            rq = np.floor(q[qi].astype(np.float64)
                          - coarse[pc]).astype(np.int64)
            luts = [[_seq_sqdist(rq[s * d_sub:(s + 1) * d_sub],
                                 cbs[s][c]) for c in range(k_cb)]
                    for s in range(m_sub)]
            for it in np.nonzero(cl == pc)[0]:
                if it == qi:
                    continue
                adc = sum(luts[s][codes[s][it]]
                          for s in range(m_sub))
                scored.append((int(np.floor(adc * 1_000_000)),
                               int(ids[it])))
        scored.sort()
        out[int(ids[qi])] = scored[:topk]
    return e, out


def r_sim_ivfpq_topk(sf_dir):
    _, out = _ivfpq_adc(sf_dir, topk=10)
    rows = [(q, iid, np.int64(adc), np.int32(rk))
            for q, lst in out.items()
            for rk, (adc, iid) in enumerate(lst, 1)]
    return pd.DataFrame(rows, columns=["q_id", "item_id",
                                       "adc_micro", "rank"])


def r_sim_ivfpq_rerank(sf_dir, cand_k=50, topk=10):
    e, out = _ivfpq_adc(sf_dir, topk=cand_k)
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    nrm = np.array([np.sqrt(_seq_dot(v, v)) for v in m])
    pos = {int(v): i for i, v in enumerate(e["vec_id"])}
    rows = []
    for qd, lst in out.items():
        qi = pos[qd]
        scored = []
        for _, iid in lst:
            j = pos[iid]
            cos = np.floor(_seq_dot(m[qi], m[j])
                           / (nrm[qi] * nrm[j]) * 10000) / 10000
            scored.append((-cos, iid))
        scored.sort()
        rows += [(qd, iid, -nc, np.int32(rk))
                 for rk, (nc, iid) in enumerate(scored[:topk], 1)]
    return pd.DataFrame(rows, columns=["q_id", "item_id", "cosine",
                                       "rank"])


def r_join_blowup(sf_dir, k=20):
    o = _read(sf_dir, "orders")
    li = _read(sf_dir, "lineitem")
    lc = o.groupby(o["o_orderkey"].astype(str)).size()
    rc = li.groupby(li["l_orderkey"].astype(str)).size()
    p = pd.DataFrame({"n_left": lc, "n_right": rc}).dropna()
    p = p.astype(np.int64)
    p["pairs"] = p["n_left"] * p["n_right"]
    p = p.reset_index(names="key")
    top = p.sort_values(["pairs", "key"], ascending=[False, True],
                        kind="mergesort").head(k).copy()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int32)
    total = pd.DataFrame([{
        "key": None, "n_left": np.int64(p["n_left"].sum()),
        "n_right": np.int64(p["n_right"].sum()),
        "pairs": np.int64(p["pairs"].sum()), "rank": np.int32(0)}])
    return pd.concat([top, total], ignore_index=True)


# --------------------------------------------------------------------
# r15: BOUNDS-MODE replays of the four approx-sketch gates (VERDICT
# r14 #2). The sketch ESTIMATES (HLL++ registers, GK/KLL summaries)
# are Spark-internal and deliberately absent from the hashed columns;
# what each gate query emits is (a) exact anchors and (b) an `ok`
# boolean computed in-engine as |estimate - anchor| within the
# documented envelope. The witness therefore replays the EXACT
# anchors independently in pandas and asserts ok == True — a match
# proves both that the anchors are right by a third engine AND that
# the committed approx values sat inside the oracle's own envelope
# (a bound violation flips ok to false and fails the value compare).
# These entries are listed in BOUNDS_MODE and marked in the artifact.
# --------------------------------------------------------------------

def r_corpus_percentiles_approx(sf_dir):
    li = _read(sf_dir, "lineitem")
    g = (li[li["l_extendedprice"].notna()]
         .groupby("l_returnflag").size().rename("n")
         .reset_index())
    rows = [(rf, np.int32(q), np.int64(n), True)
            for rf, n in zip(g["l_returnflag"], g["n"])
            for q in (25, 50, 75, 95, 99)]
    return pd.DataFrame(rows, columns=["l_returnflag", "quantile",
                                       "n", "ok"])


def r_distinct_count_approx(sf_dir):
    ev = _read(sf_dir, "events")
    g = (ev.groupby("event_type")["user_id"].nunique()
           .rename("n_distinct").reset_index())
    g["n_distinct"] = g["n_distinct"].astype(np.int64)
    g["ok"] = True
    return g


def r_histogram_equidepth_approx(sf_dir):
    li = _read(sf_dir, "lineitem")
    n_total = np.int64(li["l_extendedprice"].notna().sum())
    return pd.DataFrame({"bucket": np.arange(8, dtype=np.int32),
                         "n_total": n_total, "ok": True})


def r_audience_overlap(sf_dir):
    ev = _read(sf_dir, "events")
    # distinct (set, key) pairs; sizes INCLUDE a null key (engine's
    # count(lit(1)) and DuckDB's count(*) both count it), the
    # intersection join excludes it (both engines' equi-join does)
    sets = (ev[["event_type", "user_id"]].astype(
                {"user_id": "string"})
              .drop_duplicates())
    # a NULL set id never appears in the engine's output (its
    # set_a < set_b pair predicate is NULL for null sets) — exclude
    # it here too instead of crashing on sorted(NaN, str)
    sets = sets[sets["event_type"].notna()]
    size = sets.groupby("event_type", dropna=False).size()
    members = {
        s: set(k for k in grp["user_id"] if pd.notna(k))
        for s, grp in sets.groupby("event_type")}
    types = sorted(size.index)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            rows.append((a, b, np.int64(size[a]), np.int64(size[b]),
                         np.int64(len(members[a] & members[b])),
                         True))
    return pd.DataFrame(rows, columns=["set_a", "set_b", "n_a",
                                       "n_b", "n_both", "ok"])


#: replays whose approx content is verified via the in-query `ok`
#: envelope + independently recomputed exact anchors (see the block
#: comment above) — marked as bounds-mode in the artifact coverage.
BOUNDS_MODE = {"corpus_percentiles_approx", "distinct_count_approx",
               "histogram_equidepth_approx", "audience_overlap"}


REPLAYS = {
    # --- r15: approx-sketch gates, bounds-mode (VERDICT r14 #2) ---
    "corpus_percentiles_approx": r_corpus_percentiles_approx,
    "distinct_count_approx": r_distinct_count_approx,
    "histogram_equidepth_approx": r_histogram_equidepth_approx,
    "audience_overlap": r_audience_overlap,
    # --- r14 batch 13: PQ / IVF-PQ triple + join_blowup ---
    "sim_pq_topk": r_sim_pq_topk,
    "sim_ivfpq_topk": r_sim_ivfpq_topk,
    "sim_ivfpq_rerank": r_sim_ivfpq_rerank,
    "join_blowup": r_join_blowup,
    # --- r14 batch 12: trained structures (k-means / PCA) ---
    "embedding_kmeans": r_embedding_kmeans,
    "dedup_semantic": r_dedup_semantic,
    "embedding_pca": r_embedding_pca,
    "embedding_pca_incremental": r_embedding_pca_incremental,
    "embedding_drift": r_embedding_drift,
    # --- r14 batch 11: multimodal codecs + bloom gate + ext LM ---
    "multimodal_decode": r_multimodal_decode,
    "multimodal_png": r_multimodal_png,
    "multimodal_jpeg": r_multimodal_jpeg,
    "multimodal_wav": r_multimodal_wav,
    "multimodal_resize": r_multimodal_resize,
    "multimodal_frames": r_multimodal_frames,
    "multimodal_dhash": r_multimodal_dhash,
    "multimodal_audiohash": r_multimodal_audiohash,
    "multimodal_video_dhash": r_multimodal_video_dhash,
    "dedup_images": r_dedup_images,
    "decontam_bloom": r_decontam_bloom,
    "quality_lm_external": r_quality_lm_external,
    # --- r14 batch 10: simhash family + minhash_fast truth ---
    "dedup_simhash": r_dedup_simhash,
    "dedup_simhash_pairs": r_dedup_simhash_pairs,
    "dedup_minhash_fast": r_dedup_minhash_fast,
    "groupby_sum": r_groupby_sum,
    "flagship_join_groupby_count": r_flagship_join_groupby_count,
    "join_inner": r_join_inner,
    "concat": r_concat,
    "tpch_q1": r_tpch_q1,
    "histogram_value": r_histogram_value,
    "events_sessionize": r_events_sessionize,
    "dedup_ngram_jaccard": r_dedup_ngram_jaccard,
    "text_chunks": r_text_chunks,
    "streaming_running_totals": r_streaming_running_totals,
    "scalar_reduction": r_scalar_reduction,
    "filter_expr": r_filter_expr,
    "sort_topk": r_sort_topk,
    "window_rank": r_window_rank,
    "dedup_exact": r_dedup_exact,
    "text_token_count": r_text_token_count,
    "embedding_quantize": r_embedding_quantize,
    "graph_pagerank": r_graph_pagerank,
    "coreset_kcenter": r_coreset_kcenter,
    "dsir_weights": r_dsir_weights,
    "corpus_percentiles": r_corpus_percentiles,
    "events_quantiles_by_group": r_events_quantiles_by_group,
    "heavy_hitters_cms": r_heavy_hitters_cms,
    "scd2_history": r_scd2_history,
    "multimodal_bmp": r_multimodal_bmp,
    "corpus_weighted_quantiles": r_corpus_weighted_quantiles,
    "er_jaro_winkler": r_er_jaro_winkler,
    "sim_topk": r_sim_topk,
    # --- r14 batch 9: ANN legs + sinks + incremental dedup ---
    "sim_ivf": r_sim_ivf,
    # incremental IVF, full probe: same exact-top-k identity
    "sim_ivf_incremental": r_sim_ivf,
    "sim_ann_lsh": r_sim_ann_lsh,
    "dedup_embedding_cosine_ann": r_dedup_embedding_cosine_ann,
    "dedup_embedding_leakage": r_dedup_embedding_leakage,
    "sink_clustered_roundtrip": r_sink_clustered_roundtrip,
    "sink_compacted_roundtrip": r_sink_compacted_roundtrip,
    "source_csv_malformed": r_source_csv_malformed,
    "source_schema_evolution": r_source_schema_evolution,
    "dedup_incremental": r_dedup_incremental,
    "dedup_index_compact": r_dedup_index_compact,
    "dedup_minhash_incremental": r_dedup_minhash_incremental,
    "multimodal_meta": r_multimodal_meta,
    # --- r14 batch 8: streaming twins + roundtrips + minhash/RRF ---
    "source_csv_roundtrip": r_source_csv_roundtrip,
    "source_json_roundtrip": r_source_json_roundtrip,
    "source_orc_roundtrip": r_source_orc_roundtrip,
    "streaming_dedup": r_streaming_dedup,
    "streaming_static_join": r_streaming_static_join,
    "streaming_cdc_apply": r_streaming_cdc_apply,
    "streaming_group_topk": r_streaming_group_topk,
    "streaming_late_data": r_streaming_late_data,
    "streaming_sessionize": r_streaming_sessionize,
    "streaming_dedup_neardup": r_streaming_dedup_neardup,
    "streaming_stream_join": r_streaming_stream_join,
    "streaming_stream_join_outer": r_streaming_stream_join_outer,
    "streaming_stream_join_full": r_streaming_stream_join_full,
    "dedup_minhash": r_dedup_minhash,
    "hybrid_rrf": r_hybrid_rrf,
    "hybrid_rrf3": r_hybrid_rrf3,
    "sim_quantized_topk": r_sim_quantized_topk,
    "text_bpe_tokens": r_text_bpe_tokens,
    "events_basket_rules": r_events_basket_rules,
    "dedup_span_removal": r_dedup_span_removal,
    "curation_pipeline": r_curation_pipeline,
    "url_domain_filter": r_url_domain_filter,
    # --- r14 batch 7: graph + seasonal + classifier + drift ---
    "graph_triangles": r_graph_triangles,
    "graph_kcore": r_graph_kcore,
    "leakage_safe_split": r_leakage_safe_split,
    "quality_quantile_keep": r_quality_quantile_keep,
    "quality_classifier": r_quality_classifier,
    "classifier_calibration": r_classifier_calibration,
    "quality_kappa": r_quality_kappa,
    "chi2_source_terms": r_chi2_source_terms,
    "text_token_drift": r_text_token_drift,
    "events_seasonal": r_events_seasonal,
    "events_anomaly_seasonal": r_events_anomaly_seasonal,
    "events_changepoint": r_events_changepoint,
    "source_text_lines": r_source_text_lines,
    "mixture_token_budget": r_mixture_token_budget,
    "events_props_typed": r_events_props_typed,
    "dsir_select": r_dsir_select,
    "sparse_postings_lookup": r_sparse_postings_lookup,
    # --- r14 batch 6: sampling family + sequences + dedup tails ---
    "events_top_paths": r_events_top_paths,
    "events_transitions": r_events_transitions,
    "events_trend": r_events_trend,
    "mixture_sample": r_mixture_sample,
    "stratified_sample": r_stratified_sample,
    "weighted_sample": r_weighted_sample,
    "negative_sample": r_negative_sample,
    "purged_kfold": r_purged_kfold,
    "dedup_editdist": r_dedup_editdist,
    "dedup_corpus": r_dedup_corpus,
    "dedup_embedding_cosine": r_dedup_embedding_cosine,
    "sim_knn_join": r_sim_knn_join,
    "keyword_topk": r_keyword_topk,
    "source_concentration": r_source_concentration,
    "rollup_incremental": r_rollup_incremental,
    "group_topk_incremental": r_group_topk_incremental,
    "join_salted": r_join_salted,
    # --- r14 batch 5: relational core remainder + feature ops ---
    "join_left": r_join_left,
    "join_right": r_join_right,
    "join_left_semi": r_join_left_semi,
    "join_left_anti": r_join_left_anti,
    "join_right_semi": r_join_right_semi,
    "join_right_anti": r_join_right_anti,
    "join_multikey": r_join_multikey,
    "scan_project": r_scan_project,
    "distinct": r_distinct,
    "intersect": r_intersect,
    "except": r_except,
    "case_when": r_case_when,
    "string_functions": r_string_functions,
    "unpivot": r_unpivot,
    "grouping_sets": r_grouping_sets,
    "window_ntile": r_window_ntile,
    "events_histogram": r_events_histogram,
    "text_fingerprint": r_text_fingerprint,
    "vocab_oov": r_vocab_oov,
    "text_token_stats": r_text_token_stats,
    "locf_fill": r_locf_fill,
    "winsorize_value": r_winsorize_value,
    "standard_scale": r_standard_scale,
    "target_encode": r_target_encode,
    "temporal_split": r_temporal_split,
    "markov_transitions": r_markov_transitions,
    "tpch_q8": r_tpch_q8,
    "dedup_jaccard_prefix": r_dedup_jaccard_prefix,
    "curation_report": r_curation_report,
    # --- r14 batch 4: TPC-H remainder + packing/LM/encoding ---
    "tpch_q2": r_tpch_q2,
    "tpch_q7": r_tpch_q7,
    "tpch_q9": r_tpch_q9,
    "tpch_q10": r_tpch_q10,
    "tpch_q11": r_tpch_q11,
    "tpch_q15": r_tpch_q15,
    "tpch_q16": r_tpch_q16,
    "tpch_q17": r_tpch_q17,
    "tpch_q18": r_tpch_q18,
    "tpch_q19": r_tpch_q19,
    "tpch_q20": r_tpch_q20,
    "tpch_q21": r_tpch_q21,
    "tpch_q22": r_tpch_q22,
    "text_pack": r_text_pack,
    "text_pack_greedy": r_text_pack_greedy,
    "quality_lm_score": r_quality_lm_score,
    "events_ab_welch": r_events_ab_welch,
    "target_encode_loo": r_target_encode_loo,
    "zorder_key": r_zorder_key,
    # --- r14 batch 3: dedup/decontam core + exact-stats profiling
    #     + lexical ranking + warehouse remainder ---
    "dedup_contamination": r_dedup_contamination,
    "decontam_ngrams": r_decontam_ngrams,
    "dedup_spans": r_dedup_spans,
    "impute_median": r_impute_median,
    "events_funnel": r_events_funnel,
    "events_resample": r_events_resample,
    "lineitem_corr": r_lineitem_corr,
    "histogram_equidepth": r_histogram_equidepth,
    "group_topk": r_group_topk,
    "shard_assignment": r_shard_assignment,
    "merge_upsert": r_merge_upsert,
    "quality_expectations": r_quality_expectations,
    "pii_scan": r_pii_scan,
    "sim_sparse_topk": r_sim_sparse_topk,
    "sim_bm25": r_sim_bm25,
    "text_tfidf": r_text_tfidf,
    # --- r14 batch 2: product analytics + TPC-H composites ---
    "events_asof_join": r_events_asof_join,
    "events_merge_asof": r_events_merge_asof,
    "events_asof_nearest": r_events_asof_nearest,
    "events_attribution": r_events_attribution,
    "events_attribution_linear": r_events_attribution_linear,
    "events_cohort_retention": r_events_cohort_retention,
    "events_ewm": r_events_ewm,
    "events_anomaly_mad": r_events_anomaly_mad,
    "events_interval_join": r_events_interval_join,
    "events_sliding_window": r_events_sliding_window,
    "events_json": r_events_json,
    "window_range_frame": r_window_range_frame,
    "text_vocab": r_text_vocab,
    "curation_funnel": r_curation_funnel,
    "groupby_ts_key": r_groupby_ts_key,
    "tpch_q4": r_tpch_q4,
    "tpch_q12": r_tpch_q12,
    "tpch_q14": r_tpch_q14,
    # --- r14 extension (VERDICT r13 #4) ---
    # core shapes
    "groupby_count": r_groupby_count,
    "groupby_extended": r_groupby_extended,
    "groupby_bool": r_groupby_bool,
    "groupby_cube": r_groupby_cube,
    "groupby_rollup": r_groupby_rollup,
    "pivot": r_pivot,
    "join_full": r_join_full,
    "join_timestamp_key": r_join_timestamp_key,
    "int_literal_widening": r_int_literal_widening,
    "datetime_filter": r_datetime_filter,
    "datetime_parts": r_datetime_parts,
    "window_lag": r_window_lag,
    "window_rolling": r_window_rolling,
    # composite analytics
    "tpch_q3": r_tpch_q3,
    "tpch_q5": r_tpch_q5,
    "tpch_q6": r_tpch_q6,
    "tpch_q13": r_tpch_q13,
    "events_window": r_events_window,
    # sampling
    "sample_hash": r_sample_hash,
    "dataset_split": r_dataset_split,
    # text / quality (the DuckDB-shared-machinery priority set)
    "text_lang_id": r_text_lang_id,
    "text_quality": r_text_quality,
    "text_repetition": r_text_repetition,
    "text_redact_pii": r_text_redact_pii,
    "quality_gopher": r_quality_gopher,
    "quality_c4": r_quality_c4,
    "text_line_dedup": r_text_line_dedup,
    "text_phrase_search": r_text_phrase_search,
    "url_canonicalize": r_url_canonicalize,
    # warehouse (rank-dedup / fusion / diff / profile)
    "cdc_apply": r_cdc_apply,
    "cdc_survivorship": r_cdc_survivorship,
    "table_diff": r_table_diff,
    "table_profile": r_table_profile,
    # dedup clustering
    "dedup_clusters": r_dedup_clusters,
    "dedup_keep_best": r_dedup_keep_best,
}


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-compare canonical form: columns sorted by name, rows
    sorted by every column, dtypes normalized to int64/float64/str."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        kind = out[c].dtype.kind
        if kind in "iu":
            out[c] = out[c].astype(np.int64)
        elif kind == "f":
            out[c] = out[c].astype(np.float64)
        elif kind == "b":
            out[c] = out[c].astype(bool)
        else:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main():
    from charmpandas_spark.session import get_spark
    import __spark_entry__ as entry_mod

    sf_dir = SF_DIR
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    only = [a for a in sys.argv[1:]
            if not a.startswith("--")
            and a not in (sf_dir, out_path)]
    if only:
        # ADVICE r16: a typo'd subset name used to vanish silently
        # (n=0, failures=0 — indistinguishable from a clean pass)
        unknown = sorted(set(only) - set(REPLAYS))
        if unknown:
            print(f"ERROR: unknown replay name(s): {unknown} "
                  f"(not in REPLAYS)", file=sys.stderr)
            sys.exit(2)
        replays = {k: REPLAYS[k] for k in only}
    else:
        replays = REPLAYS
    spark = get_spark(app_name="pandas-witness")
    qs = entry_mod.queries()
    results, fails = {}, 0
    for name, replay in replays.items():
        try:
            got = _canon(qs[name](spark, sf_dir).toPandas())
            want = _canon(replay(sf_dir))
            ok = (list(got.columns) == list(want.columns)
                  and len(got) == len(want) and got.equals(want))
            results[name] = {"rows": len(got), "match": bool(ok)}
            if not ok:
                fails += 1
                diff = (got != want).any()
                results[name]["diff_cols"] = \
                    [c for c in got.columns if diff.get(c, True)] \
                    if len(got) == len(want) else \
                    f"rows {len(got)} vs {len(want)}"
            print(f"{'OK  ' if ok else 'FAIL'} {name} "
                  f"({len(got)} rows)", file=sys.stderr)
        except Exception as exc:
            fails += 1
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"ERR  {name}: {results[name]['err']}",
                  file=sys.stderr)
    spark.stop()
    doc = {"sf_dir": sf_dir, "engine": "pandas/numpy replay",
           "n": len(replays), "failures": fails,
           # a subset run must not read as full coverage (ADVICE r16)
           "subset": sorted(replays) if only else None,
           "coverage": {
               "replayed": len(replays),
               "registry": len(qs),
               "excluded": sorted(set(qs) - set(replays)),
               "bounds_mode": sorted(BOUNDS_MODE),
               "bounds_mode_rationale":
                   "The four approx-sketch gates emit exact anchors "
                   "plus an in-query `ok` envelope boolean (the "
                   "sketch estimates themselves are Spark-internal "
                   "and stay out of the hashed columns). Their "
                   "replays recompute the exact anchors "
                   "independently and assert ok=true — a bound "
                   "violation flips ok and fails the value compare, "
                   "so the committed approx values are witnessed to "
                   "sit inside the oracle's own envelopes."},
           "queries": results}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    print(json.dumps(doc))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
