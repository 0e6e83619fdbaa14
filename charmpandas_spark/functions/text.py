"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (the reference has NO string functions at
all — the ArrayOperation enum at src/operations.hpp:10-23 is its
complete scalar-function inventory). These are the north-star
LLM-pipeline operators: language ID, quality scoring, token counting,
document fingerprinting.

Design rules (100 TB):
- Everything is built-in ``pyspark.sql.functions`` — JVM-side,
  whole-stage-codegen'd, no Python in the hot path.
- Deterministic across engines: hashing is md5 (identical in Spark and
  DuckDB), ratios use FLOOR-based rounding (IEEE-exact both sides).
- Each operator is a Column-in/Column-out function, so it composes
  with filters/joins and Catalyst can prune/push around it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "normalize_text",
    "whitespace_token_count",
    "regex_token_count",
    "language_id",
    "quality_score",
    "fingerprint",
    "char_shingles",
    "word_shingles",
    "corpus_vocab",
    "tf_idf",
    "token_frequency_stats",
    "chunk_documents",
    "pack_sequences",
    "pack_greedy",
    "redact_pii",
    "repetition_stats",
    "token_drift",
    "token_drift_sql",
    "vocab_coverage",
    "vocab_coverage_sql",
    "LANG_STOPWORDS",
    "TOKEN_REGEX",
]

#: BPE-ish tokenizer regex: letter runs, single digits, punctuation
#: marks — approximates byte-pair-encoding token boundaries closely
#: enough for count-based filtering.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

#: Small high-frequency stopword sets per language for n-gram/stopword
#: language ID. Word-boundary regexes keep this evaluable as one
#: vectorized regexp_count per language.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it",
           "with", "was", "on", "are", "this"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu",
           "den", "von", "mit", "sich", "auf", "für"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "que", "pour",
           "dans", "qui", "pas", "sur", "avec"],
    "es": ["el", "los", "las", "y", "que", "en", "un", "es", "por",
           "con", "una", "para", "del", "se"],
}


def lang_pattern(lang: str) -> str:
    """Word-boundary alternation regex for one language's stopwords."""
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim — the canonical form used
    by fingerprinting and dedup so trivial formatting differences don't
    defeat near-dup detection."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def whitespace_token_count(col: Column | str) -> Column:
    """Token count by whitespace splitting (0 for empty/blank)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("int")


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: number of TOKEN_REGEX matches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX)).cast("int")


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit
    counts over the lowercased text; 'und' (undetermined) when no
    stopword of any language matches. One vectorized regexp_count per
    language — no UDF, fully codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    scores = {lang: F.regexp_count(low, F.lit(lang_pattern(lang)))
              for lang in LANG_STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic tie-break: later-checked language wins ties only if
    # strictly greater; iterate in reversed fixed order so 'en' wins
    # ties (checked last => first when-match below).
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def language_id_sql(text_expr: str) -> str:
    """DuckDB-SQL twin of :func:`language_id` (oracle generation)."""
    score = {
        lang: ("length(regexp_extract_all(lower(" + text_expr + "), "
               f"'{lang_pattern(lang)}'))")
        for lang in LANG_STOPWORDS
    }
    greatest = "greatest(" + ", ".join(score.values()) + ")"
    out = "'und'"
    for lang in reversed(list(LANG_STOPWORDS)):
        out = (f"CASE WHEN {score[lang]} = {greatest} THEN '{lang}' "
               f"ELSE {out} END")
    return f"CASE WHEN {greatest} = 0 THEN 'und' ELSE {out} END"


def quality_score(col: Column | str) -> Column:
    """Document quality in [0,1]: weighted blend of alphabetic ratio,
    stopword presence, word-length sanity, and length saturation.
    Pure built-ins; ANSI-safe (no division by zero)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    safe_n = F.when(n == 0, F.lit(1)).otherwise(n).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / safe_n
    words = whitespace_token_count(c)
    safe_w = F.when(words == 0, F.lit(1)).otherwise(words).cast("double")
    mean_wlen = F.length(F.regexp_replace(c, r"\s", "")) / safe_w
    # word length sanity: 1 at mean length 5, linearly 0 by 1 or 15
    wlen_term = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.abs(mean_wlen - F.lit(5.0)) / F.lit(10.0))
    stop_hits = F.regexp_count(F.lower(c), F.lit(lang_pattern("en")))
    stop_term = F.least(F.lit(1.0), stop_hits.cast("double") / F.lit(8.0))
    len_term = F.least(F.lit(1.0), n.cast("double") / F.lit(500.0))
    raw = (F.lit(0.35) * alpha + F.lit(0.25) * stop_term
           + F.lit(0.2) * wlen_term + F.lit(0.2) * len_term)
    score = F.when(n == 0, F.lit(0.0)).otherwise(raw)
    return F.floor(score * 10000) / 10000


def quality_score_sql(t: str) -> str:
    """DuckDB-SQL twin of :func:`quality_score`."""
    n = f"length({t})"
    safe_n = f"CAST(CASE WHEN {n} = 0 THEN 1 ELSE {n} END AS DOUBLE)"
    alpha = f"length(regexp_replace({t}, '[^A-Za-z]', '', 'g')) / {safe_n}"
    words = (f"CASE WHEN trim({t}) = '' THEN 0 ELSE "
             f"length(regexp_split_to_array(trim({t}), '\\s+')) END")
    safe_w = f"CAST(CASE WHEN ({words}) = 0 THEN 1 ELSE ({words}) END AS DOUBLE)"
    mean_wlen = f"length(regexp_replace({t}, '\\s', '', 'g')) / {safe_w}"
    wlen_term = f"greatest(0.0, 1.0 - abs(({mean_wlen}) - 5.0) / 10.0)"
    stop_hits = (f"length(regexp_extract_all(lower({t}), "
                 f"'{lang_pattern('en')}'))")
    stop_term = f"least(1.0, CAST({stop_hits} AS DOUBLE) / 8.0)"
    len_term = f"least(1.0, CAST({n} AS DOUBLE) / 500.0)"
    raw = (f"0.35 * ({alpha}) + 0.25 * ({stop_term}) + 0.2 * ({wlen_term})"
           f" + 0.2 * ({len_term})")
    return (f"FLOOR((CASE WHEN {n} = 0 THEN 0.0 ELSE {raw} END) * 10000)"
            f" / 10000")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 is bit-identical across Spark/DuckDB/Python — the foundation
    for exact dedup and for seeding minhash."""
    return F.md5(normalize_text(col).cast("binary"))


def fingerprint_sql(t: str) -> str:
    return f"md5(trim(regexp_replace(lower({t}), '\\s+', ' ', 'g')))"


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text, as an
    array column. Built with sequence+transform (JVM-side); documents
    shorter than k yield a single whole-string shingle.

    PERF: as a Column expression the embedded normalize re-evaluates
    per array element (HOF lambda semantics). For bulk corpora use
    ``dedup.shingle_table``, which materializes the normalize behind
    an exchange (one evaluation per row)."""
    norm = normalize_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(norm, i, k)))


def char_shingles_sql(t: str, k: int = 5) -> str:
    norm = f"trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"
    return (f"list_distinct(list_transform("
            f"range(1, greatest(length({norm}) - {k - 1}, 1) + 1), "
            f"i -> substr({norm}, CAST(i AS INT), {k})))")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the normalized text."""
    words = F.split(normalize_text(col), " ")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.array_distinct(F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")))


def word_shingles_sql(t: str, n: int = 3) -> str:
    norm = f"trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"
    words = f"string_split({norm}, ' ')"
    return (f"list_distinct(list_transform("
            f"range(0, greatest(length({words}) - {n}, 0) + 1), "
            f"i -> array_to_string(list_slice({words}, "
            f"CAST(i + 1 AS INT), CAST(i + {n} AS INT)), ' ')))")


def corpus_vocab(df, text_col: str, id_col: str, top_k: int = 100):
    """Top-``top_k`` corpus vocabulary by token frequency (tokens from
    the normalized text). One explode + one groupBy; Spark's
    orderBy+limit computes per-partition top-k before the final merge,
    so the driver never sees more than top_k rows. Ties broken by
    token text for determinism."""
    from .dedup import spread

    toks = (spread(df).select(
                F.explode(F.split(normalize_text(text_col), " "))
                 .alias("token"))
            .filter(F.col("token") != ""))
    return (toks.groupBy("token")
                .agg(F.count(F.lit(1)).alias("freq"))
                .orderBy(F.col("freq").desc(), F.col("token").asc())
                .limit(top_k))


def tf_idf(df, text_col: str, id_col: str):
    """(doc, term, weight) TF-IDF-style weights over the corpus.

    Weight = (term count / doc length) * (N / document frequency) —
    the RATIONAL variant (no logarithm), so every factor is an exact
    ratio of integers and the double arithmetic is bit-identical
    across engines (ln's last-ulp behavior is libm-specific; for the
    classic log-damped idf apply ``F.log`` on top and accept
    approximate comparison). Two aggregations (r18): tf on
    (doc, term) and df on term; the doc length rides a WINDOW over
    the same doc-keyed exchange the old doclen join needed —
    ``sum(cnt) over (partition by doc)`` equals the token count
    exactly (both count the doc's non-empty tokens), so the separate
    groupBy(doc) pass over ``toks`` and its join disappear from the
    plan. N rides in as a broadcast 1-row aggregate, never a driver
    collect. ``toks`` and ``tf`` each feed two plan branches, so
    both are persisted (the raw scan + explode would otherwise run
    3x); call ``dedup.release`` on the result to free them."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from .dedup import spread

    toks = (spread(df).select(
                F.col(id_col).alias("doc"),
                F.explode(F.split(normalize_text(text_col), " "))
                 .alias("term"))
            .filter(F.col("term") != "")
            .persist(StorageLevel.MEMORY_AND_DISK))
    tf = toks.groupBy("doc", "term").agg(
        F.count(F.lit(1)).alias("cnt")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n"))
    weight = (F.col("cnt").cast("double") / F.col("dl")) \
        * (F.col("n").cast("double") / F.col("df"))
    out = (tf.withColumn("dl", F.sum("cnt").over(
                Window.partitionBy("doc")))
             .join(dfreq, "term")
             .crossJoin(F.broadcast(n_docs))
             .select("doc", "term",
                     (F.floor(weight * 1000000) / 1000000)
                     .alias("weight")))
    out._cps_persisted = [toks, tf]  # see dedup.release()
    return out


# ---------------------------------------------------------------------------
# training-data preparation: chunking + PII redaction
# ---------------------------------------------------------------------------

def chunk_documents(
    df: SparkDF,
    text_col: str,
    id_col: str,
    max_tokens: int = 64,
    overlap: int = 8,
) -> SparkDF:
    """Split documents into overlapping token-bounded chunks — the
    standard pre-tokenization step for training-corpus assembly
    (context-window packing wants bounded, slightly-overlapping
    pieces, not whole documents).

    Whitespace tokens over the normalized text; chunk k covers tokens
    ``[k*stride, k*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``, so consecutive chunks share
    ``overlap`` tokens and every token lands in >= 1 chunk. Output:
    (doc, chunk_idx, chunk_text, n_tokens).

    Scale: pure built-ins (split/sequence/posexplode/slice — JVM-side,
    codegen), no shuffle at all: chunking rides the scan and the
    explode multiplies rows ~n_tokens/stride per doc, embarrassingly
    parallel at any corpus size.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    toks = F.col("__cps_toks")
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size(toks) - 1, F.lit(0)),
                        F.lit(stride))
    return (df.select(F.col(id_col).alias("doc"),
                      F.split(normalize_text(text_col), " ")
                       .alias("__cps_toks"))
              .select("doc", "__cps_toks",
                      F.posexplode(starts).alias("chunk_idx",
                                                 "__cps_start"))
              .withColumn("__cps_toks",
                          F.slice(toks, F.col("__cps_start") + 1,
                                  max_tokens))
              .select("doc", "chunk_idx",
                      F.array_join("__cps_toks", " ").alias("chunk_text"),
                      F.size("__cps_toks").alias("n_tokens")))


def chunk_documents_sql(t: str, id_expr: str, max_tokens: int = 64,
                        overlap: int = 8) -> str:
    """DuckDB twin of :func:`chunk_documents` (same normalize, same
    chunk geometry) for oracle verification. The CROSS JOIN
    range(0, 100000) bounds chunk generation at 100k chunks/document
    (~2.8M tokens at the registered stride) — an oracle-side-only cap,
    comfortably above the test corpora; the Spark side is unbounded.
    A guard CTE makes the cap LOUD: if any document ever needs more
    chunks than the range provides, the oracle raises instead of
    silently under-producing rows (range() can't take a subquery
    bound in DuckDB, so the bound can't be derived from max(n))."""
    stride = max_tokens - overlap
    norm = f"trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc,
                   string_split({norm}, ' ') AS tk,
                   len(string_split({norm}, ' ')) AS n
            FROM documents),
        guard AS (
            SELECT CASE WHEN MAX(n) >= 100000 * {stride}
                        THEN error('chunk oracle cap exceeded: doc over '
                                   || (100000 * {stride}) || ' tokens')
                        ELSE 1 END AS ok
            FROM toks),
        st AS (
            SELECT doc, tk, n, CAST(k AS INT) AS chunk_idx,
                   CAST(k * {stride} AS INT) AS s
            FROM toks CROSS JOIN guard CROSS JOIN range(0, 100000) r(k)
            WHERE k * {stride} <= greatest(n - 1, 0))
        SELECT doc, chunk_idx,
               array_to_string(tk[s + 1 : least(s + {max_tokens}, n)], ' ')
                   AS chunk_text,
               CAST(least(s + {max_tokens}, n) - s AS INT) AS n_tokens
        FROM st
    """


def token_frequency_stats(df, text_col: str, id_col: str):
    """Corpus-statistics quality signals (the unigram-LM family of
    filters, rational-arithmetic edition): per document,

    - ``n_tokens``,
    - ``mean_tok_freq``: mean corpus frequency of the doc's tokens
      (commonness — wordlike text scores near natural-language
      frequencies, gibberish scores near 1/corpus),
    - ``rare_frac``: fraction of tokens whose corpus count <= 2
      (OOV/noise proxy — the practical 'perplexity-ish' junk
      detector without a log, so every value is two IEEE divisions
      + floor, bit-identical in the DuckDB oracle).

    Plan shape (100 TB): explode -> vocab aggregation (one shuffle,
    map-side combined) -> SHUFFLE_HASH join of the exploded tokens
    against the vocab (hinted: the vocab can be 10^8 rows — never
    broadcast it; same policy as the dedup inverted index) -> per-doc
    aggregation (second shuffle). The corpus-total rides in-plan as a
    1-row broadcast.
    """
    toks = (df.select(F.col(id_col).alias("doc"),
                      F.explode(F.split(normalize_text(text_col), " "))
                      .alias("tok"))
              .filter(F.col("tok") != ""))
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("__cps_tc"))
    total = vocab.agg(F.sum("__cps_tc").alias("__cps_tot"))
    joined = (toks.join(vocab.hint("shuffle_hash"), "tok")
                  .crossJoin(F.broadcast(total)))
    return (joined.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("__cps_tc").alias("__cps_sum"),
                 F.sum(F.when(F.col("__cps_tc") <= 2, 1).otherwise(0))
                  .alias("__cps_rare"),
                 F.first("__cps_tot").alias("__cps_tot"))
            .select(
                "doc", "n_tokens",
                (F.floor(F.col("__cps_sum").cast("double")
                         / F.col("n_tokens") / F.col("__cps_tot")
                         * 100_000_000) / 100_000_000)
                .alias("mean_tok_freq"),
                (F.floor(F.col("__cps_rare").cast("double")
                         / F.col("n_tokens") * 1_000_000) / 1_000_000)
                .alias("rare_frac")))


def token_frequency_stats_sql(t: str, id_expr: str) -> str:
    """DuckDB twin of :func:`token_frequency_stats` — same normalize,
    same rational arithmetic, same floor rounding."""
    norm = f"trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc, unnest(string_split({norm}, ' ')) AS tok
            FROM documents),
        tf AS (SELECT doc, tok FROM toks WHERE tok <> ''),
        vocab AS (SELECT tok, COUNT(*) AS tc FROM tf GROUP BY tok),
        total AS (SELECT SUM(tc) AS tot FROM vocab)
        SELECT f.doc, COUNT(*) AS n_tokens,
               FLOOR(CAST(SUM(v.tc) AS DOUBLE) / COUNT(*)
                     / ANY_VALUE(total.tot) * 100000000) / 100000000
                   AS mean_tok_freq,
               FLOOR(CAST(SUM(CASE WHEN v.tc <= 2 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*) * 1000000) / 1000000
                   AS rare_frac
        FROM tf f JOIN vocab v USING (tok) CROSS JOIN total
        GROUP BY f.doc
    """


def pack_sequences(
    chunks,
    token_col: str = "n_tokens",
    order_cols: tuple[str, ...] = ("doc", "chunk_idx"),
    budget: int = 2048,
    num_partitions: int | None = None,
):
    """Context-window PACKING: concatenate chunks in global
    ``order_cols`` order and cut fixed ``budget``-token training
    sequences (the GPT-style pack-then-cut pipeline step right after
    :func:`chunk_documents`). Each chunk is assigned the sequence in
    which it STARTS (``seq_id``) and its token offset within that
    sequence (``seq_offset``); a chunk whose tokens straddle a cut
    continues into the next sequence (``n_seqs`` > 1).

    Scale design — a DISTRIBUTED PREFIX SUM, because the naive
    ``sum().over(Window.orderBy(...))`` global window collapses the
    whole corpus into ONE sorted task:

    1. range-repartition on ``order_cols`` (one shuffle; ranges are
       globally ordered and non-overlapping),
    2. sort within partitions (local, no shuffle) and stream a
       running exclusive cumsum per partition via ``mapInPandas``
       (the batch iterator spans the whole partition in order); the
       cumsum output is pinned MEMORY_AND_DISK because BOTH the data
       path and the totals path consume it — without the pin,
       Catalyst's column pruning specializes the two subtrees and
       the scan+chunk+shuffle+cumsum would run twice (measured: 2
       scans, zero ReusedExchange). Call ``dedup.release(out)`` to
       free it, as with the dedup/similarity pipelines,
    3. per-partition token totals (map-side partial agg of the
       pinned cumsum) feed a tiny ≤num_partitions-row running-offset
       window (single task over partition COUNT, not data) broadcast
       back,
    4. global start = partition offset + local cumsum; seq_id/offset
       are pure arithmetic.

    Parallelism is bounded by data size at every step; the only
    single-task structure holds one row per PARTITION. ``order_cols``
    must be a unique key (ties across a range boundary would make
    the order — and the packing — nondeterministic).
    """
    from pyspark import TaskContext
    from pyspark.sql import Window

    sdf = chunks
    spark = sdf.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32"))
    oc = list(order_cols)
    ranged = (sdf.repartitionByRange(num_partitions, *oc)
                 .sortWithinPartitions(*oc))

    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType)
    out_schema = StructType(list(sdf.schema.fields) + [
        StructField("__cps_start", LongType()),
        StructField("__cps_pid", IntegerType())])
    tname = token_col

    def cumsum_stream(batches):
        import pandas as _pd  # noqa: F401 (worker-side)
        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            t = pdf[tname].astype("int64")
            pdf = pdf.copy()
            pdf["__cps_start"] = t.cumsum() - t + run
            pdf["__cps_pid"] = pid
            run += int(t.sum())
            yield pdf

    from pyspark import StorageLevel

    local = (ranged.mapInPandas(cumsum_stream, out_schema)
             .persist(StorageLevel.MEMORY_AND_DISK))
    totals = (local
              .groupBy("__cps_pid")
              .agg(F.sum(tname).cast("long").alias("__cps_ptot")))
    w_off = (Window.orderBy("__cps_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "__cps_pid",
        F.coalesce(F.sum("__cps_ptot").over(w_off), F.lit(0))
         .alias("__cps_poff"))
    start = (F.col("__cps_poff") + F.col("__cps_start")).alias("__s")
    out = (local.join(F.broadcast(offsets), "__cps_pid")
                .withColumn("__s", start)
                .select(*sdf.columns,
                        F.floor(F.col("__s") / budget)
                         .cast("long").alias("seq_id"),
                        F.pmod(F.col("__s"), F.lit(budget))
                         .cast("long").alias("seq_offset"),
                        (F.floor((F.col("__s") + F.greatest(
                            F.col(tname).cast("long"), F.lit(1)) - 1)
                            / budget) - F.floor(F.col("__s") / budget)
                         + 1).cast("int").alias("n_seqs")))
    out._cps_persisted = [local]  # see dedup.release()
    return out


def pack_greedy(
    chunks,
    token_col: str = "n_tokens",
    order_cols: tuple[str, ...] = ("doc", "chunk_idx"),
    budget: int = 2048,
    group_col: str | None = None,
    num_groups: int = 1024,
):
    """NO-SPLIT packing: greedy next-fit — chunks are never cut; a
    new bin opens whenever the next chunk would overflow ``budget``
    (SFT-style packing, where an example must not straddle
    sequences). Chunks LARGER than the budget get a bin of their own
    (callers should pre-filter or pre-chunk; they are flagged with
    ``overflow = true``).

    Greedy packing is inherently sequential, so it cannot be a
    window function; the scale shape is PARTITIONED greed: rows
    group by ``group_col`` (default: a deterministic hash of the
    leading order column into ``num_groups`` buckets), each group is
    packed independently — exact greedy within a group, parallel
    across groups, one shuffle total. Bin ids are (group, local_bin)
    pairs encoded as ``group * 2^32 + local``, globally unique. The
    packing-efficiency loss vs single-stream greedy is at most one
    partially-filled trailing bin PER GROUP — negligible when
    groups >> budget tokens.

    Next-fit (not first-fit-decreasing) is deliberate: it preserves
    ``order_cols`` order inside every bin, which training pipelines
    want (document chunks stay adjacent), and it is
    deterministic with a trivial sequential reference.

    Group-column contract (r6 ADVICE): a user-supplied ``group_col``
    must be integral with values in ``[0, 2^31)`` — the value is the
    high half of ``bin_id`` (``group * 2^32 + local``), keeping bin
    ids interpretable and collision-free. Non-integral columns raise
    at plan time and out-of-range values raise inside the task;
    arbitrary keys (strings, negatives) should go through the default
    path, which hashes via ``pmod(xxhash64(...))``.
    """
    from pyspark.sql.types import (
        BooleanType, ByteType, IntegerType, LongType, ShortType,
        StructField, StructType)

    sdf = chunks
    if group_col is None:
        sdf = sdf.withColumn(
            "__cps_grp",
            F.pmod(F.xxhash64(F.col(order_cols[0])), F.lit(num_groups)))
        group_col = "__cps_grp"
    else:
        gtype = sdf.schema[group_col].dataType
        if not isinstance(gtype, (ByteType, ShortType, IntegerType,
                                  LongType)):
            raise TypeError(
                f"pack_greedy group_col {group_col!r} must be an "
                f"integer column in [0, 2^31) (got {gtype.simpleString()}"
                f"); hash arbitrary keys first, e.g. "
                f"pmod(xxhash64(col), n_groups)")
    out_schema = StructType(list(sdf.schema.fields) + [
        StructField("bin_id", LongType()),
        StructField("bin_fill", LongType()),
        StructField("overflow", BooleanType())])
    oc, tname, gname = list(order_cols), token_col, group_col

    def pack_group(_key, pdf):
        pdf = pdf.sort_values(oc).reset_index(drop=True)
        grp = int(pdf[gname].iloc[0])
        if not (0 <= grp < (1 << 31)):
            raise ValueError(
                f"pack_greedy group value {grp} outside [0, 2^31): "
                f"bin_id = group * 2^32 + local would collide or "
                f"overflow; hash the group column first")
        bins, fills, over = [], [], []
        local, fill = 0, 0
        for t in pdf[tname].astype("int64"):
            t = int(t)
            if fill > 0 and fill + t > budget:
                local, fill = local + 1, 0
            bins.append(grp * (1 << 32) + local)
            fill += t
            fills.append(fill)
            over.append(t > budget)
        pdf = pdf.copy()
        pdf["bin_id"], pdf["bin_fill"], pdf["overflow"] = bins, fills, over
        return pdf

    out = (sdf.groupBy(gname)
              .applyInPandas(pack_group, out_schema))
    if gname == "__cps_grp":
        out = out.drop("__cps_grp")
    return out


def pack_sequences_sql(chunks_cte: str, budget: int,
                       token_col: str = "n_tokens",
                       order_cols: tuple[str, ...] = ("doc", "chunk_idx"),
                       ) -> str:
    """DuckDB twin of :func:`pack_sequences`: the single-node global
    window the distributed prefix sum must match bit-for-bit.
    ``chunks_cte`` is a complete CTE body producing the chunk rows
    (e.g. the :func:`chunk_documents_sql` query)."""
    ob = ", ".join(order_cols)
    return f"""
        WITH chunks AS ({chunks_cte}),
        s AS (
            SELECT *, COALESCE(SUM({token_col}) OVER (
                       ORDER BY {ob}
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS st
            FROM chunks)
        SELECT * EXCLUDE (st),
               CAST(FLOOR(st / {budget}) AS BIGINT) AS seq_id,
               CAST(st % {budget} AS BIGINT) AS seq_offset,
               CAST(FLOOR((st + GREATEST({token_col}, 1) - 1)
                          / {budget})
                    - FLOOR(st / {budget}) + 1 AS INT) AS n_seqs
        FROM s
    """


_PII_PATTERNS = [
    # order matters: emails before bare domains, IPs before phones
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Redact common PII shapes (emails, IPv4s, phone-ish numbers)
    with typed placeholders — the minimum-viable scrub pass a
    training pipeline runs before anything else sees the text. Pure
    ``regexp_replace`` chain: JVM-side, codegen, no shuffle; patterns
    are RE2-compatible so the DuckDB oracle uses the SAME strings
    (see ``redact_pii_sql``)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def redact_pii_sql(t: str) -> str:
    """DuckDB twin of :func:`redact_pii` — identical pattern chain."""
    out = t
    for pat, tag in _PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{tag}', 'g')"
    return out


def repetition_stats(
    df: SparkDF,
    text_col: str,
    id_col: str,
) -> SparkDF:
    """Gopher-style repetition signals per document: the fraction of
    all word 2-grams taken by the single most frequent one
    (``top_bigram_frac``) and the distinct-token ratio
    (``distinct_token_frac``) — the standard template/boilerplate
    detectors a web-corpus filter stack applies before training.

    Bigrams are built JVM-side from the token array (one HOF pass per
    row), then one shuffle on (doc, bigram) for the counts and one on
    doc for the roll-up — both partial-aggregated map-side. Fractions
    are exact rationals floored at 1e-6 (cross-engine parity); both
    are null for documents with fewer than 2 tokens.
    """
    tk = F.col("__cps_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tk) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(tk, i),
                              F.element_at(tk, i + 1)))
    base = (df.select(F.col(id_col).alias("doc"),
                      F.split(normalize_text(text_col), " ")
                       .alias("__cps_toks"))
              .select("doc",
                      F.size(tk).alias("n_toks"),
                      F.size(F.array_distinct(tk)).alias("n_distinct"),
                      F.explode(
                          F.when(F.size(tk) >= 2, grams)
                           .otherwise(F.array().cast("array<string>")))
                      .alias("gram")))
    counts = base.groupBy("doc", "n_toks", "n_distinct", "gram") \
                 .agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy("doc", "n_toks", "n_distinct").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("total"))
    frac = lambda num, den: F.floor(  # noqa: E731
        num.cast("double") / den.cast("double") * 1000000) / 1000000
    out = df.select(F.col(id_col).alias("doc")).join(agg, "doc", "left")
    return out.select(
        "doc",
        F.coalesce(F.col("total"), F.lit(0)).alias("n_bigrams"),
        F.when(F.col("total") > 0,
               frac(F.col("top_c"), F.col("total")))
         .alias("top_bigram_frac"),
        F.when(F.col("total") > 0,
               frac(F.col("n_distinct"), F.col("n_toks")))
         .alias("distinct_token_frac"))


def repetition_stats_sql(t: str, id_expr: str) -> str:
    """DuckDB twin of :func:`repetition_stats`."""
    norm = f"trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc, string_split({norm}, ' ') AS tk
            FROM documents),
        st AS (SELECT doc, tk, len(tk) AS n_toks,
                      len(list_distinct(tk)) AS n_distinct
               FROM toks),
        grams AS (
            SELECT doc, n_toks, n_distinct,
                   tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]
                       AS gram
            FROM st CROSS JOIN range(1, 1000000) r(i)
            WHERE i <= n_toks - 1),
        counts AS (
            SELECT doc, n_toks, n_distinct, gram, COUNT(*) AS c
            FROM grams GROUP BY 1, 2, 3, 4),
        agg AS (
            SELECT doc, n_toks, n_distinct,
                   MAX(c) AS top_c, SUM(c) AS total
            FROM counts GROUP BY 1, 2, 3)
        SELECT s.doc,
               CAST(COALESCE(a.total, 0) AS BIGINT) AS n_bigrams,
               CASE WHEN a.total > 0 THEN
                   FLOOR(CAST(a.top_c AS DOUBLE) / a.total * 1000000)
                       / 1000000 END AS top_bigram_frac,
               CASE WHEN a.total > 0 THEN
                   FLOOR(CAST(a.n_distinct AS DOUBLE) / a.n_toks
                         * 1000000) / 1000000 END AS distinct_token_frac
        FROM st s LEFT JOIN agg a USING (doc)
    """


def assign_shards(
    df,
    token_col: str,
    order_cols: tuple[str, ...],
    shard_tokens: int,
    num_partitions: int | None = None,
):
    """Assign each row (document) to a training SHARD so consecutive
    shards hold ~``shard_tokens`` tokens each — the unit a trainer
    streams (one shard ≈ one data-loader file). A document belongs
    to the shard where its global token-offset STARTS, so documents
    are never split; a shard can exceed the budget by at most one
    document's tokens.

    Built on :func:`pack_sequences`'s distributed prefix sum — same
    scale shape (range shuffle + per-partition streamed cumsum +
    per-partition offset broadcast), no global single-task window.
    Output: the input columns + ``shard`` (bigint). Call
    ``dedup.release(out)`` after the action to free the pinned
    cumsum intermediate.
    """
    packed = pack_sequences(df, token_col=token_col,
                            order_cols=order_cols, budget=shard_tokens,
                            num_partitions=num_partitions)
    out = packed.select(*df.columns, F.col("seq_id").alias("shard"))
    out._cps_persisted = getattr(packed, "_cps_persisted", [])
    return out


def assign_shards_sql(rows_cte: str, shard_tokens: int, token_col: str,
                      order_cols: tuple[str, ...]) -> str:
    """DuckDB twin of :func:`assign_shards` (global window cumsum)."""
    ob = ", ".join(order_cols)
    return f"""
        WITH rows_in AS ({rows_cte})
        SELECT * EXCLUDE (__st),
               CAST(FLOOR(__st / {shard_tokens}) AS BIGINT) AS shard
        FROM (SELECT *, COALESCE(SUM({token_col}) OVER (
                          ORDER BY {ob}
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS __st
              FROM rows_in)
    """


def write_token_shards(
    df,
    path: str,
    token_col: str,
    order_cols: tuple[str, ...],
    shard_tokens: int,
    mode: str = "overwrite",
) -> None:
    """Materialize :func:`assign_shards` as a ``shard=N``-partitioned
    parquet layout with ONE file per shard: the hash repartition on
    ``shard`` lands each shard's rows in a single task, so each
    partition directory holds a single right-sized file — exactly
    what a data loader wants to memory-map sequentially. Shard count
    grows with corpus tokens / ``shard_tokens``, so parallelism is
    corpus-proportional at any scale.
    """
    out = assign_shards(df, token_col, order_cols, shard_tokens)
    (out.repartition(F.col("shard"))
        .write.mode(mode).partitionBy("shard").parquet(path))
    from .dedup import release
    release(out)


def token_drift(df_a, df_b, text_col: str, id_col: str,
                min_count: int = 5):
    """Vocabulary drift between two corpus slices (yesterday's crawl
    vs today's, source A vs source B) — the data-quality monitor that
    catches a scraper change or an injected spam burst before
    training does. Per token appearing >= ``min_count`` times
    overall: observed counts in each slice and a chi-square-style
    drift contribution against the pooled expectation,
    ``chi_micro = floor(1e6 * (o_a - e_a)^2 / e_a) + floor(1e6 *
    (o_b - e_b)^2 / e_b)`` where ``e_side = total_side * (o_a + o_b)
    / (total_a + total_b)``. Int64 micro-units (fixed-order doubles
    inside, integer sum outside), so the per-token scores and any
    top-k drift ranking are cross-engine exact; ``ORDER BY chi_micro
    DESC`` surfaces the drifting tokens.

    Plan (r18, the dsir conditional-aggregate fusion — VERDICT r17
    #7): BOTH sides' counts come out of ONE side-tagged union +
    single groupBy(token) with two conditional counts (the former
    per-side groupBy pair + full-outer join re-derived each side's
    explode subtree), and the totals ta/tb ride a single GLOBAL
    window over the vocab-sized count table (one tiny
    single-partition exchange) instead of two
    crossJoin-of-derived-aggregate subtrees the static planner
    duplicated — the r16 plan re-ran the corpus explode SIX times (2
    sides x {joined, ta, tb}), this one runs it once per side.
    Values are identical int64: a conditional count over the union
    equals the per-side count with absent tokens coalesced to 0, and
    the window totals sum the same vocab rows the 1-row aggregates
    did. Shuffle volume is bounded by vocabulary, not corpus rows."""
    from pyspark.sql import Window

    from .dedup import spread

    def toks(df, flag):
        return (spread(df).select(
                    F.lit(flag).alias("__in_a"),
                    F.explode(F.split(normalize_text(text_col), " "))
                     .alias("token"))
                .filter(F.col("token") != ""))

    joined = (toks(df_a, True).unionByName(toks(df_b, False))
              .groupBy("token")
              .agg(F.count(F.when(F.col("__in_a"), 1)).alias("o_a"),
                   F.count(F.when(~F.col("__in_a"), 1)).alias("o_b")))
    tot = Window.partitionBy()
    j = (joined.withColumn("__ta", F.sum("o_a").over(tot))
               .withColumn("__tb", F.sum("o_b").over(tot))
               .where(F.col("o_a") + F.col("o_b") >= min_count))
    pooled = (F.col("o_a") + F.col("o_b")).cast("double") \
        / (F.col("__ta") + F.col("__tb")).cast("double")
    ea = F.col("__ta").cast("double") * pooled
    eb = F.col("__tb").cast("double") * pooled
    chi = (F.floor(F.lit(1_000_000)
                   * (F.col("o_a").cast("double") - ea)
                   * (F.col("o_a").cast("double") - ea) / ea)
           + F.floor(F.lit(1_000_000)
                     * (F.col("o_b").cast("double") - eb)
                     * (F.col("o_b").cast("double") - eb) / eb))
    # an EMPTY slice (predicate matched nothing) zeroes one
    # expectation — chi-square is undefined there, and the raw
    # expression would divide by zero under ANSI; report NULL drift
    # rather than crash (same hazard class as the constant-column
    # histogram)
    chi = F.when((F.col("__ta") == 0) | (F.col("__tb") == 0),
                 F.lit(None)).otherwise(chi)
    return j.select("token", "o_a", "o_b", chi.alias("chi_micro"))


def token_drift_sql(t: str, pred_a: str, pred_b: str, id_expr: str,
                    text_expr: str, min_count: int = 5) -> str:
    """DuckDB twin of :func:`token_drift` over predicate-split halves
    of one table."""
    norm = (f"string_split(trim(regexp_replace(lower({text_expr}), "
            f"'\\s+', ' ', 'g')), ' ')")
    return f"""
        WITH toks AS (
            SELECT ({pred_a}) AS in_a, unnest({norm}) AS token
            FROM {t} WHERE ({pred_a}) OR ({pred_b})),
        c AS (
            SELECT token,
                   CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END)
                        AS BIGINT) AS o_a,
                   CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END)
                        AS BIGINT) AS o_b
            FROM toks WHERE token <> '' GROUP BY token),
        tot AS (SELECT sum(o_a) AS ta, sum(o_b) AS tb FROM c)
        SELECT token, o_a, o_b,
               CAST(FLOOR(1000000
                    * (CAST(o_a AS DOUBLE)
                       - CAST(ta AS DOUBLE) * (CAST(o_a + o_b AS DOUBLE)
                         / CAST(ta + tb AS DOUBLE)))
                    * (CAST(o_a AS DOUBLE)
                       - CAST(ta AS DOUBLE) * (CAST(o_a + o_b AS DOUBLE)
                         / CAST(ta + tb AS DOUBLE)))
                    / (CAST(ta AS DOUBLE) * (CAST(o_a + o_b AS DOUBLE)
                       / CAST(ta + tb AS DOUBLE)))) AS BIGINT)
               + CAST(FLOOR(1000000
                    * (CAST(o_b AS DOUBLE)
                       - CAST(tb AS DOUBLE) * (CAST(o_a + o_b AS DOUBLE)
                         / CAST(ta + tb AS DOUBLE)))
                    * (CAST(o_b AS DOUBLE)
                       - CAST(tb AS DOUBLE) * (CAST(o_a + o_b AS DOUBLE)
                         / CAST(ta + tb AS DOUBLE)))
                    / (CAST(tb AS DOUBLE) * (CAST(o_a + o_b AS DOUBLE)
                       / CAST(ta + tb AS DOUBLE)))) AS BIGINT)
                   AS chi_micro
        FROM c, tot
        WHERE o_a + o_b >= {min_count}
    """


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV-rate audit against a reference vocab
# ---------------------------------------------------------------------------

def vocab_coverage(df, ref_df, text_col: str, id_col: str,
                   vocab_size: int = 200):
    """Per-document OUT-OF-VOCABULARY rate against the top-``vocab_size``
    token vocabulary of a REFERENCE corpus — the audit run before
    committing a tokenizer or when admitting a new data source (a
    source whose tokens are mostly OOV to the reference either needs
    vocab growth or is the wrong language/format for the model).

    Output: ``(doc_id, n_tokens, n_oov, oov_micro)`` with
    ``oov_micro = floor(1e6 * n_oov / n_tokens)`` — an exact integer
    rational (empty documents emit 0 tokens and NULL rate rather
    than a fake 0: "no evidence" is not "fully covered").

    Plan: the vocabulary is ``corpus_vocab``'s per-partition top-k
    merge (driver never holds more than ``vocab_size`` rows) and
    broadcasts to the coverage join; the corpus side is one
    scan-local explode + a broadcast LEFT join + one groupBy on the
    doc id — the exploded tokens shuffle once, the corpus itself
    never does. At 100 TB the vocab stays vocab_size rows no matter
    the data; the doc-id groupBy is the only data-scale exchange.
    """
    from .dedup import spread

    vocab = corpus_vocab(ref_df, text_col, id_col, vocab_size) \
        .select(F.col("token").alias("__cps_v"))
    toks = (spread(df).select(
                F.col(id_col).alias("doc_id"),
                F.explode(F.split(normalize_text(text_col), " "))
                 .alias("token"))
            .filter(F.col("token") != ""))
    hit = (toks.join(F.broadcast(vocab),
                     toks["token"] == F.col("__cps_v"), "left")
               .select("doc_id",
                       F.col("__cps_v").isNull().cast("long")
                        .alias("__cps_oov")))
    counted = hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__cps_oov").alias("n_oov"))
    # empty docs vanish in the explode — restore them with 0/NULL
    return (df.select(F.col(id_col).alias("doc_id"))
              .join(counted, "doc_id", "left")
              .select("doc_id",
                      F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                      F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
                      F.floor(F.lit(1_000_000.0) * F.col("n_oov")
                              / F.col("n_tokens"))
                       .cast("long").alias("oov_micro")))


def vocab_coverage_sql(corpus_t: str, ref_t: str, text_expr: str,
                       id_expr: str, vocab_size: int = 200) -> str:
    """DuckDB twin of :func:`vocab_coverage` (same normalize + top-k
    vocab with (freq DESC, token ASC) tie-break)."""
    norm = (f"trim(regexp_replace(lower({text_expr}), '\\s+', ' ', "
            f"'g'))")
    return f"""
        WITH vocab AS (
            SELECT token FROM (
                SELECT unnest(string_split({norm}, ' ')) AS token
                FROM {ref_t}) WHERE token <> ''
            GROUP BY token
            ORDER BY count(*) DESC, token ASC LIMIT {vocab_size}),
        toks AS (
            SELECT {id_expr} AS doc_id,
                   unnest(string_split({norm}, ' ')) AS token
            FROM {corpus_t}),
        counted AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov
            FROM (SELECT * FROM toks WHERE token <> '') t
            LEFT JOIN vocab v USING (token)
            GROUP BY t.doc_id)
        SELECT d.doc_id,
               COALESCE(c.n_tokens, 0) AS n_tokens,
               COALESCE(c.n_oov, 0) AS n_oov,
               CAST(floor(1000000.0 * COALESCE(c.n_oov, 0)
                          / c.n_tokens) AS BIGINT) AS oov_micro
        FROM (SELECT {id_expr} AS doc_id FROM {corpus_t}) d
        LEFT JOIN counted c USING (doc_id)
    """
