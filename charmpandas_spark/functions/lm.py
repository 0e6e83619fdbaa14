"""Count-based n-gram language-model scoring — the classic
perplexity-style quality filter (CCNet / KenLM lineage) re-expressed
as joins over count tables instead of a native LM binary.

The scale shape is two groupBys over an exploded bigram stream (learn)
plus two SHUFFLE_HASH joins (score) — no UDF, no driver state, and the
count tables are DataFrames, so a model learned on a trusted reference
corpus (e.g. Wikipedia) can score an arbitrarily larger crawl.

EXACT integer contract (the same trick as ``quality.classifier_score``
and ``sparse.tf_cosine_topk``): instead of summing floating-point log
probabilities — whose ``ln`` and summation order differ across engines
— each bigram's Laplace-smoothed conditional probability is floored to
integer MICRO-UNITS, ``floor(1e6 * (c(w1 w2) + 1) / (c(w1 ·) + V))``,
and per-document totals are int64 sums. Rankings and keep/drop
decisions are then bit-identical in any engine at any partitioning,
which is what makes the operator oracle-checkable. (A micro-unit
average probability is a monotone quality signal exactly like mean
log-prob is; the filter thresholds on it the same way.)

Reference parity note: the reference engine has no LM scorer — this is
part of the beyond-reference training-data-pipeline surface (CCNet:
Wenzek et al. 2020, public method).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from .dedup import spread
from .text import normalize_text

__all__ = [
    "bigram_lm",
    "bigram_lm_score",
    "bigram_lm_score_sql",
]

MICRO = 1_000_000


def _doc_bigrams(df: SparkDF, text_col: str, id_col: str) -> SparkDF:
    """(doc, w1, w2) adjacent-token pairs, built scan-locally: the
    normalized SPLIT array is pinned below the ``spread`` exchange
    (the shingle_table lesson — HOF lambdas re-evaluate referenced
    expressions per element), then ``zip_with`` over two slices forms
    the bigram stream with one explode and zero joins."""
    normed = spread(df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(text_col), " ").alias("__cps_words")))
    words = F.col("__cps_words")
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    return (normed
            .select("doc", F.explode(pairs).alias("bg"))
            .select("doc", F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2"))
            .where((F.col("w1") != "") & (F.col("w2") != "")))


def bigram_lm(df: SparkDF, text_col: str, id_col: str
              ) -> tuple[SparkDF, SparkDF, SparkDF]:
    """Learn a bigram model from a corpus: returns
    ``(bigrams, contexts, vocab_size)`` DataFrames —
    ``(w1, w2, c12)``, ``(w1, c1)``, and a 1-row ``(v)`` — all LAZY
    (nothing is counted until a score plan executes; ``v`` rides the
    score plan as a broadcast 1-row cross join, the in-plan-scalar
    pattern the ANN auto-tuner uses)."""
    bg = _doc_bigrams(df, text_col, id_col)
    bigrams = (bg.groupBy("w1", "w2")
                 .agg(F.count(F.lit(1)).alias("c12")))
    # c(w1 ·) derives from the bigram table — partial-aggregated,
    # far smaller than re-exploding the corpus
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (bg.select(F.col("w1").alias("w"))
               .union(bg.select(F.col("w2").alias("w")))
               .agg(F.count_distinct(F.col("w")).alias("v")))
    return bigrams, contexts, vocab


def bigram_lm_score(df: SparkDF, text_col: str, id_col: str,
                    model: tuple[SparkDF, SparkDF, SparkDF] | None = None,
                    ) -> SparkDF:
    """Score each document under the (given or self-learned) bigram
    model: ``(doc, n_bigrams, sum_micro_p, avg_micro_p)`` where each
    bigram contributes ``floor(1e6 * (c12 + 1) / (c1 + V))`` — Laplace
    add-one smoothing, so bigrams with unseen contexts still score
    (``c12 = c1 = 0`` via left joins). Documents with no bigram (< 2
    tokens) are excluded — threshold them separately if needed.

    Plan: bigram stream ⋈ bigram counts ⋈ context counts (both
    SHUFFLE_HASH — a Zipf count table is never broadcast), one groupBy
    doc. Higher ``avg_micro_p`` = more reference-like text; filter
    with ``WHERE avg_micro_p >= t`` exactly like a perplexity cut.

    Self-scoring (``model=None``) pins the exploded bigram stream
    MEMORY_AND_DISK so learn, vocab, and score all read ONE
    materialization instead of re-running the normalize+zip explode
    three times (the cross_corpus_pairs lesson); call
    ``dedup.release(result)`` after fetching in long-lived sessions."""
    pinned = None
    if model is None:
        from pyspark import StorageLevel

        pinned = _doc_bigrams(df, text_col, id_col) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        bigrams = (pinned.groupBy("w1", "w2")
                   .agg(F.count(F.lit(1)).alias("c12")))
        contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
        vocab = (pinned.select(F.col("w1").alias("w"))
                 .union(pinned.select(F.col("w2").alias("w")))
                 .agg(F.count_distinct(F.col("w")).alias("v")))
        bg = pinned
    else:
        bigrams, contexts, vocab = model
        bg = _doc_bigrams(df, text_col, id_col)
    scored = (bg
              .join(bigrams.hint("shuffle_hash"), ["w1", "w2"], "left")
              .join(contexts.hint("shuffle_hash"), ["w1"], "left")
              .crossJoin(F.broadcast(vocab))
              .select(
                  "doc",
                  F.floor(
                      (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                      * F.lit(MICRO)
                      / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                  ).alias("mp")))
    out = (scored.groupBy("doc")
           .agg(F.count(F.lit(1)).alias("n_bigrams"),
                F.sum("mp").alias("sum_micro_p"))
           .select("doc", "n_bigrams", "sum_micro_p",
                   F.floor(F.col("sum_micro_p") / F.col("n_bigrams"))
                    .alias("avg_micro_p")))
    if pinned is not None:
        out._cps_persisted = [pinned]  # see dedup.release()
    return out


def bigram_lm_score_sql(t: str, id_expr: str, text_expr: str,
                        learn_pred: str = "TRUE",
                        score_pred: str = "TRUE") -> str:
    """DuckDB twin of :func:`bigram_lm_score`. The bigram stream is
    formed by positional list indexing (list_transform over a range)
    rather than by slice-zip — a semantic re-derivation, not an
    implementation echo; the integer micro-unit arithmetic makes the
    two agree exactly. ``learn_pred``/``score_pred`` split the table
    into the model corpus and the scored corpus (both TRUE =
    self-scored)."""
    return f"""
        WITH norm AS (
            SELECT {id_expr} AS doc,
                   ({learn_pred}) AS __learn, ({score_pred}) AS __score,
                   string_split(trim(regexp_replace(lower({text_expr}),
                                     '\\s+', ' ', 'g')), ' ') AS toks
            FROM {t} WHERE ({learn_pred}) OR ({score_pred})),
        pairs AS (
            SELECT doc, __learn, __score,
                   unnest(list_transform(
                       range(1, greatest(length(toks), 1)),
                       i -> [toks[CAST(i AS INT)],
                             toks[CAST(i + 1 AS INT)]])) AS p
            FROM norm),
        bg_all AS (
            SELECT doc, __learn, __score, p[1] AS w1, p[2] AS w2
            FROM pairs WHERE p[1] <> '' AND p[2] <> ''),
        bg_learn AS (SELECT * FROM bg_all WHERE __learn),
        bg AS (SELECT * FROM bg_all WHERE __score),
        bigrams AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bg_learn GROUP BY w1, w2),
        contexts AS (
            SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
            FROM bigrams GROUP BY w1),
        vocab AS (
            SELECT count(DISTINCT w) AS v FROM (
                SELECT w1 AS w FROM bg_learn
                UNION ALL SELECT w2 FROM bg_learn)),
        scored AS (
            SELECT bg.doc,
                   CAST(FLOOR((COALESCE(b.c12, 0) + 1) * 1000000.0
                              / (COALESCE(c.c1, 0) + vocab.v))
                        AS BIGINT) AS mp
            FROM bg
            LEFT JOIN bigrams b USING (w1, w2)
            LEFT JOIN contexts c USING (w1)
            CROSS JOIN vocab)
        SELECT doc, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(mp) AS BIGINT) AS sum_micro_p,
               CAST(FLOOR(sum(mp) * 1.0 / count(*)) AS BIGINT)
                   AS avg_micro_p
        FROM scored GROUP BY doc
    """
