"""Distributed Bloom filter as a DataFrame — the scalable membership
prefilter for decontamination / blocklist / seen-before checks.

Spark's own ``BloomFilterAggregate`` exists only as an internal
runtime-filter expression (not SQL-registered in Spark 4), so this
builds the same structure out of plain relational ops:

- **build**: each key sets ``k`` bit positions ``pmod(xxhash64(key,
  seed_i), m)``; positions fold into an ``(word, bits)`` table via
  ``groupBy(pos DIV 64) -> bit_or(1 << (pos % 64))`` — a partial-
  aggregable JVM-side aggregate, never more than ``m/64`` rows no
  matter how many keys went in.
- **probe**: each candidate explodes its ``k`` positions, joins the
  (broadcast) word table, and is a member iff EVERY position's bit is
  set — one broadcast hash join + one ``bool_and`` groupBy; the
  corpus side never shuffles.

Properties the tests and the correctness gate lean on:

- **No false negatives, deterministically**: xxhash64 is a fixed
  function, so a key inserted at build time ALWAYS probes positive —
  not a probabilistic claim, an algebraic one. The registered gate
  query (`decontam_bloom`) asserts exactly this: every exactly-
  contaminated document is bloom-flagged.
- **Bounded false positives**: classic ``(1 - e^{-kn/m})^k``; the
  pytest measures FPR against disjoint probes and pins it under 2x
  the formula.

100 TB shape: ``m/64`` rows is ~20 MB of longs for a 10^10-bit filter
— broadcastable for filters covering billions of inserted keys, while
the probing corpus streams through scan-local position arithmetic.
For benchmark decontamination (10^5-10^7 n-grams) the filter is
kilobytes. Reference parity: the reference engine has no membership
sketch at all — this is part of the beyond-reference pipeline
surface, same tier as MinHash/SimHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

__all__ = ["bloom_build", "bloom_probe", "bloom_params",
           "decontaminate_bloom"]


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal ``(m_bits, k)`` for ``n_keys`` at false-positive rate
    ``fpp`` (standard formulas, m rounded up to a multiple of 64)."""
    import math

    m = max(64, int(math.ceil(-n_keys * math.log(fpp)
                              / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2))) if n_keys else 1
    return m, int(k)


def _positions(col, m_bits: int, k: int):
    """Array of ``k`` bit positions for a key — xxhash64 with the
    probe index mixed in as a second hashed column (Spark's xxhash64
    has no seed arg; hashing (key, i) is the standard substitute)."""
    return F.array(*[
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
        for i in range(k)])


def bloom_build(df: SparkDF, col: str, m_bits: int, k: int) -> SparkDF:
    """Fold ``df[col]``'s values into a Bloom word table
    ``(word: long, bits: long)`` — at most ``m_bits/64`` rows. One
    partial-aggregated groupBy; duplicate keys cost nothing extra."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(_positions(F.col(col), m_bits, k)).alias("__p")
    # shiftleft's bit-count arg must be an expression-level column
    # (the python helper only takes int literals)
    bit = F.expr("shiftleft(1L, cast(pmod(__p, 64) as int))")
    return (df.select(pos)
              .select((F.col("__p") / 64).cast("long").alias("word"),
                      bit.alias("__b"))
              .groupBy("word")
              .agg(F.bit_or("__b").alias("bits")))


def bloom_probe(df: SparkDF, col: str, bloom: SparkDF, m_bits: int,
                k: int, out_col: str = "might_contain",
                broadcast_bloom: bool = True) -> SparkDF:
    """Annotate ``df`` with ``out_col``: true iff ALL ``k`` of the
    key's bit positions are set in ``bloom`` (a :func:`bloom_build`
    table). Guaranteed true for every key that was inserted (no false
    negatives); false positives at the filter's design rate.

    Plan: explode k positions, ONE broadcast (or shuffle) hash join
    on word, ``bool_and`` back to one row per input row. The input
    side never shuffles under broadcast; rows are carried by a
    struct keyed by a per-row id, so arbitrary input schemas
    (including maps, which can't be grouping keys) survive and
    fully-duplicate input rows keep their multiplicity."""
    b = F.broadcast(bloom) if broadcast_bloom else bloom
    tagged = (df.withColumn("__cps_rid", F.monotonically_increasing_id())
                .withColumn("__cps_row", F.struct(*df.columns))
                .withColumn("__p",
                            F.explode(_positions(F.col(col),
                                                 m_bits, k)))
                .select("__cps_rid", "__cps_row",
                        (F.col("__p") / 64).cast("long").alias("word"),
                        F.expr("shiftleft(1L, cast(pmod(__p, 64) "
                               "as int))").alias("__m")))
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(F.col("__m")) != 0))
    out = (tagged.join(b, "word", "left")
                 .groupBy("__cps_rid")
                 .agg(F.first("__cps_row").alias("__cps_row"),
                      F.every(hit).alias(out_col)))
    return out.select(*[F.col(f"__cps_row.{c}").alias(c)
                        for c in df.columns], out_col)


def decontaminate_bloom(corpus: SparkDF, benchmark: SparkDF,
                        text_col: str, id_col: str, n: int = 13,
                        fpp: float = 0.001,
                        m_bits: int | None = None,
                        k: int | None = None) -> SparkDF:
    """Bloom-prefiltered benchmark decontamination: build a Bloom
    filter over the benchmark's distinct word n-grams, flag every
    corpus document containing >= 1 bloom-positive n-gram. Compared
    to :func:`dedup.decontaminate`'s exact distinct-ngram semi-join,
    the benchmark side collapses to ``m/64`` longs — no shuffle of
    the corpus n-grams on the join key at all, the standard
    scale-out when the benchmark set no longer broadcasts as rows.

    GUARANTEE (the registered gate leans on it): no false negatives —
    a document the exact path finds contaminated is ALWAYS flagged.
    False positives flag extra documents at ~``fpp`` per distinct
    n-gram; callers route flagged docs to the exact check (two-tier,
    like LSH -> exact verify).

    Output: ``(doc, n_ngrams, n_flagged)`` with ``n_flagged`` the
    count of the document's distinct n-grams that probe positive.
    ``m_bits``/``k`` default to :func:`bloom_params` sized on the
    benchmark's distinct n-gram count (one cheap count action)."""
    from .dedup import shingle_table

    bs = (shingle_table(benchmark, text_col, id_col,
                        use_chars=False, n=n)
          .select(F.explode("sh").alias("s"))
          .distinct())
    if m_bits is None or k is None:
        m_bits, k = bloom_params(bs.count(), fpp)
    bloom = bloom_build(bs, "s", m_bits, k)
    cs = (shingle_table(corpus, text_col, id_col, use_chars=False, n=n)
          .select("doc", F.explode("sh").alias("s")))
    probed = bloom_probe(cs, "s", bloom, m_bits, k,
                         out_col="__hit")
    return (probed.groupBy("doc")
                  .agg(F.count(F.lit(1)).alias("n_ngrams"),
                       F.sum(F.col("__hit").cast("long"))
                        .alias("n_flagged")))
