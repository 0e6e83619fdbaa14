"""End-to-end training-data curation pipeline.

The composed story the individual operators exist for: raw documents
in, a deduplicated / filtered / split corpus out, every stage a
distributed DataFrame transformation.

    raw documents
      -> URL/domain blocklist filter      (urls.py, broadcast anti-join)
      -> line dedup / span profile /      (CCNet boilerplate, recycled
         classifier score                  spans, linear quality model)
      -> benchmark decontamination        (5-gram overlap vs held-out
                                           eval slice)
      -> bigram-LM perplexity cut         (lm.py + two-pass approx
                                           quantile threshold)
      -> quality + language filter        (text.py + Gopher rules,
                                           one codegen'd scan pass)
      -> exact dedup                      (fingerprint keep-first)
      -> near-dup clustering              (MinHash/LSH -> components)
      -> keep one doc per cluster
      -> semantic dedup                   (k-means + within-cluster
                                           cosine, SemDeDup-style)
      -> deterministic train/val/test     (key-hash buckets)
      -> chunk + pack into context windows (distributed prefix sum)
      -> partitioned parquet by split     (partition-pruned reads)

Run: python examples/pipeline_demo.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import charmpandas_spark as cps
from charmpandas_spark.functions.dedup import (
    connected_components, duplicate_spans, exact_dedup, line_dedup,
    minhash_near_dup, release)
from charmpandas_spark.functions.kmeans import semantic_near_dup
from charmpandas_spark.functions.quality import (
    classifier_score, gopher_quality)
from charmpandas_spark.functions.sampling import assign_splits
from charmpandas_spark.functions.text import (
    chunk_documents, language_id, pack_sequences, quality_score,
    whitespace_token_count, write_token_shards)
from charmpandas_spark.functions.urls import filter_blocked_domains


def curate(docs, threshold=0.7, embeddings=None):
    """documents (+ optional embeddings) -> (curated_df, stats)."""
    stats = {"raw": docs.count()}

    # 0. provenance filter: drop blocklisted domains before paying for
    #    anything else (synthetic URLs here — see q_url_domain_filter)
    sid = F.col("doc_id").cast("string")
    docs = docs.withColumn("url", F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".com/d/"), sid))
    docs = filter_blocked_domains(docs, "url", ["src13.com"])
    stats["after_url_filter"] = docs.count()

    # 0b. line-level boilerplate dedup (CCNet-style): drop lines
    #     repeated across >= 3 docs, reassemble in order. The
    #     synthetic corpus has no newlines, so segment into 3-word
    #     pseudo-lines first (same trick as q_text_line_dedup).
    seg = docs.withColumn("text", F.regexp_replace(
        "text", r"((?:\S+ ){2}\S+) ", "$1\n"))
    cleaned = (line_dedup(seg, "text", "doc_id", max_doc_freq=3)
               .withColumnRenamed("doc", "doc_id")
               .filter(F.col("text") != "")
               .withColumn("text", F.regexp_replace("text", r"\n", " ")))
    docs = docs.drop("text").join(
        cleaned.select("doc_id", "text"), "doc_id")
    stats["after_line_dedup"] = docs.count()

    # 0c. duplicated-span profile: cut docs that are mostly recycled
    #     4-gram spans even if no whole-document near-dup fires
    prof = duplicate_spans(docs, "text", "doc_id", k=4, min_docs=2)
    hollow = prof.filter(F.col("dup_frac") > 0.8) \
                 .select(F.col("doc").alias("doc_id"))
    docs = docs.join(hollow, "doc_id", "left_anti")
    release(prof)
    stats["after_span_filter"] = docs.count()

    # 0d. classifier quality score (integer micro-unit linear model):
    #     one broadcast join + one shuffle, exact keep/drop
    w = docs.sparkSession.createDataFrame(
        [("data", 400_000), ("query", 300_000), ("table", 200_000),
         ("error", -300_000), ("dup", -400_000)],
        "term string, w_micro long")
    cls = classifier_score(docs, "text", "doc_id", w,
                           threshold_micro=-2_000_000)
    docs = docs.join(cls.filter("keep").select(F.col("doc").alias("doc_id")),
                     "doc_id")
    stats["after_classifier"] = docs.count()

    # 0e. benchmark decontamination (GPT-3-style): hold out a slice as
    #     the "eval set" and drop every training doc that shares any
    #     word 5-gram with it — one explode + one shuffle-hash join
    from charmpandas_spark.functions.dedup import decontaminate
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    dec = decontaminate(corpus, bench, "text", "doc_id", n=5)
    docs = corpus.join(dec.filter("n_hits = 0")
                          .select(F.col("doc").alias("doc_id")),
                       "doc_id")
    stats["after_decontamination"] = docs.count()

    # 0f. bigram-LM perplexity cut: self-learned model, keep ~the top
    #     90% by avg micro-probability via the TWO-PASS approx cut
    #     (broadcast threshold + scan-local filter — no global window,
    #     the form that survives 100 TB)
    from charmpandas_spark.functions.lm import bigram_lm_score
    from charmpandas_spark.functions.quality import quantile_keep_approx
    lm = bigram_lm_score(docs, "text", "doc_id")
    lm_best = quantile_keep_approx(lm, "avg_micro_p", keep_frac=0.9) \
        .select(F.col("doc").alias("doc_id"))
    docs = docs.join(lm_best, "doc_id")
    release(lm)
    # lineage cut: stages 0-0f are now a deep prefix (URL filter,
    # line dedup, span profile, classifier, decontamination, LM cut);
    # every downstream stage-count and the ITERATIVE ops (connected
    # components, k-means) would re-execute the whole chain per
    # action/iteration without this barrier
    docs = docs.localCheckpoint()
    stats["after_lm_cut"] = docs.count()

    # 1. filter: predicted-English, quality floor, token budget, plus
    #    the Gopher A1 rule set — still ONE codegen'd pass over the
    #    scan, fully pushed down (gopher signals are scan-local)
    kept = docs.filter(
        (language_id("text") == "en")
        & (quality_score("text") >= 0.4)
        & (whitespace_token_count("text").between(10, 100_000)))
    # min_stopwords=1: the synthetic vocabulary carries only 'the'
    gq = gopher_quality(kept, "text", "doc_id", min_words=10,
                        min_stopwords=1)
    kept = kept.join(gq.filter(F.col("keep") == 1).select("doc_id"),
                     "doc_id")
    stats["after_filter"] = kept.count()

    # 2. exact dedup (normalized-content fingerprint, keep lowest id)
    kept = exact_dedup(kept, "text", "doc_id")
    stats["after_exact_dedup"] = kept.count()

    # 3. near-dup clusters: MinHash/LSH candidate pairs (verified with
    #    exact Jaccard), transitive closure, keep one doc per cluster
    pairs = minhash_near_dup(kept, "text", "doc_id",
                             threshold=threshold)
    comp = connected_components(pairs, "doc_a", "doc_b")
    losers = comp.filter(F.col("v") != F.col("component")) \
                 .select(F.col("v").alias("doc_id"))
    kept = kept.join(losers, "doc_id", "left_anti")
    release(pairs)
    stats["after_near_dedup"] = kept.count()

    # 3b. semantic dedup (SemDeDup-style): embedding-space near-dups
    #     the text-level passes can't see — k-means buckets cap the
    #     candidate set, keep the lower id of each close pair
    if embeddings is not None:
        emb = embeddings.join(
            kept.select(F.col("doc_id").alias("vec_id")), "vec_id")
        sem = semantic_near_dup(emb, "embedding", "vec_id",
                                k=8, iters=2, threshold=0.3)
        sem_losers = sem.select(F.col("id_b").alias("doc_id")).distinct()
        kept = kept.join(sem_losers, "doc_id", "left_anti")
    stats["after_semantic_dedup"] = kept.count()

    # 4. stable split assignment (survives appends and reshuffles)
    kept = assign_splits(kept, "doc_id",
                         {"train": 0.9, "val": 0.05, "test": 0.05})
    return kept, stats


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    spark = cps.get_spark(app_name="pipeline-demo")
    docs = cps.read_table(spark, sf_dir, "documents").sdf
    emb = cps.read_table(spark, sf_dir, "embeddings").sdf

    curated, stats = curate(docs, embeddings=emb)

    # 6. context-window assembly for the train split: chunk, then pack
    #    into fixed 512-token sequences (distributed prefix sum)
    train = curated.filter(F.col("split") == "train")
    packed = pack_sequences(
        chunk_documents(train, "text", "doc_id", max_tokens=64,
                        overlap=8),
        budget=512)
    stats["train_chunks"] = packed.count()
    stats["train_sequences"] = packed.agg(
        (F.max("seq_id") + 1).alias("n")).first()["n"]
    release(packed)

    # 6a'. token-WEIGHTED length profile of the curated corpus: the
    #      doc length at the 50th/90th percentile of TOKENS (not of
    #      documents) — the denominator the shard budget below
    #      actually divides by
    from charmpandas_spark.functions.profile import weighted_quantiles
    wq = weighted_quantiles(
        curated.select("split", "n_chars",
                       whitespace_token_count("text").alias("w")),
        "n_chars", "w", ["split"], ps=(0.5, 0.9)).collect()
    stats["token_wq50_chars"] = {r["split"]: r["wq_500000"]
                                 for r in wq}

    # 6b. token-budget SHARD write of the train split: one file per
    #     ~4k-token shard (what a data loader memory-maps)
    with tempfile.TemporaryDirectory() as shard_tmp:
        toks = train.select(
            "doc_id", whitespace_token_count("text").alias("n_tok"))
        write_token_shards(toks, os.path.join(shard_tmp, "shards"),
                           "n_tok", ("doc_id",), shard_tokens=4000)
        n_shards = len([d for d in os.listdir(
            os.path.join(shard_tmp, "shards"))
            if d.startswith("shard=")])
        stats["train_shards"] = n_shards

    with tempfile.TemporaryDirectory() as tmp:
        out = out_dir or os.path.join(tmp, "curated")
        # 5. one partitioned sink: downstream trainers read their
        #    split with partition pruning (no full scan)
        curated.write.mode("overwrite").partitionBy("split").parquet(out)
        splits = {r.split: r.n for r in
                  spark.read.parquet(out).groupBy("split")
                       .agg(F.count(F.lit(1)).alias("n")).collect()}
        for k, v in stats.items():
            print(f"{k:>18}: {v}")
        print(f"{'splits':>18}: {splits}")
        assert stats["raw"] >= stats["after_url_filter"] \
            >= stats["after_line_dedup"] \
            >= stats["after_span_filter"] \
            >= stats["after_classifier"] \
            >= stats["after_filter"] \
            >= stats["after_exact_dedup"] \
            >= stats["after_near_dedup"] \
            >= stats["after_semantic_dedup"]
        assert stats["train_sequences"] <= stats["train_chunks"]
        assert sum(splits.values()) == stats["after_semantic_dedup"]
    print("pipeline demo passed")
    spark.stop()


if __name__ == "__main__":
    main()
