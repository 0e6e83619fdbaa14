"""End-to-end hybrid retrieval stack.

The composed story for the search-side operators: one corpus, four
candidate generators, one fused ranking, all distributed DataFrame
transformations with exact-integer rankings wherever a ranking is
compared or fused:

    documents + embeddings
      -> sparse leg: inverted-index TF-cosine top-k   (sparse.py)
      -> dense leg: exact cosine top-k                (similarity.py)
      -> quantized stage 1: centered int8 codes,      (quantize.py)
         integer-dot top-k over the 4x-smaller table
      -> float rescore of stage-1 survivors           (two-stage serving)
      -> reciprocal-rank fusion of sparse + dense     (fusion.py)
      -> persisted postings lookup                    (bucket-pruned)
      -> IVF-PQ serving index: coarse lists +         (ivfpq.py)
         residual codes + probe-pruned ADC

Run: python examples/retrieval_demo.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import charmpandas_spark as cps
from charmpandas_spark.functions.fusion import rrf_fuse
from charmpandas_spark.functions.quantize import (
    quantize_embeddings, quantized_dot_topk)
from charmpandas_spark.functions.similarity import cosine_sim, knn_join
from charmpandas_spark.functions.sparse import tf_cosine_topk


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = cps.get_spark(app_name="retrieval-demo")
    docs = cps.read_table(spark, sf_dir, "documents").sdf
    emb = cps.read_table(spark, sf_dir, "embeddings").sdf
    queries = F.col("vec_id") < 10

    t0 = time.time()
    sparse = tf_cosine_topk(docs, docs.where(F.col("doc_id") < 10),
                            "text", "doc_id", k=10)
    n_sparse = sparse.count()

    dense = knn_join(emb.where(queries), emb, "embedding", "vec_id",
                     k=10, exact=True)
    n_dense = dense.count()

    # stage 1 on centered int8 codes (4x smaller scan), then rescore
    # the survivors on the original floats — the two-stage layout
    codes = quantize_embeddings(emb, "embedding", "vec_id",
                                centered=True)
    stage1 = quantized_dot_topk(codes, codes.where(F.col("id") < 10),
                                k=30)
    rescored = (stage1
                .join(emb.select(F.col("vec_id").alias("q_id"),
                                 F.col("embedding").alias("qv")), "q_id")
                .join(emb.select(F.col("vec_id").alias("item_id"),
                                 F.col("embedding").alias("cv")),
                      "item_id")
                .select("q_id", "item_id",
                        cosine_sim(F.col("qv"), F.col("cv"))
                         .alias("cosine")))
    n_stage2 = rescored.count()

    # the billion-vector serving structure: m-byte codes, nprobe of
    # nlist lists scanned per query, per-(query, list) ADC LUTs
    from charmpandas_spark.functions.ivfpq import (ivfpq_build,
                                                   ivfpq_search)
    codes_pq, cents, books = ivfpq_build(
        emb, "embedding", "vec_id", nlist=8, coarse_iters=2, m=8,
        codebook_k=16, pq_iters=2, coarse_cap=256, pq_cap=256)
    ivfpq = ivfpq_search(codes_pq, cents, books, emb.where(queries),
                         "embedding", "vec_id", k=10, nprobe=3)
    n_ivfpq = ivfpq.count()

    fused = rrf_fuse(
        [sparse.select(F.col("q_doc").alias("q_id"),
                       F.col("c_doc").alias("item_id"), "rank"),
         dense.select(F.col("qid").alias("q_id"),
                      F.col("nid").alias("item_id"), "rank")],
        k0=60, top_k=5)
    n_fused = fused.count()
    dt = time.time() - t0

    print(f"sparse leg:    {n_sparse} ranked pairs")
    print(f"dense leg:     {n_dense} ranked pairs")
    print(f"stage1+rescore:{n_stage2} rescored candidates")
    print(f"ivfpq leg:     {n_ivfpq} ADC-ranked pairs")
    print(f"fused top-5:   {n_fused} rows in {dt:.2f}s")
    top = fused.where(F.col("q_id") == 0) \
        .orderBy("fused_rank").limit(5).collect()
    print("q=0 fused:", [(r["item_id"], r["rrf_micro"]) for r in top])
    assert n_fused > 0 and n_stage2 > 0
    print("retrieval demo passed")
    spark.stop()


if __name__ == "__main__":
    main()
