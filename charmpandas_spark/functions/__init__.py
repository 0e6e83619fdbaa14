from .dedup import (
    decontaminate,
    dedup_incremental,
    duplicate_spans,
    edit_distance_pairs,
    fingerprint_index_write,
    exact_dedup,
    exact_dedup_survivors,
    lsh_candidate_pairs,
    minhash_near_dup,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_table,
    line_dedup,
    simhash,
    simhash_near_dup,
)
from .expect import validate
from .fusion import rrf_fuse
from .lm import bigram_lm, bigram_lm_score
from .profile import (histogram_equidepth, histogram_equiwidth,
                      join_blowup_profile, pii_scan, profile_columns)
from .quantize import quantize_embeddings, quantized_dot_topk
from .regression import ab_welch, correlation, linear_fit
from .similarity import (
    ann_lsh_topk,
    cosine_pairs,
    cosine_sim,
    cosine_topk,
    knn_join,
)
from .sketches import (
    approx_distinct,
    approx_quantiles,
    heavy_hitters,
    hll_merge,
    hll_sketch,
)
from .kmeans import (
    kmeans_fit_predict,
)
from .quality import (
    c4_clean,
    gopher_quality,
    gopher_signals,
)
from .sparse import (
    phrase_match,
    term_postings,
    tf_cosine_topk,
)
from .text import (
    assign_shards,
    chunk_documents,
    fingerprint,
    language_id,
    normalize_text,
    quality_score,
    redact_pii,
    regex_token_count,
    whitespace_token_count,
    write_token_shards,
)

__all__ = [
    "decontaminate", "dedup_incremental", "duplicate_spans",
    "edit_distance_pairs", "fingerprint_index_write", "line_dedup",
    "rrf_fuse", "bigram_lm", "bigram_lm_score",
    "histogram_equiwidth", "profile_columns",
    "quantize_embeddings", "quantized_dot_topk", "linear_fit",
    "ab_welch", "correlation", "histogram_equidepth",
    "join_blowup_profile", "pii_scan",
    "exact_dedup", "exact_dedup_survivors", "lsh_candidate_pairs",
    "minhash_near_dup", "minhash_signatures", "ngram_jaccard_pairs",
    "shingle_table", "simhash", "simhash_near_dup",
    "ann_lsh_topk", "cosine_pairs", "cosine_sim", "cosine_topk",
    "knn_join",
    "phrase_match", "term_postings", "tf_cosine_topk", "validate",
    "approx_distinct", "approx_quantiles", "heavy_hitters",
    "hll_merge", "hll_sketch",
    "c4_clean", "gopher_quality", "gopher_signals",
    "kmeans_fit_predict",
    "assign_shards", "chunk_documents", "fingerprint", "language_id",
    "normalize_text", "quality_score", "redact_pii",
    "regex_token_count", "whitespace_token_count", "write_token_shards",
]
