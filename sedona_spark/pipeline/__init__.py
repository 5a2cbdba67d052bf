from sedona_spark.pipeline.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    simhash64,
    ngram_jaccard_pairs,
)
from sedona_spark.pipeline.text import (
    token_count,
    quality_stats,
    language_id,
    doc_fingerprint,
)
from sedona_spark.pipeline.ann import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
    embedding_near_dup_pairs,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "token_count",
    "quality_stats",
    "language_id",
    "doc_fingerprint",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "embedding_near_dup_pairs",
]
