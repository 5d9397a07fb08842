from .text import (
    normalize_question,
    slugify_expr,
    tokenize_expr,
    tokenize_sources,
)
from .scoring import (
    blend_scores,
    clamp01,
    fallback_vector_score,
    keyword_overlap,
    rating_matches,
)
from .vector import cosine_similarity, dot_product, l2_norm, query_vector_lit
from .embedding import (
    DEFAULT_DIM,
    deterministic_embedding,
    deterministic_embedding_expr,
    deterministic_embedding_duckdb_sql,
    v5_embedding_column,
    hash_bucket,
)
from .hashing import (
    band_keys_expr,
    md5_expr,
    minhash_expr,
    simhash_expr,
    word_shingles_expr,
)

__all__ = [
    "normalize_question",
    "slugify_expr",
    "tokenize_expr",
    "tokenize_sources",
    "blend_scores",
    "clamp01",
    "fallback_vector_score",
    "keyword_overlap",
    "rating_matches",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "query_vector_lit",
    "DEFAULT_DIM",
    "deterministic_embedding",
    "v5_embedding_column",
    "deterministic_embedding_expr",
    "deterministic_embedding_duckdb_sql",
    "hash_bucket",
    "band_keys_expr",
    "md5_expr",
    "minhash_expr",
    "simhash_expr",
    "word_shingles_expr",
]
