from .relational import (
    compile_predicate,
    game_summaries,
    paginate,
    search_games,
)
from .topk import topk, topk_per_group
from .collapse import collapse_hits_by_game
from .asof import asof_join, range_join
from .similarity import brute_force_topk, cosine_knn_join, lsh_bucketed_topk
from .dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from .textan import (
    document_fingerprint,
    language_id,
    quality_score,
    token_counts,
)

__all__ = [
    "compile_predicate",
    "game_summaries",
    "paginate",
    "search_games",
    "topk",
    "topk_per_group",
    "collapse_hits_by_game",
    "brute_force_topk",
    "cosine_knn_join",
    "lsh_bucketed_topk",
    "asof_join",
    "range_join",
    "exact_duplicates",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "document_fingerprint",
    "language_id",
    "quality_score",
    "token_counts",
]
