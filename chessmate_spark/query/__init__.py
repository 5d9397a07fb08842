from .intent import (
    MetadataFilter,
    QueryPlan,
    RatingFilter,
    Request,
    analyse,
    extract_keywords,
    normalize,
    tokenize,
)

__all__ = [
    "MetadataFilter",
    "QueryPlan",
    "RatingFilter",
    "Request",
    "analyse",
    "extract_keywords",
    "normalize",
    "tokenize",
]
