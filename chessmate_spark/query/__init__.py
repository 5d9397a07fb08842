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
from .serve import (
    ServingError,
    answer_question,
    batch_answer,
    format_response_text,
    plan_to_dict,
    summarize,
)

__all__ = [
    "MetadataFilter",
    "QueryPlan",
    "RatingFilter",
    "Request",
    "ServingError",
    "analyse",
    "answer_question",
    "batch_answer",
    "extract_keywords",
    "format_response_text",
    "normalize",
    "plan_to_dict",
    "summarize",
    "tokenize",
]
