"""Reusable DataFrame-in/DataFrame-out operators.

These are the LLM-data-pipeline extensions (BASELINE.json north_star) plus
join algorithms Spark lacks natively. Query-catalog modules wrap them as
named queries; they are equally importable as a library surface.
"""

from .dedup import (  # noqa: F401
    embedding_neardup_pairs,
    exact_dedup,
    jaccard_similarity_pairs,
    keep_latest,
    minhash_lsh_candidates,
    minhash_neardup_pairs,
    simhash,
    simhash_neardup_pairs,
)
from .graph import connected_components  # noqa: F401
from .similarity import brute_force_knn, cosine_expr, lsh_bucketed_knn  # noqa: F401
from .joins import asof_join, range_join_bucketed, salted_join  # noqa: F401
from .multimodal import (  # noqa: F401
    attach_binary_payload,
    attach_magic_payload,
    byte_stats,
    extract_media_features,
    sniff_format,
)
