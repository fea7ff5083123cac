from nass_summary_spark.functions.parsing import (
    commodity_name,
    dataitem_paths,
    location_code,
    safe_number,
    strip_measured_in,
)
from nass_summary_spark.functions.text import (
    bpe_ish_token_count,
    langid_scores,
    quality_features,
    rolling_fingerprint,
    whitespace_token_count,
    word_shingles,
)
from nass_summary_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    token_hash64,
)

__all__ = [
    "safe_number",
    "location_code",
    "dataitem_paths",
    "commodity_name",
    "strip_measured_in",
    "word_shingles",
    "whitespace_token_count",
    "bpe_ish_token_count",
    "langid_scores",
    "quality_features",
    "rolling_fingerprint",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "token_hash64",
]
