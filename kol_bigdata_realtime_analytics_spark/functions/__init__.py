"""Domain column-function library.

Every formula the reference implements (often 2-4 times, in Spark + numpy +
tiered fallbacks) exists here exactly once, as a native pyspark Column
expression — JVM-side, whole-stage-codegen'd, no Python round trip.
"""

from kol_bigdata_realtime_analytics_spark.functions.counts import parse_count
from kol_bigdata_realtime_analytics_spark.functions.scoring import (
    composite_score,
    engagement,
    engagement_rate,
    kol_tier,
    trending_label,
    trending_score,
    trending_velocity,
    trust_rule_score,
    virality_index,
)
from kol_bigdata_realtime_analytics_spark.functions.text import (
    doc_fingerprint_md5,
    language_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "parse_count",
    "engagement",
    "engagement_rate",
    "trending_velocity",
    "trending_score",
    "trending_label",
    "trust_rule_score",
    "kol_tier",
    "virality_index",
    "composite_score",
    "tokens",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "language_id",
    "quality_score",
    "doc_fingerprint_md5",
]
