"""Query surface: name -> (Spark plan builder, DuckDB oracle SQL)."""

from kol_bigdata_realtime_analytics_spark.plans.registry import REGISTRY, get_queries, get_oracles

# importing the modules populates REGISTRY
from kol_bigdata_realtime_analytics_spark.plans import relational  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import domain  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import llm_ops  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import streaming_queries  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import extended  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import ml  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import advanced  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import subqueries  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import data_quality  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import invariants  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import unigram_lm  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import hnsw_search  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import index_persistence  # noqa: F401
from kol_bigdata_realtime_analytics_spark.plans import quality_model  # noqa: F401

__all__ = ["REGISTRY", "get_queries", "get_oracles"]
