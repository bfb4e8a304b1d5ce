"""ML inference queries: in-engine batch scoring over the gold profile shape.

Replaces the reference's scoring seam — per-row HTTP POST /predict/trust from
inside a streaming UDF (reference hot_path_scoring.py:388-430) and a separate
numpy copy of the feature pipeline (predict.py:310-398) — with ONE feature
derivation scored inside the engine (SURVEY §7.2.6).

`ml_trust_inference` runs the BROADCAST-MODEL pandas_udf path on purpose (the
general pattern for real LightGBM artifacts); its oracle is plain SQL because
the stand-in model is a fixed-weight logistic — so the driver hash-checks the
whole Arrow/broadcast plumbing. pytest additionally asserts the pandas path
agrees with the native-expression scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.functions.ml_scoring import (
    score_with_model,
    trust_logit,
)
from kol_bigdata_realtime_analytics_spark.plans.domain import trunc6
from kol_bigdata_realtime_analytics_spark.plans.registry import register, table


def synthetic_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic raw-profile frame derived from customer (same scheme as
    the trust_scores query, plus posts/engagement_rate for the model)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0)) * 1000, 0).cast("long").alias("followers"),
        (F.col("c_custkey") % 1000).cast("long").alias("posts"),
        ((F.col("c_custkey") % 100) / 1000.0).alias("engagement_rate"),
        (F.col("c_acctbal") > 5000).alias("verified"),
        (F.col("c_custkey") % 4000).cast("double").alias("age_days"),
        (F.col("c_acctbal") / 1000.0).alias("ff_ratio"),
    )


_PROFILE_SQL = """
  SELECT c_custkey,
         CAST(ROUND(GREATEST(c_acctbal, 0) * 1000) AS BIGINT) AS followers,
         c_custkey % 1000 AS posts,
         (c_custkey % 100) / 1000.0 AS engagement_rate,
         c_acctbal > 5000 AS verified,
         CAST(c_custkey % 4000 AS DOUBLE) AS age_days,
         c_acctbal / 1000.0 AS ff_ratio
  FROM customer
"""

# weights mirrored from functions/ml_scoring.TRUST_MODEL; term order matters
# (left-to-right IEEE addition must match the udf's sequential accumulate)
_ML_TRUST_ORACLE = f"""
WITH prof AS ({_PROFILE_SQL})
SELECT c_custkey,
       floor(100.0 / (1.0 + exp(-(
         -1.5
         + 0.22 * ln(1 + GREATEST(followers, 0))
         + 0.15 * ln(1 + GREATEST(posts, 0))
         + 3.0 * engagement_rate
         + 1.2 * CASE WHEN verified THEN 1.0 ELSE 0.0 END
         + 0.3 * (age_days / 365.0)
         + -0.08 * LEAST(ff_ratio, 50.0)
       ))) * 1000000) / 1000000 AS trust_ml
FROM prof
"""


@register("ml_trust_inference", oracle=_ML_TRUST_ORACLE)
def ml_trust_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-model batch scoring via Arrow pandas_udf (the F3 fix)."""
    prof = synthetic_profiles(spark, sf_dir)
    score = score_with_model(spark, prof)
    return prof.select("c_custkey", trunc6(score).alias("trust_ml"))


@register("ml_trust_inference_native", oracle=_ML_TRUST_ORACLE.replace("trust_ml", "trust_ml_native"))
def ml_trust_inference_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same model as ONE native column expression — zero Python, full
    whole-stage codegen; the plan of choice when the model is linear."""
    prof = synthetic_profiles(spark, sf_dir)
    score = trust_logit("followers", "posts", "engagement_rate", "verified", "age_days", "ff_ratio")
    return prof.select("c_custkey", trunc6(score).alias("trust_ml_native"))
