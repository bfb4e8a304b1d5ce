"""The 29-feature trust-model engineering pipeline — canonical definition.

The reference implements this pipeline TWICE with subtle divergences
(reference: batch/feature_store/feature_engineering.py:154-346 in PySpark vs
serving/api/routers/predict.py:310-398 in numpy; e.g. the
low_engagement_high_posts threshold is 0.01 in one and 0.5 in the other, and
activity_score / age_activity_interaction differ). SURVEY.md §7.4 flags this
as a consistency hazard; the engine defines ONE canonical variant — the
batch/feature_store one, which is what the published model was trained on —
and every consumer (batch ETL, streaming scoring, serving) uses this module.

Expected input columns (the silver trust-features schema):
  followers_count, following_count, post_count, favorites_count,
  account_age_days, followers_following_ratio, posts_per_day, bio_length,
  has_bio, has_url, has_profile_image, default_profile,
  default_profile_image, verified   (numerics; flags as 0/1 ints)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the 29 engineered columns + 4 passthrough binary features
FEATURE_COLUMNS = [
    "log_followers",
    "log_following",
    "log_posts",
    "log_favorites",
    "log_account_age",
    "followers_following_ratio_capped",
    "posts_per_day_capped",
    "engagement_rate",
    "activity_score",
    "profile_completeness",
    "followers_per_day",
    "posts_per_follower",
    "following_per_day",
    "bio_length_norm",
    "high_activity_flag",
    "low_engagement_high_posts",
    "default_profile_score",
    "suspicious_growth",
    "fake_follower_indicator",
    "followers_tier",
    "account_age_tier",
    "activity_tier",
    "verified_followers_interaction",
    "profile_engagement_interaction",
    "age_activity_interaction",
    "has_bio",
    "has_url",
    "has_profile_image",
    "verified",
]


def engineer_trust_features(df: DataFrame) -> DataFrame:
    """Append the full engineered-feature set as native column expressions.

    One `select` — a single projection node for Catalyst, one codegen stage;
    the reference's 7 sequential withColumn blocks produce the same plan but
    this form makes the single-pass nature explicit.
    """
    c = F.col
    # 1. log transforms (tame skew)
    log_followers = F.log1p(c("followers_count"))
    log_account_age = F.log1p(c("account_age_days"))
    # 2. outlier capping
    ratio_capped = F.when(c("followers_following_ratio") > 10000, 10000).otherwise(
        c("followers_following_ratio")
    )
    ppd_capped = F.when(c("posts_per_day") > 50, 50).otherwise(c("posts_per_day"))
    # 3. derived
    engagement_rate = c("favorites_count") / (c("post_count") + 1)
    activity_score = ppd_capped * F.sqrt(engagement_rate + 1)
    profile_completeness = (c("has_bio") + c("has_url") + c("has_profile_image")) / 3.0
    followers_per_day = c("followers_count") / (c("account_age_days") + 1)

    out = df.select(
        "*",
        log_followers.alias("log_followers"),
        F.log1p(c("following_count")).alias("log_following"),
        F.log1p(c("post_count")).alias("log_posts"),
        F.log1p(c("favorites_count")).alias("log_favorites"),
        log_account_age.alias("log_account_age"),
        ratio_capped.alias("followers_following_ratio_capped"),
        ppd_capped.alias("posts_per_day_capped"),
        engagement_rate.alias("engagement_rate"),
        activity_score.alias("activity_score"),
        profile_completeness.alias("profile_completeness"),
        followers_per_day.alias("followers_per_day"),
        (c("post_count") / (c("followers_count") + 1)).alias("posts_per_follower"),
        (c("following_count") / (c("account_age_days") + 1)).alias("following_per_day"),
        F.least(c("bio_length") / 200.0, F.lit(1.0)).alias("bio_length_norm"),
        # 4. untrustworthy indicators
        F.when(c("posts_per_day") > 20, 1).otherwise(0).alias("high_activity_flag"),
        F.when((engagement_rate < 0.01) & (c("post_count") > 1000), 1)
        .otherwise(0)
        .alias("low_engagement_high_posts"),
        (c("default_profile") + c("default_profile_image")).alias("default_profile_score"),
        F.when((followers_per_day > 100) & (c("account_age_days") < 365), 1)
        .otherwise(0)
        .alias("suspicious_growth"),
        F.when((c("followers_count") > 10000) & (engagement_rate < 0.1), 1)
        .otherwise(0)
        .alias("fake_follower_indicator"),
        # 5. binning
        F.when(c("followers_count") < 1_000, 0)
        .when(c("followers_count") < 10_000, 1)
        .when(c("followers_count") < 100_000, 2)
        .when(c("followers_count") < 1_000_000, 3)
        .otherwise(4)
        .alias("followers_tier"),
        F.when(c("account_age_days") < 365, 0)
        .when(c("account_age_days") < 730, 1)
        .when(c("account_age_days") < 1825, 2)
        .otherwise(3)
        .alias("account_age_tier"),
        F.when(c("posts_per_day") < 0.5, 0)
        .when(c("posts_per_day") < 2, 1)
        .when(c("posts_per_day") < 10, 2)
        .otherwise(3)
        .alias("activity_tier"),
        # 6. interactions
        (c("verified") * log_followers).alias("verified_followers_interaction"),
        (profile_completeness * engagement_rate).alias("profile_engagement_interaction"),
        (log_account_age * (1 / (ppd_capped + 1))).alias("age_activity_interaction"),
    )
    # 7. nulls -> 0 (engineered cols only; pass-through cols untouched)
    return out.fillna(0, subset=[col for col in FEATURE_COLUMNS if col in out.columns])
