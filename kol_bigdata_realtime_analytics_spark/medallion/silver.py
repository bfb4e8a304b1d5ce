"""Bronze -> Silver transforms: per-source projection to unified schemas,
union-by-name, dedup, derived columns.

Rebuild of reference batch/etl/bronze_to_silver.py:163-580 as pure functions.
Differences from the reference (deliberate, SURVEY.md §4 anti-patterns):
no df.count() actions inside transforms (the reference runs up to 4 jobs per
table save), dedup is DETERMINISTIC (row_number over an explicit ordering,
not dropDuplicates' arbitrary keep), one canonical silver schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.functions.counts import parse_count

# ---------------------------------------------------------------------------
# unified kol_profiles schema (ref: bronze_to_silver.py:163-214,264-324)
# ---------------------------------------------------------------------------


def profiles_from_wikipedia(bronze: DataFrame) -> DataFrame:
    """wikipedia_backlinko payload -> unified profile rows.

    Username is regexp-extracted from the channel link; subscribers arrive as
    a string in millions ("23.5") -> long followers (ref :168-175).
    """
    return (
        bronze.select(
            F.col("kol_id"),
            F.lit("youtube").alias("platform"),
            F.regexp_extract(F.col("payload.Link"), r"/([^/]+)/?$", 1).alias("username"),
            F.col("payload.Name").alias("display_name"),
            F.lit("").alias("bio"),
            (
                F.regexp_extract(F.col("payload.`Subscribers (millions)`"), r"[\d.]+", 0)
                .try_cast("double")
                * 1_000_000
            )
            .cast("long")
            .alias("followers_count"),
            F.lit(0).cast("long").alias("following_count"),
            F.lit(0).cast("long").alias("post_count"),
            F.lit(0).cast("long").alias("favorites_count"),
            F.lit(True).alias("verified"),
            F.lit(None).cast("string").alias("account_created_at"),
            F.col("payload.Link").alias("profile_url"),
            F.col("payload.Category").alias("category"),
            F.lit("wikipedia_backlinko").alias("source"),
        )
        .filter(F.col("username").isNotNull() & (F.col("username") != ""))
    )


def profiles_from_twitter(bronze: DataFrame) -> DataFrame:
    """twitter_human_bots payload.profile.* -> unified profile rows."""
    p = "payload.profile"
    return (
        bronze.select(
            F.col("kol_id"),
            F.lit("twitter").alias("platform"),
            F.col(f"{p}.screen_name").alias("username"),
            F.col(f"{p}.name").alias("display_name"),
            F.coalesce(F.col(f"{p}.description"), F.lit("")).alias("bio"),
            F.coalesce(F.col(f"{p}.followers_count"), F.lit(0)).cast("long").alias("followers_count"),
            F.coalesce(F.col(f"{p}.friends_count"), F.lit(0)).cast("long").alias("following_count"),
            F.coalesce(F.col(f"{p}.statuses_count"), F.lit(0)).cast("long").alias("post_count"),
            F.coalesce(F.col(f"{p}.favourites_count"), F.lit(0)).cast("long").alias("favorites_count"),
            F.coalesce(F.col(f"{p}.verified"), F.lit(False)).alias("verified"),
            F.col(f"{p}.created_at").alias("account_created_at"),
            F.concat(F.lit("https://twitter.com/"), F.col(f"{p}.screen_name")).alias("profile_url"),
            F.lit("Unknown").alias("category"),
            F.lit("twitter_human_bots").alias("source"),
        )
        .filter(F.col("username").isNotNull() & (F.col("username") != ""))
    )


def profiles_from_tiktok(bronze: DataFrame) -> DataFrame:
    """tiktok_profiles payload -> unified profile rows (ref
    tiktok_bronze_to_silver.py:131-147).

    username doubles as kol_id; the raw human-readable follower/following
    strings parse through the ONE native parse_count expression (the
    reference calls its row-at-a-time parse_count_udf here); verified stays
    boolean like every other source in this engine (the reference casts it
    to int to paper over a schema drift this unified schema doesn't have).
    """
    p = "payload"
    return bronze.select(
        F.col(f"{p}.username").alias("kol_id"),
        F.lit("tiktok").alias("platform"),
        F.col(f"{p}.username").alias("username"),
        F.col(f"{p}.nickname").alias("display_name"),
        F.coalesce(F.col(f"{p}.bio"), F.lit("")).alias("bio"),
        parse_count(F.col(f"{p}.followers_raw")).alias("followers_count"),
        parse_count(F.col(f"{p}.following_raw")).alias("following_count"),
        F.lit(0).cast("long").alias("post_count"),
        F.lit(0).cast("long").alias("favorites_count"),
        F.coalesce(F.col(f"{p}.verified"), F.lit(False)).alias("verified"),
        F.col(f"{p}.event_time").alias("account_created_at"),
        F.col(f"{p}.profile_url").alias("profile_url"),
        F.lit("Unknown").alias("category"),
        F.lit("tiktok_bronze").alias("source"),
    ).filter(F.col("username").isNotNull() & (F.col("username") != ""))


def products_from_tiktok(bronze: DataFrame) -> DataFrame:
    """tiktok product payload -> silver product rows (ref
    product_tracker.py:246-263): keep id/url/title/seller + parsed sold
    count, drop rows missing id or url, deterministic dedup by product_id
    (latest scraped_at wins; the reference's dropDuplicates keeps an
    arbitrary row)."""
    p = "payload"
    base = bronze.select(
        F.col(f"{p}.product_id").alias("product_id"),
        F.col(f"{p}.product_url").alias("product_url"),
        F.col(f"{p}.title").alias("title"),
        F.col(f"{p}.seller_username").alias("seller_username"),
        parse_count(F.col(f"{p}.sold_raw")).alias("sold_count"),
        F.col(f"{p}.scraped_at").alias("scraped_at"),
    ).filter(F.col("product_id").isNotNull() & F.col("product_url").isNotNull())
    w = Window.partitionBy("product_id").orderBy(
        F.col("scraped_at").desc_nulls_last(), F.col("product_url").asc()
    )
    return base.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def unify_profiles(*sources: DataFrame) -> DataFrame:
    """Union heterogeneous profile frames and dedup per (platform, username).

    Deterministic keep: highest followers_count wins (ties -> first source
    alphabetically) — unlike dropDuplicates, re-runs give identical output.
    """
    out = sources[0]
    for df in sources[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    w = Window.partitionBy("platform", "username").orderBy(
        F.col("followers_count").desc_nulls_last(), F.col("source").asc()
    )
    return out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def with_profile_derived(profiles: DataFrame) -> DataFrame:
    """account_age_days / posts_per_day / followers_friends_ratio / bio flags
    (ref :436-456). `created_at` format: 'yyyy-MM-dd HH:mm:ss'."""
    created = F.to_timestamp("account_created_at", "yyyy-MM-dd HH:mm:ss")
    age = F.datediff(F.current_date(), F.to_date(created))
    ratio = F.col("followers_count") / F.greatest(F.col("following_count"), F.lit(1))
    return profiles.select(
        "*",
        F.coalesce(age, F.lit(0)).alias("account_age_days"),
        F.round(
            F.col("post_count") / F.greatest(F.coalesce(age, F.lit(0)), F.lit(1)), 4
        ).alias("posts_per_day"),
        F.round(ratio, 2).alias("followers_friends_ratio"),
        (F.length(F.coalesce(F.col("bio"), F.lit(""))) > 0).cast("int").alias("has_bio"),
        F.length(F.coalesce(F.col("bio"), F.lit(""))).alias("bio_length"),
    )


# ---------------------------------------------------------------------------
# kol_content (ref :264-347) — short_video_trends + youtube_trending
# ---------------------------------------------------------------------------


def content_from_short_video(bronze: DataFrame) -> DataFrame:
    return (
        bronze.select(
            F.coalesce(F.col("payload.author_handle"), F.col("kol_id")).alias("kol_id"),
            F.coalesce(F.col("payload.platform"), F.lit("tiktok")).alias("platform"),
            F.concat(F.lit("sv_"), F.col("payload.row_id").cast("string")).alias("content_id"),
            F.col("payload.title_keywords").alias("title"),
            F.coalesce(F.col("payload.views"), F.lit(0)).cast("long").alias("views"),
            F.coalesce(F.col("payload.likes"), F.lit(0)).cast("long").alias("likes"),
            F.coalesce(F.col("payload.comments"), F.lit(0)).cast("long").alias("comments"),
            F.coalesce(F.col("payload.shares"), F.lit(0)).cast("long").alias("shares"),
            F.col("payload.publish_date_approx").alias("published_at"),
            F.lit("short_video_trends").alias("source"),
        )
        .filter(F.col("kol_id").isNotNull() & (F.col("kol_id") != ""))
    )


def content_from_youtube(bronze: DataFrame) -> DataFrame:
    return (
        bronze.select(
            F.coalesce(F.col("payload.channel_id"), F.col("kol_id")).alias("kol_id"),
            F.lit("youtube").alias("platform"),
            F.col("payload.video_id").alias("content_id"),
            F.col("payload.title").alias("title"),
            F.coalesce(F.col("payload.view_count"), F.lit(0)).cast("long").alias("views"),
            F.coalesce(F.col("payload.likes"), F.lit(0)).cast("long").alias("likes"),
            F.coalesce(F.col("payload.comment_count"), F.lit(0)).cast("long").alias("comments"),
            F.lit(0).cast("long").alias("shares"),
            F.col("payload.publish_time").alias("published_at"),
            F.lit("youtube_trending").alias("source"),
        )
        .filter(F.col("kol_id").isNotNull() & (F.col("kol_id") != ""))
    )


def unify_content(*sources: DataFrame) -> DataFrame:
    """Union + deterministic dedup by content_id + engagement columns
    (engagement_rate per ref :338-347: (l+c+s)/views*100, 0-safe)."""
    out = sources[0]
    for df in sources[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    w = Window.partitionBy("content_id").orderBy(F.col("views").desc_nulls_last(), F.col("source").asc())
    eng = F.col("likes") + F.col("comments") + F.col("shares")
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("engagement", eng)
        .withColumn(
            "engagement_rate",
            F.when(F.col("views") > 0, F.round(eng / F.col("views") * 100, 4)).otherwise(0.0),
        )
    )


# ---------------------------------------------------------------------------
# kol_engagement_metrics (ref :552-580) — the A1 multi-measure agg
# ---------------------------------------------------------------------------


def engagement_metrics(content: DataFrame) -> DataFrame:
    """Per (platform, kol_id) engagement rollup: one shuffle, map-side
    partial agg free from Catalyst; avg_engagement_rate derived post-agg."""
    agg = content.groupBy("platform", "kol_id").agg(
        F.sum("views").alias("total_views"),
        F.sum("likes").alias("total_likes"),
        F.sum("comments").alias("total_comments"),
        F.sum("shares").alias("total_shares"),
        F.count("*").alias("total_posts"),
        F.round(F.avg("views"), 2).alias("avg_views_per_post"),
        F.round(F.avg("likes"), 2).alias("avg_likes_per_post"),
        F.max("views").alias("max_views"),
        F.min("views").alias("min_views"),
        F.first("source").alias("source"),
    )
    total_eng = F.col("total_likes") + F.col("total_comments") + F.col("total_shares")
    return agg.withColumn(
        "avg_engagement_rate",
        F.when(F.col("total_views") > 0, F.round(total_eng / F.col("total_views") * 100, 4)).otherwise(
            0.0
        ),
    )


# ---------------------------------------------------------------------------
# kol_trust_features (ref :393-467) — labeled twitter profiles for ML
# ---------------------------------------------------------------------------


def trust_features_from_twitter(bronze: DataFrame) -> DataFrame:
    """Labeled feature rows from twitter_human_bots (label: 1 = trustworthy
    human, 0 = untrustworthy bot — ref account_type semantics)."""
    p = "payload.profile"
    created = F.to_timestamp(F.col(f"{p}.created_at"), "yyyy-MM-dd HH:mm:ss")
    age = F.coalesce(F.datediff(F.current_date(), F.to_date(created)), F.lit(0))
    return (
        bronze.select(
            F.col(f"{p}.screen_name").alias("username"),
            F.coalesce(F.col(f"{p}.followers_count"), F.lit(0)).cast("long").alias("followers_count"),
            F.coalesce(F.col(f"{p}.friends_count"), F.lit(0)).cast("long").alias("following_count"),
            F.coalesce(F.col(f"{p}.statuses_count"), F.lit(0)).cast("long").alias("post_count"),
            F.coalesce(F.col(f"{p}.favourites_count"), F.lit(0)).cast("long").alias("favorites_count"),
            F.coalesce(F.col(f"{p}.verified"), F.lit(False)).cast("int").alias("verified"),
            F.coalesce(F.col(f"{p}.default_profile"), F.lit(False)).cast("int").alias("default_profile"),
            F.coalesce(F.col(f"{p}.default_profile_image"), F.lit(False))
            .cast("int")
            .alias("default_profile_image"),
            (~F.coalesce(F.col(f"{p}.default_profile_image"), F.lit(False)))
            .cast("int")
            .alias("has_profile_image"),
            F.coalesce(F.col(f"{p}.has_url"), F.lit(False)).cast("int").alias("has_url"),
            (F.length(F.coalesce(F.col(f"{p}.description"), F.lit(""))) > 0)
            .cast("int")
            .alias("has_bio"),
            F.length(F.coalesce(F.col(f"{p}.description"), F.lit(""))).alias("bio_length"),
            age.alias("account_age_days"),
            F.coalesce(
                F.col("payload.derived_features.followers_friends_ratio"),
                F.col(f"{p}.followers_count")
                / F.greatest(F.col(f"{p}.friends_count"), F.lit(1)),
                F.lit(0.0),
            ).alias("followers_following_ratio"),
            (F.col(f"{p}.statuses_count") / F.greatest(age, F.lit(1))).alias("posts_per_day"),
            F.when(F.col("payload.trust_label.account_type") == "human", 1)
            .when(F.col("payload.trust_label.account_type") == "bot", 0)
            .alias("label"),
        )
        .filter(F.col("username").isNotNull() & (F.col("username") != ""))
        .filter(F.col("label").isin(1, 0))
    )
