"""Scoring formulas — trending, trust, tiers, virality, composite.

Each formula is defined ONCE as a native Column expression (the reference
splits these across a streaming Python UDF, a numpy reimplementation in the
API layer, and a dashboard copy — e.g. trending in
streaming/spark_jobs/trending_stream.py:145-292 AND
serving/api/routers/predict.py:841-910; trust rule score in
batch/etl/silver_to_gold.py:211-230; composite in
serving/api/routers/scores.py:186).

Native exprs are Catalyst-visible: they fold constants, participate in
whole-stage codegen, and never cross into a Python worker.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# engagement (reference: trending_stream.py:452-455; bronze_to_silver.py:338-347)
# --------------------------------------------------------------------------


def engagement(likes: Column | str, comments: Column | str, shares: Column | str) -> Column:
    """Total engagement = likes + comments + shares (nulls count as 0)."""
    z = F.lit(0)
    return F.coalesce(_c(likes), z) + F.coalesce(_c(comments), z) + F.coalesce(_c(shares), z)


def engagement_rate(total_engagement: Column | str, views: Column | str) -> Column:
    """engagement / views, 0 when views is 0/null (ref: bronze_to_silver.py:338-347)."""
    v = F.coalesce(_c(views), F.lit(0))
    return F.when(v > 0, F.coalesce(_c(total_engagement), F.lit(0)) / v).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# trending score (reference: trending_stream.py:145-245, tuning points at
# predict.py:879-884: raw=1 -> ~30, raw=2 -> 50, raw=5 -> ~85)
# --------------------------------------------------------------------------

#: per-window minutes of the reference's 5-minute sliding window
_WINDOW_MINUTES = 5.0
#: engagement-velocity baseline the reference hardcodes (trending_stream.py:280-281)
_BASELINE_VELOCITY = 100.0
#: event-count baseline for "market penetration"
_BASELINE_EVENTS = 10.0
_SIGMOID_K = 0.8
_SIGMOID_THETA = 2.0


def trending_velocity(total_engagement: Column | str, event_count: Column | str) -> Column:
    """velocity = (engagement / 5 min) * (1 + 0.1 * ln(1 + n_events))."""
    e = F.coalesce(_c(total_engagement), F.lit(0)).cast("double")
    n = F.coalesce(_c(event_count), F.lit(0)).cast("double")
    return (e / F.lit(_WINDOW_MINUTES)) * (F.lit(1.0) + F.lit(0.1) * F.log1p(n))


def trending_raw(velocity: Column, event_count: Column | str, momentum: Column | None = None) -> Column:
    """raw = 0.5 * platform_growth + 0.3 * market_penetration + 0.2 * (1 + momentum).

    platform_growth   = velocity / baseline(100)
    market_penetration = n_events / baseline(10)
    momentum defaults to 0 (the reference stubs it; our streaming layer
    computes it statefully as avg velocity of the last 3 windows).
    """
    mom = momentum if momentum is not None else F.lit(0.0)
    pg = velocity / F.lit(_BASELINE_VELOCITY)
    mp = F.coalesce(_c(event_count), F.lit(0)).cast("double") / F.lit(_BASELINE_EVENTS)
    return F.lit(0.5) * pg + F.lit(0.3) * mp + F.lit(0.2) * (F.lit(1.0) + mom)


def trending_score(raw: Column) -> Column:
    """Sigmoid squash to 0-100: 100 / (1 + e^{-k (raw - theta)}), k=0.8 theta=2."""
    return F.lit(100.0) / (F.lit(1.0) + F.exp(F.lit(-_SIGMOID_K) * (raw - F.lit(_SIGMOID_THETA))))


def trending_label(score: Column | str) -> Column:
    """Viral>=80 / Hot>=60 / Warm>=40 / Normal>=25 / Cold (trending_stream.py labels)."""
    s = _c(score)
    return (
        F.when(s >= 80, "Viral")
        .when(s >= 60, "Hot")
        .when(s >= 40, "Warm")
        .when(s >= 25, "Normal")
        .otherwise("Cold")
    )


# --------------------------------------------------------------------------
# rule-based trust score (reference: silver_to_gold.py:211-230)
# --------------------------------------------------------------------------


def trust_rule_score(
    verified: Column | str,
    has_profile_image: Column | str,
    account_age_days: Column | str,
    followers_friends_ratio: Column | str,
    label: Column | str | None = None,
) -> Column:
    """verified +20, profile-img +10, min(age/365*20, 20), min(ratio/10*20, 20),
    label bonus (+20 trustworthy / -30 untrustworthy), clamped to [0, 100].

    Exact reference semantics (silver_to_gold.py:211-230; there the label is
    `is_untrustworthy` with 0 -> +20 and 1 -> -30 — here `label` is
    IS-TRUSTWORTHY: 1 -> +20, 0 -> -30, null -> 0)."""
    score = F.lit(0.0)
    score = score + F.when(F.coalesce(_c(verified).cast("boolean"), F.lit(False)), 20.0).otherwise(0.0)
    score = score + F.when(F.coalesce(_c(has_profile_image).cast("boolean"), F.lit(False)), 10.0).otherwise(0.0)
    age = F.coalesce(_c(account_age_days), F.lit(0)).cast("double")
    score = score + F.least(age / F.lit(365.0) * F.lit(20.0), F.lit(20.0))
    ratio = F.coalesce(_c(followers_friends_ratio), F.lit(0)).cast("double")
    score = score + F.least(ratio / F.lit(10.0) * F.lit(20.0), F.lit(20.0))
    if label is not None:
        lab = _c(label)
        score = score + F.when(lab == 1, 20.0).when(lab == 0, -30.0).otherwise(0.0)
    return F.greatest(F.least(score, F.lit(100.0)), F.lit(0.0))


def kol_tier(followers: Column | str) -> Column:
    """Follower-count tier ladder (ref thresholds + labels, silver_to_gold.py:233-240)."""
    f = F.coalesce(_c(followers), F.lit(0))
    return (
        F.when(f >= 1_000_000, "Mega")
        .when(f >= 100_000, "Macro")
        .when(f >= 10_000, "Micro")
        .when(f >= 1_000, "Nano")
        .otherwise("Rising")
    )


def virality_index(favorites: Column | str, followers: Column | str) -> Column:
    """favorites / followers, 0 when followers <= 0 (ref: dashboard/app.py:467)."""
    f = F.coalesce(_c(followers), F.lit(0))
    return F.when(f > 0, F.coalesce(_c(favorites), F.lit(0)).cast("double") / f).otherwise(F.lit(0.0))


def composite_score(trending: Column | str, success: Column | str, trust: Column | str) -> Column:
    """0.4 * trending + 0.35 * success + 0.25 * trust (ref: scores.py:186)."""
    z = F.lit(0.0)
    return (
        F.lit(0.4) * F.coalesce(_c(trending), z)
        + F.lit(0.35) * F.coalesce(_c(success), z)
        + F.lit(0.25) * F.coalesce(_c(trust), z)
    )
