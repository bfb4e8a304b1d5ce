"""Structured Streaming queries (trending hot path, campaign features)."""
