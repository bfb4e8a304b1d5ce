"""Reusable DataFrame -> DataFrame operators (dedup, similarity, top-k, multimodal)."""
