"""Operator modules: each registers its declared queries (SURVEY §2B)."""
