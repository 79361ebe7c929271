"""Streaming operators (stub)."""
