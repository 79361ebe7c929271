"""Sources (stub)."""
