"""Plan inspection utilities (stub)."""
