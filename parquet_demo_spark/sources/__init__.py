"""External sources & sinks (SURVEY §2A R10–R16, build plan step 5)."""
