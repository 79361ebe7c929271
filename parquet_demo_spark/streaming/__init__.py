"""Structured Streaming surface (SURVEY §2B S29/S30, build plan step 6).

The reference's "streaming" is pull-based batch iteration with a bounded
queue (`ingest_parquet_to_mongo_stream.py:102-181`, backpressure at
`_bulk.py:145`). Here streams are first-class: file-source readStream →
event-time windows (tumbling / sliding / session) with watermarks →
sinks. Batch-stream equivalence is the correctness strategy: the same
aggregation runs as a stream (availableNow trigger, memory sink) and is
hash-checked against the batch SQL oracle.
"""
