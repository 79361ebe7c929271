"""parquet_demo_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``alxmancilla/parquet-demo`` (columnar Parquet I/O + ETL toolkit,
see SURVEY.md), re-expressed Spark-first:

- the columnar data model (Arrow Table / RecordBatch) becomes the Spark
  DataFrame (SURVEY §1.1);
- the reference's hand-rolled coercion loops become Catalyst casts
  (SURVEY §1.2);
- its ThreadPool + bounded-queue ingest pipelines become partition-parallel
  writes and Structured Streaming ``foreachBatch`` (SURVEY §2A R12/R13/R20);
- on top, the charter extensions: relational query surface, dedup,
  similarity search, text analysis, multimodal columns (SURVEY §2B).

Everything here is public PySpark API; there are no custom Catalyst rules
(SURVEY §4.1 concludes none are needed).
"""

from parquet_demo_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
