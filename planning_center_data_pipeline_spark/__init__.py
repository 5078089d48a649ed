"""planning_center_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the semantics of the reference ETL pipeline
(JarrodWade/planning-center-data-pipeline, an Airflow TaskFlow DAG that
extracts Planning Center people data, validates counts, and serves
CSV/S3/Sheets outputs) as a reusable Spark DataFrame operator library,
plus a general relational query surface, a Structured Streaming wing,
and LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session.py    SparkSession builder (AQE, UTC, Arrow).
  schemas.py    explicit StructTypes for every source.
  functions/    Column->Column expression helpers (reference F1-F6).
  operators/    relational + extension operators (joins, aggs, windows,
                dedup, similarity, text stats).
  sources/      readers and edge-adapter stubs (PCO JSON:API shapes).
  plans/        named end-to-end queries exposed via __spark_entry__.
  streaming/    Structured Streaming formulations of the event queries.
"""

from planning_center_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
