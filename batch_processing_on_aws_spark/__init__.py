"""batch_processing_on_aws_spark — a PySpark-native analytics engine
with the query and data-processing capabilities of the reference
pipeline ``HoracioSoldman/batch-processing-on-aws`` (a batch ELT
pipeline over London cycling data: S3 lake → Spark transform →
star-schema warehouse), re-expressed Spark-first and extended with
training-data-pipeline operators (dedup, similarity search, text
analysis).

Layout:
- ``session``    — scale-aware SparkSession factory
- ``schemas``    — explicit StructType registry (no inference in prod)
- ``sources``    — csv/json/parquet scans, testdata catalog
- ``functions``  — datetime-part scalar functions
- ``operators``  — conformance, dedup, anti-join, set ops, audit,
                   merge/upsert writer, near-dup, similarity, text stats
- ``plans``      — the dashboard + TPC-H-shaped analytic queries
- ``streaming``  — incremental micro-batch pipeline (the reference's
                   weekly cron semantics, SURVEY.md §2.8)
- ``pipeline``   — end-to-end star-schema build (fact + dims)
"""

__version__ = "0.1.0"
