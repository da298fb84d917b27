"""stock_etl_pipeline_spark — a from-scratch PySpark-native analytics engine
with the query and data-processing capabilities of the reference batch ETL
pipeline (chiefscript/stock-etl-pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, UTC, Arrow).
- ``schemas``    : canonical StructTypes for the raw/transformed/warehouse
                   stages (reference: dags/utils/validators.py:15-61) and a
                   dict→StructType builder (reference: dags/utils/loaders.py:83-104).
- ``datasets``   : readers for the driver's TPC-H-ish parquet tables and the
                   deterministic ``prices`` stand-in view derivation.
- ``sources``    : pluggable driver-side API sources → DataFrame
                   (reference: dags/utils/extractors.py, plugins/custom_operators/api_gcs.py).
- ``operators``  : transform / merge / window / analytics / upsert / dedup /
                   similarity / text operators (SURVEY.md §2 inventory).
- ``functions``  : scalar expression helpers shared across operators.
- ``quality``    : single-pass data-quality suite (reference:
                   dags/utils/validators.py, fused per SURVEY.md §2.8 Q13).
- ``sinks``      : csv/json/parquet/partitioned writers and merge-upsert
                   (reference: dags/utils/loaders.py).
- ``streaming``  : Structured Streaming extension over the events table.
- ``multimodal`` : opaque-binary column plumbing with stubbed decoders.
"""

__version__ = "0.1.0"
