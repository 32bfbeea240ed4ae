"""PySpark-native analytics engine with the query and data-processing
capabilities of Manali0711/Harvard-Artifacts-Collection-Data-Engineering-Analytics-App.

The reference (``/root/reference/harvard_artifacts_app.py``) is a Streamlit app
that delegates all query execution to a remote MySQL/TiDB engine. This package
re-expresses the same capability surface Spark-first:

- ``session``    — SparkSession factory tuned for columnar scans + AQE
- ``catalog``    — parquet table loaders / temp-view registration
- ``schemas``    — explicit StructType schemas (artifact domain + driver tables)
- ``etl``        — the reference's transform/load semantics (T1–T5)
- ``sources``    — paginated REST ingest re-imagined as a distributed source
- ``queries``    — the 20 reference query templates + extended analytics,
                   each as a DataFrame builder AND an ANSI-SQL oracle string
- ``functions``  — text/vector scalar-function library (no Python UDFs in the
                   hot path; Catalyst expressions only)
- ``operators``  — LLM-data-pipeline operators: dedup (exact/MinHash-LSH/
                   SimHash/Jaccard/embedding), similarity search (brute/IVF),
                   multimodal binary-column plumbing
- ``streaming``  — Structured Streaming on the events table (tumbling/sliding/
                   session windows, watermarks, stateful dedup)
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
