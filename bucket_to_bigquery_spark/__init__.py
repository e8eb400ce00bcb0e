"""bucket_to_bigquery_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (buzzware/bucket-to-bigquery, a GCS-CSV → BigQuery batch
loader; see SURVEY.md), re-expressed Spark-first:

- ``session``       — SparkSession factory (UTC session TZ, AQE, tuned confs)
- ``catalog``       — testdata table loading / temp-view registration
- ``ingest``        — the reference's actual surface: manifest-driven CSV
                      batch loading with positional auto-expanding schemas,
                      ``_imported`` audit dedup, day partitioning
- ``queries``       — the declared query surface (SURVEY §2.C Q1–Q50), each
                      paired with a DuckDB oracle SQL string
- ``operators``     — custom operators Spark lacks as built-ins (as-of join,
                      range join, dedup family, similarity search, text
                      analysis, multimodal columns)
- ``functions``     — scalar-function library incl. the reference's
                      ``local_time`` expression (readme.md:46 parity)
- ``streaming``     — Structured Streaming pipelines replacing the
                      reference's PubSub machinery (SURVEY §2.A A5/A17)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and AQE; Python UDFs appear only where built-ins cannot
express the semantics, and then always Arrow-vectorized.
"""

__version__ = "0.1.0"
