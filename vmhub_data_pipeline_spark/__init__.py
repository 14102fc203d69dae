"""vmhub_data_pipeline_spark — a from-scratch, PySpark-native analytics engine
with the query and data-processing capabilities of SEMANTC-AI/vmhub_data_pipeline.

The reference (read-only at /root/reference) is a batch ELT pipeline
(REST ingest -> NDJSON lake -> warehouse load) whose analytical surface is
delegated to BigQuery.  This package re-expresses BOTH layers Spark-first:

* ``pipeline/``  — ingest/enrich/partition/watermark/dedup/load semantics
  (reference parity: src/main.py, src/utils/gcs_helper.py,
  src/utils/bigquery_helper.py).
* ``schema/``    — BigQuery-style ``{name,type,mode,fields}`` spec ->
  ``StructType`` compiler (reference parity:
  src/utils/bigquery_helper.py:98-107).
* ``sources/``   — paginated-REST scan with the reference's retry/EOF/bisect
  taxonomy (src/api/vmhub_client.py), NDJSON lake source/sink.
* ``queries/``   — the analytical query catalog: every operator in
  SURVEY.md §2 as a named (Spark callable, oracle SQL) pair.
* ``operators/`` — dedup (exact/minhash/simhash), similarity search,
  text analysis, as-of joins — the LLM-data-pipeline extensions.
* ``streaming/`` — Structured Streaming over the events table (watermark,
  tumbling/sliding/session windows, stateful dedup).

Everything is DataFrame-in / DataFrame-out and lazy; Catalyst does the
optimization.  No custom execution engine.
"""

__version__ = "0.1.0"
