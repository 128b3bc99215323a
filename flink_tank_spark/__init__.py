"""flink_tank_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference streaming playground (alexdgarland/flink-tank), re-expressed
Spark-first:

- ``streaming/``  — the reference's entire dataflow surface (parse/route,
  per-key enrichment+sequencing, sliding-window aggregation) as pure
  DataFrame transforms usable in both batch tests and Structured Streaming.
- ``plans/``      — the batch analytics layer: TPC-H-style queries, window
  functions, set operations over the driver's parquet tables, every one
  backed by a DuckDB oracle.
- ``operators/``  — LLM-data-pipeline operators: dedup (exact/MinHash/
  SimHash/n-gram-Jaccard/embedding), similarity search, text analysis,
  multimodal column plumbing.
- ``io/``         — sources & sinks (parquet tables, Kafka helpers).
- ``functions/``  — scalar/aggregate helpers (oracle-exact decimal
  aggregation, JSON utilities).

Design rules (enforced throughout):
- Declarative DataFrame/SQL; Catalyst picks physical plans.
- No driver-side collect loops inside operators — everything distributed.
- Python UDFs only where built-ins cannot express the semantics, and
  then always Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
"""

__version__ = "0.1.0"
