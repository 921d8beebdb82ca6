"""otrrentetl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing
capabilities of the reference ETL daemon ``omza/otrrentetl``
(surveyed in /root/repo/SURVEY.md) as an idiomatic Apache Spark
DataFrame/SQL engine, extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Design principles (SURVEY.md §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join planning.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs
  only where built-ins genuinely can't express the semantics.
- Every operator designed for a 1000-executor / 100 TB deployment:
  broadcast bona-fide dimensions, partial aggregation, no
  driver-side collects on data paths, AQE on.
"""

__version__ = "0.1.0"
