"""innercircle_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL system
(yjyjyjy/innercircle-etl): relational operator surface (scans,
upsert/merge family, joins incl. as-of, window dedup, percentile
aggregates, set ops), plus large-scale training-data-pipeline
operators (dedup via MinHash-LSH/SimHash, similarity search, text
analysis, multimodal column plumbing).

Design principles (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst owns physical planning.
- Pure functions ``DataFrame -> DataFrame``; no hidden temp-table state.
- Deterministic run-clock: every time-dependent transform takes an
  explicit ``run_ts``/``run_date`` parameter (reference used ``now()``).
- Pandas UDFs (Arrow-batched) only where built-ins can't express the
  semantics; never row-at-a-time Python UDFs in the hot path.
"""

__version__ = "0.1.0"
