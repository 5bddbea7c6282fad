"""Query plans: the operator-inventory query registry.

Each module under ``plans/`` registers named queries (Spark builder +
DuckDB oracle SQL) covering one family of SURVEY.md §2 operators.
Importing this package populates the registry.
"""

from innercircle_etl_spark.plans.registry import ORACLES, QUERIES, load  # noqa: F401

# Import for registration side effects.
from innercircle_etl_spark.plans import (  # noqa: F401,E402
    aggregates,
    circle_queries,
    corpus_pipeline,
    decode_queries,
    dedup_queries,
    filters,
    graph_queries,
    insight_queries,
    joins,
    multimodal_queries,
    pipeline_queries,
    roi_cascade,
    sampling_queries,
    scalar_funcs,
    setops,
    similarity_queries,
    sources_queries,
    streaming_queries,
    text_queries,
    tokenizer_queries,
    upserts,
    windows,
)

# Registers q1_quality_report (lives at package root per SURVEY §7;
# imports plans.registry, so it must come after the core imports).
from innercircle_etl_spark import quality  # noqa: F401,E402
