"""External source/sink connectors (SURVEY §2.1).

Parquet/CSV/JSON live in plans/sources_queries.py as registered
round-trips; this package holds the connector machinery that needs
engine code: the paginated REST source and the batched REST sink
(S8/S9), both with injectable transports so the distributed
plumbing is testable without a network.
"""

from innercircle_etl_spark.sources.rest import (  # noqa: F401
    http_json_transport,
    ndjson_capture_post,
    parquet_page_transport,
    rest_sink,
    rest_source,
)
