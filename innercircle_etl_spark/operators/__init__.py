"""Generic DataFrame -> DataFrame operators.

Each operator is a pure function; references into the reference repo
(file:line) in docstrings mark which behavior it re-expresses.
"""

from innercircle_etl_spark.operators.asof import asof_join  # noqa: F401
from innercircle_etl_spark.operators.percentiles import percentile_disc  # noqa: F401
from innercircle_etl_spark.operators.upsert import (  # noqa: F401
    conditional_flag_update,
    date_gaps,
    insert_if_absent,
    merge_update,
    partition_delete_reload,
)
from innercircle_etl_spark.operators.window_dedup import (  # noqa: F401
    first_per_key,
    latest_per_key,
    top_n_per_group,
)
