"""Isolated per-query timer for optimization A/B runs.

Usage: python tools/qtime.py <query> [query ...]

Methodology mirrors bench.py's measured region (warm-code/cold-data
min-of-reps via count() of the final DataFrame, caches dropped
between reps) so numbers are comparable to the bench's per-query
entries, without paying for the other 29 queries per iteration.
Reps via $SPARK_GRAFT_QTIME_REPS (default 3), sf dir via
$SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from innercircle_etl_spark.plans import QUERIES  # noqa: E402
from innercircle_etl_spark.session import drop_query_caches, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_QTIME_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="qtime")
    out = {}
    for name in names:
        fn = QUERIES[name]
        # warm-up at sf0.001 (codegen) then one untimed warm rep at
        # the measured SF (C2 JIT) — bench.py's exact discipline
        fn(spark, "/root/testdata/sf0.001").count()
        drop_query_caches(spark)
        fn(spark, SF_DIR).count()
        drop_query_caches(spark)
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            n = fn(spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
            drop_query_caches(spark)
        out[name] = {"min": min(samples), "n": n, "samples": samples}
        print(f"# {name}: {min(samples):.3f}s {samples} n={n}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
