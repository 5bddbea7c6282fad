"""A/B the lazy 3-scan vs fused 1-scan fact consumption in ep3/ep5.

The round-6 verdict flagged ep3/ep5's deliberate multi-scan design
(each branch re-reads the column-pruned parquet) as the one choice
that gets expensive when storage is COLD: 3x scan IO at 100TB, and
on this host a page-cache-reclaim regime took ep5 from 2.6s warm to
19-34s. The fused form (SPARK_GRAFT_FUSED_SCAN=1) reads the fact
ONCE, repartitions by `coll` and pins it, so the floor percentile
and leg groupings add no exchange — trading scan IO for one
full-width shuffle + a cache fill.

This tool measures both forms, warm AND cold, at any SF dir:

    python tools/ab_fused_scan.py [sf_dir] [reps]

"Cold" = posix_fadvise(POSIX_FADV_DONTNEED) over the SF dir's
parquet files before each rep — evicts exactly OUR data's pages
(never other tenants') so the scan pays real disk IO, approximating
the remote/cold-storage regime the verdict asks about. Results print
as one JSON line for SCALE.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evict_pages(sf_dir: str) -> None:
    for path in glob.glob(f"{sf_dir}/*.parquet"):
        fd = os.open(path, os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.session import drop_query_caches, get_spark

    spark = get_spark(app_name="ab_fused_scan")
    out: dict[str, dict[str, dict[str, float]]] = {}

    for name in ("ep3_roi_cascade", "ep5_shadow_trade"):
        fn = QUERIES[name]
        out[name] = {}
        # one untimed warm-in per query (JIT ramp — bench.py's lesson)
        fn(spark, sf_dir).count()
        drop_query_caches(spark)
        for form in ("lazy", "fused"):
            os.environ["SPARK_GRAFT_FUSED_SCAN"] = (
                "1" if form == "fused" else "0"
            )
            for mode in ("warm", "cold"):
                samples = []
                for _ in range(reps):
                    if mode == "cold":
                        evict_pages(sf_dir)
                    t0 = time.time()
                    fn(spark, sf_dir).count()
                    samples.append(round(time.time() - t0, 3))
                    drop_query_caches(spark)
                samples.sort()
                out[name][f"{form}_{mode}"] = {
                    "min": samples[0],
                    "median": samples[len(samples) // 2],
                    "max": samples[-1],
                }
                print(
                    f"# {name} {form} {mode}: {samples}",
                    file=sys.stderr,
                )
    os.environ.pop("SPARK_GRAFT_FUSED_SCAN", None)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
