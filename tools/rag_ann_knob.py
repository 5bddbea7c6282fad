"""Measure ep10's ANN retrieval leg at two plane counts — the
corpus-size knob the SCALE.md round-9 section documents: candidates
per query = |chunks| / 2^planes, so the bucket count scales with the
corpus while the plan (bucket-keyed equi-join, broadcast query side,
per-query top-K) never changes.

    python tools/rag_ann_knob.py [sf_dir] [planes ...]

Defaults: .scratch/sf10, planes 4 and 12 (the oracle-checked
registration grain and the 100x-honest grain). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    planes = [int(x) for x in sys.argv[2:]] or [4, 12]

    from innercircle_etl_spark.plans.similarity_queries import rag_ann_topk
    from innercircle_etl_spark.session import drop_query_caches, get_spark

    spark = get_spark(app_name="rag_ann_knob")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for p in planes:
        t0 = time.time()
        n = rag_ann_topk(spark, sf_dir, n_planes=p).count()
        out[f"planes_{p}"] = {
            "wall_s": round(time.time() - t0, 2),
            "rows": n,
            "buckets": 1 << p,
        }
        print(f"# planes={p}: {out[f'planes_{p}']}", file=sys.stderr)
        drop_query_caches(spark)
    print(json.dumps({"sf_dir": sf_dir, "ann_leg": out}))


if __name__ == "__main__":
    main()
