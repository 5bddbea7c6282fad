"""Double-run determinism for the round-2 composites: two
independent builds of each DAG must return identical rows — the net
that catches unstable window orders, tie-breaks, or accidental
nondeterminism anywhere in a cascade.
"""

from __future__ import annotations

import pytest

from innercircle_etl_spark.plans import QUERIES


def rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in r) for r in df.select(cols).collect()
    )


@pytest.mark.parametrize(
    "name",
    [
        "ep4_circles",
        "ep7_posts",
        "ep8_corpus_pipeline",
        "q1_quality_report",
        "w4b_global_rank_scalable",
        "dedup_cluster_canonical",
    ],
)
def test_composite_runs_deterministic(spark, sf_dir, name):
    fn = QUERIES[name]
    assert rows(fn(spark, sf_dir)) == rows(fn(spark, sf_dir))
