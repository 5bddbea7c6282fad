"""Round-5 operator checks beyond the oracle gate: interval-join
equivalence to the naive non-equi join, containment vs Jaccard
asymmetry, TWAP hand-computed, span dedup vs brute force, BM25
ordering sanity, q3 outlier injection, ep9 manifest invariants."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from innercircle_etl_spark.plans import QUERIES


def test_interval_bucket_join_equals_naive_join(spark, sf_dir):
    """The bucketed plan must produce EXACTLY the rows of the naive
    non-equi join (Spark computes that fine at fixture scale — it is
    only the 100TB plan that cannot)."""
    from innercircle_etl_spark.plans.registry import load

    got = sorted(
        map(tuple, QUERIES["j12_interval_bucket_join"](spark, sf_dir).collect())
    )
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 499 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("e"),
    )
    b = ev.select(F.col("event_id").alias("event_id"), "ts", "value")
    naive = (
        a.join(b, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .select("window_id", "event_id", "value")
    )
    assert got == sorted(map(tuple, naive.collect()))
    assert got  # non-empty: windows actually catch events


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment fires
    in the short→long direction while Jaccard stays far below 0.8.
    Checked on the verify expressions directly."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short), (2, long_)], ["doc_id", "text"]
    )
    from innercircle_etl_spark.functions import sketches as SK

    sh = df.select(
        "doc_id",
        SK.word_shingles(F.split("text", " "), 3).alias("sh"),
    )
    a = sh.filter(F.col("doc_id") == 1).select(
        F.col("sh").alias("sh_a")
    )
    b = sh.filter(F.col("doc_id") == 2).select(
        F.col("sh").alias("sh_b")
    )
    row = (
        a.crossJoin(b)
        .select(
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size("sh_a")
            ).alias("contain_a"),
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .collect()[0]
    )
    assert row["contain_a"] == 1.0
    assert row["jaccard"] < 0.2


def test_twap_hand_computed(spark):
    """3 events for one user: values 10 (held 10s), 20 (held 30s),
    then a final open observation. TWAP = (10*10 + 20*30)/40 = 17.5;
    the open interval is excluded from the weights and the count."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, 10.0),
        (2, base + datetime.timedelta(seconds=10), 7, 20.0),
        (3, base + datetime.timedelta(seconds=40), 7, 99.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    import innercircle_etl_spark.plans.registry as R
    import innercircle_etl_spark.plans.windows as W

    orig = R.load
    try:
        R.load = lambda s, d, t: df if t == "events" else orig(s, d, t)
        W.load = R.load
        (out,) = QUERIES["w10_twap"](spark, "unused").collect()
    finally:
        R.load = orig
        W.load = orig
    assert out["user_id"] == 7
    assert out["n_intervals"] == 2
    assert abs(out["twap"] - 17.5) < 1e-12


def test_substring_spans_brute_force(spark):
    """Two docs sharing one exact 40-char span (and nothing else)
    yield exactly the rows a brute-force substring count produces."""
    shared = "x" * 10 + "the quick brown fox jumps over things" [:30]
    assert len(shared) == 40
    d1 = shared + " unique tail one abcdefghij"
    d2 = "prefix two zyxwvut " + shared
    df = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])

    import innercircle_etl_spark.plans.dedup_queries as D
    import innercircle_etl_spark.plans.registry as R

    orig = R.load
    try:
        R.load = lambda s, d, t: df if t == "documents" else orig(s, d, t)
        D.load = R.load
        rows = QUERIES["dedup_substring_spans"](spark, "unused").collect()
    finally:
        R.load = orig
        D.load = orig

    # brute force over the PLANTED corpus the query builds (neither
    # doc_id is % 25, so planting adds nothing here)
    def spans(t):
        return {t[i : i + 40] for i in range(len(t) - 39)}

    common = spans(d1) & spans(d2)
    assert len(rows) == len(common)
    assert all(r["n_docs"] == 2 and r["first_doc"] == 1 for r in rows)
    assert len(common) >= 1  # the planted shared span is visible


def test_bm25_prefers_term_dense_short_docs(spark, sf_dir):
    """Within the fixture corpus the top hit must contain the query
    terms, scores must be positive and non-increasing with rank."""
    rows = QUERIES["text_bm25_search"](spark, sf_dir).collect()
    assert len(rows) == 10
    by_rank = sorted(rows, key=lambda r: r["rank"])
    scores = [r["score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_terms"] <= 3 for r in rows)


def test_q3_flags_injected_outlier(spark, sf_dir):
    """Baseline fixture has bounded z-scores; injecting one 100x
    price must raise that group's max_abs_z and outlier count."""
    from innercircle_etl_spark.plans.registry import load

    base = {
        r["flag"]: r
        for r in QUERIES["q3_outlier_zscores"](spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    first = li.limit(1).select("l_returnflag").collect()[0][0]
    poisoned = li.unionByName(
        li.limit(1).withColumn("l_extendedprice", F.lit(9.9e6))
    )

    import innercircle_etl_spark.plans.registry as R
    import innercircle_etl_spark.quality as Q

    orig = R.load
    try:
        R.load = (
            lambda s, d, t: poisoned if t == "lineitem" else orig(s, d, t)
        )
        Q.load = R.load
        after = {
            r["flag"]: r
            for r in QUERIES["q3_outlier_zscores"](spark, "unused").collect()
        }
    finally:
        R.load = orig
        Q.load = orig
    assert after[first]["max_abs_z"] > base[first]["max_abs_z"] * 5
    assert after[first]["n_outliers"] >= base[first]["n_outliers"] + 1


def test_ep9_manifest_invariants(spark, sf_dir):
    """Every planted scaled copy is deduped before indexing: no
    manifest cell may contain an id >= the planting offset; cell
    populations sum to |survivors|; mean assignment cosine is a
    valid cosine."""
    from innercircle_etl_spark.plans.planting import PLANT_ID_OFFSET
    from innercircle_etl_spark.plans.registry import load

    rows = QUERIES["ep9_vector_index_pipeline"](spark, sf_dir).collect()
    assert rows
    n_emb = load(spark, sf_dir, "embeddings").count()
    # survivors = all originals (each planted copy pairs with its
    # original at cosine ~1 and is dropped as the higher id)
    assert sum(r["n_vectors"] for r in rows) == n_emb
    for r in rows:
        assert r["min_vec_id"] < PLANT_ID_OFFSET
        assert -1.0 <= r["avg_cos"] <= 1.0


def test_i13_tombstone_blocks_out_of_order_resurrection(spark, sf_dir):
    """The version-guard + tombstone core of the streaming CDC
    apply (operators/cdc.py — the REAL code i13 runs), driven
    directly: a DELETE applied in batch 1 must not be resurrected
    by an OLDER update arriving in batch 2, while a genuinely newer
    update must re-insert the key."""
    import os
    import shutil

    from innercircle_etl_spark.operators.cdc import apply_cdc_batch

    base = "/root/repo/.scratch/i13_tombstone_test"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    snap = f"{base}/snapshot"
    spark.createDataFrame(
        [(1, 100.0, False, -1, -1), (2, 200.0, False, -1, -1)],
        "k long, bal double, deleted boolean, v_ts long, v_eid long",
    ).write.mode("overwrite").parquet(snap)

    schema = "k long, ts_us long, event_id long, op string, new_bal double"
    # batch 1: key 1 deleted at t=100; key 2 updated at t=100
    apply_cdc_batch(
        snap,
        spark.createDataFrame(
            [(1, 100, 10, "D", None), (2, 100, 11, "U", 222.0)], schema
        ),
        1,
    )
    # batch 2 (out of order): OLDER update for key 1 (t=50) must NOT
    # resurrect it; NEWER update for key 2 (t=150) must win
    apply_cdc_batch(
        snap,
        spark.createDataFrame(
            [(1, 50, 5, "U", 111.0), (2, 150, 12, "U", 333.0)], schema
        ),
        2,
    )
    state = {r["k"]: r for r in spark.read.parquet(snap).collect()}
    assert state[1]["deleted"] is True  # tombstone survived
    assert state[2]["deleted"] is False and state[2]["bal"] == 333.0
    # batch 3: genuinely newer re-insert of key 1 (t=200) wins
    apply_cdc_batch(
        snap,
        spark.createDataFrame([(1, 200, 20, "U", 444.0)], schema),
        3,
    )
    state = {r["k"]: r for r in spark.read.parquet(snap).collect()}
    assert state[1]["deleted"] is False and state[1]["bal"] == 444.0
    # idempotence: re-applying batch 3 changes nothing
    apply_cdc_batch(
        snap,
        spark.createDataFrame([(1, 200, 20, "U", 444.0)], schema),
        4,
    )
    state2 = {r["k"]: r for r in spark.read.parquet(snap).collect()}
    assert {k: (v["bal"], v["deleted"]) for k, v in state.items()} == {
        k: (v["bal"], v["deleted"]) for k, v in state2.items()
    }
