"""Round-6 behavioral tests: CDC swap crash-safety, w10 zero-
duration guard, sq-adc degenerate dimension, salt-factor sizing."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.cdc import (
    apply_cdc_batch,
    recover_snapshot,
)

_SNAP_SCHEMA = "k long, bal double, deleted boolean, v_ts long, v_eid long"
_LOG_SCHEMA = "k long, ts_us long, event_id long, op string, new_bal double"


def _fresh_snap(spark, base):
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    snap = f"{base}/snapshot"
    spark.createDataFrame(
        [(1, 100.0, False, -1, -1), (2, 200.0, False, -1, -1)],
        _SNAP_SCHEMA,
    ).write.mode("overwrite").parquet(snap)
    return snap


def _state(spark, snap):
    return {
        r["k"]: (r["bal"], r["deleted"])
        for r in spark.read.parquet(snap).collect()
    }


def test_cdc_swap_recovers_mid_rename_crash(spark):
    """Crash window the round-5 ADVICE flagged: between
    rename(live → _old) and rename(_tmp → live) only _old exists.
    The next apply (or reader) must restore it and converge to the
    same state a crash-free run produces."""
    base = "/root/repo/.scratch/cdc_crash_test"
    snap = _fresh_snap(spark, base)
    b1 = spark.createDataFrame([(1, 100, 10, "U", 111.0)], _LOG_SCHEMA)
    b2 = spark.createDataFrame([(2, 200, 20, "U", 222.0)], _LOG_SCHEMA)
    apply_cdc_batch(snap, b1, 1)
    expected_after_b1 = _state(spark, snap)
    # simulate the crash: live snapshot moved aside, new one never
    # landed (the replacement tmp dir is gone with the process)
    os.rename(snap, f"{snap}_old")
    assert not os.path.exists(snap)
    apply_cdc_batch(snap, b2, 2)  # must recover _old, then merge
    assert not os.path.exists(f"{snap}_old")
    got = _state(spark, snap)
    assert got[1] == expected_after_b1[1]  # b1's effect survived
    assert got[2] == (222.0, False)


def test_cdc_swap_tolerates_stale_old_copy(spark):
    """Crash after the new snapshot landed but before _old was
    dropped: both dirs exist. recover_snapshot must NOT clobber the
    newer live dir, and the next apply must clear the stale copy."""
    base = "/root/repo/.scratch/cdc_stale_old_test"
    snap = _fresh_snap(spark, base)
    apply_cdc_batch(
        snap,
        spark.createDataFrame([(1, 100, 10, "U", 111.0)], _LOG_SCHEMA),
        1,
    )
    live = _state(spark, snap)
    # stale _old left behind by a crash mid-cleanup
    spark.createDataFrame(
        [(9, 9.0, False, -1, -1)], _SNAP_SCHEMA
    ).write.mode("overwrite").parquet(f"{snap}_old")
    recover_snapshot(snap)
    assert _state(spark, snap) == live  # live dir untouched
    apply_cdc_batch(
        snap,
        spark.createDataFrame([(2, 200, 20, "U", 222.0)], _LOG_SCHEMA),
        2,
    )
    assert not os.path.exists(f"{snap}_old")
    assert 9 not in _state(spark, snap)


def test_cdc_failed_write_cleans_tmp_and_keeps_snapshot(spark):
    """A batch whose evaluation throws mid-write must leave the live
    snapshot untouched and not leak its _tmp_{batch_id} dir."""
    base = "/root/repo/.scratch/cdc_failed_write_test"
    snap = _fresh_snap(spark, base)
    before = _state(spark, snap)
    poison = spark.createDataFrame(
        [(1, 100, 10, "U", 111.0)], _LOG_SCHEMA
    ).withColumn(
        "new_bal", F.assert_true(F.lit(False)).cast("double")
    )
    with pytest.raises(Exception):
        apply_cdc_batch(snap, poison, 7)
    assert not os.path.exists(f"{snap}_tmp_7")
    assert _state(spark, snap) == before


def test_sq_adc_degenerate_dimension_guard(spark, duck):
    """ann_sq_adc's quantizer divides by (hi-lo); on a CONSTANT
    dimension Spark non-ANSI x/0 yields NULL while DuckDB IEEE
    yields inf — the greatest(range, 1e-300) guard must make both
    engines produce code 0 instead."""
    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [3.0, 5.0])],
        "vec_id long, v array<double>",
    )
    rng = df.agg(
        F.array(F.min(F.col("v")[0]), F.min(F.col("v")[1])).alias("lo"),
        F.array(F.max(F.col("v")[0]), F.max(F.col("v")[1])).alias("hi"),
    )
    codes = df.crossJoin(F.broadcast(rng)).select(
        "vec_id",
        F.expr(
            "transform(sequence(0, 1),"
            " i -> cast(round((v[i] - lo[i])"
            " / greatest(hi[i] - lo[i], 1e-300)"
            " * 255) AS BIGINT))"
        ).alias("c"),
    )
    got = {r["vec_id"]: list(r["c"]) for r in codes.collect()}
    assert got[0] == [0, 0]  # constant dim 1 → 0, not None
    assert got[1] == [255, 0]
    duck_code = duck.execute(
        "SELECT CAST(round((5.0 - 5.0)"
        " / greatest(5.0 - 5.0, 1e-300) * 255) AS BIGINT)"
    ).fetchone()[0]
    assert duck_code == 0


def test_salt_factor_scales_with_measured_skew(spark):
    """salt_factor (the q4-report → x11/x12 loop-closer) must size
    from the data: a uniform key needs ~no salting, a pathological
    key (one value owning half the rows) spreads proportionally to
    its share of the shuffle, and the factor respects the clamps."""
    from innercircle_etl_spark.operators.skew import salt_factor

    uniform = spark.range(1000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    skewed = spark.range(1000).select(
        F.when(F.col("id") < 500, F.lit(7))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    p = 32
    f_uni = salt_factor(uniform, "k", shuffle_partitions=p)
    f_skew = salt_factor(skewed, "k", shuffle_partitions=p)
    # uniform: top1_share = 2/1000 → ceil(0.002*32) = 1
    assert f_uni == 1
    # skewed: top1_share = 0.5 → ceil(0.5*32) = 16
    assert f_skew == 16
    assert f_skew > f_uni
    assert salt_factor(skewed, "k", shuffle_partitions=p, max_salts=4) == 4
    assert salt_factor(uniform, "k", shuffle_partitions=p, min_salts=2) == 2
    # empty input: defined, minimal
    empty = uniform.filter(F.lit(False))
    assert salt_factor(empty, "k", shuffle_partitions=p) == 1


def test_epoch_shuffle_is_complete_permutation(spark, sf_dir):
    """samp_epoch_shuffle must emit every doc exactly once, with
    dense 1..n positions per shard, and a different seed must
    produce a different order (same membership)."""
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.plans.registry import load

    out = QUERIES["samp_epoch_shuffle"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # determinism: identical on re-run
    out2 = QUERIES["samp_epoch_shuffle"](spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_weighted_resample_tracks_weights(spark, sf_dir):
    """samp_weighted_resample keep-rates must track the per-language
    weights: languages with weight >= 1 keep everything; a language
    with weight w < 1 keeps ~w of its docs (hash-uniform, so within
    a loose tolerance at fixture scale)."""
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.plans.registry import load
    from pyspark.sql import functions as FF

    kept = QUERIES["samp_weighted_resample"](spark, sf_dir)
    rates = {
        r["lang"]: r
        for r in kept.groupBy("lang")
        .agg(
            FF.count(FF.lit(1)).alias("n_kept"),
            FF.first("sample_weight").alias("w"),
        )
        .collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(FF.count(FF.lit(1)).alias("n"))
        .collect()
    }
    for lang, row in rates.items():
        frac = row["n_kept"] / totals[lang]
        if row["w"] >= 1.0:
            assert frac == 1.0, lang
        else:
            assert abs(frac - row["w"]) < 0.25, (lang, frac, row["w"])


def test_phash_robust_to_edits_sensitive_to_length(spark, sf_dir):
    """The blockhash contract: a same-length byte edit moves the
    signature at most a few bits (planted mutations must be found),
    while the planted pair ids are self-describing (x, x+OFFSET)."""
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.plans.planting import (
        DOC_NEAR_MOD,
        PLANT_ID_OFFSET,
    )
    from innercircle_etl_spark.plans.registry import load

    rows = QUERIES["mm_dedup_phash"](spark, sf_dir).collect()
    assert rows, "planted mutations must produce pairs"
    found = {
        (r["doc_a"], r["doc_b"]): r["hamming"] for r in rows
    }
    n_docs = load(spark, sf_dir, "documents").count()
    planted = [
        (d, d + PLANT_ID_OFFSET)
        for d in range(0, n_docs, DOC_NEAR_MOD)
    ]
    hits = [p for p in planted if p in found]
    # a single same-length char edit shifts at most a couple of
    # block sums — the planted pair must collide at tiny Hamming
    assert len(hits) >= 0.9 * len(planted), (len(hits), len(planted))
    assert all(found[p] <= 2 for p in hits)


def test_salted_ops_with_computed_factor_match_plain(spark):
    """The identical-result contract holds for a COMPUTED factor on
    skewed data: salted_agg == plain groupBy, salted_join == plain
    join, row for row."""
    from innercircle_etl_spark.operators.skew import (
        salt_factor,
        salted_agg,
        salted_join,
    )

    fact = spark.range(2000).select(
        F.when(F.col("id") < 1200, F.lit(3))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("label")
    )
    n = salt_factor(fact, "k")
    assert n > 1  # the fixture is genuinely skewed
    plain_j = sorted(
        fact.join(dim, "k").select("k", "v", "label").collect()
    )
    salted_j = sorted(
        salted_join(fact, dim, ["k"], salt_src=F.col("v"), n_salts=n)
        .select("k", "v", "label")
        .collect()
    )
    assert plain_j == salted_j
    plain_a = sorted(
        fact.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("s"))
        .collect()
    )
    salted_a = sorted(
        salted_agg(
            fact,
            ["k"],
            {
                "n_rows": ("sum", F.count(F.lit(1))),
                "s": ("sum", F.sum("v")),
            },
            salt_src=F.col("v"),
            n_salts=n,
        ).collect()
    )
    assert plain_a == salted_a


def test_boilerplate_scrub_removes_shared_keeps_unique(spark, sf_dir):
    """text_boilerplate_scrub: a planted near-dup replica shares
    every full segment with its original, so BOTH lose those
    segments (cross-doc frequency >= 2); a doc with no planted copy
    and no organic repeats keeps everything; and clean_text word
    count must equal 10*full_kept + the kept tail remainder —
    i.e. reassembly preserves order and drops nothing else."""
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.plans.planting import (
        DOC_NEAR_MOD,
        PLANT_ID_OFFSET,
    )

    out = {r["doc_id"]: r for r in
           QUERIES["text_boilerplate_scrub"](spark, sf_dir).collect()}
    planted = [d for d in out if d >= PLANT_ID_OFFSET]
    assert planted, "no planted replicas in scrub output"
    for pid in planted:
        orig = pid - PLANT_ID_OFFSET
        assert orig % DOC_NEAR_MOD == 0
        # every full shared segment scrubbed from both sides
        assert out[pid]["n_removed"] >= 1
        assert out[orig]["n_removed"] >= 1
    # unplanted docs: the fixture generator also plants ORGANIC
    # near-dup pairs (shared long prefixes), which the scrub rightly
    # catches — but the majority of docs are unique and must keep
    # every segment
    untouched = [
        d for d in out
        if d < PLANT_ID_OFFSET and d % DOC_NEAR_MOD != 0
    ]
    assert untouched
    zero_removed = sum(1 for d in untouched if out[d]["n_removed"] == 0)
    assert zero_removed > len(untouched) / 2
    # reassembly audit: kept count matches clean_text word count
    for d, r in out.items():
        words = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert words >= max(0, r["n_kept"] - 1) * 10 + (1 if r["n_kept"] else 0)
        assert words <= r["n_kept"] * 10


def test_chunk_windows_cover_documents(spark, sf_dir):
    """text_chunk_windows invariants: chunk 0 starts at token 1,
    consecutive starts differ by the stride, the windows cover every
    token of the doc (last window clipped to n), and each chunk's
    token count matches its materialized text."""
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.plans.registry import load

    out = QUERIES["text_chunk_windows"](spark, sf_dir).collect()
    n_tok = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tok)
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["tok_start"] == 1
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for a, b in zip(chunks, chunks[1:]):
            assert b["tok_start"] - a["tok_start"] == 24  # stride
            assert b["tok_start"] <= a["tok_end"] + 1  # no gaps
        assert chunks[-1]["tok_end"] == n_tok[d]  # full coverage
        for c in chunks:
            assert len(c["chunk_text"].split(" ")) == c["n_tokens"]
            assert c["n_tokens"] == c["tok_end"] - c["tok_start"] + 1


def test_rag_retrieval_shape_and_ordering(spark, sf_dir):
    """ep10: every query chunk retrieves exactly K=3 neighbors,
    never itself, with ranks dense and scores non-increasing."""
    from innercircle_etl_spark.plans import QUERIES

    out = QUERIES["ep10_rag_retrieval"](spark, sf_dir).collect()
    assert out, "no query chunks sampled"
    by_q = {}
    for r in out:
        assert not (
            r["q_doc"] == r["m_doc"] and r["q_chunk"] == r["m_chunk"]
        )
        assert -1.0 <= r["cos"] <= 1.0
        by_q.setdefault((r["q_doc"], r["q_chunk"]), []).append(r)
    for key, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == [1, 2, 3], key
        assert rs[0]["cos"] >= rs[1]["cos"] >= rs[2]["cos"], key
