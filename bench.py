"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over the headline set (lower is
better). Each query executes via count() of the final DataFrame so
results materialize without driver-side collection costs.

The stdout line is deliberately COMPACT (total + per-query mins
only): the driver captures a bounded tail of stdout, and rounds 6-7
lost their headline numbers ("parsed": null) when the line outgrew
that window after the spread/calibration instrumentation landed.
The full instrumented payload (per-rep samples, spreads, start/end
+ per-query calibration probes, per-offender noise attribution) is
written to $SPARK_GRAFT_BENCH_OUT (default ``BENCH_local.json``
next to this file) on every run, so the evidence is committed with
the repo instead of squeezed through the capture window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the
# shapes that dominate a 100TB run (scan-agg, multiway join, window
# dedup, as-of, sketch dedup, ANN).
HEADLINE = [
    "a3_sum_min_max_avg",
    "a8_percentile_disc",
    "j1_multiway_join",
    "j7_asof_join",
    "w1_latest_per_key",
    "o1_global_topk",
    "u1_insert_if_absent",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "text_quality_score",
    "f6_json_extract",
    "d12_trade_decode_pipeline",
    "mm_image_features",
    "ep3_roi_cascade",
    "ep5_shadow_trade",
]

# Second headline group (round-9 verdict item 3): the LLM-pipeline
# families added in rounds 8-9 — composites, tokenizer training,
# importance sampling, corpus-LM filtering, Bloom ingest, fixed-k
# IVF — so their wall-time trend is driver-tracked like the original
# 20 have been since round 5. Reported as parsed.llm_queries /
# parsed.llm_total, SEPARATE from the original total so the
# round-over-round trend of `value` stays comparable.
LLM_HEADLINE = [
    "ep8_corpus_pipeline",
    "ep11_ingest_dedup",
    "ep12_training_mix",
    "ep13_contrastive_pairs",
    "ep14_multimodal_pairs",
    "tok_bpe_merges",
    "samp_dsir_importance",
    "text_lm_rarity_filter",
    "dedup_bloom_incremental",
    "ann_ivf_fixed_k",
]

# Pinned reference probe profile (round-9 verdict item 2): the
# clean-run calibration of BENCH_local_r09.json (cpu = median of the
# 20 per-query probes, 0.2385s; io = start/end probe band
# 0.132-0.191s) on this box in a healthy regime. The compact line
# reports this run's probes as RATIOS to this profile plus a
# drift-normalized total, so a drifted host reads straight off the
# committed artifact (round 9's +3.5%-with-16-uniform-inflations
# needed a NOTES.md essay; now the artifact self-adjudicates).
_REF_PROBE = {"cpu": 0.24, "io": 0.16}


def _median(xs: list[float]) -> float:
    """True median: averages the two middle samples on even-length
    input. ``sorted(xs)[len(xs)//2]`` is the UPPER median, which on
    even-length probe lists (cal probe + one rep probe in 2-rep
    degraded mode, or after noise probes) biased the ratio high and
    overcorrected normalized walls downward — the same direction as
    the ep11 4.1x single-probe incident (round-11 advice item 1)."""
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def normalize_timings(
    timings: dict[str, float],
    probe_samples: dict[str, list[float]],
    ref_cpu: float = _REF_PROBE["cpu"],
    deviation: float = 0.2,
    cap: int = 6,
) -> tuple[dict[str, float], dict[str, float], float | None]:
    """Per-query drift normalization (round-10 verdict item 2): a
    single run-level probe ratio cannot adjudicate a load burst
    confined to ONE query's measurement window (round 10: ep5 read
    +229% raw while run-median drift was 1.542x; the probe sitting
    NEXT to ep5's reps read 2.35x, and clearing the query took three
    independent out-of-artifact measurements). Each query is instead
    normalized by the median of its OWN adjacent probes — the
    pre-rep calibration sample plus any noise-attribution probes
    taken between its extra reps.

    Returns (normalized, movers, run_ratio):
    - normalized: every query's wall divided by its own probe ratio
      (queries with no adjacent probe fall back to the run-median
      ratio — their entry is still present, so a fully-probed run
      and a budget-degraded one are distinguishable via the caller's
      ``skipped``/probe bookkeeping, not by silent absence);
      BIAS NOTE: the probe is a pure-CPU shuffle job, so dividing a
      full wall by its ratio OVERCORRECTS for queries less
      CPU-bound than the probe (scan/IO-lean walls shrink less than
      the probe slows) — normalized values adjudicate WHETHER a
      window was bursty and bound the clean wall from below; they
      are not clean-box predictions. Raw walls stay in the artifact
      alongside them for exactly this reason;
    - movers: the <= ``cap`` queries whose own ratio deviates from
      the run-median ratio by more than ``deviation`` (relative) —
      the rows where aggregate normalization actively misleads and
      the compact line must carry the per-query verdict;
    - run_ratio: the run-median probe ratio (None when no query had
      a probe — the caller must mark that explicitly rather than
      report drift 1.0 off the reference fallback).

    CPU-probe coverage only: the probes time a fixed shuffle+agg
    job, so this normalization adjudicates co-tenant CPU bursts; the
    page-cache-reclaim noise mode moves only the io probe and is
    reported separately (drift.io), not divided out — an io-drifted
    host's normalized walls still read high on scan-heavy queries.
    """
    ratios: dict[str, float] = {}
    for name in timings:
        ps = probe_samples.get(name) or []
        if ps:
            ratios[name] = _median(ps) / ref_cpu
    run_ratio = _median(list(ratios.values())) if ratios else None
    normalized = {
        name: round(wall / ratios.get(name, run_ratio or 1.0), 3)
        for name, wall in timings.items()
    }
    movers = {}
    if run_ratio:
        deviants = sorted(
            (
                (abs(r / run_ratio - 1.0), name)
                for name, r in ratios.items()
                if abs(r / run_ratio - 1.0) > deviation
            ),
            reverse=True,
        )
        movers = {name: normalized[name] for _, name in deviants[:cap]}
    return normalized, movers, run_ratio


def emit_artifacts(
    compact: dict, full: dict, out_path: str, stdout=None
) -> str:
    """Write the full payload to ``out_path`` and print the compact
    line to ``stdout`` — LAST, so a full-payload write failure can't
    cost the driver its parseable line. The compact line stays under
    ~1.5 KB for the 20-query headline set (driver capture windows
    truncated the old single-line-everything form in rounds 6-7);
    tests/test_bench_artifact.py pins both properties."""
    line = json.dumps(compact)
    try:
        # serialize BEFORE opening the file: a non-serializable value
        # in spread/calibration (TypeError/ValueError, not just
        # OSError) must not leave a truncated artifact behind, and —
        # round-8 advice — must not escape and kill the compact line
        payload = json.dumps(full, indent=1)
        with open(out_path, "w") as f:
            f.write(payload)
            f.write("\n")
        print(f"# full payload -> {out_path}", file=sys.stderr)
    except Exception as e:  # keep the stdout artifact alive regardless
        print(f"# full payload write FAILED: {e!r}", file=sys.stderr)
    print(line, file=stdout)
    return line


def _drop_caches(spark) -> None:
    """Between-rep hygiene — see session.drop_query_caches."""
    from innercircle_etl_spark.session import drop_query_caches

    drop_query_caches(spark)


def _cpu_probe(spark) -> float:
    """The ONE fixed CPU-probe job (32-task shuffle + agg, no
    parquet, no Python), timed. Every probe site — calibration,
    pre-query, per-rep, post-rep, noise attribution — must run this
    identical job or the ratios against the pinned _REF_PROBE
    profile silently desynchronize (the job was pasted five times
    before this helper; round-12 review)."""
    t0 = time.time()
    spark.range(30_000_000).selectExpr(
        "id % 32 AS k", "id AS v"
    ).groupBy("k").sum("v").count()
    return round(time.time() - t0, 3)


def _io_probe(spark, sf_dir: str) -> float:
    """The ONE fixed IO-probe job (full lineitem parquet scan +
    collected sum — collect(), not count(), so Catalyst can't prune
    the scan to metadata; round-6 self-review), timed. Same rule as
    _cpu_probe: every io-probe site — calibration, noise
    attribution, the ep12 adjudication tool — must run this
    identical job or ratios against _REF_PROBE["io"] silently
    desynchronize (it was pasted three times before this helper;
    round-13 review)."""
    t0 = time.time()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
        {"l_extendedprice": "sum"}
    ).collect()
    return round(time.time() - t0, 3)


def _parse_sf(sf_dir: str) -> float | str:
    """Scale factor for the compact line, falling back to the raw
    path when no component parses (never raise: the old
    ``float(basename.replace('sf', ''))`` raised ValueError on
    renamed fixtures AFTER all measurement finished — losing the
    whole artifact to a label; round-12 review). The parse itself is
    the SHARED helper the sf10-demotion sweep uses, so the bench
    label and the demotion decision agree on every path shape
    (round-13 advice item 1: nested 'sf10/data' used to label as the
    raw string here while the sweep parsed 10 and demoted)."""
    from innercircle_etl_spark.sfparse import parse_sf

    sf = parse_sf(sf_dir)
    return sf if sf is not None else sf_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # JVM/codegen warm-up on the smallest SF: run EVERY headline
    # query once at sf0.001 so no measured rep absorbs whole-stage
    # codegen compilation (the composite cascades compile ~100
    # generated classes; measured: ep3's first execution costs ~2x
    # its steady state). This is the warm-code half of the bench's
    # stated warm-code/cold-data methodology; caches are cleared so
    # the measured reps still read data cold.
    for name in HEADLINE + LLM_HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").count()
        _drop_caches(spark)

    # Three reps per query, report the min and the per-query
    # min/median/max spread. Caches are cleared between reps, so
    # every rep recomputes all data — the min measures
    # warm-code/cold-data steady state (the right proxy for a
    # long-lived cluster) and filters the 2-6x co-tenant noise this
    # box shows between identical runs; the recorded spread makes
    # that noise claim CHECKABLE from the bench artifact itself (a
    # query whose max is 3x its min was measured on a loaded box,
    # not regressed).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # Up to this many EXTRA reps per query when the observed spread
    # exceeds 2x — on a co-tenant-loaded box a bad rep can cost 3-6x
    # steady state, and three samples may all land on load spikes;
    # extra sampling lets the min converge to the plan's true cost.
    # Every sample (including the noisy ones) stays in the recorded
    # spread, so this adds information rather than hiding any.
    extra_cap = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "3"))

    def calibrate() -> dict[str, float]:
        """Fixed synthetic job (32-task shuffle + agg, no parquet,
        no Python) timed 3x: a pure probe of the box's current
        parallel CPU throughput, plus one fixed PARQUET-SCAN probe
        ("io") of the measured dataset. The two separate the noise
        modes: CPU contention moves both, while host page-cache
        reclaim (observed: a DAMON regime pinned buff/cache at ~1GB
        and scan-heavy queries went disk-cold, 2-4x slower with the
        CPU probe flat) moves only the io probe. Recording them at
        start and end makes the noise claim checkable from the
        artifact: if a probe spreads 2-3x, so does every query that
        leans on that resource."""
        samples = [_cpu_probe(spark) for _ in range(3)]
        samples.sort()
        io_s = _io_probe(spark, sf_dir)
        _drop_caches(spark)
        return {
            "min": round(samples[0], 3),
            "median": round(samples[1], 3),
            "max": round(samples[-1], 3),
            "io": round(io_s, 3),
        }

    cal_start = calibrate()
    # Wall-clock budget guard: on a loaded box the warm reps could
    # push the whole run past a harness timeout, which would lose
    # the artifact entirely — worse than a noisier min. Past 60% of
    # budget the warm reps are skipped (methodology note prints so
    # the artifact says which mins are ramp-exposed).
    # 540s default for the 30-query two-group suite (was 480 for 20
    # queries; the clean two-group run measures ~6-7 min with warm
    # reps). The LLM group runs LAST, so on a slow box its warm reps
    # are the first casualties of the 0.6 gate — its mins are then
    # ramp-exposed (stderr notes say which); the ordering is
    # deliberate: the original 20-query trend keeps priority.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "540"))
    bench_t0 = time.time()
    spread: dict[str, dict[str, float]] = {}
    # One calibration SAMPLE before every query (3s of overhead
    # across the suite): a co-tenant load burst confined to the
    # middle of the run slows a whole query's reps UNIFORMLY —
    # invisible to the within-query spread AND to the start/end
    # calibrations (observed: a ~5-min burst inflated 8 consecutive
    # sf1 queries 3-4x with tight per-query spreads and clean
    # start/end calibrations). The per-query probe timestamps the
    # box's throughput next to every measurement, so a polluted
    # window is readable straight off the artifact.
    cal_probe: dict[str, float] = {}
    # Every probe sample adjacent to a query's reps (the pre-rep
    # calibration sample + any noise-attribution probes) — the input
    # to per-query drift normalization.
    probe_samples: dict[str, list[float]] = {}
    # Partial-run self-identification (round-10 advice): a query the
    # 95%-budget gate dropped shrinks `value` — the round-over-round
    # headline — so the compact artifact must say so itself instead
    # of leaving a reader to diff the queries dict across rounds.
    skipped: list[str] = []
    ramp_exposed: list[str] = []

    def measure(name: str, timings: dict[str, float]) -> None:
        # Hard artifact-preservation gates (the 0.6/0.85 gates below
        # only trim OPTIONAL warm/extra reps; with two groups the
        # mandatory timed reps themselves must degrade before the
        # run can outlive a harness timeout and lose BOTH groups'
        # numbers): past 95% of budget skip the query entirely (a
        # missing llm entry beats a lost artifact), past 75% drop to
        # a single timed rep (recorded in spread as n=1 — readable).
        if time.time() - bench_t0 > 0.95 * budget_s:
            print(f"# {name}: SKIPPED (budget)", file=sys.stderr)
            skipped.append(name)
            return
        reps_here = (
            reps if time.time() - bench_t0 < 0.75 * budget_s else 1
        )
        cal_probe[name] = _cpu_probe(spark)
        fn = QUERIES[name]
        # One UNTIMED warm rep at the measured SF first: the sf0.001
        # warmup above compiles the generated classes but its tiny
        # task counts don't push the JVM's tiered JIT over the C2
        # compile thresholds, so the first full-scale execution of a
        # query still runs 2-3x its steady state (measured: the
        # round-4 min-vs-median gaps, and an interleaved A/B where
        # rep 1 of either ngram variant cost 6-12s against a 3.3s
        # floor). min-of-reps should measure the plan, not the
        # warm-in ramp.
        if time.time() - bench_t0 < 0.6 * budget_s:
            fn(spark, sf_dir).count()
            _drop_caches(spark)
        else:
            print(f"# {name}: warm rep skipped (budget)", file=sys.stderr)
            ramp_exposed.append(name)
        samples, n = [], 0
        rep_probes: list[float] = []
        for r in range(reps_here):
            if r > 0:
                # probe IMMEDIATELY before each further timed rep:
                # the pre-query probe above is separated from rep 1
                # by the (multi-second) warm rep, so a transient
                # spike caught by that single sample could be
                # divided into a wall it never overlapped (first
                # real r11 run: ep11's lone probe read 4.1x while
                # its reps were tight — normalized 0.994s, below
                # even the clean-box wall). The per-query ratio is
                # the MEDIAN over these adjacent samples.
                rep_probes.append(_cpu_probe(spark))
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
            # drop caches a query built for itself: reps are timed
            # data-cold and queries can't interfere with each other
            _drop_caches(spark)
        if not rep_probes:
            # single-rep mode (explicit reps=1, or the 0.75 budget
            # gate): without this, the only sample is the pre-query
            # calibration probe, which an un-skipped warm rep can
            # separate from the timed rep by multiple seconds — the
            # non-adjacency failure the per-rep probes exist to fix.
            # One POST-rep probe keeps degraded runs adjacent-sampled
            # (round-11 advice item 1).
            rep_probes.append(_cpu_probe(spark))
        # adaptive extra reps while the spread looks load-polluted.
        # Each trip also samples BOTH calibration probes at that
        # instant — the per-offender noise attribution: a bad rep is
        # host noise only if a probe degraded WITH it (io probe for
        # page-cache reclaim, cpu probe for co-tenant CPU), and the
        # artifact records the pairing so the claim is checkable
        # per offending query, not just per run.
        extra = 0
        noise_probes: list[dict[str, float]] = []
        while (
            extra < extra_cap
            and max(samples) > 2 * min(samples)
            and time.time() - bench_t0 < 0.85 * budget_s
        ):
            cpu_s = _cpu_probe(spark)
            io_s = _io_probe(spark, sf_dir)
            _drop_caches(spark)
            noise_probes.append(
                {"cpu": round(cpu_s, 3), "io": round(io_s, 3)}
            )
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
            _drop_caches(spark)
            extra += 1
        raw = [round(s, 3) for s in samples]  # arrival order
        samples.sort()
        timings[name] = round(samples[0], 3)
        spread[name] = {
            "min": round(samples[0], 3),
            "median": round(samples[len(samples) // 2], 3),
            "max": round(samples[-1], 3),
            "samples": raw,
        }
        if noise_probes:
            spread[name]["noise_probes"] = noise_probes
        probe_samples[name] = (
            [cal_probe[name]]
            + rep_probes
            + [p["cpu"] for p in noise_probes]
        )
        print(
            f"# {name}: {timings[name]:.3f}s (n={n},"
            f" median {spread[name]['median']:.3f},"
            f" max {spread[name]['max']:.3f})",
            file=sys.stderr,
        )

    timings: dict[str, float] = {}
    llm_timings: dict[str, float] = {}
    for name in HEADLINE:
        measure(name, timings)
    for name in LLM_HEADLINE:
        measure(name, llm_timings)

    total = round(sum(timings.values()), 3)
    llm_total = round(sum(llm_timings.values()), 3)
    sf = _parse_sf(sf_dir)
    cal_end = calibrate()
    # Host-drift self-adjudication: this run's probes as ratios to
    # the pinned healthy profile. cpu = the run-median of the
    # per-query probe ratios (they timestamp the whole run); io =
    # mean of the start/end scan probes. A ratio well above 1.0 says the box was
    # slow, not the code — and the normalized totals are what the
    # same run would have read on the reference-profile box.
    # Normalization is PER-QUERY (round-10 verdict item 2): each
    # wall divided by the median of its own adjacent probes, so a
    # burst confined to one query's window is adjudicated in the
    # artifact (r10's ep5 +229% needed three out-of-artifact
    # measurements to clear). `queries_normalized` carries the
    # deviant rows (own ratio >20% off the run median — where the
    # aggregate ratio misleads); the full payload carries every
    # query's normalized wall. CPU-noise coverage only: the io probe
    # moves alone under page-cache reclaim and is reported as
    # drift.io, not divided out.
    all_timings = dict(timings)
    all_timings.update(llm_timings)
    normalized_full, movers, run_ratio = normalize_timings(
        all_timings, probe_samples
    )
    io_now = (cal_start["io"] + cal_end["io"]) / 2
    drift: dict[str, object] = {
        # None = no per-query probes survived the budget gates: cpu
        # drift is UNKNOWN, not 1.0 (the old silent ref fallback)
        "cpu": round(run_ratio, 3) if run_ratio else None,
        "io": round(io_now / _REF_PROBE["io"], 3),
    }
    norm_total = (
        round(sum(normalized_full[n] for n in timings), 3)
        if run_ratio
        else None
    )
    llm_norm_total = (
        round(sum(normalized_full[n] for n in llm_timings), 3)
        if run_ratio
        else None
    )
    compact = {
        "metric": "headline_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "llm_total": llm_total,
        "llm_queries": llm_timings,
        "drift": drift,
        "drift_normalized_total": norm_total,
        "llm_normalized_total": llm_norm_total,
        "queries_normalized": movers,
        "skipped": skipped,
        "ramp_exposed": ramp_exposed,
        "sf": sf,
    }
    full = dict(
        compact,
        # None when no query got a probe: the fallback-normalized
        # walls are just raw walls divided by 1.0, and a full-payload
        # reader who misses drift.cpu=null would mistake them for
        # drift-adjusted numbers (round-11 advice item 4) — mirror
        # how norm_total/llm_norm_total are already nulled
        queries_normalized_full=normalized_full if run_ratio else None,
        spread=spread,
        calibration={
            "start": cal_start,
            "per_query": cal_probe,
            "probe_samples": probe_samples,
            "end": cal_end,
            "note": (
                "normalization divides by ADJACENT cpu-probe ratios"
                " (per query; run-median fallback for probe-less"
                " rows) — it adjudicates co-tenant CPU bursts only;"
                " page-cache reclaim moves drift.io alone and is"
                " reported, not divided out"
            ),
        },
    )
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
    )
    emit_artifacts(compact, full, out_path)
    spark.stop()


if __name__ == "__main__":
    main()
