"""Contract tests for the bench artifact pipeline (round-7 verdict
item 1: BENCH_r06/r07 were ``"parsed": null`` because bench.py's
single stdout line outgrew the driver's bounded capture window once
the spread/calibration instrumentation landed).

The fix splits the output: a COMPACT stdout line the driver parses
(total + per-query mins only) and the full instrumented payload
written to BENCH_local.json. These tests pin the split without
running the (minutes-long) bench itself.
"""

from __future__ import annotations

import io
import json

from bench import (
    HEADLINE,
    LLM_HEADLINE,
    _REF_PROBE,
    emit_artifacts,
    normalize_timings,
)


def _fixture():
    # shaped exactly like bench.main()'s dicts, at headline size,
    # with worst-case-width values (xx.xxx) in every slot; the
    # round-11 fields at plausible-worst width (6 movers — the cap —
    # plus a degraded run's skip lists; self-consistent: a skipped
    # query has NO timings entry, that's what skipping means)
    timings = {name: 12.345 for name in HEADLINE}
    llm_timings = {
        name: 12.345 for name in LLM_HEADLINE if name not in LLM_HEADLINE[-3:]
    }
    compact = {
        "metric": "headline_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "llm_total": round(sum(llm_timings.values()), 3),
        "llm_queries": llm_timings,
        "drift": {"cpu": 1.254, "io": 1.188},
        "drift_normalized_total": 196.89,
        "llm_normalized_total": 98.445,
        "queries_normalized": {
            name: 12.345 for name in (HEADLINE + LLM_HEADLINE)[:6]
        },
        "skipped": LLM_HEADLINE[-3:],
        "ramp_exposed": LLM_HEADLINE[-6:],
        "sf": 0.1,
    }
    spread = {
        name: {
            "min": 1.234,
            "median": 2.345,
            "max": 9.876,
            "samples": [9.876, 2.345, 1.234, 1.5, 1.6, 1.7],
            "noise_probes": [{"cpu": 0.4, "io": 0.15}] * 3,
        }
        for name in HEADLINE + LLM_HEADLINE
    }
    full = dict(
        compact,
        spread=spread,
        calibration={
            "start": {"min": 0.2, "median": 0.21, "max": 0.3, "io": 0.4},
            "per_query": {
                name: 0.21 for name in HEADLINE + LLM_HEADLINE
            },
            "end": {"min": 0.2, "median": 0.22, "max": 0.5, "io": 0.5},
        },
    )
    return compact, full


def test_compact_line_fits_capture_window(tmp_path):
    """The stdout line must stay small even with BOTH headline
    groups present — the r06/r07 failures were ~8 KB lines truncated
    to a tail fragment, of which ~1.5 KB survived; the two-group
    line with drift fields must stay inside that observed floor."""
    compact, full = _fixture()
    out = io.StringIO()
    line = emit_artifacts(
        compact, full, str(tmp_path / "BENCH_local.json"), stdout=out
    )
    assert line == out.getvalue().strip()
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total_wall_clock"
    assert set(parsed["queries"]) == set(HEADLINE)
    # skipped queries have no timing entry — the lists partition
    assert set(parsed["llm_queries"]) | set(parsed["skipped"]) == set(
        LLM_HEADLINE
    )
    assert parsed["drift"].keys() == {"cpu", "io"}
    assert "drift_normalized_total" in parsed
    assert "queries_normalized" in parsed and "skipped" in parsed
    assert "spread" not in parsed and "calibration" not in parsed


def test_per_query_burst_adjudication():
    """Round-10 verdict item 2, the synthetic-burst pin: a load
    burst confined to ONE query's measurement window (its adjacent
    probe reads 2.35x the healthy profile while every other probe is
    clean) must be adjudicated IN the artifact — the bursty query's
    normalized wall reads its clean-box value and it is flagged as a
    mover, while clean queries normalize by the (clean) run-median
    ratio and are not flagged. Round 10's real instance: ep5 read
    6.692s raw (+229%) with run drift 1.542x; clearing it took three
    out-of-artifact measurements."""
    ref = _REF_PROBE["cpu"]
    timings = {"ep5_shadow_trade": 6.692, "j1_multiway_join": 0.641,
               "w1_latest_per_key": 0.828, "o1_global_topk": 0.5,
               "u1_insert_if_absent": 0.4}
    probe_samples = {
        "ep5_shadow_trade": [2.35 * ref, 2.4 * ref, 2.3 * ref],
        "j1_multiway_join": [1.0 * ref],
        "w1_latest_per_key": [1.02 * ref],
        "o1_global_topk": [0.98 * ref],
        "u1_insert_if_absent": [1.0 * ref],
    }
    normalized, movers, run_ratio = normalize_timings(
        timings, probe_samples
    )
    assert run_ratio == 1.0
    # the burst is divided out of the bursty query...
    assert abs(normalized["ep5_shadow_trade"] - 6.692 / 2.35) < 0.01
    # ...and only that query is flagged for the compact line
    assert set(movers) == {"ep5_shadow_trade"}
    assert movers["ep5_shadow_trade"] == normalized["ep5_shadow_trade"]
    assert normalized["j1_multiway_join"] == 0.641


def test_normalization_probe_less_and_empty_runs():
    """Degraded-run contracts (round-10 advice item 3): a query with
    no adjacent probe (budget-skipped extras) normalizes by the
    run-median ratio — present in the output, never silently
    dropped; a run where NO query got a probe returns run_ratio None
    (drift UNKNOWN — the caller emits null, not a 1.0 read off the
    reference fallback) and walls pass through raw. A fast box
    (ratio < 1) normalizes UP — adjudication is symmetric."""
    ref = _REF_PROBE["cpu"]
    normalized, movers, run_ratio = normalize_timings(
        {"a": 2.0, "b": 4.0}, {"a": [0.5 * ref]}
    )
    assert run_ratio == 0.5
    assert normalized == {"a": 4.0, "b": 8.0}
    assert movers == {}
    normalized, movers, run_ratio = normalize_timings(
        {"a": 2.0, "b": 4.0}, {}
    )
    assert run_ratio is None
    assert normalized == {"a": 2.0, "b": 4.0} and movers == {}


def test_normalization_uses_true_median():
    """Round-11 advice item 1: on EVEN-length probe lists the old
    ``sorted(ps)[len//2]`` picked the UPPER median, biasing the ratio
    high and overcorrecting normalized walls downward (the ep11-
    incident direction). Two samples [1x, 2x] must read 1.5x, not
    2x — per query AND for the run-median over an even query count."""
    ref = _REF_PROBE["cpu"]
    normalized, movers, run_ratio = normalize_timings(
        {"a": 3.0, "b": 3.0},
        {"a": [1.0 * ref, 2.0 * ref], "b": [1.0 * ref, 2.0 * ref]},
    )
    assert run_ratio == 1.5
    assert normalized == {"a": 2.0, "b": 2.0}


def test_bench_sf_label_never_crashes():
    """Round-12 review: bench's compact-line sf label used
    float(basename.replace('sf','')), which raised ValueError on
    renamed fixture dirs (sf10-v2, sf10_perm) AFTER all measurement
    finished — losing the artifact to a label. _parse_sf must parse
    the numeric prefix and fall back to the raw path, never raise."""
    from bench import _parse_sf

    assert _parse_sf("/root/testdata/sf0.1") == 0.1
    assert _parse_sf("/x/.scratch/sf10") == 10.0
    assert _parse_sf("/x/sf10-v2") == 10.0
    assert _parse_sf("/x/sf10_perm") == 10.0
    assert _parse_sf("/data/custom_fixture") == "/data/custom_fixture"


def test_sf10_demotion_selection():
    """tools/sf1_spot_sweep.default_names: at sf10 (and ONLY there)
    the DEMOTED_AT_SF10 rows are pulled out of a default sweep and
    returned with their reason so the artifact records a marker;
    explicit naming bypasses the mechanism entirely (main() only
    calls default_names when no names were given) — that is the
    regression-canary path SCALE.md's policy requires."""
    from tools.sf1_spot_sweep import DEMOTED_AT_SF10, default_names

    queries = ["graph_triangles", "graph_triangles_sampled", "j1", "q1"]
    names, demoted = default_names(queries, ["j1"], "/x/.scratch/sf10")
    assert "graph_triangles" not in names
    assert "graph_triangles_sampled" in names and "q1" in names
    assert demoted == {
        "graph_triangles": DEMOTED_AT_SF10["graph_triangles"]
    }
    names, demoted = default_names(queries, ["j1"], "/x/.scratch/sf1")
    assert "graph_triangles" in names and demoted == {}
    # round-11 advice item 2: the match is the sf<N> prefix of ANY
    # path component, not basename == 'sf10' — renamed copies,
    # nested data dirs, and factor>100 fixtures all still demote
    for path in ("/x/sf10-v2", "/x/sf10_perm", "/x/sf10/data", "/x/sf100"):
        names, demoted = default_names(queries, ["j1"], path)
        assert "graph_triangles" not in names, path
        assert "graph_triangles" in demoted, path
    # no sf component at all: demotion NOT applied (and main's
    # stderr note fires); sf1_perm parses as 1 and keeps exact forms;
    # an sf-prefixed ancestor DEEPER than the parent must not hijack
    # the label (round-12 review: /data/sf2020-era/nested/fixture)
    for path in ("/x/bigdata", "/x/sf1_perm", "/data/sf2020-era/nested/fixture"):
        names, demoted = default_names(queries, ["j1"], path)
        assert "graph_triangles" in names and demoted == {}, path


def test_full_payload_written_and_supersets_compact(tmp_path):
    compact, full = _fixture()
    path = tmp_path / "BENCH_local.json"
    emit_artifacts(compact, full, str(path), stdout=io.StringIO())
    payload = json.loads(path.read_text())
    for k, v in compact.items():
        assert payload[k] == v
    assert set(payload["spread"]) == set(HEADLINE + LLM_HEADLINE)
    assert payload["calibration"]["start"]["io"] == 0.4


def test_stdout_line_survives_payload_write_failure(tmp_path):
    """An unwritable payload path must not cost the driver its
    parseable line — the whole point of the split is that the
    stdout artifact is the one that must never be lost."""
    compact, full = _fixture()
    out = io.StringIO()
    line = emit_artifacts(
        compact, full, str(tmp_path / "no_such_dir" / "x.json"), stdout=out
    )
    assert json.loads(line)["value"] == compact["value"]
    assert out.getvalue().strip() == line
