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

from bench import HEADLINE, LLM_HEADLINE, emit_artifacts


def _fixture():
    # shaped exactly like bench.main()'s dicts, at headline size,
    # with worst-case-width values (xx.xxx) in every slot
    timings = {name: 12.345 for name in HEADLINE}
    llm_timings = {name: 12.345 for name in LLM_HEADLINE}
    compact = {
        "metric": "headline_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "llm_total": round(sum(llm_timings.values()), 3),
        "llm_queries": llm_timings,
        "drift": {"cpu": 1.254, "io": 1.188},
        "drift_normalized_total": 196.89,
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
    assert set(parsed["llm_queries"]) == set(LLM_HEADLINE)
    assert parsed["drift"].keys() == {"cpu", "io"}
    assert "drift_normalized_total" in parsed
    assert "spread" not in parsed and "calibration" not in parsed


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
