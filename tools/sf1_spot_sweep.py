"""Spot-sweep registry queries at a big scale factor, one wall-clock
each, with a per-query watchdog.

The round-8 composite run caught ep10's 2-task straggler stage ONLY
because something finally executed it at sf1 — the headline bench
covers 20 queries and the correctness sweeps run at sf0.01/sf0.1,
so a non-headline query whose plan degenerates at 10x data (a
split-bound stage, an accidental quadratic blow-up) had no gate.
This tool is that gate: run each named query (default: every
batch-registry query NOT in bench.HEADLINE) once at ``sf_dir``,
record wall + rows, and if a query exceeds the watchdog budget,
cancel its jobs via the session's job-group API and record TIMEOUT
instead of hanging the sweep.

    python tools/sf1_spot_sweep.py [sf_dir] [budget_s] [name ...]

Prints one JSON line; per-query progress on stderr. Queries are run
in registry order. Timings here are single-shot coarse signals for
finding pathologies (10x-data wall should sit within ~0.5-15x of
the sf0.1 figure), not bench-grade minima.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Streaming/stateful/source queries key their scratch checkpoints
# by basename(sf_dir), so sf1 dirs auto-create and the whole family
# runs fine at 10x (round-8 measurement: all 26 streaming/source/
# upsert members finish in <=17 s at sf1, worst = i11's outer-join
# state lifecycle). Nothing is skipped by default.
SKIP_PREFIXES: tuple[str, ...] = ()

# Exact-form demotion at sf10 (round-10 verdict stretch item,
# policy in SCALE.md "Round 11"): a query here has an oracle-checked
# approximate relief valve that carries its sf10 trend, so the exact
# form runs at sf10 ONLY as a regression canary — when its
# implementing module changed that round, or when named explicitly
# on the command line. It still runs in every sf0.01 driver sweep
# and at sf1 (cheap there); default sf10 sweeps record a
# "demoted" marker instead of paying the wall.
DEMOTED_AT_SF10 = {
    "graph_triangles": (
        "exact form costs ~1,470 s at sf10; graph_triangles_sampled "
        "(DOULION p=1/4, 25% oracle-checked bound, <=3.5% observed "
        "error) carries the sf10 trend — run exact only when "
        "graph_queries.py changed or when named explicitly"
    ),
    # Round-14 (r13 verdict item 4): the seven rows every sf10 sweep
    # since r9 has re-adjudicated as documented fixture boundaries
    # now carry their policy marker mechanically. Five are the
    # mod-97-codebook boundary (the fixture codebook GROWS with the
    # corpus, so |corpus| x |codebook| assignment cosines are
    # quadratic BY FIXTURE — SCALE.md round-12 sf10 section); two
    # are the quadratic exact recall-baseline leg production drops.
    # Each names its green in-sweep control; name any row explicitly
    # to re-arm its exact canary.
    "ann_ivf_probe": (
        "mod-97 codebook boundary (k grows with n -> quadratic "
        "assignment BY FIXTURE); control: ann_ivf_fixed_k (constant "
        "k=32, green at sf10, plan pinned by "
        "test_ivf_fixed_k_same_plan_shape)"
    ),
    "ann_ivf_lloyd": (
        "mod-97 codebook boundary via its Lloyd seed set; control: "
        "ann_ivf_fixed_k carries the sf10 IVF trend"
    ),
    "ann_recall_lloyd": (
        "recall harness over the mod-97 codebook: the exact "
        "full-corpus baseline leg is quadratic BY DESIGN (it is what "
        "production drops); controls: ann_ivf_fixed_k + the "
        "registered rag_ann_production bucketed path"
    ),
    "dedup_semantic_clusters": (
        "mod-97 codebook boundary (|corpus| x |codebook| cosines); "
        "control: dedup_semantic_fixed_k (constant k, green at sf10)"
    ),
    "ep9_vector_index_pipeline": (
        "mod-97 codebook boundary in the index-build stage; control: "
        "ann_index_incremental_update + the cellpart maintenance "
        "family carry the sf10 index-lifecycle trend at O(batch)"
    ),
    "ep10_rag_retrieval": (
        "quadratic exact recall-baseline scorer (documented round 9); "
        "control: rag_ann_production (the registered bucketed path "
        "at the production plane count — runs in every sweep tier)"
    ),
    "ep10_rag_retrieval_ann": (
        "same harness as ep10_rag_retrieval — the quadratic exact "
        "leg it diffs against dominates; control: rag_ann_production"
    ),
    # Round-15 (r14 verdict item 3): the closest row to the sf10
    # watchdog budget (281.9 s of 300 s in the r14 sweep) — FIXED
    # 2^16 buckets make within-bucket pairs quadratic in corpus size
    # (SCALE.md round-9; the plane count is the granularity knob).
    "dedup_embedding_multiprobe": (
        "fixed 2^16-bucket quadratic at 281.9 s of the 300 s budget "
        "(r14 sweep) — one fixture bump tips it; control: "
        "dedup_embedding_multiprobe_scaled (the SAME margin-"
        "multiprobe plan at the production 24-plane setting, "
        "hash-exact against the same all-pairs oracle, green at "
        "sf10) carries the trend — run the 16-plane exact canary "
        "when dedup_queries.py changed or when named explicitly"
    ),
    # Round-16 (r15 verdict item 2): the second of the two rows that
    # sat inside 15% of the sf10 budget two sweeps running (284.7 s
    # in-sweep, 230-245 clean band, vs the 255 s line) — the 5-gram
    # vocab only partially de-saturates this ~30-word synthetic
    # corpus, so candidate count stays near-quadratic. The widening
    # knob IS the production answer (module doc), so the next step
    # carries the trend.
    "dedup_ngram_jaccard_w5": (
        "5-gram vocab (20.4k) leaves candidates near-quadratic on "
        "this corpus: 284.7 s in-sweep of the 300 s budget (r15) / "
        "230-245 clean; control: dedup_ngram_jaccard_w7 (the SAME "
        "PPJoin plan one widening step on — 63k vocab, ~3x fewer "
        "candidates, identical 47,700 sf10 rows, 89.7 s measured "
        "under load-16) — run the w5 canary when dedup_queries.py "
        "changed or when named explicitly"
    ),
}


# Per-query watchdog-budget overrides (round-12 verdict stretch 7):
# a query here is ADJUDICATED healthy at a wall the default budget
# sits just under, so routine sweeps apply the recorded budget
# instead of re-timing-out and forcing a fresh adjudication every
# round. ep4_circles: sf1 single-shot completes in ~93 s vs the
# 120 s default — sub-linear (6x wall for 10x data), and exactly its
# plan shape (two date-sliced ROI-cascade SCD generations ≈ 2x the
# ep3 single-generation control's 40.3 s + glue; NOTES.md round-12
# sf1 sweep note). The override leaves headroom for same-session
# GC/heap churn after heavy predecessors (the 5-10x overstatement
# class documented in the verify skill).
BUDGET_OVERRIDES: dict[str, float] = {
    "ep4_circles": 240.0,
    # Round-15: three rows whose DOCUMENTED cold sf1 walls sit at or
    # over the 120 s default, so they pass a default sweep only on a
    # warm-cascade or quiet-box day (r14 read them at 56/28/26 s —
    # the outliers; r15's readings matched the documented walls and
    # recorded spurious TIMEOUTs). graph_triangles: 126 s documented
    # cold (NOTES round-9; 113-143 s across four r15 re-measures).
    # ep10_rag_retrieval: 67-122 s documented (SCALE round-8
    # composite table). ep10_rag_retrieval_ann: 44.7 s documented
    # but its quadratic exact leg carries the same burst sensitivity
    # (120-149 s under measured load-19+ bursts). Overrides leave
    # the same churn headroom as ep4's.
    "graph_triangles": 240.0,
    "ep10_rag_retrieval": 240.0,
    "ep10_rag_retrieval_ann": 240.0,
    # Round-14: in-sweep sf1 reading 120.05 s (TIMEOUT at the default
    # budget) vs isolated re-measure 42.75 s — the documented
    # same-session GC-churn overstatement class (its persisted twin
    # read 45.0 s in the SAME sweep, and the amortized form completes
    # sf10 in 81.9 s, so a genuine >120 s sf1 wall is implausible).
    # The override absorbs the churn band instead of forcing a fresh
    # adjudication every round; sf10 stays inside the default 300 s.
    "ep13_contrastive_pairs_amortized": 240.0,
}


# The ONE sf parser, shared with bench.py so the demotion decision
# and the bench artifact's sf label can never disagree (round-13
# advice items 1-2; rules and rationale in the helper's module doc —
# basename takes an sf<number> PREFIX, the parent fallback requires
# an EXACT sf<number> component, so /data/sf2020-era/fixture no
# longer hijacks the label). default_names still logs the matched
# value whenever demotion fires.
from innercircle_etl_spark.sfparse import parse_sf  # noqa: E402


def default_names(
    queries, headline, sf_dir: str
) -> tuple[list[str], dict[str, str]]:
    """(names to run, demoted name -> reason) for a no-explicit-names
    sweep: every batch-registry query outside the headline set, minus
    — at sf>=10 only — the DEMOTED_AT_SF10 rows (which are returned
    separately so the sweep records a marker instead of silence)."""
    names = [
        n
        for n in queries
        if n not in headline
        and not any(n.startswith(p) for p in SKIP_PREFIXES)
    ]
    demoted: dict[str, str] = {}
    sf = parse_sf(sf_dir)
    if sf is not None and sf >= 10:
        demoted = {n: r for n, r in DEMOTED_AT_SF10.items() if n in names}
        names = [n for n in names if n not in demoted]
        if demoted:
            print(
                f"# sf10 demotion applied (parsed sf={sf} from"
                f" {sf_dir!r}): {sorted(demoted)} — name them"
                f" explicitly to re-arm the exact canaries",
                file=sys.stderr,
            )
    elif sf is None and any(n in names for n in DEMOTED_AT_SF10):
        print(
            f"# sf10 demotion NOT applied: no sf<N> component in"
            f" {sf_dir!r} — if this is a factor>=100 fixture the"
            f" exact forms in DEMOTED_AT_SF10 will pay their full"
            f" wall",
            file=sys.stderr,
        )
    return names, demoted


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    names = sys.argv[3:]

    from bench import HEADLINE
    from innercircle_etl_spark.plans import QUERIES
    from innercircle_etl_spark.session import drop_query_caches, get_spark

    demoted: dict[str, str] = {}
    if not names:
        names, demoted = default_names(QUERIES, HEADLINE, sf_dir)

    spark = get_spark(app_name="sf1_spot_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        group = f"spot_{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        timed_out = threading.Event()
        q_budget = max(budget, BUDGET_OVERRIDES.get(name, 0.0))
        if q_budget > budget:
            print(
                f"# {name}: budget override {q_budget}s (adjudicated"
                f" healthy at this wall — see BUDGET_OVERRIDES)",
                file=sys.stderr,
            )

        def watchdog() -> None:
            if not done.wait(q_budget):
                timed_out.set()
                sc.cancelJobGroup(group)

        done = threading.Event()
        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        t0 = time.time()
        try:
            n = QUERIES[name](spark, sf_dir).count()
            wall = round(time.time() - t0, 2)
            out[name] = {"wall_s": wall, "rows": n}
        except Exception as e:  # cancelled or genuinely broken
            wall = round(time.time() - t0, 2)
            out[name] = {
                "wall_s": wall,
                "error": "TIMEOUT" if timed_out.is_set() else repr(e)[:200],
            }
        finally:
            done.set()
            sc.setJobGroup("", "")
            try:
                drop_query_caches(spark)
            except Exception:
                pass
        print(f"# {name}: {out[name]}", file=sys.stderr)
    for name, reason in demoted.items():
        out[name] = {"demoted": reason}
        print(f"# {name}: demoted (see SCALE.md)", file=sys.stderr)
    applied = {
        n: b
        for n, b in BUDGET_OVERRIDES.items()
        if n in out and b > budget
    }
    payload = {"sf_dir": sf_dir, "budget_s": budget, "results": out}
    if applied:
        payload["budget_overrides"] = applied
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
