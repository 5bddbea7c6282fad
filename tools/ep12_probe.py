"""One-query adjudicating measurement for ep12_training_mix
(round-12 verdict What's-wrong #1 / round-13 item 3): interleave the
bench's exact cpu probe and io probe with cold-cache ep12 reps at
sf0.1 and print every sample as one JSON line, so a reading stands
or falls on its own in-artifact probes instead of a narrative.
Methodology matches bench.py (warm code at sf0.001, drop_query_caches
between reps, min-of-reps as the steady-state estimate); two probe
warm-up rounds are discarded so the probe job's own codegen doesn't
pollute sample 1 (it cost 0.76 s in the first round-13 session).

    python tools/ep12_probe.py [reps]

Round-13 findings recorded in NOTES.md "ep12 bench question closed".
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from bench import _REF_PROBE, _cpu_probe, _drop_caches, _io_probe  # noqa: E402
from innercircle_etl_spark.plans import QUERIES  # noqa: E402
from innercircle_etl_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="ep12_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def io_probe() -> float:
        # bench's ONE io-probe job — never paste it (its docstring)
        return _io_probe(spark, SF)

    QUERIES["ep12_training_mix"](spark, "/root/testdata/sf0.001").count()
    _drop_caches(spark)
    for _ in range(2):  # probe-job codegen warm-up, discarded
        _cpu_probe(spark)
        io_probe()
    _drop_caches(spark)

    out = {"cpu": [], "io": [], "ep12": []}
    for _ in range(reps):
        out["cpu"].append(_cpu_probe(spark))
        out["io"].append(io_probe())
        _drop_caches(spark)
        t0 = time.time()
        QUERIES["ep12_training_mix"](spark, SF).count()
        out["ep12"].append(round(time.time() - t0, 3))
        _drop_caches(spark)
    out["cpu"].append(_cpu_probe(spark))
    out["io"].append(io_probe())

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    out["cpu_ratio"] = round(med(out["cpu"]) / _REF_PROBE["cpu"], 3)
    out["io_ratio"] = round(med(out["io"]) / _REF_PROBE["io"], 3)
    out["ep12_min"] = min(out["ep12"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
