"""Round-14 measurement harness (guide §1): per-query timing split into
plan-construction (build) vs execution (noop sink), best-of-N, plus
``.explain("formatted")`` capture into plans/r14/.

Usage:
    python scripts/measure.py [--runs N] [--sf DIR] [--plans] name [name ...]
    python scripts/measure.py --top K        # K slowest from BENCH_FULL.json

Timing methodology matches bench.py (clearCache between runs, noop sink,
timer brackets build+write) but additionally reports the build-only time so
driver-side plan-construction cost is visible separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from burst_db_spark.registry import all_queries
from burst_db_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans = False
    names: list[str] = []
    top = 0
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans":
            plans = True; i += 1
        elif a == "--top":
            top = int(args[i + 1]); i += 2
        else:
            names.append(a); i += 1

    specs = all_queries()
    if top:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_FULL.json")) as fh:
            q = json.load(fh)["queries"]
        q = {k: v for k, v in q.items() if isinstance(v, (int, float))}
        names = [k for k, _ in sorted(q.items(), key=lambda x: -x[1])[:top]]

    spark = get_spark(app_name="measure_r14")
    # warmup
    try:
        specs["p10_dedup_distinct"].build(spark, sf_dir).count()
    except Exception as e:  # noqa: BLE001
        print(f"warmup failed: {e}", file=sys.stderr)

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15"))
    os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in names:
        if name not in specs:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        try:
            builds, totals = [], []
            for _ in range(runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"measure:{name}")
                t0 = time.perf_counter()
                df = specs[name].build(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                builds.append(t1 - t0)
                totals.append(t2 - t0)
            rec = {
                "total_best": round(min(totals), 3),
                "build_best": round(min(builds), 3),
                "totals": [round(x, 3) for x in totals],
                "builds": [round(x, 3) for x in builds],
            }
            if plans:
                spark.catalog.clearCache()
                df = specs[name].build(spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(plan_dir, f"{name}_current.txt"),
                          "w") as fh:
                    fh.write(txt)
                rec["exchanges"] = txt.count("Exchange")
                rec["py_nodes"] = (txt.count("BatchEvalPython")
                                   + txt.count("ArrowEvalPython")
                                   + txt.count("MapInArrow")
                                   + txt.count("FlatMapGroupsInPandas")
                                   + txt.count("MapInPandas"))
            out[name] = rec
            print(f"{name}: total={rec['total_best']}s "
                  f"build={rec['build_best']}s "
                  f"spread={rec['totals']}"
                  + (f" exch={rec.get('exchanges')}"
                     f" py={rec.get('py_nodes')}" if plans else ""))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            out[name] = {"err": str(e)[:300]}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
