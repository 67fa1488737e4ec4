"""Per-query optimization probe (r15): time isolated catalog entries and
capture their physical plans.

Usage:
  python bench_probe.py --plans q1 q2 ...       # explain("formatted") -> plans/<round>/<q>_<tag>.txt
  python bench_probe.py --time N q1 q2 ...      # N timed runs each (collect(), bench methodology)
  python bench_probe.py --noop N q1 q2 ...      # N timed runs each (noop sink — guide §1.4)
  --tag before|after   suffix for plan files (default "before")
  --round rNN          plans subdirectory (default "r16")

The timing methodology matches bench.py (same session factory, same
warm-up, collect() on the same callables) so probe numbers are
comparable with BENCH_DETAIL.json; ``--noop`` exists to separate
compute from result-collection per guide §1.4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "OUTPOST_SPARK_ORACLE_FIXTURES", f"/tmp/outpost_spark_probe_fix_{os.getpid()}"
)

from outpost_spark import queries_catalog  # noqa: E402
from outpost_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--plans", action="store_true", help="capture explain('formatted')")
    ap.add_argument("--time", type=int, metavar="N", help="N timed collect() runs each")
    ap.add_argument("--noop", type=int, metavar="N", help="N timed noop-sink runs each")
    ap.add_argument("--tag", default="before", help="plan-file suffix")
    ap.add_argument("--round", default="r16", dest="round_dir", help="plans/<round>/ dir")
    ap.add_argument("names", nargs="*", help="catalog entry names (default: all)")
    ns = ap.parse_args()
    if ns.plans:
        mode, runs = "plans", 0
    elif ns.noop is not None:
        mode, runs = "noop", ns.noop
    else:
        mode, runs = "time", ns.time if ns.time is not None else 3
    tag, names = ns.tag, list(ns.names)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("outpost-spark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = queries_catalog.queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        ap.error(
            f"unknown quer{'y' if len(unknown) == 1 else 'ies'} {unknown}; "
            f"valid entries: {sorted(registry)}"
        )
    if not names:
        names = list(registry)

    # same warm-up as bench.py: parquet footers + Python worker pool
    registry["metrics_count_all"](spark, sf_dir).collect()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus).repartition(cpus).mapInPandas(lambda it: it, "id long").collect()

    if mode == "plans":
        outdir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "plans", ns.round_dir
        )
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"{name}: wrote {path} ({plan.count('Exchange')} Exchange refs)")
        return

    import gc

    out: dict[str, list[float]] = {}
    for name in names:
        fn = registry[name]
        ts = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            ts.append(round(time.perf_counter() - t0, 4))
            gc.collect()
        out[name] = ts
        print(json.dumps({name: ts}))
    print(json.dumps({"probe": out}, separators=(",", ":")))


if __name__ == "__main__":
    main()
