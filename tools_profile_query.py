"""Per-query optimization profiler (round 15).

For each named registry query: one untimed warm-up execution, then
N timed ``count()`` repeats (the bench's timed action), plus one
``noop``-sink timed run (guide §1.4 — computes every column), the
``explain("formatted")`` plan, and the Spark job/stage count of a
single warm execution (the bench at sf0.1 is scheduling-bound, so
job count ≈ fixed overhead per query).

Usage:
    python tools_profile_query.py [--sf DIR] [--repeats N] \
        [--plans-dir plans/r15] [--suffix before] q1 q2 ...

Writes ``<plans-dir>/<query>_<suffix>.txt`` with the plan + a header
of timings, and prints one summary line per query.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_mailio_diskusage_handler_spark import registry  # noqa: E402
from go_mailio_diskusage_handler_spark.session import build_session  # noqa: E402


def plan_stats(plan: str) -> str:
    import re

    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_bhj = len(re.findall(r"\bBroadcastHashJoin\b", plan))
    n_smj = len(re.findall(r"\bSortMergeJoin\b", plan))
    n_shj = len(re.findall(r"\bShuffledHashJoin\b", plan))
    n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan))
    n_wsc = len(re.findall(r"WholeStageCodegen", plan))
    return (
        f"Exchange={n_exchange} BHJ={n_bhj} SMJ={n_smj} SHJ={n_shj} "
        f"PythonEval={n_py} WSCodegen={n_wsc}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = build_session("profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # session warm-up mirroring bench.py: JVM + python worker pool
    registry.QUERIES["du_core"](spark, args.sf).limit(1).collect()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    names = args.queries
    if names == ["ALL"]:
        names = list(registry.QUERIES)
    for name in names:
        fn = registry.QUERIES[name]
        # untimed warm-up (codegen/JIT + page cache)
        try:
            fn(spark, args.sf).count()
        except Exception as exc:
            print(f"{name}: WARMUP-FAIL {type(exc).__name__}: {exc}")
            spark.catalog.clearCache()
            continue
        finally:
            spark.catalog.clearCache()
        # job/stage count of one warm run
        sc.setJobGroup(f"prof:{name}", name)
        before_jobs = set(tracker.getJobIdsForGroup(f"prof:{name}"))
        fn(spark, args.sf).count()
        jobs = [j for j in tracker.getJobIdsForGroup(f"prof:{name}") if j not in before_jobs]
        n_stages = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        sc.setJobGroup("", "")
        spark.catalog.clearCache()
        # timed count() repeats (bench methodology)
        counts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            counts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        # one noop-sink run (full-column compute)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        noop = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        # plan capture
        df = fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        spark.catalog.clearCache()
        med = sorted(counts)[len(counts) // 2]
        stats = plan_stats(plan)
        line = (
            f"{name}: count_med={med} runs={counts} noop={noop} "
            f"jobs={len(jobs)} stages={n_stages} {stats}"
        )
        print(line, flush=True)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(f"# {line}\n# sf={args.sf}\n\n{plan}")
    spark.stop()


if __name__ == "__main__":
    main()
