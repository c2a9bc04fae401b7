"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + count-style action;
results are consumed via a cheap aggregate so the full plan runs but
no driver materialization dominates).

Run-to-run comparability: the round-4 recording showed a uniform
~1.4-1.5x slowdown across the whole SQL tier vs round 2 with unchanged
plans.  A controlled re-run in round 5 — same code, same registration
order, idle machine — reproduced the ROUND-2 numbers (e.g.
sql_large_orders 1.90/2.96/1.88 s across r2/r4/now), so the drift was
co-located load on the recording host, not code, warmup ordering, or
registration position.  Treat cross-round per-query deltas under ~1.5x
as environment noise unless they reproduce on a quiet machine.

Cross-round TOTALS are not comparable when the registry grows: round
5 roughly doubled the query count, so compare the COMMON per-query
subset instead.  End-of-round-5 reference: the 66 entries parsed from
BENCH_r04's tail summed 68.0 s there and 50.5-76.9 s across round-5
closing runs (spread = co-located load; the faster runs follow the
LSH driver-probe rewrite, sim_lsh_ann_topk 3.65 -> ~1.5-2.1 s at 3x
round 2's recall).  The one real added common-subset cost is
curation_mixture's documented skew-guard aggregation (0.3 -> 1.0 s).

Round-5-continuation reference (idle machine): 134 queries, 154.3 s
total at sf0.1/local[32]; no query above ~6.2 s after the
dedup_triangles edge-persist fix (its unpersisted edge plan had been
re-running the whole Jaccard pipeline once per self-join branch,
14.1 s -> ~5 s cold / ~3 s warm).  A concurrent pytest run inflates
the same bench to ~674 s — co-located load dominates every cross-run
comparison, reconfirming the round-4 drift diagnosis.

End-of-continuation reference (idle): 153 queries, 150.8 s — 19 more
queries than the prior reference at a LOWER total (run-to-run noise
plus the triangle fix), heaviest query 8.3 s (curation_keep_best),
zero errors.

Second-continuation reference: 181 queries, 233.0 s idle (back-to-back
runs spread 233-307 s on this box; a 3x repeat probe shows the spread
is COLD-start variance, not regression — the r4-recorded heavies
re-measure warm at their r4 values: dedup_clusters 14.6 s cold /
~5.1 s warm vs r4's 4.78, dedup_ngram_jaccard 2.8/2.2 vs r4's 2.70).
The 28 new queries together add ~24 s; every one is individually
< 3.5 s at sf0.1.  Zero errors.

End-of-second-continuation reference: 195 queries, 248.3 s idle,
heaviest 6.5 s (curation_corpus), zero errors; the full 195-query
oracle sweep at sf0.01 passed 195/195 the same session.

Round-7 reference: 200 queries, 233.7 s idle — 227.0 s for the
pre-addition 196, the four round-7 additions (span trim, weighted
Jaccard, KLL, theta) add ~5 s, heaviest dedup_eval_pr ~7.6 s (it runs
3rd in the r7 registration order and is charged the whole dedup
family's codegen JIT; a warmup A/B measured 6.8 s of sf0.001 pre-warm
buying back only 2 s, so the charge stays where it is), zero errors.
Back-to-back idle runs this round spread 233.7-270.9 s with UNIFORM
inflation on trivial queries (du_core 0.29 → 1.47 s in the slower
runs) — treat the whole band as this box's idle variance and compare
per-query, not totals, across rounds.  A /proc/stat sample taken
DURING a full run shows <0.5% hypervisor steal and long sub-10%-user
stretches: at sf0.1 the bench is scheduling-latency-bound (per-job
setup and driver-executor round-trips over tiny stages), not
CPU-bound, so totals jitter while plan shapes and the 10x-scaling
probes in SCALE.md carry the real performance signal.  From round 7
on the FULL per-query map of the latest sf0.1 run is committed as
BASELINE_QUERIES.json — cross-round per-query comparisons should read
that file's git history, not the truncated BENCH_r*.json tails.

Round-8 reference: 207 queries, 267.0 s idle (back-to-back complete
runs 267.7/267.0 — 0.3% apart; an earlier 205-query idle run measured
249.9 s) — like-for-like ≈249 s for the prior 200 after subtracting
the seven round-8 additions (~18 s: udtf_table_arg_changes ~8 s is
the bulk — a Python UDTF's per-row eval over 100k events is the
documented cost of the TABLE-argument API surface; the
window-function events_* family is the production path for that
shape).  Same-day idle runs this round spread 249.9-324.2 s (1.30x)
with the >2x per-query outliers exactly the queries the r8 rotation
moved to the FRONT of the run order — registration position decides
who pays the JVM/codegen warmup tax, so cross-round per-query
comparisons must account for rotation moves, not just load.

Round-10 reference: 235 queries, 234.0 s idle pin.  Idle bands moved
WITHIN the day: 192-204 s mid-round (232 queries, afternoon) vs
234-262 s at close (235 queries, evening, load average 0.03 — the
drift is host-level, invisible to guest load), re-proving that idle
bands are per-day-per-hour and only >1.5x PER-QUERY movers mean
anything.  The six round-10 additions (full-outer/semi attribution
joins, Arrow cogroup stats, SQL-UDF bands, listagg, media shard plan)
add ~2 s combined; the one structural mover vs the r9 pin is
curation_ppl_buckets 0.86->1.34 s — the documented cost of its new
unscored-bucket branch (one extra bounded scan+aggregate,
plan-pinned); every other >1.5x delta is band noise on sub-second
queries.

Round-11 reference: 238 queries, 233.5 s idle pin — now MEDIAN-OF-3
per query (round-10 verdict #3), so one loaded run can no longer cost
a round of signal: the pin and every later driver run use the same
repeats (per-run totals of the pin run: 275.2/231.5/215.4 s — run 1
carries the cold tax, the median reads warm steady-state).  The three
round-11 additions (transpose, variant_explode, lateral aliases) add
~1 s combined.  sim_pca_project — round 10's single 2.00x watch item —
re-measures at 1.21 s vs its 0.89 s old pin (1.36x, inside the band):
the 2.00x was co-located load, as the uniform r10 inflation predicted.
The >1.5x movers vs the old pin are all sub-second queries the r11
rotation moved to the registry FRONT (events_bitmap_users 0.22->0.59 s
etc.) — the round-8-documented warmup-position tax, now baked into the
pin at the same positions the driver will run them.

Round-12 reference: 258 queries, 256.1 s idle pin — now with a
DISCARDED per-query warm-up pass before the median-of-3 repeats
(round-11 verdict #6), so per-run totals read flat
(259.6/261.0/254.7 s; the cold ramp that contaminated the r11 spread
block is gone).  A midday pin of the same code measured the first
254 queries at 207.3 s with per-run totals 210.3/213.2/203.5 and
median_rel_spread 0.102 — the committed evening re-pin (which adds
the last four additions) sits ~1.23x above it in aggregate, the same
host-level per-day-per-hour idle band the round-10 notes document.
Within-run spread stayed tight (max_rel_spread 1.05), and the
cross-pin movers above 1.8x are all sub-1.4 s queries
(profile_orders 0.37→0.95 s, dq_orders_constraints 0.50→1.34 s, …)
— the scheduling-latency noise class the round-7 notes pin on small
stages, with every multi-second heavy inside 1.5x of its midday
value except sim_kmeans_stats (2.45→4.12 s, 1.68x, the same band).  The eight round-12 additions are all
sub-second (~2.5 s combined); the heaviest queries are unchanged
(graph_pagerank_brands, curation_corpus).  The 100x replicated-scale
exponents for the five slowest live in SCALE.md (round-12 section):
0.67-1.11, all near-linear.

Baseline-refresh policy (round-7 verdict): COMMIT a BASELINE_QUERIES
refresh only from an IDLE run — check nothing else is running (no
concurrent pytest/verify; `uptime` load well under core count) and,
when in doubt, confirm a trivial query's timing sits in its idle band
(du_core ≈ 0.3 s idle vs ≈ 1.5 s co-located).  An inflated committed
baseline weakens the 2x regression gate for every later round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_mailio_diskusage_handler_spark import registry  # noqa: E402
from go_mailio_diskusage_handler_spark.session import build_session  # noqa: E402


# A failing query must read as a REGRESSION, not a speedup: it is
# charged a sentinel penalty far above any real query time, so the
# headline total grows when something breaks, while the run itself
# stays failure-isolated (one bad query can't abort the recording,
# as the round-3 events_sessionize crash did).
ERROR_PENALTY_SEC = 60.0


def time_query(spark, name, fn, sf_dir, repeats, warmup, errors):
    """Time one registry query: optional untimed warm-up pass, then
    ``repeats`` timed executions; returns the per-run seconds list and
    records any failure message into ``errors``.  Module-level (not
    inlined in main) so the failure-isolation contract is unit-testable.
    """
    runs: list[float] = []
    # Explicit failure flag (round-12 ADVICE): comparing the last
    # rounded elapsed against ERROR_PENALTY_SEC would misread a
    # legitimate run that happens to round to exactly 60.000 s as
    # a failure and silently skip its remaining repeats.
    failed = False
    if warmup:
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # fails in warm-up → fails timed too
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            runs.append(ERROR_PENALTY_SEC)
            failed = True
        finally:
            spark.catalog.clearCache()
    df = None
    for _ in range(repeats):
        if failed:
            break  # already failed (warm-up or a prior repeat)
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            assert n >= 0
            runs.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # one bad query must not kill the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            runs.append(ERROR_PENALTY_SEC)
            failed = True
            break  # a failing query fails every repeat; don't pay 3x
        finally:
            # Drop the frame BEFORE the next repeat constructs its own
            # (r15 measurement-bug fix): Spark's unpersist removes cache
            # entries by PLAN EQUALITY, and the old frame's cache-release
            # finalizer fired at the next repeat's REBIND — i.e. right
            # after that repeat persisted its plan-equal intermediates —
            # so repeats 2..N silently timed UNCACHED executions,
            # violating this loop's own "self-contained including its
            # own materialization" contract (repeat 1 was unaffected;
            # isolated probes never reproduced the inflation).
            df = None
            # Queries that persist intermediates (near-dup, ANN) would
            # otherwise accumulate executor storage across the run and
            # pressure later queries; each query is timed self-contained,
            # including its own materialization.
            spark.catalog.clearCache()
    return runs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # Warm the JVM/codegen once on the smallest table so q1 isn't
    # charged for session warmup, and spin up the Python worker pool
    # (first Arrow/pandas exchange otherwise bills one query ~2-3 s of
    # interpreter spawns across all cores).
    registry.QUERIES["du_core"](spark, sf_dir).limit(1).collect()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    # Prime the OS page cache for every fixture table: otherwise the
    # first query to touch each parquet file is charged its cold read,
    # and per-query timings become an artifact of registration order.
    from go_mailio_diskusage_handler_spark.sources.tables import (  # noqa: E402
        TABLES,
        load_table,
    )

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # Warm whole-stage-codegen for the vector-math HOF family at the
    # smallest fixture: these queries carry the largest generated
    # expression trees (plane/codebook literals), and their one-time
    # JIT compile (~2-3 s each, measured) otherwise lands on whichever
    # query happens to run first.  Identical expressions → codegen
    # cache hits when the timed run executes at sf_dir.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for warm_q in (
            "sim_lsh_ann_topk",
            "sim_ivfpq_ann_topk",
            "dedup_embedding_cosine",
        ):
            if warm_q in registry.QUERIES:
                try:
                    registry.QUERIES[warm_q](spark, warm_sf).count()
                except Exception:
                    pass
        spark.catalog.clearCache()

    # Median-of-N per query (round-10 verdict #3): one loaded driver
    # run was costing a whole round of perf signal — the r10 record
    # showed a UNIFORM 1.17x inflation with zero real movers.  The
    # repeats run back-to-back per query, so repeats 2..N are warm
    # (page cache + codegen); the median therefore reads as the
    # query's warm steady-state, and the committed BASELINE_QUERIES
    # pin is refreshed with the SAME method so the 2x gate compares
    # like with like.  Override for quick iteration probes.
    REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # Discarded per-query warm-up pass before the timed repeats
    # (round-11 verdict #6): with repeats timed back-to-back from
    # cold, repeat 1 was carrying each query's one-time codegen JIT +
    # page-cache tax, which the median correctly discards but the
    # spread block then double-counted as "noise" (per-run totals
    # 261.6→218.1→201.8 s in the r11 pin — a pure cold→warm ramp, not
    # machine variance).  One untimed execution first moves every
    # query to warm steady-state, so all REPEATS runs measure the same
    # regime and median_rel_spread reads ONLY real variance.  Skipped
    # when REPEATS == 1: quick iteration probes want wall-cheap
    # single-shot numbers, not warm ones.
    WARMUP = REPEATS > 1 and os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    errors: dict[str, str] = {}
    per_query_runs: dict[str, list[float]] = {}
    for name, fn in registry.QUERIES.items():
        runs = time_query(spark, name, fn, sf_dir, REPEATS, WARMUP, errors)
        per_query_runs[name] = runs
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)

    total = round(sum(timings.values()), 3)
    # Spread evidence: how noisy was THIS run?  rel_spread =
    # (max-min)/median per query; the summary keeps it compact enough
    # to survive the driver's ~2000-char stdout tail (the full per-run
    # matrix goes to BENCH_SUMMARY.json only).
    rel = {
        n: (max(r) - min(r)) / m if (m := sorted(r)[len(r) // 2]) > 0 else 0.0
        for n, r in per_query_runs.items()
    }
    worst = max(rel, key=rel.get) if rel else None
    spread = {
        "repeats": REPEATS,
        "per_run_totals": [
            round(sum(r[i] if i < len(r) else r[-1]
                      for r in per_query_runs.values()), 3)
            for i in range(REPEATS)
        ],
        "median_rel_spread": round(sorted(rel.values())[len(rel) // 2], 3)
        if rel else 0.0,
        "max_rel_spread": [worst, round(rel[worst], 3)] if worst else None,
    }
    # Key ORDER is load-bearing: the driver archives only the final
    # ~2000 chars of this line, so the headline scalars (metric/value/
    # unit/sf) must serialize LAST — after the per-query map — or they
    # are truncated away (BENCH_r01-r05 all recorded "parsed": null
    # because "value" came first and ~196 timings pushed it off the
    # tail).  Python dicts preserve insertion order through json.dumps.
    out: dict = {}
    if errors:
        out["errors"] = errors
    out["queries"] = timings
    out["spread"] = spread
    out["metric"] = "total_query_sec"
    out["value"] = total
    out["unit"] = "sec"
    out["sf"] = float(sf)
    print(json.dumps(out))
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # Self-contained run evidence (round-8 verdict task 4): the driver
    # archives only the final ~2000 chars of the stdout line, which
    # truncates most of the per-query map out of BENCH_r*.json.
    # BENCH_SUMMARY.json carries the FULL record of the latest run
    # (per-query map + headline scalars + n + sf) so the committed
    # artifact never depends on the driver's tail window.
    # Written only at the headline config (sf0.1): an ad-hoc sf0.001/
    # sf0.01 iteration probe must not clobber the committed sf0.1 run
    # evidence — the same hazard the PIN_BASELINE gate closes below.
    summary = dict(out)
    summary["n_queries"] = len(timings)
    summary["runs"] = per_query_runs
    if float(sf) == 0.1:
        try:
            with open(os.path.join(repo_dir, "BENCH_SUMMARY.json"), "w") as fh:
                json.dump(summary, fh, indent=1)
                fh.write("\n")
        except OSError:
            pass  # read-only checkout: the stdout line still records
    # Per-query regression baseline (round-5 verdict task 7), compared
    # NUMERICALLY so "0.10"/".1" spellings match (ADVICE r7).  The pin
    # is OPT-IN (round-8 verdict task 5): refreshing the committed
    # baseline is a deliberate idle-run decision per the policy above,
    # so an ordinary (possibly loaded) driver run must not overwrite
    # it — run with SPARK_GRAFT_PIN_BASELINE=1 on a quiet machine.
    if float(sf) == 0.1 and os.environ.get("SPARK_GRAFT_PIN_BASELINE") == "1":
        try:
            with open(os.path.join(repo_dir, "BASELINE_QUERIES.json"), "w") as fh:
                json.dump(out, fh, indent=1)
                fh.write("\n")
        except OSError:
            pass
    spark.stop()
    # A run with broken queries must not read as clean: the 60 s
    # penalty inflates the total, and the exit code makes it visible
    # to anything that only checks rc.  The JSON line is already
    # printed, so the recording itself is never lost.
    if errors:
        sys.exit(2)


if __name__ == "__main__":
    main()
