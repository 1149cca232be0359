"""Benchmark harness (BASELINE.md §2).

Runs every declared query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The line also carries BENCH-2 (BASELINE.md: DuckDB oracle wall over the
contract suite q01-q67, single connection) as "oracle_wall_sec" /
"oracle_queries" — VERDICT r5 #7: the baseline declares the oracle-side
anchor but no artifact recorded it before round 6.

Protocol: one warm-up action, then per query a FIRST timed run (plan +
whole-stage-codegen compile + execution to a count() action — the cold
diagnostic) followed by an immediate WARM re-run (codegen cached; caches a
query fronts are cleared first, see memo.py) whose wall is the gate basis
against the SF baseline file's ``queries_warm`` anchors (VERDICT r16 #2).
``value`` stays the first-pass suite wall — the BASELINE.md contract
metric; ``warm_suite_wall_sec`` is the steady-state number for
round-over-round comparison. SPARK_GRAFT_BENCH_WARM=0 skips the warm
re-runs (halves runtime; gate falls back to first-pass vs first-pass).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hadoop_copier_spark.memo import (  # noqa: E402
    consumed_caches,
    evict_cache_keys,
    snapshot_cache_keys,
)
from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402


class _SubsetRun(Exception):
    """Control-flow marker: SPARK_GRAFT_BENCH_ONLY skips a block."""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="hcs-bench", cpus=cpus, shuffle_partitions=int(cpus))
    # ADVICE r17: n_batches/work_ms_sum below are read from
    # q.recentProgress, whose buffer is capped by
    # spark.sql.streaming.numRecentProgressUpdates (default 100) — with
    # a replay chunk count above that, batches would silently drop and
    # sched_gap_ms would inflate by the dropped work. Raise the cap well
    # past any n_chunks this bench uses so the profile stays complete.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")

    # warm-up: JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # The warm re-run per query (VERDICT r16 #2 — ON by default since
    # round 17; SPARK_GRAFT_BENCH_WARM=0 skips it): every perf dispute
    # to date — the r15 driver gate violations, xh_hll_registers, the
    # r14 heavy-hitters case, all 20 r16 retry candidates — was
    # first-invocation whole-stage-codegen compile plus host tax,
    # adjudicated after the fact with ad-hoc warm re-measures. The warm
    # number per query lands IN the artifact, and since r17 it is the
    # GATE basis when the SF baseline file carries warm anchors
    # (queries_warm) recorded under the same protocol.
    #
    # Warm protocol: the re-run happens IMMEDIATELY after the first
    # timed run (codegen still cached — a two-loop spelling was tried
    # and rejected: Spark's codegen cache holds ~100 plans, so a
    # second full loop over 250 queries re-pays compile and measured
    # 227 s where the interleaved warm measures ~160 s of pure work).
    # ADVICE r16 (medium) / ADVICE r17: before the warm re-run, the
    # exact cache KEYS the query's own first run inserted (memo.py
    # snapshot diff) are evicted, so the warm number re-pays precisely
    # the memoized stages the first run paid — a regression in a cached
    # stage can no longer hide behind a warm re-run that measures less
    # work, including per-site tpch_probes entries the old one-fronter-
    # per-cache-NAME protocol missed. Queries whose first run HIT the
    # caches built nothing, evict nothing, and re-run hot — exactly as
    # their first run did.
    warm_pass = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    # SPARK_GRAFT_BENCH_ONLY="name1,name2" restricts the timed loop to a
    # subset (gate demos, ad-hoc profiling) and skips the oracle +
    # streaming blocks; the artifact records the subset so a partial
    # run can never be mistaken for a full record.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {s.strip() for s in only_env.split(",") if s.strip()} or None
    timings: dict[str, float] = {}
    timings_warm: dict[str, float] = {}
    total = 0.0
    timed = [
        (name, q)
        for name, q in sorted(REGISTRY.items())
        if (only is None or name in only)
        # driver-window aliases (queries/aliases.py) are the same Query
        # objects under sort-first names — timing them twice would
        # inflate the suite wall without measuring anything new
        if "alias" not in q.tags
    ]
    # Which cache KEYS each query's first run inserted (snapshot diff
    # around the first timed run, memoized-cache consumers only); the
    # warm re-run and any gate retry evict exactly these, so both
    # measure the same memoized work the first run measured.
    built_keys: dict[str, dict[str, set]] = {}
    warm_evicted: dict[str, dict[str, int]] = {}
    for name, q in timed:
        consumes = consumed_caches(q.fn)
        pre = snapshot_cache_keys() if consumes else None
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            df.count()
            dt = time.perf_counter() - t0
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            dt = -1.0
        timings[name] = round(dt, 3)
        if dt > 0:
            total += dt
        if consumes and dt > 0:
            post = snapshot_cache_keys()
            added = {c: post[c] - pre[c] for c in consumes if post[c] - pre[c]}
            if added:
                built_keys[name] = added
        if warm_pass and dt > 0:
            evicted = evict_cache_keys(built_keys.get(name, {}))
            if evicted:
                warm_evicted[name] = evicted
            t0 = time.perf_counter()
            try:
                q.fn(spark, sf_dir).count()
                timings_warm[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # pragma: no cover - bench robustness
                print(f"bench(warm): {name} FAILED: {e}", file=sys.stderr)
                timings_warm[name] = -1.0

    # BENCH-2: the DuckDB oracle side of the contract suite (q01-q67),
    # one single-threaded connection, fetch into pandas like the driver
    from hadoop_copier_spark.testing import duck_connect  # noqa: E402

    con = duck_connect(sf_dir)
    oracle_timings: dict[str, float] = {}
    oracle_total = 0.0
    for name, q in sorted(REGISTRY.items()):
        if only is not None:
            break  # subset run: contract oracle wall not meaningful
        if not (name.startswith("q") and q.oracle):
            continue
        t0 = time.perf_counter()
        try:
            con.execute(q.oracle).df()
            dt = time.perf_counter() - t0
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"bench(oracle): {name} FAILED: {e}", file=sys.stderr)
            dt = -1.0
        oracle_timings[name] = round(dt, 3)
        if dt > 0:
            oracle_total += dt
    con.close()

    # BENCH-6 (BASELINE.md): streaming tumbling-window agg over events
    # replayed as ~20 file micro-batches (maxFilesPerTrigger=1), budget
    # <= 120 s end-to-end, final table == batch q61. The replay WRITE is
    # fixture prep and excluded from the timed wall; the timed span is
    # stream start -> processAllAvailable (all micro-batches consumed).
    import shutil  # noqa: E402
    import tempfile  # noqa: E402

    from hadoop_copier_spark.streaming import (  # noqa: E402
        replay_events_time_buckets,
        stream_tumbling_counts,
    )

    replay_root = tempfile.mkdtemp(prefix="hcs_bench6_")
    streaming_wall, n_batches, stream_matches = -1.0, -1, False
    stream_profile: dict = {}
    try:
        if only is not None:
            raise _SubsetRun  # subset run: skip the streaming block
        src = replay_events_time_buckets(
            spark, sf_dir, os.path.join(replay_root, "src"), n_chunks=20
        )
        # VERDICT r16 #3: the r13-r16 walls drifted 13.7 -> 31.9 ->
        # 14-16 s across same-code runs because processAllAvailable on
        # a continuous trigger measures poll/idle waits alongside work.
        # Trigger.AvailableNow keeps the SAME per-file micro-batching
        # (maxFilesPerTrigger still bounds each batch) but terminates
        # when the present data is consumed, so the measured span is
        # work; the per-micro-batch StreamingQueryProgress durations
        # land in the artifact so any residual drift is attributable
        # (triggerExecution ~= work per batch; wall - sum(trigger) =
        # scheduling gaps).
        # r19 (OPTIMIZATION_r19.md): the aggregation state is
        # domain-bounded (one row per 10-min window x event_type — a few
        # hundred keys at ANY corpus size), so 8 state partitions replace
        # the session's 32: measured 14-17 s -> ~8 s for the same 20
        # micro-batches with the same final table (the r18-build
        # precedent: stream_interval_join's shuffle_partitions=8). The
        # timed span, trigger, replay chunking and q61 equality check are
        # unchanged; old numbers stand in BENCH_r18.json.
        t0 = time.perf_counter()
        q = stream_tumbling_counts(
            spark, src, "bench6_tumb", available_now=True, shuffle_partitions=8
        )
        q.awaitTermination()
        streaming_wall = time.perf_counter() - t0
        progress = list(q.recentProgress or [])
        n_batches = len(progress)
        trig_ms = [
            int((p.get("durationMs") or {}).get("triggerExecution", 0))
            for p in progress
        ]
        add_ms = [
            int((p.get("durationMs") or {}).get("addBatch", 0)) for p in progress
        ]
        stream_profile = {
            "trigger": "availableNow",
            "batch_trigger_ms": trig_ms,
            "batch_addbatch_ms": add_ms,
            "work_ms_sum": sum(trig_ms),
            "sched_gap_ms": max(0, int(streaming_wall * 1000) - sum(trig_ms)),
        }
        got = sorted(
            tuple(r)
            for r in spark.sql(
                "SELECT w_start_sec, event_type, n, sum_val_cents FROM bench6_tumb"
            ).collect()
        )
        want = sorted(tuple(r) for r in REGISTRY["q61"].fn(spark, sf_dir).collect())
        stream_matches = got == want
    except _SubsetRun:
        pass
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"bench(streaming): FAILED: {e}", file=sys.stderr)
    finally:
        shutil.rmtree(replay_root, ignore_errors=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # VERDICT r11 #8: ambient load lives IN the artifact, not in prose —
    # the r11 driver run read 1.26x slower purely from a 5.7 loadavg.
    loadavg = [round(x, 2) for x in os.getloadavg()]

    # VERDICT r14 #8: the per-query 2x regression gate, asserted by the
    # bench itself over EVERY query with a recorded quiet-box baseline,
    # not judge-recomputed from r7 artifacts. VERDICT r15 #4 generalizes
    # the baseline file to the SF actually being run —
    # bench/results_sf{sf}.json (sf0.1 from r14, sf1 recorded r16) — so
    # plan regressions at the AQE-flip scale gate too; an SF with no
    # recorded baseline file skips the gate rather than guessing.
    # A violation is dt > 2x baseline AND dt > baseline + 0.5 s (the
    # absolute slop keeps sub-second codegen-compile noise out); the
    # violations land IN the artifact — ambient load must not kill a
    # driver bench run, so this reports rather than exits nonzero.
    #
    # VERDICT r16 #2: when the baseline file carries WARM anchors
    # (queries_warm, recorded under the same cleared-cache warm
    # protocol) and this run took a warm pass, the gate compares
    # warm-vs-warm — codegen-compile and host-load tax cancel out, so
    # a violation means the PLAN regressed, not that the box was busy.
    # First-pass timings stay in the artifact as the cold diagnostic.
    # Runs without a warm side on either end keep the legacy
    # first-pass gate.
    gate_violations: dict[str, list[float]] = {}
    gate_retries: dict[str, list[float]] = {}
    gate_retry_cleared: dict[str, dict[str, int]] = {}
    baselines: dict[str, float] = {}
    baselines_warm: dict[str, float] = {}
    try:
        with open(os.path.join(_REPO, "bench", f"results_sf{sf}.json")) as f:
            _bfile = json.load(f)
        baselines = _bfile.get("queries", {})
        baselines_warm = _bfile.get("queries_warm", {})
    except OSError:
        pass
    warm_gate = bool(baselines_warm) and bool(timings_warm)
    gate_basis = timings_warm if warm_gate else timings
    gate_base = baselines_warm if warm_gate else baselines
    # A gate retry must evict the cache KEYS the offender's own first
    # run built, to measure the work its baseline recorded (ADVICE r16
    # medium; per-key since r18 — ADVICE r17); retries for consumers
    # whose first run hit the caches evict nothing: their baseline
    # never included the build.
    if gate_base:
        for name, dt in gate_basis.items():
            base = gate_base.get(name, -1.0)
            if dt > 0 and base > 0 and dt > 2 * base and dt > base + 0.5:
                # Self-adjudicating retry (round 16): re-run the
                # offender ONCE in the same session and keep the
                # violation only if the retry still trips. Both walls
                # land in the artifact (gate_retries) so nothing is
                # hidden; caches the offender FRONTS are cleared first
                # so the retry measures the work its baseline measured.
                evicted = evict_cache_keys(built_keys.get(name, {}))
                if evicted:
                    gate_retry_cleared[name] = evicted
                t0 = time.perf_counter()
                try:
                    REGISTRY[name].fn(spark, sf_dir).count()
                    retry = round(time.perf_counter() - t0, 3)
                except Exception:  # pragma: no cover - bench robustness
                    retry = -1.0
                gate_retries[name] = [base, dt, retry]
                if retry < 0 or (retry > 2 * base and retry > base + 0.5):
                    gate_violations[name] = [base, retry if retry > 0 else dt]
    # ADVICE r15: a query that fails outright (dt = -1.0) was invisible
    # to the gate — a regression-to-failure must be louder than a 2x
    # slowdown, so failed queries get their own artifact field; and
    # n_unbaselined is meaningful only against an SF-matched baseline
    # file, so SFs without one record -1 (not "every query is
    # unbaselined").
    failed_queries = sorted(n for n, dt in timings.items() if dt < 0)
    # ADVICE r17: a warm re-run that fails records -1.0 in queries_warm
    # and the warm gate skips dt <= 0 — a warm-only regression-to-failure
    # must land in the ARTIFACT, not just on stderr.
    failed_queries_warm = sorted(n for n, dt in timings_warm.items() if dt < 0)
    unbaselined = sorted(
        n for n in timings if gate_base.get(n, -1.0) <= 0
    ) if gate_base else []
    if failed_queries:
        print(f"bench: FAILED queries: {failed_queries}", file=sys.stderr)
    if failed_queries_warm:
        print(f"bench: FAILED warm re-runs: {failed_queries_warm}", file=sys.stderr)
    if gate_violations:
        print(f"bench: 2x gate violations: {gate_violations}", file=sys.stderr)
    full = {
        "metric": "declared_query_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "oracle_wall_sec": round(oracle_total, 3),
        "oracle_queries": oracle_timings,
        "streaming_wall_sec": round(streaming_wall, 3),
        "streaming_micro_batches": n_batches,
        "streaming_equals_batch_q61": stream_matches,
        "streaming_profile": stream_profile,
        "loadavg_1m_5m_15m": loadavg,
        "gate_basis": "warm" if warm_gate else "first_pass",
        "gate_violations": gate_violations,
        "gate_retries": gate_retries,
        "gate_retry_cleared_caches": gate_retry_cleared,
        "n_unbaselined": len(unbaselined) if gate_base else -1,
        "failed_queries": failed_queries,
    }
    if only is not None:
        full["subset"] = sorted(only)
    if timings_warm:
        full["queries_warm"] = timings_warm
        full["warm_suite_wall_sec"] = round(
            sum(v for v in timings_warm.values() if v > 0), 3
        )
        # {query: {cache: n_keys}} — the keys each warm re-run re-paid
        # (per-key protocol, ADVICE r17; was one fronter per cache name)
        full["warm_evicted_cache_keys"] = warm_evicted
        full["failed_queries_warm"] = failed_queries_warm
    print(json.dumps(full))
    # The driver records only a 2000-char TAIL of stdout; the full line
    # above (~5 KB of per-query timings) gets left-truncated into invalid
    # JSON (BENCH_r07..r09 "parsed: null" — VERDICT r7 #2 / r8 #2 /
    # r9 #2). So the LAST line is a compact summary that always fits in
    # the tail; the full per-query record also lands on disk at
    # bench/last_run.json for the artifact trail.
    # subset runs land in a separate file so a partial record can never
    # shadow the full-suite artifact trail
    record_name = "last_run.json" if only is None else "last_run_subset.json"
    try:
        with open(os.path.join(_REPO, "bench", record_name), "w") as f:
            json.dump(full, f)
    except OSError as e:  # pragma: no cover - bench robustness
        print(f"bench: could not write bench/{record_name}: {e}", file=sys.stderr)
    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v > 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    # VERDICT r18 #7: the driver keeps only a 2000-char stdout tail, and
    # rotated correctness windows make PERF's per-query table come back
    # empty — so the tail itself carries the biggest warm movers vs the
    # recorded anchors ({query: [anchor_sec, now_sec]}, top-8 by |delta|),
    # giving every round a comparable per-query signal. ADDITIVE: no
    # existing field changes.
    warm_top_deltas = {}
    if warm_gate:
        deltas = {
            n: round(dt - baselines_warm[n], 3)
            for n, dt in timings_warm.items()
            if dt > 0 and baselines_warm.get(n, -1.0) > 0
        }
        warm_top_deltas = {
            n: [baselines_warm[n], timings_warm[n]]
            for n, _ in sorted(deltas.items(), key=lambda kv: -abs(kv[1]))[:8]
        }
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "sf": full["sf"],
                "n_queries": len(timings),
                "n_failed": sum(1 for v in timings.values() if v < 0),
                "oracle_wall_sec": round(oracle_total, 3),
                "streaming_wall_sec": round(streaming_wall, 3),
                "streaming_micro_batches": n_batches,
                "streaming_equals_batch_q61": stream_matches,
                "slowest_queries": slowest,
                "warm_top_deltas_vs_anchor": warm_top_deltas,
                "loadavg_1m_5m_15m": loadavg,
                "n_gate_violations": len(gate_violations),
                "n_gate_retries": len(gate_retries),
                "n_unbaselined": len(unbaselined) if baselines else -1,
                "full_record": f"bench/{record_name}",
            }
        )
    )


if __name__ == "__main__":
    main()
