#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Default mode: runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "merge_events_per_sec": ..., "cpus": ...}

The headline number that matters for BASELINE.json is
``merge_events_per_sec``: end-to-end CDC replay (read WAL → normalize →
LWW dedup → bucketed CoW MERGE commit) measured over the full sf log.

--scaling mode: runs the same MERGE replay at local[8] and local[32]
on the same input — a dedicated update-heavy WAL (~155M events:
3.2M conversations × ~40 mutations, zipf-skewed) where compute
dominates fixed overheads — and reports events/sec at both plus
efficiency (= eps32 / (4·eps8)), the sandbox stand-in for the
north_rule's N vs 4N executor requirement. Reps are INTERLEAVED
(8,32,8,32,...; best of SPARK_GRAFT_SCALING_REPS, default 5) so the
±40% VM drift hits both levels equally instead of biasing one.
Alongside the shuffle-shaped replay it measures:
 - a CPU-bound ENGINE stage (parquet decode → Arrow normalize → md5
   fingerprint, zero exchanges) at both levels — the engine's own code
   demonstrating the ~0.9 CPU ceiling, not a synthetic busy-loop;
 - raw busy-loop CPU and 64 MB-streaming memory-bandwidth baselines,
   because a single shared-memory VM caps even embarrassingly parallel
   scaling below 1.0.
Results land in BENCH/scaling_raw.json (summarized in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SCALING_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "3200000"))
# SPARK_GRAFT_SCALING_DIR: alternate cached-WAL location — pairs with
# SPARK_GRAFT_SCALING_CONVS to run SHORT legs (a rep must fit inside
# one stable throttle window on this VM; see BENCH/BASELINE.md §7)
SCALING_LOG = os.environ.get(
    "SPARK_GRAFT_SCALING_DIR", "/root/repo/data/cdc/scaling/changelog"
)


def _burn(_):
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < 2.0:
        x += 1
    return x


def _burn_mem(_):
    import numpy as np

    a = np.zeros(64_000_000 // 8, dtype=np.float64)  # 64 MB ≫ L3
    b = np.ones_like(a)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 3.0:
        np.copyto(a, b)
        n += 1
    return n * a.nbytes


def _hw_baselines(levels=(8, 32)) -> dict:
    """Hardware scaling ceilings of this box at the two parallelism
    levels: register-only CPU (busy loop) and memory-bandwidth (64 MB
    streaming copies). A shuffle/sort-heavy Spark job is bounded by the
    *memory* ceiling on a single shared-memory VM; on a real cluster 4N
    executors bring 4N memory channels and disks, so that wall is a
    sandbox artifact."""
    import multiprocessing as mp

    out = {"cpu": {}, "mem": {}}
    for kind, fn in (("cpu", _burn), ("mem", _burn_mem)):
        for n in levels:
            with mp.get_context("fork").Pool(n) as p:
                t0 = time.monotonic()
                tot = sum(p.map(fn, range(n)))
                out[kind][n] = tot / (time.monotonic() - t0)
    return out


def _memcpy_gbps(procs: int = 8) -> float:
    """Aggregate streaming-copy bandwidth at ``procs`` workers — the
    throttle gate (same measurement as BENCH/BASELINE.md §2; healthy
    box ≈ 40 GB/s at 8 procs, throttled sessions have measured 1-10)."""
    import multiprocessing as mp

    import numpy as np

    def worker(q, n):
        a = np.ones(n, dtype=np.int64)
        b = np.empty_like(a)
        t0 = time.perf_counter()
        for _ in range(10):
            np.copyto(b, a)
        q.put(10 * a.nbytes / (time.perf_counter() - t0))

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [ctx.Process(target=worker, args=(q, 32_000_000))
          for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


def _bench_queries():
    from tap_github_search_spark.plans.queries import REGISTRY

    names = [
        "cdc_replay_transcripts",
        "cdc_conv_rollup",
        "cdc_bookmark_antijoin",
        "agg_monthly_counts",
        "join_enrich_orders",
        "topk_events",
        "docs_fingerprint",
        "emb_cosine_topk",
    ]
    return {n: REGISTRY[n][0] for n in names if n in REGISTRY}


def _force(df) -> None:
    """Materialize every column (noop sink — count() would let Catalyst
    prune the expensive ones)."""
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, sf_dir: str, table_root: str) -> dict:
    from tap_github_search_spark.sources.generator import (
        changelog_dir,
        ensure_changelog,
        sf_from_dir,
    )
    from tap_github_search_spark.streaming.job import replay

    sf = sf_from_dir(sf_dir)
    ensure_changelog(spark, sf)
    log_dir = changelog_dir(sf)
    n_events = spark.read.parquet(log_dir).count()

    timings: dict[str, float] = {}

    # untimed warmup on the smoke-scale log: JIT + whole-stage-codegen
    # compilation + Python-worker spin-up land here, not in the
    # measurement (standard JVM benchmarking practice)
    ensure_changelog(spark, 0.001)
    shutil.rmtree(f"{table_root}_warmup", ignore_errors=True)
    replay(spark, [changelog_dir(0.001)], f"{table_root}_warmup",
           n_buckets=16, n_epochs=1)
    shutil.rmtree(f"{table_root}_warmup", ignore_errors=True)

    # headline: end-to-end MERGE replay into a fresh table
    shutil.rmtree(table_root, ignore_errors=True)
    t0 = time.monotonic()
    table, _ = replay(spark, [log_dir], table_root, n_buckets=64, n_epochs=1)
    merge_sec = time.monotonic() - t0
    timings["merge_replay"] = round(merge_sec, 3)

    for name, fn in _bench_queries().items():
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    # sustained throughput: one replay of a cached mid-size update-heavy
    # WAL (~9.7M events) where fixed overheads stop dominating — the
    # number comparable to BENCH/BASELINE.md's 155M-event measurements
    sus_dir = "/root/repo/data/cdc/sustained/changelog"
    if not (os.path.isdir(sus_dir)
            and any(f.endswith(".parquet") for f in os.listdir(sus_dir))):
        from tap_github_search_spark.sources.generator import write_changelog

        write_changelog(spark, sus_dir, 200_000, n_files=16,
                        mutations_per_conv=40.0)
    n_sus = spark.read.parquet(sus_dir).count()
    shutil.rmtree(f"{table_root}_sustained", ignore_errors=True)
    t0 = time.monotonic()
    replay(spark, [sus_dir], f"{table_root}_sustained", n_buckets=64)
    sus_sec = time.monotonic() - t0
    shutil.rmtree(f"{table_root}_sustained", ignore_errors=True)

    # streaming-maintainer overhead (VERDICT r4 #8): the same streamed
    # ingest with the FULL derived surface on (depth-3 rollup chain +
    # inverted text index + LSH near-dup index, each epoch-fenced)
    # vs maintainers off — the per-epoch maintenance tax the headline
    # features cost, on a dedicated mid-size WAL (maintainer work is
    # per-affected-conversation, so a corpus-scale WAL measures the
    # indexes, not the merge).
    from tap_github_search_spark.sources.generator import write_changelog
    from tap_github_search_spark.streaming.job import stream

    mnt_dir = "/root/repo/data/cdc/sustained/changelog_maint"
    if not (os.path.isdir(mnt_dir)
            and any(f.endswith(".parquet") for f in os.listdir(mnt_dir))):
        write_changelog(spark, mnt_dir, 30_000, n_files=8,
                        mutations_per_conv=4.0)
    n_mnt = spark.read.parquet(mnt_dir).count()

    def _streamed(with_maint: bool) -> float:
        root = f"{table_root}_maint_{'on' if with_maint else 'off'}"
        shutil.rmtree(root, ignore_errors=True)
        kw = {}
        if with_maint:
            kw = dict(
                rollup_path=f"{root}/roll",
                daily_rollup_path=f"{root}/daily",
                weekly_rollup_path=f"{root}/weekly",
                text_index_path=f"{root}/idx",
                lsh_index_path=f"{root}/lsh",
            )
        t0 = time.monotonic()
        stream(spark, [mnt_dir], f"{root}/t", f"{root}/ckpt",
               n_buckets=64, merge_mode="mor", max_files_per_trigger=2,
               **kw)
        sec = time.monotonic() - t0
        shutil.rmtree(root, ignore_errors=True)
        return sec

    plain_sec = _streamed(False)
    maint_sec = _streamed(True)

    return {
        "sf": sf,
        "n_events": n_events,
        "merge_sec": merge_sec,
        "merge_events_per_sec": round(n_events / merge_sec, 1),
        "sustained_n_events": n_sus,
        "sustained_events_per_sec": round(n_sus / sus_sec, 1),
        "maintainers_n_events": n_mnt,
        "maintainers_off_events_per_sec": round(n_mnt / plain_sec, 1),
        "maintainers_on_events_per_sec": round(n_mnt / maint_sec, 1),
        "maintainers_overhead_x": round(maint_sec / plain_sec, 2),
        "queries": timings,
        "total_sec": round(sum(timings.values()), 3),
    }


def scaling_worker(n: int) -> None:
    """One measurement in a pristine process: MERGE replay + CPU-bound
    engine stage at local[n] over the cached scaling WAL. Prints one
    JSON line."""
    from pyspark.sql import functions as F

    from tap_github_search_spark.functions.normalize import normalized
    from tap_github_search_spark.session import get_spark
    from tap_github_search_spark.sources.generator import write_changelog
    from tap_github_search_spark.streaming.job import replay

    spark = get_spark(cores=n, shuffle_partitions=n)
    spark.sparkContext.setLogLevel("ERROR")
    if not (
        os.path.isdir(SCALING_LOG)
        and any(f.endswith(".parquet") for f in os.listdir(SCALING_LOG))
    ):
        t0 = time.monotonic()
        write_changelog(spark, SCALING_LOG, SCALING_CONVS, n_files=64,
                        mutations_per_conv=40.0)
        print(f"# generated scaling WAL in {time.monotonic()-t0:.0f}s",
              file=sys.stderr)
    n_events = spark.read.parquet(SCALING_LOG).count()

    # untimed warmup in THIS fresh JVM: JIT + codegen compilation must
    # not land in the measurement — a cold JVM taxes the short local[32]
    # run a far larger fraction than the long local[8] run, which would
    # systematically understate scaling efficiency.
    from tap_github_search_spark.sources.generator import (
        changelog_dir,
        ensure_changelog,
    )

    ensure_changelog(spark, 0.001)
    warm = f"/root/repo/data/bench/scaling_warmup_{n}"
    shutil.rmtree(warm, ignore_errors=True)
    replay(spark, [changelog_dir(0.001)], warm, n_buckets=16)
    shutil.rmtree(warm, ignore_errors=True)
    (
        spark.read.parquet(changelog_dir(0.001))
        .select(F.md5(normalized("text")).alias("fp"))
        .write.format("noop").mode("overwrite").save()
    )

    # shuffle-shaped job: the full MERGE replay
    root = f"/root/repo/data/bench/scaling_table_{n}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.monotonic()
    replay(spark, [SCALING_LOG], root, n_buckets=64, n_epochs=1)
    merge_sec = round(time.monotonic() - t0, 2)
    shutil.rmtree(root, ignore_errors=True)

    # CPU-bound ENGINE stage, zero exchanges: parquet decode →
    # Arrow-vectorized normalize → md5 fingerprint → noop sink. The
    # engine's own ingest-transform code; its 8→32 scaling demonstrates
    # the CPU ceiling on real work, not a synthetic busy-loop.
    t0 = time.monotonic()
    (
        spark.read.parquet(SCALING_LOG)
        .select(F.md5(normalized("text")).alias("fp"))
        .write.format("noop").mode("overwrite").save()
    )
    cpu_stage_sec = round(time.monotonic() - t0, 2)
    print(json.dumps({"n": n, "n_events": n_events,
                      "merge_sec": merge_sec,
                      "cpu_stage_sec": cpu_stage_sec}))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv
    if "--scaling-worker" in sys.argv:
        scaling_worker(int(sys.argv[sys.argv.index("--scaling-worker") + 1]))
        return

    from tap_github_search_spark.session import get_spark

    if not scaling:
        spark = get_spark(cores=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        r = run_suite(spark, sf_dir, "/root/repo/data/bench/table")
        print(
            json.dumps(
                {
                    "metric": "cdc_merge_replay_and_headline_queries",
                    "value": r["total_sec"],
                    "unit": "sec",
                    "queries": r["queries"],
                    "sf": r["sf"],
                    "n_events": r["n_events"],
                    "merge_events_per_sec": r["merge_events_per_sec"],
                    "sustained_n_events": r["sustained_n_events"],
                    "sustained_events_per_sec": r["sustained_events_per_sec"],
                    "maintainers_n_events": r["maintainers_n_events"],
                    "maintainers_off_events_per_sec":
                        r["maintainers_off_events_per_sec"],
                    "maintainers_on_events_per_sec":
                        r["maintainers_on_events_per_sec"],
                    "maintainers_overhead_x": r["maintainers_overhead_x"],
                    "cpus": cpus,
                    # contemporaneous memory-bandwidth gate: this VM's
                    # DRAM throughput swings 4-40× between sessions
                    # (noisy neighbors, BENCH/BASELINE.md §2/§4) and
                    # engine throughput tracks it ~proportionally.
                    # Recording it INSIDE the bench output lets any
                    # BENCH_r{N}.json be read against its own ceiling
                    # instead of a healthy-box baseline.
                    "memcpy_gbps_8p": round(_memcpy_gbps(8), 1),
                }
            )
        )
        spark.stop()
        return

    # --scaling: same jobs, two parallelism levels, same input, reps
    # INTERLEAVED so VM drift cannot bias one level. Each measurement
    # runs in a FRESH subprocess (own JVM + own Python gateway):
    # stopping/recreating a SparkContext inside one Python process
    # leaves the JVM's PythonAccumulatorV2 pointed at the dead server
    # and floods every task completion with EOF/broken-pipe retries —
    # measured-visible driver drag.
    import subprocess

    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "5"))
    results = {n: {"merge_sec": [], "cpu_stage_sec": []} for n in (8, 32)}
    n_events = None
    # Gate-stability protocol (round-5): a cross-subprocess ratio is only
    # meaningful if the VM's DRAM throttle held still across BOTH legs of
    # a rep. Measure the memcpy gate before each leg and once after the
    # pair; a rep self-qualifies only if max/min gate within the rep is
    # <= 1.25 (the r4 session produced a CPU-stage "scaling" of 0.244 vs
    # a same-session hardware CPU gate of 0.854 — physically impossible,
    # explained only by the throttle window shifting between the two
    # subprocesses; this check rejects such reps automatically).
    GATE_DRIFT_MAX = float(os.environ.get("SPARK_GRAFT_GATE_DRIFT", "1.25"))
    # Optional pre-qualification (SPARK_GRAFT_GATE_WAIT_S > 0): before
    # paying a rep's two multi-minute legs, demand two quick gate
    # probes that already agree within the drift gate, waiting (bounded)
    # for the throttle to settle — raises the fraction of reps that
    # land inside a stable window without changing the in-rep gates
    # that actually qualify a measurement.
    wait_budget = float(os.environ.get("SPARK_GRAFT_GATE_WAIT_S", "0"))
    rep_gates: list[list[float]] = []
    rep_stable: list[bool] = []
    for rep in range(reps):
        if wait_budget > 0:
            deadline = time.monotonic() + wait_budget
            while True:
                pre = [round(_memcpy_gbps(8), 2),
                       round(_memcpy_gbps(8), 2)]
                drift = max(pre) / max(min(pre), 1e-9)
                if drift <= GATE_DRIFT_MAX:
                    print(f"# rep {rep}: pre-qualified gates={pre}",
                          file=sys.stderr, flush=True)
                    break
                if time.monotonic() >= deadline:
                    print(f"# rep {rep}: pre-qualification timed out "
                          f"(last probes={pre}); running anyway",
                          file=sys.stderr, flush=True)
                    break
                time.sleep(20)
        gates = []
        for n in (8, 32):
            gates.append(round(_memcpy_gbps(8), 2))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scaling-worker", str(n)],
                capture_output=True, text=True, check=True,
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            n_events = r["n_events"]
            results[n]["merge_sec"].append(r["merge_sec"])
            results[n]["cpu_stage_sec"].append(r["cpu_stage_sec"])
        gates.append(round(_memcpy_gbps(8), 2))
        stable = max(gates) / max(min(gates), 1e-9) <= GATE_DRIFT_MAX
        rep_gates.append(gates)
        rep_stable.append(stable)
        print(f"# rep {rep}: "
              + ", ".join(
                  f"local[{n}] merge={results[n]['merge_sec'][-1]}s "
                  f"cpu={results[n]['cpu_stage_sec'][-1]}s"
                  for n in (8, 32)
              )
              + f" gates={gates} {'STABLE' if stable else 'REJECTED'}",
              file=sys.stderr, flush=True)

    stable_idx = [i for i, ok in enumerate(rep_stable) if ok]
    if not stable_idx:  # no rep self-qualified: report all, flag invalid
        stable_idx = list(range(reps))
        gates_passed = False
    else:
        gates_passed = True

    def _eps(n, key):
        best = min(results[n][key][i] for i in stable_idx)
        return round(n_events / best, 1)

    eps8, eps32 = _eps(8, "merge_sec"), _eps(32, "merge_sec")
    cpu8, cpu32 = _eps(8, "cpu_stage_sec"), _eps(32, "cpu_stage_sec")
    eff = eps32 / (4.0 * eps8)
    cpu_stage_eff = cpu32 / (4.0 * cpu8)
    hw = _hw_baselines()
    cpu_eff = hw["cpu"][32] / (4.0 * hw["cpu"][8])
    mem_eff = hw["mem"][32] / (4.0 * hw["mem"][8])
    out = {
        "metric": "scaling_efficiency_local8_to_local32",
        "value": round(eff, 3),
        "unit": "ratio",
        "events_per_sec": {"local8": eps8, "local32": eps32},
        "cpu_stage_events_per_sec": {"local8": cpu8, "local32": cpu32},
        "cpu_stage_scaling_efficiency": round(cpu_stage_eff, 3),
        "n_events": n_events,
        "reps_interleaved": reps,
        "hw_cpu_scaling_efficiency": round(cpu_eff, 3),
        "hw_membw_scaling_efficiency": round(mem_eff, 3),
        "fraction_of_membw_ceiling": round(eff / mem_eff, 3),
        "gate_drift_max": GATE_DRIFT_MAX,
        "gates_gbps_per_rep": rep_gates,
        "reps_stable": rep_stable,
        "gates_passed": gates_passed,
    }
    print(json.dumps(out))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling_raw.json", "w") as f:
        json.dump(
            {str(k): v for k, v in results.items()}
            | {
                "n_events": n_events,
                "reps_interleaved": reps,
                "efficiency": eff,
                "cpu_stage_efficiency": cpu_stage_eff,
                "hw_cpu_eps": {str(k): v for k, v in hw["cpu"].items()},
                "hw_mem_bytes_per_sec": {
                    str(k): v for k, v in hw["mem"].items()
                },
                "hw_cpu_scaling_efficiency": cpu_eff,
                "hw_membw_scaling_efficiency": mem_eff,
                "fraction_of_membw_ceiling": eff / mem_eff,
                "gate_drift_max": GATE_DRIFT_MAX,
                "gates_gbps_per_rep": rep_gates,
                "reps_stable": rep_stable,
                "gates_passed": gates_passed,
                "workload": {
                    "convs": SCALING_CONVS,
                    "mutations_per_conv": 40.0,
                    "log_dir": SCALING_LOG,
                },
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
