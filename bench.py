#!/usr/bin/env python
"""Benchmark harness (driver contract).

Headline: the flagship extraction pipeline (read parquet → density
extractor → hash-partitioned parquet + manifest) over the deterministic
synthetic ``pages`` table scaled to the sf tier, plus per-query timings
for representative operators over ``$GRAFT_SF_DIR``.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "extracted_mb_per_sec": ...}

``--scaling``: runs this script in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the same input (cluster-size-N vs 4N
substitute per BASELINE.md) and prints throughputs + scaling efficiency,
plus per-leg hypervisor-steal.  ``--with-control`` additionally runs the
interleaved zero-data spin pair and reports
``efficiency_vs_host_ceiling`` — the engine's raw efficiency divided by
the control's (the best ANY workload could do on this box right now), a
steal-robust scaling figure.

``--spin-control``: the zero-data register-only scaling control — the
same two-parallelism pair with a fixed-iteration ALU kernel, in-task
timing, and /proc/stat steal sampling; measures this box's per-core
capacity ceiling independent of the engine's data paths (BASELINE.md,
round 5).  ``--lo/--hi`` select the pair; GRAFT_SPIN_TASKS /
GRAFT_SPIN_ITERS size the job.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TIER = os.path.basename(SF_DIR.rstrip("/"))
ROWS_BY_TIER = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 80000}
# GRAFT_BENCH_DOCS: input-size override for scaling experiments — as the
# engine gets faster, the fixed ~8-9 s of ramp/read-warm/write-finalize
# dominates the hi-parallelism leg of a FIXED 80k-doc input and caps raw
# strong-scaling efficiency; a larger same-input pair amortizes it (the
# cluster regime: more data per node, not less wall per fixed input).
N_PAGES = int(os.environ.get("GRAFT_BENCH_DOCS",
                             ROWS_BY_TIER.get(TIER, 2000)))
PAGES_DIR = f"/tmp/graft_bench_pages/{TIER}_{N_PAGES}"
N_SHARDS = 64


def _ensure_pages() -> None:
    """Generate the pages input once (cached across runs/parallelism
    levels so both scaling legs read identical bytes); generation is
    parallelized with Ray tasks."""
    import ray

    from occular_ocr_ray.sources.pages import gen_pages_table

    marker = os.path.join(PAGES_DIR, "_DONE")
    if os.path.exists(marker):
        return
    shutil.rmtree(PAGES_DIR, ignore_errors=True)
    os.makedirs(PAGES_DIR, exist_ok=True)

    @ray.remote
    def gen_shard(idx: int, start: int, count: int) -> str:
        import pyarrow.parquet as pq

        path = os.path.join(PAGES_DIR, f"pages_{idx:04d}.parquet")
        pq.write_table(gen_pages_table(count, seed=42, start=start), path)
        return path

    per = (N_PAGES + N_SHARDS - 1) // N_SHARDS
    futs = []
    for i in range(N_SHARDS):
        start = i * per
        count = min(per, N_PAGES - start)
        if count <= 0:
            break
        futs.append(gen_shard.remote(i, start, count))
    ray.get(futs)
    with open(marker, "w") as fh:
        fh.write("ok")


def run_bench() -> dict:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from occular_ocr_ray.pipelines import relational as R
    from occular_ocr_ray.pipelines.flagship import run_extraction

    _ensure_pages()
    # warm the page cache (untimed) so we measure compute, not first read
    rd.read_parquet(PAGES_DIR, columns=["url"]).count()

    out_dir = f"/tmp/graft_bench_out/{TIER}_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    stat0 = _read_proc_stat()
    t0 = time.perf_counter()
    # One wave for the headline: the bench measures steady-state
    # streaming throughput; wave granularity is a resume knob (covered by
    # tests + the CLI default of 4) whose per-wave executor ramp/finalize
    # (~4-5 s) is parallelism-independent fixed cost that would otherwise
    # dominate the scaling-efficiency denominator at small inputs.
    summary = run_extraction(
        PAGES_DIR, out_dir, num_waves=1, resume=False, batch_size=16, num_parts=64
    )
    headline = time.perf_counter() - t0
    stat1 = _read_proc_stat()
    docs = summary["totals"]["rows"]
    mb = summary["totals"]["bytes_emitted"] / 1e6

    # output-identity digest: md5 over every wave's per-partition metric
    # rollup digest — equal digests across parallelism levels prove the
    # two legs produced identical per-partition outputs
    import glob as _glob
    import hashlib as _hashlib

    wave_digests = []
    for man in sorted(_glob.glob(os.path.join(out_dir, "manifest", "*.json"))):
        with open(man) as fh:
            wave_digests.append(json.load(fh)["rollup_digest"])
    output_digest = _hashlib.md5("".join(wave_digests).encode()).hexdigest()

    queries = {}
    qset = {} if os.environ.get("GRAFT_SKIP_QUERIES") else {
        "q1_pricing_summary": R.q1_pricing_summary,
        "revenue_by_region": R.revenue_by_region,
        "orders_join_priority": R.orders_join_priority,
        "events_hourly": R.events_hourly,
        "dedup_exact": R.dedup_exact,
        "token_counts": R.token_counts,
        "minhash_pairs": R.minhash_pairs_q,
        "knn_bruteforce": R.knn_bruteforce_q,
        "tfidf_top_terms": R.tfidf_top_terms,
        "approx_price_quantiles": R.approx_price_quantiles,
        "ranked_orders": R.ranked_orders,
        # r5 session-3 additions (join-heavy showcases; new keys only —
        # pre-existing tracked queries stay comparable across rounds)
        "returned_item_report": R.returned_item_report,
        "nation_trade_volume": R.nation_trade_volume,
    }
    for name, fn in qset.items():
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship extraction wall-time (pages→extracted parquet), plus per-query sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": TIER,
        "num_cpus": NUM_CPUS,
        "n_docs": docs,
        "docs_per_sec": round(docs / headline, 1),
        "extracted_mb_per_sec": round(mb / headline, 2),
        "output_digest": output_digest,
    }
    # host-condition fields: whole-box /proc/stat deltas across the
    # timed headline.  steal_pct >0 means the hypervisor withheld that
    # fraction of the box from THIS run (the sandbox is a CPU-
    # overcommitted VM — see BASELINE.md "Hypervisor steal"); wall-time
    # comparisons across rounds are only meaningful at similar steal.
    d = [y - x for x, y in zip(stat0, stat1)]
    tot = sum(d) or 1
    result["host_steal_pct"] = round(100 * d[7] / tot, 2)
    result["host_user_pct"] = round(100 * (d[0] + d[1]) / tot, 2)
    result["host_sys_pct"] = round(100 * d[2] / tot, 2)
    ray.shutdown()
    return result


def _burn(k: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(k):
        x += i * i
    return time.perf_counter() - t0


def _freq_probe(workers: int, n: int = 20_000_000) -> float:
    """Mean in-worker wall time of a fixed pure-Python loop with
    ``workers`` processes busy — measures this box's per-core slowdown
    (turbo/DVFS) as occupancy grows.  A real N→4N *cluster* adds nodes
    at constant per-core frequency; this single-box substitute does not,
    so --scaling reports the ratio and a frequency-adjusted efficiency
    alongside the raw one."""
    import multiprocessing as mp

    with mp.Pool(workers) as pool:
        times = pool.map(_burn, [n] * workers)
    return sum(times) / len(times)


def run_scaling() -> None:
    import subprocess

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   GRAFT_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-2: the sandbox host is noisy; min wall is the standard
        # low-noise estimator for fixed-work benchmarks
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["value"] <= b["value"] else b

    # N-vs-4N substitute pair; (4,16) is the lower-contention alternative
    # to (8,32) on this shared box (less DVFS/membw interference at hi).
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    if "--lo" in sys.argv:
        lo = int(sys.argv[sys.argv.index("--lo") + 1])
    if "--hi" in sys.argv:
        hi = int(sys.argv[sys.argv.index("--hi") + 1])
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    f_lo, f_hi = _freq_probe(lo), _freq_probe(hi)
    freq_ratio = f_hi / f_lo  # >1: cores are slower when all are busy
    out = {
        "sf": TIER,
        "n_docs": r_lo["n_docs"],
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "cpu_freq_slowdown_at_hi": round(freq_ratio, 3),
        "scaling_efficiency_freq_adj": round(eff * freq_ratio, 3),
        "output_identical_across_parallelism": r_lo["output_digest"] == r_hi["output_digest"],
        # host condition during each chosen leg (the sandbox is a CPU-
        # overcommitted VM; raw efficiency is only meaningful at ~0 steal)
        f"host_steal_pct_{lo}": r_lo.get("host_steal_pct"),
        f"host_steal_pct_{hi}": r_hi.get("host_steal_pct"),
    }
    if "--with-control" in sys.argv:
        # interleaved zero-data spin control at the same lo/hi pair: its
        # raw efficiency is the ceiling ANY workload can reach on this
        # box right now; efficiency_vs_host_ceiling = what fraction of
        # that attainable ceiling the ENGINE achieves — steal-robust
        # because engine and control see the same host.
        import subprocess

        ctl = json.loads(subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--spin-control",
             "--lo", str(lo), "--hi", str(hi)],
            capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1])
        out["control_raw_efficiency"] = ctl["raw_efficiency"]
        out["control_steal_pct_hi"] = ctl[f"leg_{hi}"]["steal_pct"]
        out["efficiency_vs_host_ceiling"] = round(
            eff / ctl["raw_efficiency"], 3) if ctl["raw_efficiency"] else None
    print(json.dumps(out))


def _read_proc_stat() -> list[int]:
    return list(map(int, open("/proc/stat").readline().split()[1:]))


def run_spin_leg(ncpu: int, n_tasks: int, iters: int) -> None:
    """One leg of --spin-control: fixed-iteration register-only work
    through the full Ray Data machinery (range → map_batches task pool →
    consume), the loop timed INSIDE each task and /proc/stat sampled
    across the leg.  Zero memory traffic, zero data movement — isolates
    host per-core capacity (hypervisor steal, DVFS) from everything the
    engine or the memory system contributes."""
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    def spin(batch):
        t0 = time.perf_counter()
        x = 1469598103934665603
        for _ in range(iters):
            x = (x * 1099511628211 + 12345) & 0xFFFFFFFFFFFFFFFF
        batch["spin_sec"] = [time.perf_counter() - t0] * len(batch["id"])
        return batch

    ds = rd.range(n_tasks, override_num_blocks=n_tasks)
    ds.limit(1).map_batches(lambda b: b, batch_size=1).count()  # warm
    s0 = _read_proc_stat()
    t0 = time.perf_counter()
    spins = sorted(r["spin_sec"]
                   for r in ds.map_batches(spin, batch_size=1).take_all())
    wall = time.perf_counter() - t0
    s1 = _read_proc_stat()
    d = [y - x for x, y in zip(s0, s1)]
    tot = sum(d) or 1
    n = len(spins)
    print(json.dumps({
        "cpus": ncpu, "n_tasks": n_tasks, "iters": iters,
        "wall_sec": round(wall, 2),
        "tasks_per_sec": round(n_tasks / wall, 1),
        "in_task_spin_sec_mean": round(sum(spins) / n, 3),
        "in_task_spin_sec_p10": round(spins[n // 10], 3),
        "in_task_spin_sec_p90": round(spins[(9 * n) // 10], 3),
        "steal_pct": round(100 * d[7] / tot, 2),
        "user_pct": round(100 * (d[0] + d[1]) / tot, 2),
        "idle_pct": round(100 * d[3] / tot, 2),
    }))
    ray.shutdown()


def run_spin_control() -> None:
    """--spin-control: the zero-data scaling control (BASELINE.md,
    round 5).  Runs the register-only spin job at --lo and --hi cpus in
    fresh processes and prints raw efficiency, in-task ALU inflation,
    and hypervisor steal per leg — the ceiling ANY workload (engine
    included) can reach on this box."""
    import subprocess

    lo = int(sys.argv[sys.argv.index("--lo") + 1]) if "--lo" in sys.argv else 8
    hi = int(sys.argv[sys.argv.index("--hi") + 1]) if "--hi" in sys.argv else 32
    n_tasks = int(os.environ.get("GRAFT_SPIN_TASKS", "960"))
    iters = int(os.environ.get("GRAFT_SPIN_ITERS", "5000000"))

    def leg(ncpu: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--spin-leg",
             str(ncpu), str(n_tasks), str(iters)],
            capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = leg(lo), leg(hi)
    eff = (r_hi["tasks_per_sec"] / r_lo["tasks_per_sec"]) / (hi / lo)
    print(json.dumps({
        "control": "register-only zero-data spin via ray.data map_batches",
        f"leg_{lo}": r_lo, f"leg_{hi}": r_hi,
        "raw_efficiency": round(eff, 3),
        "in_task_alu_inflation_hi_vs_lo": round(
            r_hi["in_task_spin_sec_mean"] / r_lo["in_task_spin_sec_mean"], 3),
    }))


def run_stats() -> None:
    """Print the flagship pipeline's per-stage ds.stats() breakdown
    (wall/cpu/heap per operator) to stderr — the observability loop used
    to tune batch size, write layout, and wave structure."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from occular_ocr_ray.pipelines.flagship import _WaveSink, extract_dataset

    _ensure_pages()
    ds = rd.read_parquet(PAGES_DIR, columns=["url", "html", "text"])
    out = extract_dataset(ds, batch_size=16, num_parts=64)
    shutil.rmtree("/tmp/graft_stats_out", ignore_errors=True)
    out.write_datasink(_WaveSink("/tmp/graft_stats_out"))
    print(out.stats(), file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--spin-leg" in sys.argv:
        i = sys.argv.index("--spin-leg")
        run_spin_leg(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                     int(sys.argv[i + 3]))
    elif "--spin-control" in sys.argv:
        run_spin_control()
    elif "--stats" in sys.argv:
        run_stats()
    else:
        print(json.dumps(run_bench()))
