#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Default: run the headline flagship KG pipeline (corpus derive → extract
→ link → canonicalize → materialize, via the resumable runner so
extraction executes exactly once) plus a representative relational query
set over $GRAFT_SF_DIR (default /root/testdata/sf0.1) at
num_cpus=$RAY_GRAFT_CPUS (default 32), then the iterative graph algos
(components, PageRank) over the flagship run's OWN adjacency output,
and finally the 4-vs-16-CPU scaling pair. Every timed unit runs
GRAFT_BENCH_SAMPLES times (default 3) and reports the MEDIAN, with
os.getloadavg() stamped into the JSON — single samples on this host
swing ±25% with outside load (BASELINE.md variance table), medians +
the loadavg stamp make the artifact load-robust.

--scaling: run the identical flagship job in TWO FRESH PROCESSES at
num_cpus=4 and num_cpus=16 (N and 4N on PHYSICAL cores — see
run_scaling's docstring for why not 8/32) on the same input and report
both throughputs plus efficiency=(T16/T4)/4 — the sandbox stand-in for
the north rule's N→4N-node criterion (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "2"))  # corpus replication
SAMPLES = int(os.environ.get("GRAFT_BENCH_SAMPLES", "3"))
QUERY_SET = [
    "q01_pricing_summary",
    "b11_hash_join",
    "b14_asof_join",
    "b26_window_agg",
    "b27_sessionize",
    "b28_knn",
    "dedup_minhash_pairs",
    "text_stats",
    "text_decontaminate",
    "text_pii_redact",
    "b13d_bloom_semi_join",
    "media_features",  # the interleaved-payload actor-pool path
    "text_lm_perplexity",  # two-pass broadcast-stats quality gate
    "dedup_semantic",  # SemDeDup: k-means assign + in-cluster prune
    "data_dsir_select",  # DSIR: two count passes + broadcast scoring
]


def _median(xs: list[float]) -> float:
    return round(statistics.median(xs), 3)


def _burn(_: int) -> float:
    import time as _t

    t0 = _t.time()
    acc = 0
    for i in range(10_000_000):
        acc += i
    return _t.time() - t0


def cpu_contention_probe(width: int = 16) -> dict:
    """Directly measure OUTSIDE-the-sandbox CPU theft (loadavg alone
    can't: the sandbox shows ~0% local CPU while host neighbors hold
    physical cores). One fixed pure-Python burn runs alone, then
    ``width`` copies run concurrently; on an idle host the slowest
    concurrent copy matches the solo time (ratio ≈ 1.0), while a ratio
    of ~2 means roughly half the physical cores were unavailable —
    exactly the regime that asymmetrically depresses the 16-CPU scaling
    leg. ~3 s total; stamped into every artifact."""
    from concurrent.futures import ProcessPoolExecutor

    solo = _burn(0)
    with ProcessPoolExecutor(width) as ex:
        times = list(ex.map(_burn, range(width)))
    return {
        "solo_s": round(solo, 3),
        "concurrent_max_s": round(max(times), 3),
        "contention_ratio": round(max(times) / solo, 2) if solo else None,
        "width": width,
    }


def run_bench(sf_dir: str, num_cpus: int, samples: int = SAMPLES) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    load_start = os.getloadavg()
    # probe BEFORE ray.init so the measurement sees only outside load
    contention = cpu_contention_probe()
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import ray.data

    from antnre_ray.config import PipelineConfig
    from antnre_ray.sources.corpus import derive_interleaved, derived_doc_ids
    from antnre_ray.state.lineage import run_flagship_resumable
    from antnre_ray.state.metrics import run_report

    out_dir = f"/tmp/antkg_bench_{num_cpus}"
    cfg = PipelineConfig(partitions=4)

    def factory():
        return derive_interleaved(f"{sf_dir}/documents.parquet", repeat=REPEAT)

    def ids_factory():
        return derived_doc_ids(f"{sf_dir}/documents.parquet", repeat=REPEAT, partitions=cfg.partitions)

    flagship_times = []
    for _ in range(samples):
        shutil.rmtree(out_dir, ignore_errors=True)  # fresh run, no resume hits
        t0 = time.time()
        run_flagship_resumable(factory, out_dir, cfg, ids_factory=ids_factory)
        flagship_times.append(time.time() - t0)
    flagship_s = _median(flagship_times)
    rep = run_report(out_dir)
    triples = rep.get("triples", 0)
    docs = None
    try:
        import pyarrow.parquet as pq

        docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows * REPEAT
    except Exception:
        pass

    qtimes: dict[str, float] = {}
    # Scaling children skip the query suite: the efficiency metric uses
    # only the flagship numbers, so timing q01..text_stats there would
    # roughly double --scaling wall-clock for discarded data.
    if os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY") != "1":
        from antnre_ray.pipelines.registry import load_all

        from antnre_ray.pipelines.extras import clear_memo_caches

        queries = load_all()
        for name in QUERY_SET:
            fn, _sql = queries[name]
            ts = []
            for _ in range(samples):
                clear_memo_caches()  # median must time the operator, not its memo
                t0 = time.time()
                out = fn(sf_dir)
                if isinstance(out, ray.data.Dataset):
                    out.count()
                ts.append(time.time() - t0)
            qtimes[name] = _median(ts)

        # Iterative graph algos over the flagship run's own adjacency
        # output (VERDICT r2 item #7). The adjacency is node-small, so
        # the default entries exercise the broadcast regime; the
        # *_shuffle entry forces the Dataset-join Pregel loop
        # (small_graph_nodes=0) so a regression in the per-iteration
        # join+groupby path stays visible in the artifact.
        import glob

        from antnre_ray.stages.graph_algos import connected_components, pagerank

        adj_files = sorted(glob.glob(f"{out_dir}/adjacency/*.parquet"))
        if adj_files:
            for gname, galgo in (
                ("kg_components_bench", lambda e: connected_components(e)),
                ("kg_pagerank_bench", lambda e: pagerank(e, iters=10)),
                (
                    "kg_components_shuffle_bench",
                    lambda e: connected_components(e, small_graph_nodes=0),
                ),
            ):
                ts = []
                for _ in range(samples):
                    edges = ray.data.read_parquet(adj_files, columns=["src", "dst"])
                    t0 = time.time()
                    galgo(edges).count()
                    ts.append(time.time() - t0)
                qtimes[gname] = _median(ts)
    ray.shutdown()
    total = round(flagship_s + sum(qtimes.values()), 3)
    return {
        "metric": "flagship_kg_e2e_plus_query_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": {"flagship_kg": flagship_s, **qtimes},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "samples": samples,
        "flagship_samples": [round(t, 3) for t in flagship_times],
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpu_contention": contention,
        "triples": triples,
        "docs": docs,
        "triples_per_sec": round(triples / flagship_s, 1) if flagship_s > 0 else None,
        "docs_per_sec": round(docs / flagship_s, 1) if docs and flagship_s > 0 else None,
    }


def run_scaling(sf_dir: str) -> dict:
    """N-vs-4N fresh-process runs on the same input (BASELINE.md protocol).

    Default levels are num_cpus=4 and num_cpus=16: this host exposes 32
    scheduler CPUs but has 16 physical cores (raw multi-process hashing
    scales 4.05x from 4→16 procs but only 3.3x from 8→32 — the 8→32 pair
    measures SMT arithmetic, not the engine). Override with
    GRAFT_SCALING_CPUS="8,32" to run the SMT pair anyway. Corpus
    replication defaults to x32 so compute dominates fixed pipeline
    costs — the protocol premise is ≥60 s of Run-A (small-leg) wall.
    x16 satisfied that through round 4 (Run-A 77 s), but the round-4/5
    kernel and block-floor speedups cut x16's Run-A to ~31 s, where the
    16-CPU leg is fixed-cost-bound and the ratio reads an artifactual
    0.68 (measured 2026-08-20); x64 over-corrects the other way — the
    4-CPU leg degrades under the 320k-doc working set and the ratio
    reads a non-credible 1.21 super-linear (the round-1 "×32 corpus
    eff 1.076" effect, larger now). x32 restores Run-A ≈ 56-59 s and
    reproduces the healthy 0.94-0.95 regime. Children run ONE sample
    each — the efficiency RATIO is load-robust (both levels equally
    affected, BASELINE.md variance note), and tripling a 100 s run
    isn't.
    """
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(","))
    repeat = os.environ.get("GRAFT_SCALING_REPEAT", "32")
    results = {}
    leg_contention = {}
    for cpus in (lo, hi):
        # Per-leg stamp: a window that closes MID-RUN hits only the
        # later leg; one end-of-run probe cannot show which readings to
        # trust (observed 2026-08-18: probe 1.05 at launch, 1.47 at
        # the end — the 16-CPU leg absorbed the neighbors).
        leg_contention[f"probe_before_{cpus}cpu"] = cpu_contention_probe()
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(cpus),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_BENCH_REPEAT=repeat,
            GRAFT_BENCH_FLAGSHIP_ONLY="1",
            GRAFT_BENCH_SAMPLES="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single-run"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            # Surface the child's actual failure instead of an IndexError.
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(
                f"scaling child (num_cpus={cpus}) failed rc={out.returncode}; stderr above"
            )
        results[cpus] = json.loads(lines[-1])
    t_lo = results[lo]["triples_per_sec"]
    t_hi = results[hi]["triples_per_sec"]
    eff = round((t_hi / t_lo) / (hi / lo), 3) if t_lo else None
    contention = cpu_contention_probe()
    return {
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
        "value": eff,
        "unit": "ratio",
        "queries": {
            f"triples_per_sec_{lo}cpu": t_lo,
            f"triples_per_sec_{hi}cpu": t_hi,
            f"flagship_s_{lo}cpu": results[lo]["queries"]["flagship_kg"],
            f"flagship_s_{hi}cpu": results[hi]["queries"]["flagship_kg"],
        },
        "sf": sf_dir,
        "num_cpus": hi,
        "gate": 0.8,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "cpu_contention": contention,
        "leg_contention": leg_contention,
        # Self-qualifying stamp (VERDICT r3 #7): at contention_ratio
        # > 1.2 outside neighbors hold a material share of the physical
        # cores, which asymmetrically depresses the 16-CPU leg — the
        # pair is then ADVISORY (re-measure at probe ≈ 1), exactly the
        # adjudication BASELINE.md performed by hand in round 3.
        "status": (
            "advisory_host_contention"
            if max(
                [(contention.get("contention_ratio") or 0)]
                + [
                    (p.get("contention_ratio") or 0)
                    for p in leg_contention.values()
                ]
            )
            > 1.2
            else "headline"
        ),
        "triples_identical": results[lo]["triples"] == results[hi]["triples"],
    }


def run_query_once(sf_dir: str, num_cpus: int, name: str, iters: int) -> dict:
    """Child for run_query_scaling: one fresh Ray session, `iters`
    cold executions of one registry query (memo caches cleared)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import ray.data

    from antnre_ray.pipelines.extras import clear_memo_caches
    from antnre_ray.pipelines.registry import load_all

    fn, _sql = load_all()[name]
    # warmup must CONSUME (registry fns return lazy Datasets — the bare
    # call executes nothing): pay worker spin-up outside the timed loop
    warm = fn(sf_dir)
    if isinstance(warm, ray.data.Dataset):
        warm.count()
    walls = []
    rows = None
    for _ in range(iters):
        clear_memo_caches()
        t0 = time.time()
        out = fn(sf_dir)
        rows = out.count() if isinstance(out, ray.data.Dataset) else len(out)
        walls.append(time.time() - t0)
    ray.shutdown()
    walls.sort()
    median = walls[len(walls) // 2]  # repo protocol: medians, not sums
    return {
        "query": name,
        "wall_s": round(median, 3),
        "walls": [round(w, 3) for w in walls],
        "rows": rows,
        "iters": iters,
    }


def run_query_scaling(sf_dir: str, name: str) -> dict:
    """4-vs-16 fresh-process pair for ONE registry query — shuffle-heavy
    scaling evidence beside the flagship pair (BASELINE.md protocol).
    Efficiency = (median_wall_lo / median_wall_hi) / (hi / lo) on the
    same input; per-leg medians over `iters` consumed executions after
    a consumed warmup (workers spun up outside the timed loop)."""
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(","))
    iters = int(os.environ.get("GRAFT_QSCALE_ITERS", "5"))
    results = {}
    leg_contention = {}
    for cpus in (lo, hi):
        leg_contention[f"probe_before_{cpus}cpu"] = cpu_contention_probe()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--query-run", name, str(iters)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(f"query-scaling child (num_cpus={cpus}) failed rc={out.returncode}")
        results[cpus] = json.loads(lines[-1])
    eff = round((results[lo]["wall_s"] / results[hi]["wall_s"]) / (hi / lo), 3)
    contention = cpu_contention_probe()
    return {
        "metric": f"query_scaling_{name}_{lo}_to_{hi}_cpus",
        "value": eff,
        "unit": "ratio",
        "queries": {
            f"wall_s_{lo}cpu": results[lo]["wall_s"],
            f"wall_s_{hi}cpu": results[hi]["wall_s"],
        },
        "sf": sf_dir,
        "num_cpus": hi,
        "iters": iters,
        "gate": 0.8,
        "rows_identical": results[lo]["rows"] == results[hi]["rows"],
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "cpu_contention": contention,
        "leg_contention": leg_contention,
        "status": (
            "advisory_host_contention"
            if max(
                [(contention.get("contention_ratio") or 0)]
                + [(p.get("contention_ratio") or 0) for p in leg_contention.values()]
            )
            > 1.2
            else "headline"
        ),
    }


if __name__ == "__main__":
    if "--scaling-query" in sys.argv:
        i = sys.argv.index("--scaling-query")
        qname = sys.argv[i + 1] if len(sys.argv) > i + 1 else "q01_pricing_summary"
        print(json.dumps(run_query_scaling(SF_DIR, qname)))
    elif "--query-run" in sys.argv:
        i = sys.argv.index("--query-run")
        print(json.dumps(run_query_once(SF_DIR, NUM_CPUS, sys.argv[i + 1], int(sys.argv[i + 2]))))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif "--single-run" in sys.argv:
        print(json.dumps(run_bench(SF_DIR, NUM_CPUS)))
    else:
        # The north rule's criterion rides along in the default artifact
        # (VERDICT r2 item #5): 4→16-CPU fresh-process scaling pair.
        # It runs FIRST — the 32-CPU sample loop leaves the host warm
        # (loadavg ~8 for minutes), which measurably depresses a
        # scaling pair run after it.
        scaling = None
        scaling_err = None
        if os.environ.get("GRAFT_BENCH_NO_SCALING") != "1":
            try:
                scaling = run_scaling(SF_DIR)
            except Exception as exc:  # artifact must still emit
                scaling_err = str(exc)[:500]
        result = run_bench(SF_DIR, NUM_CPUS)
        if scaling is not None:
            result["scaling_efficiency"] = scaling["value"]
            result["scaling"] = scaling["queries"]
            result["scaling_gate"] = scaling["gate"]
            result["scaling_status"] = scaling["status"]
            result["scaling_contention"] = scaling["cpu_contention"]
            result["scaling_triples_identical"] = scaling["triples_identical"]
        elif scaling_err is not None:
            result["scaling_error"] = scaling_err
        print(json.dumps(result))
