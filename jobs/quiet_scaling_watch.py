#!/usr/bin/env python
"""Probe-gated scaling watcher: fire `bench.py --scaling` only in a
genuinely quiet host window.

The contention probe (bench.cpu_contention_probe) measures OUTSIDE-the-
sandbox CPU theft directly — loadavg can't (the sandbox shows ~0% local
CPU while host neighbors hold physical cores), and a slow solo-burn
catches external slowdown that is invisible to both. The standing
protocol (BASELINE.md rounds 3-5) refuses to stamp a headline scaling
reading under contention; this tool automates the wait:

    python jobs/quiet_scaling_watch.py --max-hours 3 --fires 6

Gate: two CONSECUTIVE probes with contention_ratio <= --gate (default
1.12) and solo-burn <= 0.45 s. On fire it runs the full
`bench.py --scaling` pair (fresh subprocesses, per-leg probes, the
self-qualifying advisory stamp) and saves each artifact to
--out-dir/scaling_watch_N.json, stopping early on a `headline` stamp.

Measured behavior this sandbox (2026-08-19/20): ambient probes cycle
1.0-1.6 on a minutes timescale with a persistent one-core straggler;
windows open rarely and close fast, which is why a human-in-the-loop
retry keeps missing them.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-hours", type=float, default=3.0)
    ap.add_argument("--fires", type=int, default=6, help="max scaling pairs to launch")
    ap.add_argument("--gate", type=float, default=1.12, help="max clean contention_ratio")
    ap.add_argument("--solo-gate", type=float, default=0.45, help="max clean solo-burn seconds")
    ap.add_argument("--interval", type=float, default=75.0, help="seconds between probes")
    ap.add_argument("--out-dir", default="/tmp")
    ap.add_argument(
        "--query",
        default=None,
        help="fire `bench.py --scaling-query QUERY` instead of the flagship "
        "pair (set GRAFT_SF_DIR to the scaled input first)",
    )
    args = ap.parse_args()

    from bench import cpu_contention_probe

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    deadline = time.time() + args.max_hours * 3600
    clean = fires = 0
    while time.time() < deadline and fires < args.fires:
        p = cpu_contention_probe()
        print(json.dumps(p), flush=True)
        ok = p["contention_ratio"] <= args.gate and p["solo_s"] <= args.solo_gate
        clean = clean + 1 if ok else 0
        if clean < 2:
            time.sleep(args.interval)
            continue
        clean = 0
        fires += 1
        print(f"FIRING pair #{fires}", flush=True)
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        cmd = [sys.executable, bench] + (
            ["--scaling-query", args.query] if args.query else ["--scaling"]
        )
        out = subprocess.run(
            cmd,
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(bench),
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print("pair failed: " + out.stderr[-500:], flush=True)
            time.sleep(args.interval)
            continue
        art = json.loads(lines[-1])
        path = os.path.join(args.out_dir, f"scaling_watch_{fires}.json")
        with open(path, "w") as f:
            f.write(lines[-1])
        print(f"RESULT {art['value']} status={art['status']} -> {path}", flush=True)
        if art.get("status") == "headline":
            print("HEADLINE STAMP ACHIEVED", flush=True)
            return 0
        time.sleep(args.interval)
    print("watcher exit (no headline stamp)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
