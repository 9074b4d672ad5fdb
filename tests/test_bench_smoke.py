"""bench.py is the driver's per-round perf artifact — a breakage there
loses the round's BENCH_r{N}.json entirely, so smoke it in CI: one
sample, no scaling pair, tiny corpus, fresh subprocess (bench owns its
own Ray session and must not touch this suite's)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_valid_json_line(sf001):
    env = dict(
        os.environ,
        GRAFT_SF_DIR=sf001,
        RAY_GRAFT_CPUS="4",
        GRAFT_BENCH_REPEAT="1",
        GRAFT_BENCH_SAMPLES="1",
        GRAFT_BENCH_NO_SCALING="1",
        RAY_ADDRESS="",  # bench must bootstrap its own local session
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got {len(lines)}"
    d = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                "triples", "triples_per_sec", "loadavg_start", "flagship_samples"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["queries"]["flagship_kg"] > 0
    assert d["triples"] > 0
