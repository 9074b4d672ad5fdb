#!/usr/bin/env python
"""Fault-injected resume at stress scale (BASELINE.md resume protocol).

test_retry.py proves task/actor replay and test_resume proves manifest
skip at small scale; this job proves the SAME guarantees hold when a
corpus-scale flagship run dies mid-extract:

1. CLEAN reference run into its own dir (GRAFT_WAVE_PARTS=1 so each
   partition commits individually — matching wave overheads between
   the legs keeps the wall-time comparison honest).
2. KILLED run: same command in a subprocess; poll the lineage manifest
   and SIGKILL the driver the moment >= --kill-after extract partitions
   are committed (a real mid-job node loss: no atexit, no cleanup).
3. RESUME: rerun over the killed run's output dir (same subprocess
   shape as the clean leg, so both walls carry identical interpreter +
   ray.init fixed costs) and check
   - every partition committed before the kill was SKIPPED (manifest
     fingerprint match — no re-extraction),
   - triples / entities / edges counts equal the clean run,
   - the adjacency TABLE is value-identical to the clean run,
   - resume wall < clean wall (the saving is the point of lineage).

Prints one JSON line with the evidence for BASELINE.md.

Usage:
    python jobs/stress_resume.py --input /tmp/varied_docs --repeat 1 \
        --partitions 8 --kill-after 4
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _done_extract_parts(out_dir: str) -> set[int]:
    lineage = os.path.join(out_dir, "_lineage")
    done: set[int] = set()
    if not os.path.isdir(lineage):
        return done
    for name in os.listdir(lineage):
        if name.startswith("extract-part") and name.endswith(".json"):
            try:
                with open(os.path.join(lineage, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    done.add(int(rec["partition_id"]))
            except (json.JSONDecodeError, OSError):
                pass  # mid-write race: count it next poll
    return done


def _flagship_cmd(args, out_dir: str) -> list[str]:
    return [
        sys.executable,
        os.path.join(REPO, "jobs", "run_flagship.py"),
        "--input", args.input,
        "--output", out_dir,
        "--partitions", str(args.partitions),
        "--repeat", str(args.repeat),
    ]


def _adjacency_table(out_dir: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out_dir, "adjacency"))
    # list columns can't drive sort_by — canonicalize them to a joined
    # string (docs lists are themselves deterministic-sorted upstream)
    cols = {}
    for name in t.column_names:
        col = t.column(name)
        if pa.types.is_list(col.type):
            col = pa.array(
                [",".join(v) if v is not None else None for v in col.to_pylist()],
                pa.string(),
            )
        cols[name] = col
    t = pa.table(cols)
    return t.sort_by([(c, "ascending") for c in t.column_names])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--kill-after", type=int, default=4,
                    help="SIGKILL once this many extract partitions committed")
    ap.add_argument("--workdir", default="/tmp/stress_resume")
    args = ap.parse_args()

    env = dict(os.environ, GRAFT_WAVE_PARTS="1")
    clean_dir = os.path.join(args.workdir, "clean")
    kill_dir = os.path.join(args.workdir, "killed")
    shutil.rmtree(args.workdir, ignore_errors=True)

    # ---- leg 1: clean reference ------------------------------------
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    t0 = time.time()
    ref = subprocess.run(_flagship_cmd(args, clean_dir), env=env, capture_output=True, text=True)
    clean_wall = time.time() - t0
    if ref.returncode != 0:
        print(ref.stdout[-2000:], ref.stderr[-2000:], file=sys.stderr)
        raise SystemExit("clean reference run failed")
    clean_report = json.loads(ref.stdout.strip().splitlines()[-1])

    # ---- leg 2: kill mid-extract ------------------------------------
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    proc = subprocess.Popen(
        _flagship_cmd(args, kill_dir), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    committed_at_kill: set[int] = set()
    killed_by_us = False
    # bound the poll loop: a hung child must fail the job, not spin forever
    kill_budget = max(600.0, 10 * clean_wall)
    kill_deadline = time.time() + kill_budget
    while proc.poll() is None:
        if time.time() > kill_deadline:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            raise SystemExit(
                f"killed-leg child hung past {kill_budget:.0f}s without "
                f"reaching {args.kill_after} commits (got {len(committed_at_kill)})"
            )
        committed_at_kill = _done_extract_parts(kill_dir)
        if len(committed_at_kill) >= args.kill_after:
            proc.send_signal(signal.SIGKILL)
            killed_by_us = True
            break
        time.sleep(0.25)
    proc.wait()
    if proc.returncode == 0:
        raise SystemExit(
            f"run finished before {args.kill_after} commits — kill-after too large"
        )
    # the evidence is only valid if the fault was OUR mid-extract SIGKILL:
    # a child that crashed on its own (OOM, bad --input, leftover ray
    # state) before kill_after commits would otherwise masquerade as a
    # successful injection and leg 3 would just be a clean run
    if not killed_by_us or len(committed_at_kill) < args.kill_after:
        raise SystemExit(
            f"killed-leg child exited on its own (rc={proc.returncode}) after "
            f"{len(committed_at_kill)} commits — no fault was injected; "
            "evidence invalid"
        )
    # hard driver death leaves orphaned raylets; a real cluster restarts
    # the job on healthy nodes — locally that is a fresh `ray start`
    subprocess.run(["ray", "stop", "--force"], capture_output=True)

    # ---- leg 3: resume ----------------------------------------------
    # Same subprocess shape as the clean leg, so BOTH walls include the
    # identical interpreter/ray.init fixed costs and the saving ratio
    # compares like with like (round-5 review finding).
    t1 = time.time()
    res_run = subprocess.run(
        _flagship_cmd(args, kill_dir), env=env, capture_output=True, text=True
    )
    resume_wall = time.time() - t1
    if res_run.returncode != 0:
        print(res_run.stdout[-2000:], res_run.stderr[-2000:], file=sys.stderr)
        raise SystemExit("resume run failed")
    resume_report = json.loads(res_run.stdout.strip().splitlines()[-1])

    skipped = set(resume_report["skipped_partitions"])
    not_skipped = sorted(committed_at_kill - skipped)
    adj_equal = _adjacency_table(clean_dir).equals(_adjacency_table(kill_dir))
    out = {
        "metric": "stress_resume",
        "partitions": args.partitions,
        "committed_at_kill": sorted(committed_at_kill),
        "resume_skipped": sorted(skipped),
        "resume_reextracted": sorted(resume_report["processed_partitions"]),
        "committed_but_reextracted": not_skipped,
        "triples_clean": clean_report.get("triples"),
        "triples_resumed": resume_report.get("triples"),
        "entities_clean": clean_report.get("entities"),
        "entities_resumed": resume_report.get("entities"),
        "adjacency_value_identical": adj_equal,
        "clean_wall_s": round(clean_wall, 2),
        "resume_wall_s": round(resume_wall, 2),
        "resume_saving_pct": round(100 * (1 - resume_wall / clean_wall), 1),
        "ok": (
            not not_skipped
            and clean_report.get("triples") == resume_report.get("triples")
            and clean_report.get("entities") == resume_report.get("entities")
            and adj_equal
            and resume_wall < clean_wall  # the saving IS the claim
        ),
    }
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
