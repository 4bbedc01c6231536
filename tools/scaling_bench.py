"""Scaling-efficiency legs with a stall watchdog (VERDICT r5 #7).

Runs the pinned N-core and 4N-core pipeline legs sequentially (the
BENCH/BASELINE.md protocol: taskset pinning, idle machine, identical
input) and prints ONE JSON line with both walls and E = (T_N / T_4N) / 4.

The round-5 measurement lost a leg to a silent hang — a pyspark worker
stuck in recv with the machine idle. The watchdog closes that: each leg's
process GROUP is monitored via /proc CPU jiffies; if the group burns less
than ``--stall-cpu-seconds`` of CPU across ``--stall-minutes`` of wall
time (or exceeds ``--max-wall``), the group is SIGKILLed by pgid (never
by command-line pattern — a pattern match can kill the driving shell) and
the leg is retried once, with the event recorded in the output JSON.

Usage:
    python tools/scaling_bench.py --pages 400000 [--legs 2,8]
        [--warehouse-root /tmp] [--link-mode parity]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _group_cpu_jiffies(pgid: int) -> int:
    """Total utime+stime jiffies of every process in the group — the
    stall signal (a hung leg shows a flat line here while alive)."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                fields = fh.read().rsplit(")", 1)[1].split()
            # after the comm field: [0]=state [1]=ppid [2]=pgrp ...
            if int(fields[2]) != pgid:
                continue
            total += int(fields[11]) + int(fields[12])  # utime, stime
        except (OSError, IndexError, ValueError):
            continue
    return total


def run_leg(cores: int, pages: int, warehouse: str, link_mode: str,
            max_wall: float, stall_minutes: float,
            stall_cpu_seconds: float, poll: float = 15.0) -> dict:
    cpu_list = f"0-{cores - 1}" if cores > 1 else "0"
    cmd = [
        "taskset", "-c", cpu_list,
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", "12g",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--synthesize", str(pages), "--warehouse", warehouse,
        "--link-mode", link_mode,
    ]
    attempts = []
    for attempt in (1, 2):
        shutil.rmtree(warehouse, ignore_errors=True)
        started = time.time()
        with open(warehouse + ".log", "w") as log:
            proc = subprocess.Popen(
                cmd, stdout=log, stderr=subprocess.STDOUT,
                start_new_session=True, cwd=REPO,
            )
            pgid = os.getpgid(proc.pid)
            hz = os.sysconf("SC_CLK_TCK")
            window: list[tuple[float, int]] = []
            killed_reason = None
            while proc.poll() is None:
                time.sleep(poll)
                now = time.time()
                window.append((now, _group_cpu_jiffies(pgid)))
                wall = now - started
                # newest sample at least one stall-window old — the CPU
                # burned since it is the stall signal
                cutoff = now - stall_minutes * 60
                anchor = None
                for w in window:
                    if w[0] <= cutoff:
                        anchor = w
                    else:
                        break
                if anchor is not None:
                    window = [w for w in window if w[0] >= anchor[0]]
                if wall > max_wall:
                    killed_reason = f"max_wall {max_wall}s exceeded"
                elif (
                    anchor is not None
                    and (window[-1][1] - anchor[1]) / hz < stall_cpu_seconds
                ):
                    killed_reason = (
                        f"stalled: <{stall_cpu_seconds}s CPU in "
                        f"{stall_minutes}min"
                    )
                if killed_reason:
                    os.killpg(pgid, signal.SIGKILL)
                    proc.wait()
                    break
        wall = time.time() - started
        if killed_reason is None and proc.returncode == 0:
            with open(warehouse + ".log") as fh:
                last = [l for l in fh.read().splitlines() if l.startswith("{")]
            result = json.loads(last[-1]) if last else {}
            attempts.append({"attempt": attempt, "wall": round(wall, 2),
                             "status": "ok"})
            return {
                "cores": cores, "wall_seconds": result.get("wall_seconds", wall),
                "timings": result.get("timings"), "counts": result.get("counts"),
                "attempts": attempts,
            }
        attempts.append({
            "attempt": attempt, "wall": round(wall, 2),
            "status": killed_reason or f"exit {proc.returncode}",
        })
        print(f"leg local[{cores}] attempt {attempt} failed: "
              f"{attempts[-1]['status']}; retrying" if attempt == 1 else
              f"leg local[{cores}] failed twice", file=sys.stderr)
    return {"cores": cores, "wall_seconds": None, "attempts": attempts}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", type=int, required=True)
    parser.add_argument("--legs", default="2,8")
    parser.add_argument("--warehouse-root", default="/tmp")
    parser.add_argument("--link-mode", default="parity")
    parser.add_argument("--max-wall", type=float, default=3 * 3600)
    parser.add_argument("--stall-minutes", type=float, default=10.0)
    parser.add_argument("--stall-cpu-seconds", type=float, default=30.0)
    args = parser.parse_args()

    os.makedirs(args.warehouse_root, exist_ok=True)
    legs = [int(x) for x in args.legs.split(",")]
    results = []
    for cores in legs:
        wh = os.path.join(args.warehouse_root, f"wh_n{cores}")
        results.append(
            run_leg(cores, args.pages, wh, args.link_mode, args.max_wall,
                    args.stall_minutes, args.stall_cpu_seconds)
        )
    out = {"pages": args.pages, "legs": results}
    if (
        len(results) == 2
        and all(r["wall_seconds"] for r in results)
        and results[1]["cores"] == 4 * results[0]["cores"]
    ):
        t_n, t_4n = results[0]["wall_seconds"], results[1]["wall_seconds"]
        out["efficiency"] = round((t_n / t_4n) / 4.0, 3)
    print(json.dumps(out))
    return 0 if all(r["wall_seconds"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
