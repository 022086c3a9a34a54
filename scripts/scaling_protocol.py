"""Falsifiable scaling-evidence protocol (round-4 VERDICT Next 1).

Single runs of ``bench.py --scaling`` proved unrepeatable on this host:
the kernel's page-fault path degrades and recovers with co-tenant
pressure (BASELINE.md round 4), so the measured N-vs-4N efficiency
swings 0.31-0.47 between back-to-back runs. This script replaces the
single-run number with a PROTOCOL:

1. INTERLEAVED legs — lo,hi,lo,hi,… (``--pairs`` each, default 5), a
   fresh Ray process per leg, the same repeat-replicated input — so a
   substrate drift hits adjacent lo/hi legs alike instead of biasing
   one side;
2. a Ray-free ``fault_probe.py --quick`` substrate snapshot BEFORE every
   pair — the probe series lets the efficiency series be correlated
   with (or falsified against) the substrate state;
3. per-leg CPU accounting: a sampler thread sums utime+stime of every
   Ray/bench process in the leg's tree, giving core-seconds per leg.
   The CPU-normalized efficiency ``cpu_lo / cpu_hi`` answers "did 4×
   parallelism inflate the total work?" independently of how much of
   the wall was substrate stall (utilization is reported per leg).

Output: one JSON line (medians + full series) on stdout, full record in
SCALING_PROTOCOL.json next to bench.py. Nothing else may use Ray on the
box while this runs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
PROBE = os.path.join(REPO, "scripts", "fault_probe.py")

_RAY_MARKERS = (
    "ray::", "raylet", "default_worker.py", "gcs_server", "bench.py",
    "plasma_store", "log_monitor", "core_worker",
)


class CpuSampler(threading.Thread):
    """Sum utime+stime over every Ray/bench process on the box while a
    leg runs (each leg owns the box, so attribution is unambiguous).
    Per-pid maxima are kept so short-lived workers still count."""

    def __init__(self, interval: float = 0.25):
        super().__init__(daemon=True)
        self.interval = interval
        self.stop_flag = threading.Event()
        self.max_jiffies: dict[int, int] = {}
        self.cmd_cache: dict[int, bool] = {}
        self.hz = os.sysconf("SC_CLK_TCK")

    def _matches(self, pid: int) -> bool:
        hit = self.cmd_cache.get(pid)
        if hit is not None:
            return hit
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(
                    "utf-8", "ignore"
                )
        except OSError:
            return False
        hit = any(m in cmd for m in _RAY_MARKERS)
        self.cmd_cache[pid] = hit
        return hit

    def run(self) -> None:
        while not self.stop_flag.is_set():
            for name in os.listdir("/proc"):
                if not name.isdigit():
                    continue
                pid = int(name)
                if not self._matches(pid):
                    continue
                try:
                    with open(f"/proc/{pid}/stat") as f:
                        parts = f.read().rsplit(") ", 1)[-1].split()
                    j = int(parts[11]) + int(parts[12])  # utime+stime
                except (OSError, IndexError, ValueError):
                    continue
                if j > self.max_jiffies.get(pid, 0):
                    self.max_jiffies[pid] = j
            self.stop_flag.wait(self.interval)

    def cpu_seconds(self) -> float:
        return sum(self.max_jiffies.values()) / self.hz


def run_probe() -> list[dict]:
    out = subprocess.run(
        [sys.executable, PROBE, "--quick"],
        capture_output=True, text=True, timeout=600,
    )
    return [
        json.loads(line)
        for line in out.stdout.strip().splitlines()
        if line.startswith("{")
    ]


def run_leg(cpus: int, repeat: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(cpus)
    env["GRAFT_SF_DIR"] = sf_dir
    sampler = CpuSampler()
    sampler.start()
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, BENCH, "--headline-only", "--repeat", str(repeat)],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    wall = time.time() - t0
    sampler.stop_flag.set()
    sampler.join(timeout=5)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"leg cpus={cpus} produced no JSON: {out.stderr[-2000:]}"
        )
    rec = json.loads(lines[-1])
    cpu = sampler.cpu_seconds()
    return {
        "cpus": cpus,
        "sec": rec["value"],
        "features_per_sec": rec["features_per_sec"],
        "features": rec["features"],
        "cpu_seconds": round(cpu, 1),
        "utilization": round(cpu / (rec["value"] * cpus), 3)
        if rec["value"] > 0 else 0.0,
        "subprocess_wall": round(wall, 1),
    }


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--lo", type=int, default=1)
    ap.add_argument("--hi", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=24)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    pairs = []
    for p in range(args.pairs):
        probes = run_probe()
        lo = run_leg(args.lo, args.repeat, args.sf_dir)
        hi = run_leg(args.hi, args.repeat, args.sf_dir)
        eff = (
            (hi["features_per_sec"] / lo["features_per_sec"])
            / (args.hi / args.lo)
            if lo["features_per_sec"] > 0 else 0.0
        )
        eff_cpu = (
            lo["cpu_seconds"] / hi["cpu_seconds"]
            if hi["cpu_seconds"] > 0 else 0.0
        )
        pair = {
            "pair": p,
            "probe": probes,
            "lo": lo,
            "hi": hi,
            "efficiency": round(eff, 3),
            "cpu_normalized_efficiency": round(eff_cpu, 3),
        }
        pairs.append(pair)
        print(json.dumps(
            {k: pair[k] for k in
             ("pair", "efficiency", "cpu_normalized_efficiency")}
            | {"lo_sec": lo["sec"], "hi_sec": hi["sec"],
               "lo_util": lo["utilization"], "hi_util": hi["utilization"],
               "probe_fresh_gbps": next(
                   (r.get("gbps") for r in probes
                    if r.get("probe") == "fresh_alloc"), None)},
        ), flush=True)

    summary = {
        "metric": (
            f"interleaved scaling protocol {args.lo}->{args.hi} cpus, "
            f"{args.pairs} pairs, repeat={args.repeat}"
        ),
        "median_efficiency": round(
            median([p["efficiency"] for p in pairs]), 3
        ),
        "median_cpu_normalized_efficiency": round(
            median([p["cpu_normalized_efficiency"] for p in pairs]), 3
        ),
        "efficiency_series": [p["efficiency"] for p in pairs],
        "cpu_eff_series": [p["cpu_normalized_efficiency"] for p in pairs],
        "pairs": pairs,
    }
    with open(os.path.join(REPO, "SCALING_PROTOCOL.json"), "w") as f:
        json.dump(summary, f, indent=1)
    compact = dict(summary)
    compact.pop("pairs")
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
