"""Host memory/fault/object-store probes behind BASELINE.md round 4.

Reproduces the measurements that diagnosed the round-4 scaling collapse
(efficiency 0.307 at 1-vs-4 CPUs): this host's kernel serializes
anonymous-page faults across processes, and glibc clamps the malloc
mmap threshold at 32 MB, so any stage allocating >32 MB per task pays a
serialized fault cost no dataflow parallelism can hide. Run:

    python scripts/fault_probe.py          # all probes (~2 min)

Prints one JSON line per probe. No repo imports — standalone.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time

import numpy as np


def probe_stream_pretouched(mb: int = 200, iters: int = 20) -> dict:
    a = np.ones(mb * 125_000)
    b = np.empty_like(a)
    b[:] = 0.0  # pre-touch
    t0 = time.perf_counter()
    for _ in range(iters):
        np.multiply(a, 1.000001, out=b)
    dt = time.perf_counter() - t0
    return {"probe": "stream_pretouched", "mb": mb,
            "gbps": round(iters * 2 * a.nbytes / dt / 1e9, 2)}


def probe_fresh_alloc(mb: int, iters: int = 8) -> dict:
    a = np.ones(mb * 125_000)
    c = a * 1.0  # warm
    del c
    t0 = time.perf_counter()
    for _ in range(iters):
        c = a * 1.000001  # fresh destination allocation every op
    dt = time.perf_counter() - t0
    return {"probe": "fresh_alloc", "mb": mb,
            "gbps": round(iters * 2 * a.nbytes / dt / 1e9, 2)}


_CHILD = r"""
import numpy as np, time
a = np.ones(16_000_000)          # 128 MB
for _ in range(2): c = a * 1.0   # warm
t0 = time.perf_counter(); n = 6
for _ in range(n): c = a * 1.000001
print(f"{n*2*a.nbytes/(time.perf_counter()-t0)/1e9:.2f}")
"""


def probe_concurrent_faults(procs: int = 4) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CHILD)
        path = f.name
    ps = [subprocess.Popen([sys.executable, path], stdout=subprocess.PIPE,
                           text=True) for _ in range(procs)]
    rates = sorted(float(p.communicate()[0].strip()) for p in ps)
    return {"probe": "concurrent_fresh_alloc_128mb", "procs": procs,
            "per_proc_gbps": rates}


def probe_plasma_put(obj_mb: int, n_per_worker: int, workers: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=max(4, workers),
                 include_dashboard=False, logging_level="ERROR")

    @ray.remote
    def put_many(mb, n):
        import numpy as _np
        import time as _t
        t0 = _t.perf_counter()
        for _ in range(n):
            ray.put(_np.ones(mb * 125_000))
        return _t.perf_counter() - t0

    t0 = time.perf_counter()
    ray.get([put_many.remote(obj_mb, n_per_worker) for _ in range(workers)])
    dt = time.perf_counter() - t0
    return {"probe": "plasma_put", "obj_mb": obj_mb, "workers": workers,
            "aggregate_mbps": round(workers * obj_mb * n_per_worker / dt)}


def main() -> None:
    if "--quick" in sys.argv:
        # the Ray-free subset (~15 s): substrate snapshot between the
        # interleaved scaling legs (scripts/scaling_protocol.py) without
        # spinning a Ray session up next to the one under test
        out = [
            probe_stream_pretouched(iters=10),
            probe_fresh_alloc(200, iters=4),
            probe_concurrent_faults(),
        ]
        for rec in out:
            print(json.dumps(rec))
        return
    out = [
        probe_stream_pretouched(),
        probe_fresh_alloc(16, iters=100),
        probe_fresh_alloc(200),
        probe_concurrent_faults(),
        probe_plasma_put(16, 16, 1),
        probe_plasma_put(16, 16, 4),
        probe_plasma_put(128, 4, 1),
        probe_plasma_put(128, 4, 4),
    ]
    for rec in out:
        print(json.dumps(rec))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
