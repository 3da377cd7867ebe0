"""Long-session worker maintenance.

Measured pathology (NOTES_r3): after a heavy exchange workload, Ray's
reused worker processes keep ~10+ GB of freed-but-not-returned glibc heap,
and EVERY subsequent stage in the same session runs uniformly ~1.5-3×
slower — the job never reaches warm speed again (sf0.1 ER: 5-6 s warm,
15-16 s persistently after one 41M-row exchange micro, on a box with
plenty of free RAM). Fresh processes per job (bench.py's phase split) are
the structural defense; this module is the in-session one: a broadcast of
``malloc_trim(0)`` across the worker pool, which restored the aged
session's ER to 5.4 s in the same experiment.

Capping allocator arenas instead (MALLOC_ARENA_MAX=2) was tested and
REJECTED: it halves exchange throughput (6.2 s vs 3.4 s on the same
micro) — the arenas exist for a reason.
"""

from __future__ import annotations

import time


def trim_worker_heaps(n_tasks: int | None = None, hold: float = 0.3) -> int:
    """Ask the worker pool to return freed heap pages to the OS.

    Schedules a swarm of 1-CPU tasks, each of which runs ``gc.collect()``
    + glibc ``malloc_trim(0)`` in whatever worker it lands on, then holds
    its CPU slot briefly so the swarm spreads across DISTINCT workers
    instead of recycling one. Coverage is probabilistic (Ray gives no
    "run on every worker" primitive short of per-node actors), so
    ``n_tasks`` defaults to 2× the cluster's CPU count — two full waves.

    Call between heavy pipelines in a LONG-LIVED session; pointless (and
    a couple of seconds of overhead) in fresh-process-per-job layouts.
    Returns the number of tasks that successfully trimmed."""
    import ray

    if n_tasks is None:
        n_tasks = 2 * int(ray.cluster_resources().get("CPU", 8))

    @ray.remote(num_cpus=1)
    def _trim(hold_s: float) -> bool:
        import ctypes
        import gc

        gc.collect()
        try:
            ctypes.CDLL("libc.so.6").malloc_trim(0)
        except OSError:  # non-glibc platform: gc alone
            time.sleep(hold_s)
            return False
        time.sleep(hold_s)
        return True

    return sum(ray.get([_trim.remote(hold) for _ in range(n_tasks)]))
