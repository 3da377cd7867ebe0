"""Per-stage metrics sidecar (the reference's stats verb, generalized)."""

from __future__ import annotations

import json
import os
import time


class Metrics:
    """Accumulates named counters/timings for one pipeline run and persists
    them next to the run's checkpoints. Replaces the reference's in-process
    totals counters (storage.c:466-467, 616-621) with a durable sidecar."""

    def __init__(self):
        self.data: dict = {"started_at": time.time(), "stages": {}}

    def stage(self, name: str, **kv) -> None:
        self.data["stages"].setdefault(name, {}).update(kv)

    def timeit(self, name: str):
        metrics = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                metrics.stage(name, seconds=round(time.perf_counter() - self.t0, 4))

        return _Timer()

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.data["finished_at"] = time.time()
        with open(path, "w") as fh:
            json.dump(self.data, fh, indent=1)
