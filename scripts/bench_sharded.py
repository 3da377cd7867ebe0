"""Forced-sharded ER wall-time micro (the beyond-heap path).

Usage: python scripts/bench_sharded.py [sf] [num_cpus] [reps]
Times run_er_grouped(score_mode="sharded") over the synth transcripts;
prints one JSON line with per-rep wall times and the per-stage metrics
of the best rep (the broadcast path is benched by bench.py; this path
is the one whose exchanges dominate, so it gets its own harness).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from blurrily_ray.pipelines.er import run_er_grouped
    from blurrily_ray.sources.synth import ensure_transcripts
    from blurrily_ray.state.metrics import Metrics

    paths = ensure_transcripts(sf)
    times, best_metrics, n_docs = [], None, 0
    for _ in range(reps):
        m = Metrics()
        t0 = time.perf_counter()
        res = run_er_grouped(paths["transcripts"], score_mode="sharded",
                             metrics=m)
        n_docs = res["clusters"].count()
        dt = time.perf_counter() - t0
        if not times or dt < min(times):
            best_metrics = {k: v.get("seconds")
                            for k, v in m.data["stages"].items()
                            if "seconds" in v}
        times.append(round(dt, 2))
    print(json.dumps({"sharded_er_sec": min(times), "reps": times,
                      "sf": sf, "num_cpus": num_cpus, "docs": n_docs,
                      "stages_best": best_metrics}))
    ray.shutdown()


if __name__ == "__main__":
    main()
