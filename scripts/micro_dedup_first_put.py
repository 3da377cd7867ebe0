"""Micro: dedup_first_put (partitioned_map shape) vs the per-key
map_groups anti-pattern it replaced (VERDICT r3 item 4).

Old shape at 1M refs is unrunnable (~35 ms per group invocation), so the
head-to-head runs at SMALL_REFS and the new shape alone at 1M refs.
"""
import sys, time

import numpy as np
import pandas as pd
import ray
import ray.data as rd

SMALL_REFS = 20_000
BIG_REFS = 1_000_000
DUP = 2  # rows per ref


def make(n_refs: int) -> pd.DataFrame:
    rng = np.random.default_rng(42)
    refs = np.repeat(np.arange(n_refs, dtype=np.int64), DUP)
    seq = rng.permutation(len(refs)).astype(np.int64)
    return pd.DataFrame({"ref": refs, "seq": seq,
                         "text": ["x"] * len(refs)})


def old_shape(ds):
    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("seq", kind="stable").head(1)
    return ds.groupby("ref").map_groups(first)


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from blurrily_ray.stages.index import dedup_first_put

    small = make(SMALL_REFS)
    t0 = time.perf_counter()
    n_new = dedup_first_put(rd.from_pandas(small)).count()
    t_new_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_old = old_shape(rd.from_pandas(small)).count()
    t_old_small = time.perf_counter() - t0
    assert n_new == n_old == SMALL_REFS

    big = make(BIG_REFS)
    t0 = time.perf_counter()
    n_big = dedup_first_put(rd.from_pandas(big)).count()
    t_big = time.perf_counter() - t0
    assert n_big == BIG_REFS

    print(f"small({SMALL_REFS} refs): new {t_new_small:.2f}s  "
          f"old(map_groups) {t_old_small:.2f}s  "
          f"speedup {t_old_small / t_new_small:.1f}x")
    print(f"big({BIG_REFS} refs): new {t_big:.2f}s  "
          f"({BIG_REFS * DUP / t_big / 1e6:.2f}M rows/s)")
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
