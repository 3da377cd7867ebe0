"""Micro: exact_dedup (partitioned_map shape) vs the native
``groupby().aggregate(Min)`` it replaced (VERDICT r4 wrong #2).

The native aggregate is the API family this repo measured hanging >6 min
at 7.5M rows (NOTES_r2, cluster.py ban note), so the head-to-head runs at
SMALL_ROWS and the new shape alone at BIG_ROWS = 10M.  Set
MICRO_RUN_OLD_BIG=1 to ALSO attempt the old shape at 10M (expect a hang;
run under `timeout`).
"""
import os
import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL_ROWS = 100_000
BIG_ROWS = 10_000_000
DUP = 2  # rows per distinct text


def make(n_rows: int) -> rd.Dataset:
    n_texts = n_rows // DUP
    ids = np.arange(n_rows, dtype=np.int64)
    text_id = np.repeat(np.arange(n_texts, dtype=np.int64), DUP)
    rng = np.random.default_rng(7)
    perm = rng.permutation(n_rows)
    df = pd.DataFrame({"doc_id": ids,
                       "text": ("t" + pd.Series(text_id[perm]).astype(str))})
    return rd.from_pandas(df).repartition(64)


def old_shape(docs):
    import hashlib
    from ray.data.aggregate import Min

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "_h": df["text"].map(
                lambda s: hashlib.md5(s.encode()).hexdigest()),
        })

    return docs.map_batches(digest, batch_format="pandas") \
        .groupby("_h").aggregate(Min("doc_id", alias_name="doc_id")) \
        .select_columns(["doc_id"])


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from blurrily_ray.stages.dedup import exact_dedup

    small = make(SMALL_ROWS)
    t0 = time.perf_counter()
    n_new = exact_dedup(small).count()
    t_new_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_old = old_shape(small).count()
    t_old_small = time.perf_counter() - t0
    assert n_new == n_old == SMALL_ROWS // DUP, (n_new, n_old)

    big = make(BIG_ROWS)
    t0 = time.perf_counter()
    n_big = exact_dedup(big).count()
    t_big = time.perf_counter() - t0
    assert n_big == BIG_ROWS // DUP, n_big

    print(f"small({SMALL_ROWS} rows): new {t_new_small:.2f}s  "
          f"old(native aggregate) {t_old_small:.2f}s")
    print(f"big({BIG_ROWS} rows): new {t_big:.2f}s  "
          f"({BIG_ROWS / t_big / 1e6:.2f}M rows/s)")

    if os.environ.get("MICRO_RUN_OLD_BIG"):
        t0 = time.perf_counter()
        n = old_shape(make(BIG_ROWS)).count()
        print(f"big old shape: {time.perf_counter() - t0:.2f}s rows={n}")
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
