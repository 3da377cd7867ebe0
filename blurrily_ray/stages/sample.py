"""Deterministic hash-based sampling / dataset splitting.

The reference has no sampling (SURVEY.md §2); a training-data pipeline
needs REPRODUCIBLE splits — random_shuffle-then-take changes between runs
and between cluster sizes, while a content-hash bucket is stable across
runs, engines and partitionings (the same doc always lands in the same
split). Pure map, no shuffle, embarrassingly parallel at any scale.

Bucket = first 8 bytes of md5("{salt}:{key}") mod ``buckets`` — the same
expression a DuckDB oracle (or any other engine) can evaluate, so splits
made here are verifiable and portable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _bucket_array(keys, salt: str, buckets: int) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        d = hashlib.md5(f"{salt}:{k}".encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "big") % buckets
    return out


def deterministic_split(ds, *, key_col: str, lo: int, hi: int,
                        buckets: int = 100, salt: str = "split"):
    """Keep rows whose stable hash bucket falls in ``[lo, hi)`` — e.g.
    (0, 90) for train and (90, 100) for held-out gives a disjoint,
    run-stable 90/10 split keyed on content identity."""
    if not (0 <= lo < hi <= buckets):
        raise ValueError("need 0 <= lo < hi <= buckets")

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        b = _bucket_array(keys, salt, buckets)
        return batch.filter(pa.array((b >= lo) & (b < hi)))

    return ds.map_batches(keep, batch_format="pyarrow")
