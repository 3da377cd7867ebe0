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


def stratified_sample(ds, *, key_col: str, strata_col: str,
                      rates: dict, default_keep: int | None = None,
                      buckets: int = 100, salt: str = "sample"):
    """Per-stratum deterministic sampling — the corpus REBALANCING step of
    a training-data pipeline (e.g. downsample the dominant language or
    source, keep the rare ones whole) with the same run/engine/partition
    stability guarantee as :func:`deterministic_split`.

    A row is kept iff its stable content bucket (md5 of ``key_col``,
    mod ``buckets``) is below its stratum's threshold:
    ``rates[stratum]`` buckets out of ``buckets`` (so ``{"en": 10}`` with
    the default 100 buckets keeps a deterministic 10 % of the "en"
    stratum). Strata missing from ``rates`` use ``default_keep``
    (``None`` = keep everything). Pure map, no shuffle; the identical
    predicate is SQL-expressible, so samples are portable and verifiable.
    """
    import pandas as pd

    for v in list(rates.values()) + ([default_keep] if default_keep
                                     is not None else []):
        if not (0 <= v <= buckets):
            raise ValueError(f"rates must be in [0, {buckets}]")
    dflt = buckets if default_keep is None else default_keep

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        b = _bucket_array(keys, salt, buckets)
        thr = pd.Series(batch[strata_col].to_pylist()) \
            .map(rates).fillna(dflt).to_numpy(dtype=np.int64)
        return batch.filter(pa.array(b < thr))

    return ds.map_batches(keep, batch_format="pyarrow")
