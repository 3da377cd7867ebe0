"""Similarity search over embedding columns (list<float>).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast
  once (ray.put), each batch does one float64 matmul against it, emits its
  batch-local top-k, and a final tiny groupby merges. Outputs integer ranks
  only (no float columns) so the DuckDB oracle hashes identically.
- :func:`neardup_pairs` — all-pairs cosine ≥ threshold via the same
  broadcast-matmul; the LSH-bucketed variant (:func:`lsh_neardup_pairs`)
  is the 100 TB path: random-hyperplane signatures → bucket groupby →
  within-bucket exact check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from blurrily_ray.functions.hashing import stable_u64
from blurrily_ray.stages.pairs import _cached_get


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    lists = batch[vec_col].combine_chunks()
    dim = len(lists[0]) if len(lists) else 0
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), dim)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute(embeddings, query_ids, k: int = 10, *,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """(query_id, rank, neighbor_id): exact cosine top-k for each query id,
    self excluded, ties broken by neighbor id ascending, rank 1-based."""
    qarr = np.unique(np.fromiter((int(q) for q in query_ids), dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, qarr)
        return batch.filter(pa.array(keep))

    qrows = embeddings.map_batches(pick, batch_format="pyarrow").take_all()
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_mat = _unit(np.array([r[vec_col] for r in qrows], dtype=np.float64))
    q_ref = ray.put((q_ids, q_mat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qm = _cached_get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _unit(_matrix(batch, vec_col))
        # round to 6dp BEFORE ranking and break ties by neighbor id — the
        # total order the SQL oracle uses; raw-float ranking would make the
        # k-boundary depend on sub-rounding noise
        sims = np.round(m @ qm.T, 6)  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qi)):
            s = sims[:, j]
            mask = ids != qi[j]
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, -cand_s))[:k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.append(np.full(len(cand_ids), qi[j], dtype=np.int64))
            out_n.append(cand_ids)
            out_s.append(cand_s)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else np.empty(0, np.int64)),
            "neighbor_id": pa.array(np.concatenate(out_n) if out_n else np.empty(0, np.int64)),
            "cos": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.float64)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True],
                            kind="stable").head(k)
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy(),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
            "neighbor_id": df["neighbor_id"].to_numpy(),
        })

    return embeddings.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(merge, batch_format="pandas")


def neardup_pairs(embeddings, threshold: float = 0.95, *,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """(a, b) with cosine(a, b) ≥ threshold, a < b — exact, via broadcast of
    the full (unit-normalized) matrix. Right up to ~10⁶ vectors; beyond
    that use :func:`lsh_neardup_pairs`."""
    rows = embeddings.select_columns([id_col, vec_col]).take_all()
    all_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    all_mat = _unit(np.array([r[vec_col] for r in rows], dtype=np.float64)[order])
    ref = ray.put((all_ids, all_mat))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = _cached_get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _unit(_matrix(batch, vec_col))
        sims = m @ mat_all.T
        out_a, out_b = [], []
        for r in range(len(ids)):
            hit = np.nonzero((sims[r] >= threshold) & (ids_all > ids[r]))[0]
            out_a.append(np.full(len(hit), ids[r], dtype=np.int64))
            out_b.append(ids_all[hit])
        return pa.table({
            "a": pa.array(np.concatenate(out_a) if out_a else np.empty(0, np.int64)),
            "b": pa.array(np.concatenate(out_b) if out_b else np.empty(0, np.int64)),
        })

    return embeddings.map_batches(pairs, batch_format="pyarrow")


def lsh_neardup_pairs(embeddings, threshold: float = 0.95, *, n_planes: int = 16,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int = 64, seed: int = 42):
    """Scale path: random-hyperplane LSH — vectors agreeing on all
    ``n_planes`` sign bits land in one bucket; exact cosine is verified
    within buckets only. Recall < 1 by construction (tunable via planes /
    multiple tables); candidate volume is corpus-linear for clustered data."""
    rng = np.random.RandomState(stable_u64(f"hyperplanes-{seed}") % (2**31))
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucket(batch: pa.Table) -> pa.Table:
        p = _cached_get(planes_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _unit(_matrix(batch, vec_col))
        bits = (m @ p) > 0
        keys = np.packbits(bits, axis=1, bitorder="little")[:, :2].copy().view(np.uint16)[:, 0]
        return pa.table({id_col: pa.array(ids), "bucket": pa.array(keys.astype(np.int64)),
                         vec_col: batch[vec_col]})

    def within(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        mat = _unit(np.array(df[vec_col].tolist(), dtype=np.float64))
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[ia], ids[ib]
        swap = a > b
        return pd.DataFrame({"a": np.where(swap, b, a), "b": np.where(swap, a, b)})

    return embeddings.map_batches(bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(within, batch_format="pandas")
