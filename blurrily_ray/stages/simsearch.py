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


def _empty_knn_result():
    """Typed empty (query_id, rank, neighbor_id) Dataset — the contract
    when the corpus holds no query rows at all."""
    from ray.data import from_arrow

    return from_arrow(pa.table({
        "query_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int64()),
        "neighbor_id": pa.array([], type=pa.int64())}))


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
    if not qrows:  # no query rows in the corpus (e.g. empty table)
        return _empty_knn_result()
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


def sq_knn(embeddings, query_ids, k: int = 10, *,
           id_col: str = "vec_id", vec_col: str = "embedding"):
    """(query_id, rank, neighbor_id, score): scalar-quantized int8
    maximum-inner-product top-k — the memory-lean ANN scale path.

    Every vector is quantized ONCE to int8 codes
    ``floor((x * 127.0) / max|x|)`` with a corpus-global scale (found in
    the SAME streamed pass that gathers the query rows, so the float
    corpus is read exactly once), and ranking runs entirely in INTEGER
    arithmetic: score = <q_codes, v_codes>, ties broken by neighbor id
    ascending, self excluded, rank 1-based. Integer sums are
    order-independent, so the result is exact under any partitioning and
    the DuckDB oracle matches bit-for-bit — no 6dp rounding smoothing
    like :func:`knn_brute` needs for float cosine.

    100 TB shape: the int8 code matrix is the resident serving artifact
    (4× smaller than float32; shardable exactly like the ER scorer's CSR
    shards, stages/scorer.py) while raw floats stay in cold storage —
    this operator IS that read path: after quantization nothing touches
    the float corpus. Top-k contract mirrors reference find
    (storage.c:477-580).
    """
    qarr = np.unique(np.fromiter((int(q) for q in query_ids), dtype=np.int64))

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _matrix(batch, vec_col)
        bmax = float(np.abs(m).max()) if m.size else 0.0
        keep = np.isin(ids, qarr)
        # one sentinel row per block carries the block max; query rows
        # carry their float64 vector (quantized on the driver with the
        # SAME expression the corpus batches use)
        out_ids = np.concatenate((ids[keep], [-1]))
        embs = [row.tolist() for row in m[keep]] + [[]]
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            vec_col: pa.array(embs, pa.list_(pa.float64())),
            "bmax": pa.array(np.full(len(out_ids), bmax, np.float64)),
        })

    rows = embeddings.map_batches(prep, batch_format="pyarrow").take_all()
    maxabs = max((r["bmax"] for r in rows), default=0.0) or 1.0
    qrows = [r for r in rows if r[id_col] >= 0]
    if not qrows:  # no query rows in the corpus (e.g. empty table)
        from ray.data import from_arrow

        return from_arrow(pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.int64())}))
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    q_codes = np.floor(q_mat * 127.0 / maxabs).astype(np.int64)
    q_ref = ray.put((q_ids, q_codes, maxabs))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qc, ma = _cached_get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.floor(_matrix(batch, vec_col) * 127.0 / ma).astype(np.int64)
        scores = codes @ qc.T  # (batch, nq) exact int64
        out_q, out_n, out_s = [], [], []
        for j in range(len(qi)):
            s = scores[:, j]
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
            "score": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.int64)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "neighbor_id"], ascending=[False, True],
                            kind="stable").head(k)
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy(),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
            "neighbor_id": df["neighbor_id"].to_numpy(),
            "score": df["score"].to_numpy(),
        })

    return embeddings.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(merge, batch_format="pandas")


def kmeans_centroids(embeddings, k: int = 16, *, n_iters: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed spherical k-means — the iterative centroid source for
    :func:`ivf_knn` on CLUSTERED corpora (real embedding tables), where
    cells should track the data's cluster structure. NB on the synthetic
    near-uniform test embeddings, data-point centroids measure BETTER
    (recall@10 0.92 vs 0.64 at n_probe=4/16): normalized cluster means of
    random data smooth toward each other and blur the probe ordering —
    the id pick is not just an oracle convenience there.

    Fully distributed, nothing corpus-sized touches the driver:

    - **init**: the k vectors with the smallest stable hash(id) — each
      block emits its local k smallest (k rows per block), the driver
      merges k×n_blocks tiny rows.
    - **iterations**: one ``map_batches`` pass per Lloyd round emits
      per-cell partial (count, vector-sum) rows — k rows per block, the
      classic map-side combiner — and the driver reduces k×dim floats
      and re-broadcasts via ``ray.put``. Empty cells keep their previous
      centroid.

    Iterative float means are not SQL-expressible, so this path has no
    DuckDB oracle; determinism and recall-vs-brute are pinned by pytest.
    Returns a unit-normalized (k, dim) float64 matrix."""
    import pyarrow.compute as pc  # noqa: F401  (kept for parity imports)

    def seed_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return batch.slice(0, 0)
        h = pd.util.hash_array(ids)  # stable across processes
        keep = np.argsort(h, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    seeds = embeddings.select_columns([id_col, vec_col]) \
        .map_batches(seed_rows, batch_format="pyarrow").take_all()
    sid = np.array([r[id_col] for r in seeds], dtype=np.int64)
    smat = np.array([r[vec_col] for r in seeds], dtype=np.float64)
    order = np.argsort(pd.util.hash_array(sid), kind="stable")[:k]
    cents = _unit(smat[order])
    dim = cents.shape[1]

    for _ in range(n_iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = _cached_get(cref)
            m = _unit(_matrix(batch, vec_col))
            if not len(m):
                return pa.table({
                    "cell": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64()))})
            cell = np.argmax(np.round(m @ c.T, 6), axis=1)
            o = np.argsort(cell, kind="stable")
            cs = cell[o]
            bnd = np.nonzero(cs[1:] != cs[:-1])[0] + 1
            starts = np.concatenate(([0], bnd))
            sums = np.add.reduceat(m[o], starts, axis=0)
            cells = cs[starts]
            cnts = np.diff(np.concatenate((starts, [len(cs)])))
            return pa.table({
                "cell": pa.array(cells.astype(np.int64)),
                "cnt": pa.array(cnts.astype(np.int64)),
                "vsum": pa.array(list(sums), type=pa.list_(pa.float64()))})

        rows = embeddings.select_columns([vec_col]) \
            .map_batches(partial, batch_format="pyarrow").take_all()
        # content-sorted accumulation: take_all's block ARRIVAL order is
        # nondeterministic, and float += is order-sensitive — sorting by
        # the full row content makes every rerun reduce identically (the
        # oracle re-trains and embeds these floats as a literal)
        rows.sort(key=lambda r: (r["cell"], r["cnt"], tuple(r["vsum"])))
        sums = np.zeros((len(cents), dim))
        cnts = np.zeros(len(cents), dtype=np.int64)
        for r in rows:
            sums[r["cell"]] += np.asarray(r["vsum"])
            cnts[r["cell"]] += r["cnt"]
        new = cents.copy()  # empty cells keep their previous centroid
        nz = cnts > 0
        new[nz] = _unit(sums[nz] / cnts[nz, None])
        if np.allclose(new, cents, atol=1e-12):
            break
        cents = new
    return cents


def ivf_knn(embeddings, query_ids, k: int = 10, *, n_centroids: int = 16,
            n_probe: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding", centroid_mode: str = "ids"):
    """IVF (inverted-file) approximate kNN — the cell-probing scale path:
    every vector is assigned to its nearest of ``n_centroids`` centroid
    cells ONCE; a query exhaustively scores only its ``n_probe`` closest
    cells (n_probe/n_centroids of the corpus instead of all of it).

    ``centroid_mode="ids"`` (default) uses the vectors with ids
    0..n_centroids-1 — deterministic so a DuckDB oracle reproduces the
    identical cells; ``"kmeans"`` uses :func:`kmeans_centroids`
    (iterative Lloyd cells for clustered corpora, pytest-pinned instead
    of oracled — see its recall note). Assignment and ranking use
    round(cos, 6) with ties by id so both engines agree exactly.
    Output (query_id, rank, neighbor_id), recall < 1 by construction."""
    # centroid + query rows selected by a DISTRIBUTED filter — only the
    # ~n_centroids + |query_ids| matching rows reach the driver (same
    # pattern as knn_brute's pick). Streaming the full table through the
    # driver to select 26 rows would make this op a full-corpus pull at
    # 100 TB. centroid_mode="kmeans" replaces the id-based pick with
    # distributed spherical k-means (better recall, no SQL oracle).
    qarr = np.unique(np.fromiter((int(q) for q in query_ids), dtype=np.int64))
    want_cents = centroid_mode == "ids"

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, qarr)
        if want_cents:
            keep |= ids < n_centroids
        return batch.filter(pa.array(keep))

    rows = embeddings.select_columns([id_col, vec_col]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:  # no centroid/query rows (e.g. empty table)
        return _empty_knn_result()
    ids_all = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat_all = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if want_cents:
        cmask = ids_all < n_centroids
        cents = _unit(mat_all[cmask][np.argsort(ids_all[cmask])])
    else:
        cents = kmeans_centroids(embeddings, n_centroids,
                                 id_col=id_col, vec_col=vec_col)
    qmask = np.isin(ids_all, qarr)
    qo = np.argsort(ids_all[qmask])
    q_ids = ids_all[qmask][qo]
    q_mat = _unit(mat_all[qmask][qo])
    # per-query probe sets: n_probe closest cells (round 6dp, tie → cid)
    q_cos = np.round(q_mat @ cents.T, 6)
    # stable argsort keeps equal-cos cells in ascending-cid order — the
    # same total order as the oracle's (cos DESC, cid ASC)
    probe = np.argsort(-q_cos, axis=1, kind="stable")[:, :n_probe]
    ref = ray.put((q_ids, q_mat, cents, probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qm, cm, pr = _cached_get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _unit(_matrix(batch, vec_col))
        cell = np.argmax(np.round(m @ cm.T, 6), axis=1)  # ties → smallest
        sims = np.round(m @ qm.T, 6)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qi)):
            mask = np.isin(cell, pr[j]) & (ids != qi[j])
            cand_ids, cand_s = ids[mask], sims[mask, j]
            if len(cand_ids) > k:
                o = np.lexsort((cand_ids, -cand_s))[:k]
                cand_ids, cand_s = cand_ids[o], cand_s[o]
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
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  brute_limit: int = 100_000):
    """(a, b) with cosine(a, b) ≥ threshold, a < b.

    Size-gated dispatch: up to ``brute_limit`` vectors the exact broadcast-
    matmul runs (O(n²) but every pair, recall 1); beyond it the corpus-
    linear LSH-bucketed path (:func:`lsh_neardup_pairs`) takes over — at
    100 TB all-pairs cosine is never an option."""
    if embeddings.count() > brute_limit:
        return lsh_neardup_pairs(embeddings, threshold,
                                 id_col=id_col, vec_col=vec_col)
    ids_l, mats = [], []
    for batch in embeddings.select_columns([id_col, vec_col]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        ids_l.append(batch[id_col].to_numpy(zero_copy_only=False))
        mats.append(_matrix(batch, vec_col))
    all_ids = (np.concatenate(ids_l) if ids_l
               else np.empty(0, np.int64)).astype(np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    all_mat = _unit(np.concatenate(mats)[order] if mats
                    else np.zeros((0, 0)))
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


from functools import lru_cache


@lru_cache(maxsize=8)
def lsh_planes(dim: int, n_proj: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic md5-derived random hyperplanes, reproducible in SQL:
    plane[d, j] = md5_number('plane-{seed}-{j}-{d}') % 2^32 / 2^31 - 1
    (uniform in [-1, 1) — sign-LSH only needs symmetric directions).
    ``n_proj`` counts TOTAL projections (n_tables × n_planes)."""
    from blurrily_ray.functions.hashing import md5_num

    vals = np.array([[md5_num(f"plane-{seed}-{j}-{d}") % (1 << 32)
                      for j in range(n_proj)] for d in range(dim)],
                    dtype=np.float64)
    return vals / float(1 << 31) - 1.0


def lsh_neardup_pairs(embeddings, threshold: float = 0.95, *, n_planes: int = 16,
                      n_tables: int = 1, id_col: str = "vec_id",
                      vec_col: str = "embedding", seed: int = 42):
    """Scale path: random-hyperplane LSH — vectors agreeing on all
    ``n_planes`` sign bits of any of ``n_tables`` independent tables share
    a bucket; exact cosine is verified within buckets only and cross-table
    duplicate pairs are deduped. Per-pair recall ≈ 1 - (1 - p^k)^T with
    p = 1 - θ/π: tables are the recall lever, planes the precision lever.
    Candidate volume is corpus-linear for clustered data.

    Hyperplanes are md5-derived (:func:`lsh_planes`), so a DuckDB oracle
    regenerates the exact bucketing; sign bits use the RAW dot product
    (sign is normalization-invariant) to keep both engines bit-aligned.
    Buckets are processed via partitioned_map — all buckets of a hash
    partition vectorized together, never one UDF call per bucket."""
    def bucket(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, vec_col)
        p = lsh_planes(m.shape[1] if m.size else 0, n_tables * n_planes, seed)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bits = (m @ p) > 0  # (n, T*k); table t owns columns t*k..(t+1)*k-1
        n = len(ids)
        key_mat = np.empty((n, n_tables), dtype=np.int64)
        shifts = np.arange(n_planes, dtype=np.int64)[None, :]
        for t in range(n_tables):
            chunk = bits[:, t * n_planes:(t + 1) * n_planes]
            key_mat[:, t] = (np.int64(t) << np.int64(n_planes)) \
                + (chunk.astype(np.int64) << shifts).sum(axis=1)
        rep = np.repeat(np.arange(n), n_tables)
        return pa.table({id_col: pa.array(ids[rep]),
                         "bucket": pa.array(key_mat.reshape(-1)),
                         vec_col: batch[vec_col].combine_chunks().take(
                             pa.array(rep))})

    def within_all(df: pd.DataFrame) -> pd.DataFrame:
        """Exact-verify every bucket of the partition: sort by bucket,
        slice runs, one matmul per bucket (buckets are small by design)."""
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        df = df.sort_values("bucket", kind="stable")
        buckets = df["bucket"].to_numpy()
        ids = df[id_col].to_numpy()
        mat = _unit(np.array(df[vec_col].tolist(), dtype=np.float64))
        boundary = np.nonzero(buckets[1:] != buckets[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sims = mat[s:e] @ mat[s:e].T
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b = ids[s + ia], ids[s + ib]
            swap = a > b
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    from blurrily_ray.stages.common import partitioned_map

    raw = partitioned_map(
        embeddings.map_batches(bucket, batch_format="pyarrow"),
        ["bucket"], within_all)
    if n_tables == 1:
        return raw
    # a pair found by several tables appears once per table — global dedupe
    return partitioned_map(raw, ["a", "b"],
                           lambda df: df.drop_duplicates())


def pq_codebooks(embeddings, m: int = 8, n_codes: int = 16, *,
                 n_iters: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., "Product
    quantization for nearest neighbor search", TPAMI 2011): the vector
    space splits into ``m`` contiguous subspaces, each learning its own
    ``n_codes``-codeword euclidean k-means codebook — the compression
    tier BELOW :func:`sq_knn`'s int8 (dim·8 bits/vector → m·log2(n_codes)
    bits, 16× less than int8 at the defaults for 64-dim vectors).

    Distributed exactly like :func:`kmeans_centroids`: deterministic init
    (subvectors of ids 0..n_codes-1 via a distributed filter), then one
    ``map_batches`` pass per Lloyd round emitting m·n_codes partial
    (count, sum) rows per block — the driver reduces m·n_codes·dsub
    floats, never a corpus row. Deterministic: reruns are bit-identical,
    so the oracle can re-train and embed the codebooks as a SQL literal
    (the sql_ivf_knn_kmeans pattern). Returns float64 (m, n_codes, dsub),
    or None for a zero-row corpus.
    """
    def init_pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((ids >= 0) & (ids < n_codes)))

    init_rows = embeddings.select_columns([id_col, vec_col]).map_batches(
        init_pick, batch_format="pyarrow").take_all()
    if not init_rows:  # zero-row corpus: nothing to train
        return None
    if len(init_rows) != n_codes:
        raise ValueError(f"need ids 0..{n_codes - 1} present exactly once "
                         f"for init; got {len(init_rows)} rows")
    init_ids = np.array([r[id_col] for r in init_rows], dtype=np.int64)
    init = np.array([r[vec_col] for r in init_rows],
                    dtype=np.float64)[np.argsort(init_ids)]
    dim = init.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cb = np.stack([init[:, j * dsub:(j + 1) * dsub] for j in range(m)])

    for _ in range(n_iters):
        ref = ray.put(cb)

        def partial(batch: pa.Table) -> pa.Table:
            c = _cached_get(ref)
            x = _matrix(batch, vec_col)
            if not len(x):
                return pa.table({
                    "j": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64()))})
            js, cs, cnts, sums = [], [], [], []
            for j in range(m):
                xs = x[:, j * dsub:(j + 1) * dsub]
                d2 = ((xs[:, None, :] - c[j][None]) ** 2).sum(-1)
                code = np.argmin(d2, axis=1)  # first min = smallest c
                o = np.argsort(code, kind="stable")
                cc = code[o]
                bnd = np.nonzero(cc[1:] != cc[:-1])[0] + 1
                starts = np.concatenate(([0], bnd))
                js.append(np.full(len(starts), j, dtype=np.int64))
                cs.append(cc[starts].astype(np.int64))
                cnts.append(np.diff(np.concatenate(
                    (starts, [len(cc)]))).astype(np.int64))
                sums.extend(np.add.reduceat(xs[o], starts, axis=0))
            return pa.table({
                "j": pa.array(np.concatenate(js)),
                "c": pa.array(np.concatenate(cs)),
                "cnt": pa.array(np.concatenate(cnts)),
                "vsum": pa.array([s.tolist() for s in sums],
                                 type=pa.list_(pa.float64()))})

        rows = embeddings.select_columns([vec_col]) \
            .map_batches(partial, batch_format="pyarrow").take_all()
        # content-sorted accumulation — same rerun-determinism rationale
        # as kmeans_centroids (float += is arrival-order-sensitive)
        rows.sort(key=lambda r: (r["j"], r["c"], r["cnt"],
                                 tuple(r["vsum"])))
        sums = np.zeros((m, n_codes, dsub))
        cnts = np.zeros((m, n_codes), dtype=np.int64)
        for r in rows:
            sums[r["j"], r["c"]] += np.asarray(r["vsum"])
            cnts[r["j"], r["c"]] += r["cnt"]
        new = cb.copy()  # empty cells keep their previous codeword
        nz = cnts > 0
        new[nz] = sums[nz] / cnts[nz, None]
        if np.allclose(new, cb, atol=1e-12):
            break
        cb = new
    return cb


def _pq_micro_tab(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, dim) × (m, n_codes, dsub) → int64 (n, m, n_codes) micro
    squared distances ``floor(||x_sub − codeword||² · 1e6)`` — the
    integer contract both engines rank on (float noise ~1e-15 vs the
    1e-6 granularity, so the floor agrees)."""
    m, n_codes, dsub = cb.shape
    out = np.empty((len(x), m, n_codes), dtype=np.int64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        d2 = ((xs[:, None, :] - cb[j][None]) ** 2).sum(-1)
        out[:, j, :] = np.floor(d2 * 1_000_000.0).astype(np.int64)
    return out


def _adc_dists(q_tab: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Integer ADC: dist[i, q] = Σ_j q_tab[q, j, codes[i, j]] — the one
    accumulation both PQ rankers share."""
    dist = np.zeros((len(codes), len(q_tab)), dtype=np.int64)
    for j in range(codes.shape[1]):
        dist += q_tab[:, j, :][:, codes[:, j]].T
    return dist


def _pq_merge_fn(k: int):
    """Driver/groupby merge shared by pq_knn and ivfpq_knn: dist ASC,
    neighbor id ASC, rank 1..k."""

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["dist_micro", "neighbor_id"],
                            ascending=[True, True], kind="stable").head(k)
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy(),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
            "neighbor_id": df["neighbor_id"].to_numpy(),
            "dist_micro": df["dist_micro"].to_numpy(),
        })

    return merge


def _empty_pq_result():
    """Typed empty (query_id, rank, neighbor_id, dist_micro) Dataset."""
    from ray.data import from_arrow

    return from_arrow(pa.table({
        "query_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "dist_micro": pa.array([], pa.int64())}))


def pq_knn(embeddings, query_ids, k: int = 10, *, m: int = 8,
           n_codes: int = 16, n_iters: int = 3, id_col: str = "vec_id",
           vec_col: str = "embedding", codebooks: np.ndarray | None = None):
    """(query_id, rank, neighbor_id, dist_micro): product-quantized
    asymmetric-distance (ADC) kNN. Every corpus vector is ENCODED once to
    m codeword ids (micro-int argmin per subspace, ties → smallest id);
    a query precomputes its m × n_codes micro distance table and a
    neighbor's distance is the INTEGER sum of m table lookups — exact
    under any partitioning, so the DuckDB oracle (codebooks exported as a
    literal) matches bit-for-bit. Rank by dist ASC, neighbor id ASC,
    self excluded. 100 TB shape: the (n, m) uint8 code matrix is the
    resident artifact (m·log2(n_codes) bits/vector); raw floats stay in
    cold storage."""
    cb = codebooks if codebooks is not None else pq_codebooks(
        embeddings, m, n_codes, n_iters=n_iters,
        id_col=id_col, vec_col=vec_col)
    if cb is None:  # zero-row corpus
        return _empty_pq_result()
    m, n_codes, dsub = cb.shape
    qarr = np.unique(np.fromiter((int(q) for q in query_ids),
                                 dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qarr)))

    qrows = embeddings.select_columns([id_col, vec_col]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    if not qrows:
        return _empty_pq_result()
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qo = np.argsort(q_ids)
    q_ids = q_ids[qo]
    q_mat = np.array([r[vec_col] for r in qrows], dtype=np.float64)[qo]
    q_tab = _pq_micro_tab(q_mat, cb)  # (nq, m, n_codes) int64
    ref = ray.put((q_ids, q_tab, cb))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qt, c = _cached_get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _matrix(batch, vec_col)
        codes = np.argmin(_pq_micro_tab(x, c), axis=2)  # (n, m)
        dist = _adc_dists(qt, codes)
        out_q, out_n, out_s = [], [], []
        for qj in range(len(qi)):
            s = dist[:, qj]
            mask = ids != qi[qj]
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, cand_s))[:k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.append(np.full(len(cand_ids), qi[qj], dtype=np.int64))
            out_n.append(cand_ids)
            out_s.append(cand_s)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else np.empty(0, np.int64)),
            "neighbor_id": pa.array(np.concatenate(out_n) if out_n else np.empty(0, np.int64)),
            "dist_micro": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.int64)),
        })

    return embeddings.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(_pq_merge_fn(k),
                                        batch_format="pandas")


def ivfpq_knn(embeddings, query_ids, k: int = 10, *, n_centroids: int = 16,
              n_probe: int = 4, m: int = 8, n_codes: int = 16,
              n_iters: int = 3, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """IVF-PQ (IVFADC, Jégou et al. 2011) — the production-shape ANN:
    :func:`ivf_knn`'s cell probing composed with :func:`pq_knn`'s
    integer ADC. Every vector is assigned ONCE to its nearest of
    ``n_centroids`` cosine cells (id-pick centroids, round-6dp ties →
    cid — the exact ivf_knn contract) AND encoded once to m codeword
    ids; a query scores only its ``n_probe`` closest cells' members, by
    integer micro-distance table lookups. Both halves keep their
    oracle-exact contracts, so the composition is DuckDB-checkable end
    to end: probe CTEs from sql_ivf_knn + ADC CTEs from sql_pq_knn.
    Returns (query_id, rank, neighbor_id, dist_micro); recall < 1 by
    construction (cells prune in cosine space, ADC ranks in euclidean —
    the standard IVFADC asymmetry)."""
    cb = pq_codebooks(embeddings, m, n_codes, n_iters=n_iters,
                      id_col=id_col, vec_col=vec_col)
    if cb is None:  # zero-row corpus
        return _empty_pq_result()
    qarr = np.unique(np.fromiter((int(q) for q in query_ids),
                                 dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, qarr) | (ids < n_centroids)
        return batch.filter(pa.array(keep))

    rows = embeddings.select_columns([id_col, vec_col]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    ids_all = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat_all = np.array([r[vec_col] for r in rows], dtype=np.float64)
    cmask = ids_all < n_centroids
    cents = _unit(mat_all[cmask][np.argsort(ids_all[cmask])])
    qmask = np.isin(ids_all, qarr)
    if not qmask.any():
        return _empty_pq_result()
    qo = np.argsort(ids_all[qmask])
    q_ids = ids_all[qmask][qo]
    q_mat = mat_all[qmask][qo]
    q_tab = _pq_micro_tab(q_mat, cb)
    q_cos = np.round(_unit(q_mat) @ cents.T, 6)
    probe = np.argsort(-q_cos, axis=1, kind="stable")[:, :n_probe]
    ref = ray.put((q_ids, q_tab, probe, cents, cb))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qt, pr, cm, c = _cached_get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _matrix(batch, vec_col)
        cell = np.argmax(np.round(_unit(x) @ cm.T, 6), axis=1)
        # prune to the UNION of all queries' probed cells BEFORE encoding
        # — the point of IVF: ADC work scales with probed members, not
        # the batch (n_probe/n_centroids of it at uniform cells)
        probed = np.isin(cell, np.unique(pr))
        ids, x, cell = ids[probed], x[probed], cell[probed]
        codes = np.argmin(_pq_micro_tab(x, c), axis=2)
        dist = _adc_dists(qt, codes)
        out_q, out_n, out_s = [], [], []
        for qj in range(len(qi)):
            mask = np.isin(cell, pr[qj]) & (ids != qi[qj])
            cand_ids, cand_s = ids[mask], dist[mask, qj]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, cand_s))[:k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.append(np.full(len(cand_ids), qi[qj], dtype=np.int64))
            out_n.append(cand_ids)
            out_s.append(cand_s)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else np.empty(0, np.int64)),
            "neighbor_id": pa.array(np.concatenate(out_n) if out_n else np.empty(0, np.int64)),
            "dist_micro": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.int64)),
        })

    return embeddings.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(_pq_merge_fn(k),
                                        batch_format="pandas")
