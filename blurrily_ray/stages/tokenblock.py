"""Schema-agnostic token blocking (+ block purging / salting).

The canonical blocking family of the meta-blocking literature
(Papadakis et al.: every distinct word token of a record is a blocking
key; oversized blocks are purged): complements the engine's
reference-faithful trigram blocking with the standard word-granularity
scheme, and produces the same (a, b, cbs) blocking-graph edge list the
meta-blocking pruners (stages/metablock.wep_prune / cnp_prune) consume
— token blocking is exactly the input those papers prune.

Dataflow reuses the ENTIRE salted pair-generation machinery
(stages/pairs.candidate_pairs): a distributed key histogram, hot-key
salting into bucket pairs (pair-exactness pinned by
test_salting_preserves_pairs), super-hot purging BEFORE the shuffle
(the literature's block purging — a stopword's block carries no
discriminative signal and would quadratically blow a partition), and
the packed (ab, n) exchange whose per-partition counts sum to the exact
global common-token weight.

Hashes are md5-derived (functions/hashing.md5_num % 2⁶¹−1) so the
DuckDB oracle recomputes every key bit-for-bit (the dedup-shingle
convention); token-hash collisions are therefore IDENTICAL in both
engines and cannot cause divergence. Tokenization: ``\\S+`` runs of
lower(text) — the dedup/_shingles convention, mirrored by the TOKS SQL
fragment.

Ref handling: the surrogate LUT is a sorted ref array broadcast once
(ray.put, fetched per worker) — the broadcast-path convention with the
same size gate as the bitset LUT; beyond the gate the sharded scorer's
coordination-free surrogates are the documented path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from blurrily_ray.config import ERConfig
from blurrily_ray.functions.hashing import MERSENNE61, md5_num

# block purging via the standard stoplist: blocks over
# block_cap·salt_factor_max (=256) records drop pre-shuffle; blocks in
# (64, 256] salt into bucket pairs. min_cokeys=1: the blocking GRAPH
# keeps weight-1 edges (the pruners, not a fixed floor, decide).
TOKEN_MODE = ERConfig(blocking_mode="trigram", min_cokeys=1,
                      stoplist_cap=None)


def _ref_lut(docs, ref_col: str):
    """Sorted distinct-ref array, broadcast: surrogate id = sorted rank
    (the bitset LUT's positional convention, minus the bitsets)."""
    import ray as _ray

    parts = []
    for batch in docs.select_columns([ref_col]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        parts.append(batch[ref_col].to_numpy(zero_copy_only=False))
    refs = np.unique(np.concatenate(parts)) if parts else np.array([])
    if len(refs) >= (1 << 31):
        raise ValueError("token blocking's broadcast ref LUT caps at "
                         "2^31 refs; use the sharded surrogate path")
    # 1-tuple: the pruners index the broadcast as lut[0] (the bitset
    # LUT's layout, minus the bitsets)
    return _ray.put((refs,)), refs.dtype


def token_keys(docs, lut_ref, *, ref_col: str = "doc_id",
               text_col: str = "text"):
    """(key, ref) emissions: one row per DISTINCT token per document,
    key = md5_num(token) % (2⁶¹−1) over ``\\S+`` runs of lower(text),
    ref = int32 surrogate rank."""
    from blurrily_ray.stages.dedup import _TOKEN_RE
    from blurrily_ray.stages.pairs import _cached_get

    def emit(t: pa.Table) -> pa.Table:
        ref_sorted = _cached_get(lut_ref)[0]
        refs = t[ref_col].to_numpy(zero_copy_only=False)
        sur = np.searchsorted(ref_sorted, refs).astype(np.int32)
        texts = t[text_col].to_pylist()
        keys, out_refs = [], []
        for i, txt in enumerate(texts):
            hs = {md5_num(w) % MERSENNE61
                  for w in _TOKEN_RE.findall((txt or "").lower())}
            if hs:
                keys.append(np.fromiter(hs, dtype=np.int64, count=len(hs)))
                out_refs.append(np.full(len(hs), sur[i], dtype=np.int32))
        if not keys:
            return pa.table({"key": pa.array([], pa.int64()),
                             "ref": pa.array([], pa.int32())})
        return pa.table({"key": pa.array(np.concatenate(keys)),
                         "ref": pa.array(np.concatenate(out_refs))})

    return docs.map_batches(emit, batch_format="pyarrow")


def token_blocking_graph(docs, cfg: ERConfig = TOKEN_MODE, *,
                         ref_col: str = "doc_id", text_col: str = "text"):
    """docs → (cbs_edges Dataset of (ab, w), lut_ref, ref dtype): the
    token-blocking graph with exact common-token weights, hot tokens
    salted and super-hot tokens purged pre-shuffle."""
    from blurrily_ray.stages.metablock import cbs_edge_weights
    from blurrily_ray.stages.pairs import candidate_pairs, key_histogram

    lut_ref, ref_dtype = _ref_lut(docs, ref_col)
    keys = token_keys(docs, lut_ref, ref_col=ref_col,
                      text_col=text_col).materialize()
    raw, _ = candidate_pairs(keys, key_histogram(keys, cfg), cfg,
                             distinct=False, pack_int32=True)
    return cbs_edge_weights(raw), lut_ref, ref_dtype


def token_blocking_pairs(docs, cfg: ERConfig = TOKEN_MODE, *,
                         ref_col: str = "doc_id", text_col: str = "text"):
    """The full token-blocking candidate edge list: (a, b, cbs) for
    every pair co-occurring in ≥1 surviving token block, cbs = exact
    number of shared kept tokens (oracle: oracles.sql_token_pairs)."""
    from blurrily_ray.stages.pairs import _cached_get

    cbs, lut_ref, ref_dtype = token_blocking_graph(
        docs, cfg, ref_col=ref_col, text_col=text_col)
    ref_type = pa.from_numpy_dtype(ref_dtype) if ref_dtype != object \
        else pa.string()

    def typed_empty():
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], type=ref_type),
            "b": pa.array([], type=ref_type),
            "cbs": pa.array([], type=pa.int64())}))

    if cbs.schema() is None:
        return typed_empty()

    def restore(t: pa.Table) -> pa.Table:
        ref_sorted = _cached_get(lut_ref)[0]
        ab = t["ab"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(ref_sorted[(ab >> np.int64(32)).astype(np.int64)],
                          type=ref_type),
            "b": pa.array(ref_sorted[(ab & np.int64(0xFFFFFFFF))
                                     .astype(np.int64)], type=ref_type),
            "cbs": pa.array(t["w"].to_numpy(zero_copy_only=False),
                            type=pa.int64())})

    out = cbs.map_batches(restore, batch_format="pyarrow")
    # an all-purged / empty graph leaves zero blocks → no schema to
    # infer; hand downstream the typed contract instead
    return out if out.schema() is not None else typed_empty()


def token_meta_wep(docs, cfg: ERConfig = TOKEN_MODE, *,
                   ref_col: str = "doc_id", text_col: str = "text"):
    """The published meta-blocking workflow end-to-end on its canonical
    input: token-blocking graph → CBS weights → weighted edge pruning
    (oracle: oracles.sql_token_meta_wep)."""
    from blurrily_ray.stages.metablock import wep_prune

    cbs, lut_ref, ref_dtype = token_blocking_graph(
        docs, cfg, ref_col=ref_col, text_col=text_col)
    ref_type = pa.from_numpy_dtype(ref_dtype) if ref_dtype != object \
        else pa.string()
    return wep_prune(cbs.materialize(), lut_ref, ref_type=ref_type)
