"""Partitioned scorer actor pool — exact pair scoring with NO whole-corpus
materialization on the driver and NO corpus-sized broadcast.

This is the Ray-native analogue of the reference's ref-sorted posting
shards held in process memory (/root/reference/ext/blurrily/storage.c:
142-150, 516): per-doc trigram BITSETS are written once as hash(ref)-
partitioned Parquet shards (build_bitset_shards); scoring then routes the
candidate-pair stream so that each actor only ever needs a handful of
shards, loaded once into its cache and reused across batches
(map_batches with a callable CLASS = actor pool; setup in __init__ /
cache, work in __call__).

Dataflow (two pair-stream shuffles, zero corpus shuffles):

  raw pairs ─ shuffle by (shard(a), sub(b)) ─ dedupe + co-key filter
            ─ actor: attach bits_a/ntri_a/weight_a from shard(a)
            ─ shuffle by (shard(b), sub(a))
            ─ actor: attach bits_b, matches = popcount(AND), threshold
            → edges (a, b, matches, ntri_a, ntri_b, weight_a, weight_b)

The only per-pair payload crossing a shuffle is the a-side's SPARSE
trigram list (~2 bytes/trigram ≈ 630 B at the corpus's ~313-trigram mean
— 4.4× less than shipping the 2,744-byte bitset, which out-disked the
sf1.0 single-box run via object-store spill), paid once per DISTINCT
candidate pair; the scorer re-scatters it to bitsets batch-locally (a
vectorized flat-index fold, ~µs per thousand rows) so scoring stays the
cache-resident popcount(AND) kernel. Candidate pairs are O(corpus) after
blocking, so the exchange stays linear. Shard files store the same sparse
lists (smaller + splittable), live on shared storage (here a directory;
S3/NFS on a real cluster) and double as a reusable index artifact.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from blurrily_ray.config import DEFAULT, ERConfig
from blurrily_ray.stages.pairs import (
    _BITSET_BYTES,
    _list_csr,
    _popcount_and,
    _scatter_bits,
    _u64_of_refs,
    rel_fraction,
)

SHARD_MANIFEST = "SHARDS.json"
SHARD_FORMAT = "tris-v2"  # sparse lists in shards; bitsets built at load
_SCORE_CHUNK = 2048  # score-stage pair chunk: gather temps stay L3-resident

# Coordination-free surrogate ids (the NOTES_r4 analysis, shipped in r5):
# sur = (shard << SUR_RANK_BITS) | rank-in-ref-sorted-shard. Anyone holding
# a shard's sorted ref array recomputes the mapping, so no global map is
# built or broadcast; the id encodes its own routing (shard = sur >> bits)
# and its own shard-file CSR row (rank = sur & mask — shard files are
# written ref-sorted). 21 rank bits × ≤1024 shards keeps sur < 2^31, the
# range the packed (a<<32)|b pair exchange and int32 wire dtypes need —
# the same 2^31 id budget the reference protocol imposes (defaults.rb:8).
SUR_RANK_BITS = 21
_SUR_RANK_MASK = np.int64((1 << SUR_RANK_BITS) - 1)


def build_bitset_shards(docsets, path: str, n_shards: int, *,
                        lineage: dict | None = None) -> str:
    """docsets → ``path/shard=K/*.parquet`` of (ref, tris, ntri, weight),
    K = stable_hash(ref) % n_shards. Built fully distributed (map_batches +
    partitioned write); a manifest makes the build resumable/skippable."""
    mf = os.path.join(path, SHARD_MANIFEST)
    want = {"n_shards": n_shards, "format": SHARD_FORMAT,
            "lineage": lineage or {}}
    if os.path.exists(mf):
        with open(mf) as fh:
            have = json.load(fh)
        if {k: have.get(k) for k in want} == want:
            return path

    def with_shard(batch: pa.Table) -> pa.Table:
        r = np.asarray(batch["ref"].combine_chunks())
        if r.dtype == object:
            r = r.astype(str)
        shard = (_u64_of_refs(r) % np.uint64(n_shards)).astype(np.int64)
        return pa.table({
            "ref": batch["ref"],
            "tris": batch["tris"],
            "ntri": batch["ntri"].cast(pa.int64()),
            "weight": batch["weight"].cast(pa.int64()),
            "shard": pa.array(shard),
        })

    docsets.select_columns(["ref", "tris", "ntri", "weight"]) \
        .map_batches(with_shard, batch_format="pyarrow") \
        .write_parquet(path, partition_cols=["shard"])
    with open(mf, "w") as fh:
        json.dump({**want, "created_at": time.time()}, fh)
    return path


def build_bitset_shards_sur(docsets, path: str, n_shards: int):
    """ONE corpus co-partition, fused three ways: writes the ref-sorted
    bitset shard files (one file per shard, same row layout
    :func:`build_bitset_shards` produces), assigns every doc its
    coordination-free surrogate ``sur = (shard << SUR_RANK_BITS) | rank``
    in the shard's ref-sorted order, and returns the
    ``(sur, tris, ntri, weight)`` Dataset — so blocking emits pure-int
    keys and the whole sharded pair dataflow runs in int32-surrogate
    space (``candidate_pairs_fused_blocking`` + ``score_pairs_sharded_sur``)
    with no key-histogram shuffle and no string exchanges.

    Duplicate refs (the assume_grouped contiguity hazard) are detected
    for free by the per-shard sort and raised loudly. Shard writes are
    atomic tmp+rename with deterministic content, so Ray task retries
    are idempotent; downstream consumers only read shard files after the
    pair shuffle's groupby barrier, by which point every builder task
    has completed.

    Unlike :func:`build_bitset_shards` this build is NOT manifest-
    resumable: the surrogate assignment rides the returned dataflow, so
    skipping the build would skip blocking's input too — resume is
    handled one level up by the ``edges`` checkpoint in run_er."""
    if n_shards > (1 << (31 - SUR_RANK_BITS)):
        raise ValueError(f"n_shards={n_shards} exceeds the surrogate "
                         f"shard budget (≤ {1 << (31 - SUR_RANK_BITS)})")
    from blurrily_ray.stages.common import partitioned_map

    os.makedirs(path, exist_ok=True)
    mf = os.path.join(path, SHARD_MANIFEST)
    if os.path.exists(mf):
        os.unlink(mf)  # a stale non-sur manifest must not skip this build

    def shard_of(batch: pa.Table) -> np.ndarray:
        r = np.asarray(batch["ref"].combine_chunks())
        if r.dtype == object:
            r = r.astype(str)
        return (_u64_of_refs(r) % np.uint64(n_shards)).astype(np.int64)

    def build_one(t: pa.Table) -> pa.Table:
        refs = np.asarray(t["ref"].combine_chunks())
        if refs.dtype == object:
            refs = refs.astype(str)
        if len(refs) > (1 << SUR_RANK_BITS):
            raise ValueError(
                f"shard holds {len(refs)} docs > 2^{SUR_RANK_BITS} rank "
                f"budget; raise cfg.score_shards")
        order = np.argsort(refs, kind="stable")
        sr = refs[order]
        if len(sr) > 1:
            dup = sr[1:][sr[1:] == sr[:-1]]
            if len(dup):
                raise ValueError(
                    "duplicate ref in docsets (assume_grouped input not "
                    f"conversation-contiguous?), e.g. {dup[0]!r}. Re-run "
                    "with assume_grouped=False or sort the input by "
                    "(conv_id, turn_idx).")
        k = int(_u64_of_refs(sr[:1])[0] % np.uint64(n_shards)) \
            if len(sr) else 0
        sorted_t = t.take(pa.array(order.astype(np.int64)))
        out_file = pa.table({
            "ref": sorted_t["ref"],
            "tris": sorted_t["tris"],
            "ntri": sorted_t["ntri"].cast(pa.int64()),
            "weight": sorted_t["weight"].cast(pa.int64())})
        sdir = os.path.join(path, f"shard={k}")
        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, f".data-{os.getpid()}.tmp")
        pq.write_table(out_file, tmp)
        for f in os.listdir(sdir):  # clear stale multi-file layouts
            if f.endswith(".parquet"):
                os.unlink(os.path.join(sdir, f))
        os.replace(tmp, os.path.join(sdir, "data-0.parquet"))
        sur = (np.int64(k) << np.int64(SUR_RANK_BITS)) \
            | np.arange(len(sr), dtype=np.int64)
        return pa.table({
            "sur": pa.array(sur),
            "tris": out_file["tris"],
            "ntri": out_file["ntri"],
            "weight": out_file["weight"]})

    return partitioned_map(
        docsets.select_columns(["ref", "tris", "ntri", "weight"]),
        ["ref"], build_one, part_fn=shard_of, n_parts=n_shards,
        batch_format="pyarrow")


class _ShardCache:
    """Lazy per-actor cache of bitset shards: shard id → (ref_sorted,
    bits matrix, ntri, weight), each loaded once from Parquet. Eviction is
    FIFO with a small cap — routing gives each actor high shard locality,
    so the cap is rarely hit."""

    def __init__(self, shard_dir: str, max_shards: int = 8):
        self.shard_dir = shard_dir
        self.max_shards = max_shards
        self.cache: dict = {}

    def get(self, k: int):
        k = int(k)
        if k not in self.cache:
            if len(self.cache) >= self.max_shards:
                self.cache.pop(next(iter(self.cache)))
            tbl = pq.read_table(os.path.join(self.shard_dir, f"shard={k}"),
                                columns=["ref", "tris", "ntri", "weight"])
            refs = np.asarray(tbl["ref"].combine_chunks())
            if refs.dtype == object:
                refs = refs.astype(str)
            codes, counts = _list_csr(tbl["tris"])
            ntri = tbl["ntri"].to_numpy(zero_copy_only=False).astype(np.int64)
            wt = tbl["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(refs, kind="stable")
            # shard rows → bitset matrix ONCE per shard load (vectorized
            # scatter); per-row sparse codes kept as CSR for the a-side
            # attach, both in ref-sorted order
            bits = _scatter_bits(codes, counts)[order]
            sorted_counts = counts[order]
            offs = np.zeros(len(order) + 1, dtype=np.int64)
            np.cumsum(sorted_counts, out=offs[1:])
            starts = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            sorted_codes = np.empty(len(codes), dtype=np.uint16)
            src = np.repeat(starts[order] - offs[:-1], sorted_counts) \
                + np.arange(len(codes), dtype=np.int64)
            sorted_codes = codes[src]
            self.cache[k] = (refs[order], bits, ntri[order], wt[order],
                             sorted_codes, offs)
        return self.cache[k]

    def lookup(self, shard_of: np.ndarray, refs: np.ndarray):
        """Row-wise lookup of (bits, ntri, weight) for refs grouped by
        their shard ids — vectorized per shard present in the batch."""
        n = len(refs)
        bits = np.empty((n, _BITSET_BYTES), dtype=np.uint8)
        ntri = np.empty(n, dtype=np.int64)
        wt = np.empty(n, dtype=np.int64)
        for k in np.unique(shard_of):
            ref_sorted, sb, sn, sw, _, _ = self.get(k)
            m = shard_of == k
            idx = np.searchsorted(ref_sorted, refs[m])
            bits[m] = sb[idx]
            ntri[m] = sn[idx]
            wt[m] = sw[idx]
        return bits, ntri, wt

    def lookup_tris(self, shard_of: np.ndarray, refs: np.ndarray):
        """Row-wise lookup of (tris list array, ntri, weight) — the sparse
        payload the a-side attach ships across the b-shard shuffle."""
        n = len(refs)
        ntri = np.empty(n, dtype=np.int64)
        wt = np.empty(n, dtype=np.int64)
        counts = np.empty(n, dtype=np.int64)
        row_starts = np.empty(n, dtype=np.int64)
        for k in np.unique(shard_of):
            ref_sorted, _, sn, sw, _codes, offs = self.get(k)
            m = shard_of == k
            idx = np.searchsorted(ref_sorted, refs[m])
            ntri[m] = sn[idx]
            wt[m] = sw[idx]
            counts[m] = offs[idx + 1] - offs[idx]
            row_starts[m] = offs[idx]
        out_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=out_offs[1:])
        flat = np.empty(int(out_offs[-1]), dtype=np.uint16)
        # variable-length run gather per shard (few shards per batch)
        elem = _ranges(counts)
        dsti = np.repeat(out_offs[:-1], counts) + elem
        srci = np.repeat(row_starts, counts) + elem
        shard_of_elem = np.repeat(shard_of, counts)
        for k in np.unique(shard_of):
            _, _, _, _, codes, _ = self.get(int(k))
            m = shard_of_elem == k
            flat[dsti[m]] = codes[srci[m]]
        lst = pa.ListArray.from_arrays(
            pa.array(out_offs.astype(np.int32), type=pa.int32()),
            pa.array(flat, type=pa.uint16()))
        return lst, ntri, wt


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3, 1, 2] → [0, 1, 2, 0, 0, 1] — per-run element offsets."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _refs_np(col) -> np.ndarray:
    r = np.asarray(col)
    return r.astype(str) if r.dtype == object else r


class AttachA:
    """Actor stage 1: attach the a-side bitset from the actor-local shard.
    Input batches arrive clustered by shard(a) (upstream shuffle)."""

    def __init__(self, shard_dir: str, n_shards: int):
        self.cache = _ShardCache(shard_dir)
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = _refs_np(batch["a"])
        shard = (_u64_of_refs(a) % np.uint64(self.n_shards)).astype(np.int64)
        tris, ntri, wt = self.cache.lookup_tris(shard, a)
        return pa.table({
            "a": batch["a"], "b": batch["b"],
            "tris_a": tris,
            "ntri_a": pa.array(ntri), "weight_a": pa.array(wt),
        })


class ScoreB:
    """Actor stage 2: attach the b-side bitset, compute the exact shared-
    trigram score (popcount of AND — identical to the reference count,
    storage.c:527-563) and apply both threshold floors."""

    def __init__(self, shard_dir: str, n_shards: int, cfg: ERConfig):
        self.cache = _ShardCache(shard_dir)
        self.n_shards = n_shards
        self.cfg = cfg
        self.num, self.den = rel_fraction(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = _refs_np(batch["b"])
        shard = (_u64_of_refs(b) % np.uint64(self.n_shards)).astype(np.int64)
        bits_b, ntri_b, wt_b = self.cache.lookup(shard, b)
        # re-scatter the sparse a-side payload to a batch-local bitset
        # matrix — the cost the 4.4×-smaller exchange buys back
        codes, counts = _list_csr(batch["tris_a"])
        bits_a = _scatter_bits(codes, counts)
        m = _popcount_and(bits_a, bits_b)
        ntri_a = batch["ntri_a"].to_numpy(zero_copy_only=False)
        lo = np.minimum(ntri_a, ntri_b)
        keep = (m >= self.cfg.min_matches) & (m * self.den >= self.num * lo)
        out = pa.table({
            "a": batch["a"], "b": batch["b"], "matches": pa.array(m),
            "ntri_a": pa.array(ntri_a.astype(np.int64)),
            "ntri_b": pa.array(ntri_b),
            "weight_a": batch["weight_a"].cast(pa.int64()),
            "weight_b": pa.array(wt_b),
        })
        return out.filter(pa.array(keep))


# ---------------------------------------------------------------- packed
# Per-block DICTIONARY-packed dataflow (stages/_dictpack.py): each
# producer block ships every distinct ref once per target partition plus
# int32 codes, so both all-to-alls move n_blocks × n_parts blob rows and
# near-minimal bytes — and the a-side tris payload ships once per DISTINCT
# a per blob instead of once per pair. No global surrogate map is ever
# built (none may exist in sharded mode); dictionaries are block-local and
# unify per consumer partition in int-code space. Plain per-row string
# packing was measured slower and rejected (_packed.py docstring); the
# dictionary variant removes exactly the two costs that killed it
# (per-pair string bytes, Arrow→object rebuilds).

_CSR_CACHE: dict = {}
_CSR_CACHE_CAP = 4


def _shard_csr(shard_dir: str, k: int):
    """Process-global lazy cache of one shard's ref-sorted CSR arrays
    (ref_sorted, flat codes, per-ref offsets, ntri, weight) — shared by
    every map_groups task in the worker process, so a shard is read and
    sorted once per worker, not once per group. No bitset matrix is
    built here: consumers scatter bits only for the refs they touch."""
    key = (shard_dir, int(k))
    if key not in _CSR_CACHE:
        if len(_CSR_CACHE) >= _CSR_CACHE_CAP:
            _CSR_CACHE.pop(next(iter(_CSR_CACHE)))
        tbl = pq.read_table(os.path.join(shard_dir, f"shard={int(k)}"),
                            columns=["ref", "tris", "ntri", "weight"])
        refs = np.asarray(tbl["ref"].combine_chunks())
        if refs.dtype == object:
            refs = refs.astype(str)
        codes, counts = _list_csr(tbl["tris"])
        ntri = tbl["ntri"].to_numpy(zero_copy_only=False).astype(np.int64)
        wt = tbl["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(refs, kind="stable")
        offs = np.zeros(len(order) + 1, dtype=np.int64)
        np.cumsum(counts[order], out=offs[1:])
        starts = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        src = np.repeat(starts[order] - offs[:-1], counts[order]) \
            + np.arange(len(codes), dtype=np.int64)
        _CSR_CACHE[key] = (refs[order], codes[src], offs,
                           ntri[order], wt[order])
    return _CSR_CACHE[key]


def _gather_runs(flat: np.ndarray, offs: np.ndarray, idx: np.ndarray):
    """CSR run gather: rows ``idx`` of (flat, offs) → (flat', counts')."""
    counts = offs[idx + 1] - offs[idx]
    elem = _ranges(counts)
    return flat[np.repeat(offs[idx], counts) + elem], counts


def _take_str(arr: pa.Array, idx: np.ndarray) -> pa.Array:
    return arr.take(pa.array(idx.astype(np.int64)))


def _gather_shard_runs(shard_dir: str, n_shards: int, strs: np.ndarray):
    """Gather each ref's CSR trigram run from its hash shard, returning
    ``(flat, offs, ntri, wt)`` in ``strs`` order. Placement is fully
    vectorized — one repeat-indexed scatter per touched shard — instead
    of a per-distinct-ref Python slice loop + np.concatenate of tens of
    thousands of tiny arrays (the former hot-path shape)."""
    shard = (_u64_of_refs(strs) % np.uint64(n_shards)).astype(int)
    n = len(strs)
    counts = np.empty(n, np.int64)
    ntri = np.empty(n, np.int64)
    wt = np.empty(n, np.int64)
    per_shard = []
    for k in np.unique(shard):
        refs_s, codes_s, offs_s, ntri_s, wt_s = _shard_csr(shard_dir, k)
        m = shard == k
        idx = np.searchsorted(refs_s, strs[m])
        ntri[m] = ntri_s[idx]
        wt[m] = wt_s[idx]
        counts[m] = offs_s[idx + 1] - offs_s[idx]
        per_shard.append((np.nonzero(m)[0], idx, counts[m],
                          codes_s, offs_s))
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    flat = np.empty(int(offs[-1]), np.uint16)
    for where, idx, c, codes_s, offs_s in per_shard:
        src = np.repeat(offs_s[idx], c) + _ranges(c)
        dest = np.repeat(offs[where], c) + _ranges(c)
        flat[dest] = codes_s[src]
    return flat, offs, ntri, wt


def _gather_shard_runs_sur(shard_dir: str, sur: np.ndarray):
    """:func:`_gather_shard_runs` for surrogate ids: the shard and the CSR
    row come straight from the id's bits (shard files are ref-sorted, so
    rank IS the row) — no searchsorted, no strings anywhere."""
    shard = (sur >> np.int64(SUR_RANK_BITS)).astype(int)
    rank = (sur & _SUR_RANK_MASK).astype(np.int64)
    n = len(sur)
    counts = np.empty(n, np.int64)
    ntri = np.empty(n, np.int64)
    wt = np.empty(n, np.int64)
    per_shard = []
    for k in np.unique(shard):
        _, codes_s, offs_s, ntri_s, wt_s = _shard_csr(shard_dir, k)
        m = shard == k
        idx = rank[m]
        ntri[m] = ntri_s[idx]
        wt[m] = wt_s[idx]
        counts[m] = offs_s[idx + 1] - offs_s[idx]
        per_shard.append((np.nonzero(m)[0], idx, counts[m],
                          codes_s, offs_s))
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    flat = np.empty(int(offs[-1]), np.uint16)
    for where, idx, c, codes_s, offs_s in per_shard:
        src = np.repeat(offs_s[idx], c) + _ranges(c)
        dest = np.repeat(offs[where], c) + _ranges(c)
        flat[dest] = codes_s[src]
    return flat, offs, ntri, wt


def _refs_of_surs(shard_dir: str, sur: np.ndarray) -> np.ndarray:
    """Surrogate ids → original ref values (object array — shard string
    widths differ). Only ever called on SURVIVING edges, so the per-shard
    CSR cache is warm and the volume is tiny."""
    shard = (sur >> np.int64(SUR_RANK_BITS)).astype(int)
    rank = (sur & _SUR_RANK_MASK).astype(np.int64)
    out = np.empty(len(sur), dtype=object)
    for k in np.unique(shard):
        refs_s = _shard_csr(shard_dir, int(k))[0]
        m = shard == k
        out[m] = refs_s[rank[m]]
    return out


def _dedupe_attach_sur_fn(shard_dir: str, sub2: int, cfg: ERConfig):
    """Consumer of the packed (ab, n) exchange / producer of exchange 2,
    all in surrogate space: dedupe + co-key filter in int64, attach the
    a-side sparse tris by DIRECT CSR row (rank bits), and re-pack per
    b-shard partition with pure-int framing — no dictionaries, since a
    surrogate is already its own 4-byte code."""
    from blurrily_ray.stages._dictpack import pack_blobs

    empty = pa.table({"_part": pa.array([], pa.int64()),
                      "blob": pa.array([], pa.large_binary())})

    def run(df: pd.DataFrame):
        if not len(df):
            return empty
        ab = df["ab"].to_numpy()
        n = df["n"].to_numpy()
        uniq, inv = np.unique(ab, return_inverse=True)
        if cfg.min_cokeys > 1:
            sums = np.bincount(inv, weights=n.astype(np.float64))
            uniq = uniq[sums >= cfg.min_cokeys]
        if not len(uniq):
            return empty
        a = uniq >> np.int64(32)
        b = uniq & np.int64(0xFFFFFFFF)
        ua, la = np.unique(a, return_inverse=True)
        tri_flat, tri_offs, ntri_u, wt_u = _gather_shard_runs_sur(
            shard_dir, ua)
        sh_b = (b >> np.int64(SUR_RANK_BITS)).astype(np.uint64)
        part2 = (sh_b * np.uint64(sub2)
                 + _u64_of_refs(b) % np.uint64(sub2)).astype(np.int64)
        order = np.argsort(part2, kind="stable")
        la, b, part2 = la[order], b[order], part2[order]
        bnd = np.nonzero(part2[1:] != part2[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(part2)]))
        parts_out, blobs = [], []
        for s, e in zip(starts, ends):
            pres_a = np.unique(la[s:e])
            seg_tris, seg_counts = _gather_runs(tri_flat, tri_offs, pres_a)
            seg_toffs = np.zeros(len(pres_a) + 1, np.int64)
            np.cumsum(seg_counts, out=seg_toffs[1:])
            code_a = np.searchsorted(pres_a, la[s:e])
            header = np.array([e - s, len(pres_a), len(seg_tris)],
                              dtype=np.int64)
            blobs.append([
                header,
                ua[pres_a].astype(np.int32),
                seg_toffs.astype(np.int32), seg_tris,
                ntri_u[pres_a].astype(np.int32), wt_u[pres_a],
                code_a.astype(np.int32), b[s:e].astype(np.int32)])
            parts_out.append(part2[s])
        return pack_blobs(np.asarray(parts_out, dtype=np.int64), blobs)

    return run


def _score_blobs_sur_fn(shard_dir: str, cfg: ERConfig):
    """Consumer of exchange 2 in surrogate space: gather b-side CSR runs
    by rank once per DISTINCT b across the partition, scatter bitsets,
    score with the chunked popcount(AND) kernel, threshold, and
    materialize ref values only for survivors — swapped into the
    broadcast path's canonical orientation (a < b in ref order) so edge
    rows are identical across scoring modes."""
    from blurrily_ray.stages._dictpack import iter_blobs
    from blurrily_ray.stages.pairs import _scatter_bits

    num, den = rel_fraction(cfg)
    out_schema = pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("matches", pa.int64()),
        ("ntri_a", pa.int64()), ("ntri_b", pa.int64()),
        ("weight_a", pa.int64()), ("weight_b", pa.int64())])
    empty = out_schema.empty_table()

    def run(t: pa.Table) -> pa.Table:
        parsed, all_b = [], []
        for r in iter_blobs(t):
            n_pairs, n_ua, tris_len = (int(x) for x in r.seg(3, np.int64))
            ua = r.seg(n_ua, np.int32)
            toffs = r.seg(n_ua + 1, np.int32)
            tris = r.seg(tris_len, np.uint16)
            ntri_a = r.seg(n_ua, np.int32)
            wt_a = r.seg(n_ua, np.int64)
            code_a = r.seg(n_pairs, np.int32)
            b = r.seg(n_pairs, np.int32)
            parsed.append((ua, toffs, tris, ntri_a, wt_a, code_a, b))
            all_b.append(b)
        if not parsed:
            return empty
        ub = np.unique(np.concatenate(all_b).astype(np.int64))
        flat_b, offs_b, ntri_b_u, wt_b_u = _gather_shard_runs_sur(
            shard_dir, ub)
        bits_b = _scatter_bits(flat_b, np.diff(offs_b))
        outs = []
        for ua, toffs, tris, ntri_a, wt_a, code_a, b in parsed:
            bits_a = _scatter_bits(tris, np.diff(toffs.astype(np.int64)))
            bcode = np.searchsorted(ub, b.astype(np.int64))
            m = np.empty(len(code_a), np.int64)
            for s in range(0, len(code_a), _SCORE_CHUNK):
                e = min(s + _SCORE_CHUNK, len(code_a))
                m[s:e] = _popcount_and(bits_a[code_a[s:e]],
                                       bits_b[bcode[s:e]])
            na = ntri_a.astype(np.int64)[code_a]
            nb_c = ntri_b_u[bcode]
            lo = np.minimum(na, nb_c)
            keep = (m >= cfg.min_matches) & (m * den >= num * lo)
            if not keep.any():
                continue
            ka, kb = code_a[keep], bcode[keep]
            a_ref = _refs_of_surs(shard_dir, ua.astype(np.int64)[ka])
            b_ref = _refs_of_surs(shard_dir, ub[kb])
            wa = wt_a[ka]
            wb = wt_b_u[kb]
            na_k, nb_k = na[keep], nb_c[keep]
            swap = a_ref > b_ref  # canonical a < b in REF order (the
            # broadcast path's orientation — its surrogates are positions
            # in the globally ref-sorted array; ours are (shard, rank))
            if swap.any():
                a_ref[swap], b_ref[swap] = b_ref[swap], a_ref[swap].copy()
                wa = np.where(swap, wb, wa)
                wb = np.where(swap, wt_a[ka], wb)
                na_s = np.where(swap, nb_k, na_k)
                nb_k = np.where(swap, na[keep], nb_k)
                na_k = na_s
            outs.append(pa.table({
                "a": pa.array(a_ref, type=pa.string()),
                "b": pa.array(b_ref, type=pa.string()),
                "matches": pa.array(m[keep]),
                "ntri_a": pa.array(na_k), "ntri_b": pa.array(nb_k),
                "weight_a": pa.array(wa.astype(np.int64)),
                "weight_b": pa.array(wb.astype(np.int64)),
            }, schema=out_schema))
        return pa.concat_tables(outs) if outs else empty

    return run


def score_pairs_sharded_sur(raw_pairs, shard_dir: str,
                            cfg: ERConfig = DEFAULT, *,
                            n_shards: int | None = None):
    """Surrogate-space sharded scoring — consumes the PACKED ``(ab, n)``
    pair stream of :func:`pairs.candidate_pairs_fused_blocking` over
    :func:`build_bitset_shards_sur` ids. Exchange 1 is a pure fixed-width
    int blob exchange (``packed_cols`` — the generic packer; no string
    dictionaries exist to ship); the consumer fuses dedupe + co-key
    filter + a-side CSR attach BY ROW INDEX; exchange 2 ships int-framed
    tris blobs to b-shard partitions; strings materialize only for
    surviving edges. Together with int-key fused blocking this removes
    the sharded path's key-histogram shuffle and every string exchange
    (NOTES_r4's round-5 candidate #5 / VERDICT r4 next #4)."""
    import ray

    from blurrily_ray.stages.common import partitioned_map

    n_shards = n_shards or cfg.score_shards
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    sub = max(2, -(-max(cfg.join_partitions, 2 * n_cpus) // n_shards))
    sub2 = max(1, -(-2 * n_cpus // n_shards))

    def part1(batch: pa.Table) -> np.ndarray:
        ab = batch["ab"].to_numpy(zero_copy_only=False)
        a = ab >> np.int64(32)
        b = ab & np.int64(0xFFFFFFFF)
        sh_a = (a >> np.int64(SUR_RANK_BITS)).astype(np.uint64)
        return (sh_a * np.uint64(sub)
                + _u64_of_refs(b) % np.uint64(sub)).astype(np.int64)

    packed1 = partitioned_map(
        raw_pairs, ["ab"], _dedupe_attach_sur_fn(shard_dir, sub2, cfg),
        part_fn=part1, n_parts=n_shards * sub,
        packed_cols={"ab": np.int64, "n": np.uint16})
    return packed1.groupby("_part").map_groups(
        _score_blobs_sur_fn(shard_dir, cfg), batch_format="pyarrow")


def _pack_pairs_fn(n_shards: int, sub: int):
    """Producer stage of exchange 1: raw (a, b[, n]) rows → one
    dictionary-packed blob per (block, partition), partition =
    shard(a)·sub + hash(b) % sub (all copies of a pair co-locate; every
    partition is homogeneous in shard(a) for the attach)."""
    import pyarrow.compute as pc

    from blurrily_ray.stages._dictpack import pack_blobs, str_segments

    def pack(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pack_blobs(np.empty(0, np.int64), [])
        enc_a = pc.dictionary_encode(batch["a"].combine_chunks())
        enc_b = pc.dictionary_encode(batch["b"].combine_chunks())
        ca = enc_a.indices.to_numpy(zero_copy_only=False)
        cb = enc_b.indices.to_numpy(zero_copy_only=False)
        # hash UNIQUE refs only (string hashing is the per-row cost the
        # dictionary removes), then broadcast through the codes
        ha = _u64_of_refs(np.asarray(enc_a.dictionary).astype(str))
        hb = _u64_of_refs(np.asarray(enc_b.dictionary).astype(str))
        part = ((ha % np.uint64(n_shards))[ca] * np.uint64(sub)
                + (hb % np.uint64(sub))[cb]).astype(np.int64)
        n = (batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
             if "n" in batch.column_names
             else np.ones(len(batch), dtype=np.int64))
        if len(n) and n.max() > np.iinfo(np.int32).max:
            raise OverflowError("co-key count exceeds int32 wire dtype")
        order = np.argsort(part, kind="stable")
        ca, cb, n, part = ca[order], cb[order], n[order], part[order]
        bnd = np.nonzero(part[1:] != part[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(part)]))
        parts_out, blobs = [], []
        for s, e in zip(starts, ends):
            pres_a = np.unique(ca[s:e])
            pres_b = np.unique(cb[s:e])
            seg_strs = pa.concat_arrays(
                [_take_str(enc_a.dictionary, pres_a),
                 _take_str(enc_b.dictionary, pres_b)])
            enc = pc.dictionary_encode(seg_strs)
            gmap = enc.indices.to_numpy(zero_copy_only=False)
            code_a = gmap[np.searchsorted(pres_a, ca[s:e])]
            code_b = gmap[len(pres_a):][np.searchsorted(pres_b, cb[s:e])]
            offs, data = str_segments(enc.dictionary)
            header = np.array([e - s, len(enc.dictionary), len(data)],
                              dtype=np.int64)
            blobs.append([header, offs, data,
                          code_a.astype(np.int32),
                          code_b.astype(np.int32),
                          n[s:e].astype(np.int32)])
            parts_out.append(part[s])
        return pack_blobs(np.asarray(parts_out, dtype=np.int64), blobs)

    return pack


def _dedupe_attach_fn(shard_dir: str, n_shards: int, sub2: int,
                      cfg: ERConfig):
    """Consumer of exchange 1 / producer of exchange 2, one fused group
    task: unify the partition's blob dictionaries, dedupe + co-key-filter
    pairs in int-code space, attach the a-side sparse tris from the
    partition's (single) a-shard ONCE PER DISTINCT a, and re-pack per
    b-shard partition — the tris payload crosses the second exchange once
    per distinct (a, blob), not once per pair."""
    import pyarrow.compute as pc

    from blurrily_ray.stages._dictpack import (
        iter_blobs, pack_blobs, str_from_segments, str_segments,
        unify_dicts)

    empty = pa.table({"_part": pa.array([], pa.int64()),
                      "blob": pa.array([], pa.large_binary())})

    def run(t: pa.Table) -> pa.Table:
        dicts, codes_a, codes_b, ns = [], [], [], []
        for r in iter_blobs(t):
            n_rows, n_uniq, nbytes = (int(x) for x in r.seg(3, np.int64))
            offs = r.seg(n_uniq + 1, np.int32)
            data = r.seg(nbytes, np.uint8)
            dicts.append(str_from_segments(offs, data))
            codes_a.append(r.seg(n_rows, np.int32))
            codes_b.append(r.seg(n_rows, np.int32))
            ns.append(r.seg(n_rows, np.int32))
        if not dicts:
            return empty
        gdict, remaps = unify_dicts(dicts)
        ga = np.concatenate([m[c] for m, c in zip(remaps, codes_a)])
        gb = np.concatenate([m[c] for m, c in zip(remaps, codes_b)])
        n = np.concatenate(ns).astype(np.int64)
        G = len(gdict)
        key = ga.astype(np.int64) * G + gb
        uniq, inv = np.unique(key, return_inverse=True)
        if cfg.min_cokeys > 1:
            sums = np.bincount(inv, weights=n.astype(np.float64))
            uniq = uniq[sums >= cfg.min_cokeys]
        if not len(uniq):
            return empty
        pa_c = (uniq // G).astype(np.int64)
        pb_c = (uniq % G).astype(np.int64)

        # a-side attach per DISTINCT a (partition is homogeneous in
        # shard(a), but group by hash anyway — robustness over labels)
        ua = np.unique(pa_c)
        a_str = np.asarray(_take_str(gdict, ua)).astype(str)
        tri_flat, tri_offs_u, ntri_u, wt_u = _gather_shard_runs(
            shard_dir, n_shards, a_str)

        # b-side routing per DISTINCT b
        ub = np.unique(pb_c)
        b_str = np.asarray(_take_str(gdict, ub)).astype(str)
        hb = _u64_of_refs(b_str)
        part2_u = ((hb % np.uint64(n_shards)) * np.uint64(sub2)
                   + ((hb >> np.uint64(32)) % np.uint64(sub2))
                   ).astype(np.int64)
        la = np.searchsorted(ua, pa_c)  # pair → index into ua
        lb = np.searchsorted(ub, pb_c)
        part2 = part2_u[lb]
        order = np.argsort(part2, kind="stable")
        la, lb, part2 = la[order], lb[order], part2[order]
        bnd = np.nonzero(part2[1:] != part2[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(part2)]))
        parts_out, blobs = [], []
        a_dict_arr = _take_str(gdict, ua)
        b_dict_arr = _take_str(gdict, ub)
        for s, e in zip(starts, ends):
            pres_a = np.unique(la[s:e])
            pres_b = np.unique(lb[s:e])
            seg_a = _take_str(a_dict_arr, pres_a)
            seg_b = _take_str(b_dict_arr, pres_b)
            a_offs, a_data = str_segments(seg_a)
            b_offs, b_data = str_segments(seg_b)
            seg_tris, seg_counts = _gather_runs(
                tri_flat, tri_offs_u, pres_a)
            seg_toffs = np.zeros(len(pres_a) + 1, np.int64)
            np.cumsum(seg_counts, out=seg_toffs[1:])
            code_a = np.searchsorted(pres_a, la[s:e])
            code_b = np.searchsorted(pres_b, lb[s:e])
            header = np.array(
                [e - s, len(pres_a), len(pres_b), len(a_data),
                 len(b_data), len(seg_tris)], dtype=np.int64)
            blobs.append([
                header, a_offs, a_data,
                seg_toffs.astype(np.int32), seg_tris,
                ntri_u[pres_a].astype(np.int32), wt_u[pres_a],
                b_offs, b_data,
                code_a.astype(np.int32), code_b.astype(np.int32)])
            parts_out.append(part2[s])
        return pack_blobs(np.asarray(parts_out, dtype=np.int64), blobs)

    return run


def _score_blobs_fn(shard_dir: str, n_shards: int, cfg: ERConfig):
    """Consumer of exchange 2: per partition, unify the blobs' b
    dictionaries, scatter bitsets once per DISTINCT ref on each side,
    score with the popcount(AND) kernel (storage.c:527-563) in
    cache-bounded pair chunks, and materialize strings only for pairs
    that survive both thresholds."""
    from blurrily_ray.stages._dictpack import (
        iter_blobs, str_from_segments, unify_dicts)
    from blurrily_ray.stages.pairs import _scatter_bits

    num, den = rel_fraction(cfg)
    out_schema = pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("matches", pa.int64()),
        ("ntri_a", pa.int64()), ("ntri_b", pa.int64()),
        ("weight_a", pa.int64()), ("weight_b", pa.int64())])
    empty = out_schema.empty_table()
    prof = bool(os.environ.get("BLURRILY_PROF"))

    def run(t: pa.Table) -> pa.Table:
        tp = time.perf_counter
        t0 = tp()
        parsed = []
        b_dicts = []
        for r in iter_blobs(t):
            (n_pairs, n_ua, n_ub, a_bytes, b_bytes,
             tris_len) = (int(x) for x in r.seg(6, np.int64))
            a_offs = r.seg(n_ua + 1, np.int32)
            a_data = r.seg(a_bytes, np.uint8)
            toffs = r.seg(n_ua + 1, np.int32)
            tris = r.seg(tris_len, np.uint16)
            ntri_a = r.seg(n_ua, np.int32)
            wt_a = r.seg(n_ua, np.int64)
            b_offs = r.seg(n_ub + 1, np.int32)
            b_data = r.seg(b_bytes, np.uint8)
            code_a = r.seg(n_pairs, np.int32)
            code_b = r.seg(n_pairs, np.int32)
            a_dict = str_from_segments(a_offs, a_data)
            b_dict = str_from_segments(b_offs, b_data)
            parsed.append((a_dict, b_dict, toffs, tris, ntri_a, wt_a,
                           code_a, code_b))
            b_dicts.append(b_dict)
        if not parsed:
            return empty
        t1 = tp()
        # bitsets once per DISTINCT b across the whole partition
        gb_dict, remaps = unify_dicts(b_dicts)
        t2 = tp()
        b_str = np.asarray(gb_dict).astype(str)
        flat_b, offs_b, ntri_b_u, wt_b_u = _gather_shard_runs(
            shard_dir, n_shards, b_str)
        t3 = tp()
        bits_b = _scatter_bits(flat_b, np.diff(offs_b))
        t4 = tp()
        ph = {"scatter_a": 0.0, "pop": 0.0, "thresh": 0.0, "strs": 0.0}

        outs = []
        for bi, (a_dict, b_dict, toffs, tris, ntri_a, wt_a,
                 code_a, code_b) in enumerate(parsed):
            u0 = tp()
            bits_a = _scatter_bits(tris, np.diff(toffs.astype(np.int64)))
            ph["scatter_a"] += tp() - u0
            gcb = remaps[bi][code_b]
            ntri_a64 = ntri_a.astype(np.int64)
            # pairs arrive (a, b)-sorted from the producer's np.unique —
            # no re-sort needed; 2048-pair outer chunks keep the two
            # gather temporaries ~5.6 MB/side (L3-resident) instead of
            # the former 16k-row ~45 MB/side DRAM streams. Sorted-input
            # sweep: 512-2048 plateau at 1.5-1.7x over 16384; 65536 is
            # 0.8x (micro_score_chunk2, 2 M pairs x 6 k distinct)
            u0 = tp()
            m = np.empty(len(code_a), np.int64)
            for s in range(0, len(code_a), _SCORE_CHUNK):
                e = min(s + _SCORE_CHUNK, len(code_a))
                m[s:e] = _popcount_and(bits_a[code_a[s:e]],
                                       bits_b[gcb[s:e]])
            ph["pop"] += tp() - u0
            u0 = tp()
            na = ntri_a64[code_a]
            nb_c = ntri_b_u[gcb]
            lo = np.minimum(na, nb_c)
            keep = (m >= cfg.min_matches) & (m * den >= num * lo)
            ph["thresh"] += tp() - u0
            if not keep.any():
                continue
            u0 = tp()
            ka, kb = code_a[keep], gcb[keep]
            outs.append(pa.table({
                "a": _take_str(a_dict, ka),
                "b": _take_str(gb_dict, kb),
                "matches": pa.array(m[keep]),
                "ntri_a": pa.array(na[keep]),
                "ntri_b": pa.array(nb_c[keep]),
                "weight_a": pa.array(wt_a.astype(np.int64)[ka]),
                "weight_b": pa.array(wt_b_u[kb]),
            }, schema=out_schema))
            ph["strs"] += tp() - u0
        if prof:
            import sys

            print(f"PROF-SCORE parse={t1 - t0:.3f} unify={t2 - t1:.3f} "
                  f"gather_b={t3 - t2:.3f} scatter_b={t4 - t3:.3f} "
                  f"scatter_a={ph['scatter_a']:.3f} pop={ph['pop']:.3f} "
                  f"thresh={ph['thresh']:.3f} strs={ph['strs']:.3f} "
                  f"total={tp() - t0:.3f}", file=sys.stderr)
        return pa.concat_tables(outs) if outs else empty

    return run


def score_pairs_sharded(raw_pairs, shard_dir: str, cfg: ERConfig = DEFAULT,
                        *, n_shards: int | None = None,
                        concurrency: tuple[int, int] | None = None,
                        packed: bool = True):
    """Raw candidate pairs (with per-partition co-key counts ``n``) →
    thresholded edges, with NOTHING corpus-sized on the driver.

    ``packed=True`` (default) runs the dictionary-packed dataflow: both
    all-to-alls move blob rows (see the packed section above), dedupe +
    a-side attach fuse into one group task, and the b-side scoring group
    scatters bitsets once per distinct ref. ``packed=False`` keeps the
    scalar-row actor-pool dataflow (the module docstring's original
    shape) — retained as the semantics pin for tests.

    Correctness does not depend on batch/shard alignment — consumers
    group-lookup whatever shards their rows hash to — the routing only
    buys locality so each group task touches few shards."""
    import ray

    n_shards = n_shards or cfg.score_shards
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    if concurrency is None:
        concurrency = (1, max(2, n_cpus))

    if packed:
        sub = max(2, -(-max(cfg.join_partitions, 2 * n_cpus) // n_shards))
        sub2 = max(1, -(-2 * n_cpus // n_shards))
        packed1 = raw_pairs.map_batches(
            _pack_pairs_fn(n_shards, sub), batch_format="pyarrow",
            batch_size=None)
        attached = packed1.groupby("_part").map_groups(
            _dedupe_attach_fn(shard_dir, n_shards, sub2, cfg),
            batch_format="pyarrow")
        return attached.groupby("_part").map_groups(
            _score_blobs_fn(shard_dir, n_shards, cfg),
            batch_format="pyarrow")

    from blurrily_ray.stages.common import partitioned_map

    def dedupe_cokeys(df: pd.DataFrame) -> pd.DataFrame:
        """All copies of an (a, b) pair share the partition key, so the
        summed ``n`` is the exact global co-key count (same contract as
        score_pairs_fused)."""
        n = df["n"] if "n" in df.columns else pd.Series(
            np.ones(len(df), dtype=np.int64), index=df.index)
        if cfg.min_cokeys > 1:
            counts = df.assign(_n=n).groupby(["a", "b"], sort=False)["_n"].sum()
            counts = counts[counts >= cfg.min_cokeys]
            out = counts.reset_index()[["a", "b"]]
        else:
            out = df[["a", "b"]].drop_duplicates()
        return out

    # shuffle 1 FUSES co-key dedupe with a-shard locality: partition id =
    # shard(a)·sub + hash(b) % sub. Every copy of an (a, b) pair shares
    # both a and b → co-partitioned (dedupe/count stays exact); every
    # output partition is homogeneous in shard(a) → AttachA locality
    # without the second routing shuffle the first version paid for.
    sub = max(2, -(-max(cfg.join_partitions, 2 * n_shards) // n_shards))

    def part_a(batch: pa.Table) -> np.ndarray:
        a = _refs_np(np.asarray(batch["a"].combine_chunks()))
        b = _refs_np(np.asarray(batch["b"].combine_chunks()))
        ra = _u64_of_refs(a) % np.uint64(n_shards)
        return (ra * np.uint64(sub)
                + _u64_of_refs(b) % np.uint64(sub)).astype(np.int64)

    deduped = partitioned_map(raw_pairs, ["a", "b"], dedupe_cokeys,
                              part_fn=part_a, n_parts=n_shards * sub)
    attached = deduped.map_batches(
        AttachA, fn_constructor_args=(shard_dir, n_shards),
        batch_size=16384, batch_format="pyarrow", concurrency=concurrency)

    # shuffle 2: cluster by b-shard for the score-side attach (this one
    # carries the sparse ~2·ntri-byte tris_a payload — the linear-in-pairs
    # cost the module docstring budgets for)
    def part_b(batch: pa.Table) -> np.ndarray:
        b = _refs_np(np.asarray(batch["b"].combine_chunks()))
        return (_u64_of_refs(b) % np.uint64(n_shards)).astype(np.int64)

    routed_b = partitioned_map(attached, ["b"], lambda t: t,
                               part_fn=part_b, n_parts=n_shards,
                               batch_format="pyarrow")
    edges = routed_b.map_batches(
        ScoreB, fn_constructor_args=(shard_dir, n_shards, cfg),
        batch_size=16384, batch_format="pyarrow", concurrency=concurrency)
    return edges
