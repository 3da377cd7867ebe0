"""Blocking, candidate pair generation and exact pair scoring.

Design (SURVEY.md §7 step 3-4, north_rule "partitioning / shuffle / skew
handled explicitly"):

1. **Exact trigram histogram** — the key space is only 28³ = 21,952 codes,
   so skew decisions use exact counts, not sketches: per-batch bincount →
   tiny (trigram, n) partial rows → groupby sum → one 21,952-long array on
   the driver, broadcast into every subsequent stage closure.

2. **Blocking keys = each doc's rarest trigrams.** A trigram shared by half
   the corpus generates O(n²) candidate pairs and zero signal (the
   reference calls such inputs "pathological", README.md:15-17). Each doc
   emits at most ``max_keys_per_doc`` of its globally-rarest trigrams
   (ties broken by code). Two docs that really match share most of their
   trigram sets — including the rare ones — so the probability both miss
   every shared key decays geometrically in the key count. At small corpus
   scale every trigram is rare and this degenerates to full trigram
   blocking (reference behavior).

3. **Explicit salting of hot keys.** Keys whose *emitted* count n exceeds
   ``block_cap`` are split into s = ceil(n/cap) buckets by a stable hash of
   the ref; the key is replicated per bucket *pair* (gu ≤ gv) so every
   cross-bucket pair is still generated exactly once — salting bounds block
   size without losing pairs. Keys beyond ``block_cap * salt_factor_max``
   are dropped from blocking and logged (stoplist; score is unaffected
   because scoring never uses blocking output).

4. **Exact re-scoring.** matches = |T(a) ∩ T(b)| over the FULL trigram
   sets (identical to the reference find score, storage.c:527-563),
   computed by joining candidate pairs back to per-doc trigram sets —
   broadcast of the (filtered) docsets when they fit
   (``broadcast_limit_bytes``), two-sided hash join otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from blurrily_ray.config import DEFAULT, ERConfig
from blurrily_ray.stages.common import join_partitions_cap
from blurrily_ray.functions.trigram import NUM_TRIGRAMS, _concat_ranges

_GET_CACHE: dict = {}


def _cached_get(ref):
    """ray.get with a per-worker memo — broadcast objects are fetched and
    deserialized once per worker process, not once per batch. Keeps a few
    entries so interleaved stages sharing a worker pool don't thrash."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _GET_CACHE:
        if len(_GET_CACHE) >= 8:
            _GET_CACHE.clear()
        _GET_CACHE[key] = ray.get(ref)
    return _GET_CACHE[key]


def _u64_of_refs(refs: np.ndarray) -> np.ndarray:
    """Stable per-ref bucket hash (process-independent). Vectorized bit-mix
    for integer refs (the surrogate-id path); md5 for strings."""
    refs = np.asarray(refs)
    if np.issubdtype(refs.dtype, np.integer):
        h = refs.astype(np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return h
    from blurrily_ray.functions.hashing import stable_u64

    return np.fromiter((stable_u64(str(r)) for r in refs), dtype=np.uint64,
                       count=len(refs))


def _sum_vector_rows(ds_vectors) -> np.ndarray:
    """Stream fixed-size count vectors (one per input batch) to the driver
    and sum — rows ≈ n_blocks, each 21,952 ints, so this is a combiner tree
    with a driver root, never a data shuffle."""
    hist = np.zeros(NUM_TRIGRAMS, dtype=np.int64)
    for batch in ds_vectors.iter_batches(batch_size=256, batch_format="pyarrow"):
        vecs = batch["v"].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        hist += flat.reshape(-1, NUM_TRIGRAMS).sum(axis=0)
    return hist


def trigram_histogram(docsets) -> np.ndarray:
    """Exact global trigram → doc-count histogram (21,952 bins).

    Per-batch bincount emits ONE fixed-size vector row (combiner); the
    driver sums the ≤ n_blocks vectors. A Ray groupby here would shuffle
    and sort millions of sparse rows for a histogram that fits in 172 KB.
    """

    def partial(batch: pa.Table) -> pa.Table:
        tris = batch["tris"].combine_chunks()
        codes = tris.flatten().to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, minlength=NUM_TRIGRAMS).astype(np.int64)
        return pa.table({"v": pa.array([counts], type=pa.list_(pa.int64()))})

    return _sum_vector_rows(
        docsets.map_batches(partial, batch_size=4096, batch_format="pyarrow"))


def blocking_keys(docsets, hist: np.ndarray, cfg: ERConfig = DEFAULT,
                  max_keys_per_doc: int = 40, *, lut_ref=None):
    """docsets → (key:int32, ref) emissions: per doc, its globally-rarest
    trigrams (all rare ones up to ``max_keys_per_doc``, rarest first).

    In ``trigram_pair`` mode the key is the composite of TWO of the doc's
    ``cfg.pair_rarest`` rarest trigrams, encoded ``t1 * 21952 + t2``
    (t1 < t2): C(R,2) keys per doc over a 28⁶/2 key space, so unrelated
    docs almost never collide (config.py rationale). ``trigram_triple``
    composes THREE (28⁹/6 key space — headroom past ~10¹⁰ docs). Keys are
    int64 in every mode (21952³ ≈ 1.06·10¹³ < 2⁶³)."""
    hist_ref = ray.put(hist)
    arity = {"trigram": 1, "trigram_pair": 2,
             "trigram_triple": 3}[cfg.blocking_mode]
    n_sel = {1: max_keys_per_doc, 2: cfg.pair_rarest,
             3: cfg.triple_rarest}[arity]
    comb_cache: dict = {}

    def combos(n: int) -> tuple[np.ndarray, ...]:
        """Index tuples of all sorted ``arity``-combinations of range(n)
        (n ≤ n_sel, so the cache stays tiny)."""
        if n not in comb_cache:
            from itertools import combinations

            idx = np.array(list(combinations(range(n), arity)),
                           dtype=np.int64).reshape(-1, arity)
            comb_cache[n] = tuple(idx[:, j] for j in range(arity))
        return comb_cache[n]

    def emit(batch: pa.Table) -> pa.Table:
        """Fully vectorized selection + combination: ONE global lexsort
        ranks every doc's trigrams by (freq, code); kept codes regroup by
        per-doc kept-count so each count-class builds its combination
        keys as one matrix op — no per-doc Python loop."""
        h = _cached_get(hist_ref)
        tris = batch["tris"].combine_chunks()
        offsets = tris.offsets.to_numpy()
        counts = np.diff(offsets)
        codes = tris.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        ref_type = pa.int64() if lut_ref is not None else batch["ref"].type
        keys = np.empty(0, dtype=np.int64)
        idx = np.empty(0, dtype=np.int64)
        if len(codes):
            freq = h[codes]
            doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            # rank each doc's trigrams by (freq, code); keep the n_sel
            # rarest (== all when the doc has fewer)
            order = np.lexsort((codes, freq, doc_of))
            sd = doc_of[order]
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            rank = np.arange(len(codes), dtype=np.int64) - starts[sd]
            keep = rank < n_sel
            kc, kd = codes[order][keep], sd[keep]
            # regroup kept codes sorted by (doc, code) — combination keys
            # must compose code-ascending
            o2 = np.lexsort((kc, kd))
            kc, kd = kc[o2], kd[o2]
            m = np.bincount(kd, minlength=n)  # kept count per doc
            if arity == 1:
                keys, idx = kc, kd
            else:
                kstarts = np.zeros(n, dtype=np.int64)
                np.cumsum(m[:-1], out=kstarts[1:])
                out_k, out_i = [], []
                for mv in np.unique(m):
                    if mv < arity:
                        continue
                    docs_mv = np.nonzero(m == mv)[0]
                    gather = (kstarts[docs_mv][:, None]
                              + np.arange(mv)[None, :])
                    mat = kc[gather]  # (n_docs_mv, mv) code-ascending
                    parts = combos(int(mv))
                    key = mat[:, parts[0]]
                    for j in range(1, arity):
                        key = key * np.int64(NUM_TRIGRAMS) + mat[:, parts[j]]
                    out_k.append(key.reshape(-1))
                    out_i.append(np.repeat(docs_mv, len(parts[0])))
                if out_k:
                    keys = np.concatenate(out_k)
                    idx = np.concatenate(out_i)
            if cfg.key_sample_mod > 1 and len(keys):
                # deterministic key sampling (config.py) — the SQL oracle
                # applies the identical integer predicate
                kk = ((keys.astype(np.uint64) * np.uint64(2654435761))
                      % np.uint64(1 << 32)) % np.uint64(cfg.key_sample_mod)
                sel = kk == 0
                keys, idx = keys[sel], idx[sel]
        if not len(keys):
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "ref": pa.array([], type=ref_type)})
        if lut_ref is not None:
            # surrogate-id path: emit each doc's row index in the broadcast
            # sorted-ref array instead of its (string) ref — every
            # downstream shuffle/dedupe then runs on int64 keys
            ref_sorted = _cached_get(lut_ref)[0]
            r = np.asarray(batch["ref"].combine_chunks())
            if r.dtype == object:
                r = r.astype(str)
            ref_ids = np.searchsorted(ref_sorted, r)
            return pa.table({"key": pa.array(keys),
                             "ref": pa.array(ref_ids[idx].astype(np.int64))})
        return pa.table({"key": pa.array(keys),
                         "ref": batch["ref"].take(pa.array(idx))})

    return docsets.map_batches(emit, batch_format="pyarrow")


KEY_HIST_PARTS = 64


def key_histogram(keys_ds, cfg: ERConfig = DEFAULT):
    """Sparse histogram of *emitted* blocking keys that can collide
    (count ≥ 2): returns (keys, counts, regime) with keys int64 sorted.
    Keys emitted once can neither pair nor need salting, so they never
    reach the driver — the result is sized by *collisions*, not the key
    space (essential in trigram_pair/triple mode, space 2.4·10⁸ / 10¹²).

    Driver-bound guarantee: a partition whose collidable-key count
    exceeds ``cfg.driver_key_limit / n_parts`` ships only its keys hotter
    than block_cap (the ones salting/stoplisting actually needs) and is
    marked 'hot-only' in ``regime``; salt_plan then keeps that
    partition's unknown keys unsalted instead of dropping them — pair
    generation stays exact, only the singleton-filter optimization is
    lost for the overloaded partition."""
    from blurrily_ray.stages.common import _col_hash, partitioned_map

    n_parts = KEY_HIST_PARTS
    per_part = max(1, cfg.driver_key_limit // n_parts)

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["key"].value_counts()
        vc = vc[vc >= 2]
        hot_only = len(vc) > per_part
        if hot_only:
            # must ship every key salting OR the stoplist needs: anything
            # hotter than min(block_cap, stoplist threshold)
            hot_thresh = min(cfg.block_cap,
                             cfg.stoplist_cap
                             or (cfg.block_cap * cfg.salt_factor_max))
            vc = vc[vc > hot_thresh]
        if len(df) == 0:
            return pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "part": pd.Series([], dtype="int64"),
                                 "hot_only": pd.Series([], dtype="int64")})
        part = int(_col_hash(df["key"].iloc[:1])[0] % np.uint64(n_parts))
        # sentinel row (key = -1) always carries the partition's regime —
        # a hot-only partition may ship ZERO key rows yet must be marked
        keys_out = np.concatenate(([-1], vc.index.to_numpy(dtype=np.int64)))
        n_out = np.concatenate(([0], vc.to_numpy(dtype=np.int64)))
        return pd.DataFrame({"key": keys_out, "n": n_out,
                             "part": np.int64(part),
                             "hot_only": np.int64(hot_only)})

    regime = np.zeros(n_parts, dtype=bool)  # False = full listing
    kparts, nparts = [], []
    for batch in partitioned_map(keys_ds, ["key"], count_part,
                                 n_parts=n_parts).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        k = batch["key"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        kparts.append(k[k >= 0])
        nparts.append(n[k >= 0])
        if len(batch):
            p = batch["part"].to_numpy(zero_copy_only=False)
            h = batch["hot_only"].to_numpy(zero_copy_only=False)
            regime[p[h > 0]] = True
    if not kparts:
        return np.empty(0, np.int64), np.empty(0, np.int64), regime
    keys = np.concatenate(kparts).astype(np.int64)
    counts = np.concatenate(nparts).astype(np.int64)
    order = np.argsort(keys)
    return keys[order], counts[order], regime


def salt_plan(key_hist, cfg: ERConfig = DEFAULT):
    """(sorted keys, per-key bucket counts s, regime) for collidable keys:
    s = 1 (plain), >1 (salted into s buckets), 0 (stoplisted / dropped).
    ``regime`` marks hot-only histogram partitions (see key_histogram) —
    None/all-False means the listing is complete. Accepts the sparse
    (keys, counts[, regime]) tuple or a legacy dense array."""
    regime = None
    if isinstance(key_hist, np.ndarray):  # dense 21,952-bin form
        keys = np.nonzero(key_hist >= 2)[0].astype(np.int64)
        counts = key_hist[keys]
    elif len(key_hist) == 3:
        keys, counts, regime = key_hist
    else:
        keys, counts = key_hist
    cap = cfg.block_cap
    s = np.ceil(counts / cap).astype(np.int64)
    s[counts <= cap] = 1
    stop = cfg.stoplist_cap or (cap * cfg.salt_factor_max)
    dropped = counts > stop
    s[dropped] = 0
    stats = {
        "keys_total": int(len(keys)),
        "keys_salted": int((s > 1).sum()),
        "keys_dropped": int(dropped.sum()),
        "emissions_dropped": int(counts[dropped].sum()),
        "hist_parts_hot_only": int(regime.sum()) if regime is not None else 0,
    }
    return keys, s, regime, stats


def candidate_pairs(keys_ds, key_hist, cfg: ERConfig = DEFAULT, *,
                    distinct: bool = True, pack_int32: bool = False):
    """(key, ref) emissions → candidate (a, b) pairs, a < b (globally
    distinct when ``distinct``, else deduped only within partitions).

    Returns (pairs_ds, skew_stats). Hot keys are salted into bucket pairs;
    super-hot keys are dropped and counted in skew_stats.

    ``pack_int32``: refs are known int32-range ids (the surrogate path) —
    emit ONE packed ``ab = a·2³² + b`` int64 column instead of (a, b).
    The co-key shuffle then moves 12 B/row instead of 24 and every
    downstream groupby/hash runs single-column (~2× at sf1.0 scale).
    (In-partition pre-scoring was tried and REJECTED: popcount on the
    pre-cokey-filter volume with random bitset gathers costs far more
    than the shuffle it saves — NOTES_r2.md.)
    """
    plan_keys, plan_s, regime, skew_stats = salt_plan(key_hist, cfg)
    salts_ref = ray.put((plan_keys, plan_s, regime))

    def _default_s(keys: np.ndarray, regime) -> np.ndarray:
        """s for keys ABSENT from the plan: 0 (drop — the key was counted
        once, it cannot pair) when its histogram partition shipped a full
        listing, 1 (keep unsalted) when that partition was hot-only and
        the key's exact count is unknown (but ≤ block_cap)."""
        if regime is None or not regime.any():
            return np.zeros(len(keys), dtype=np.int64)
        h = keys.astype(np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        part = (h % np.uint64(KEY_HIST_PARTS)).astype(np.int64)
        return regime[part].astype(np.int64)

    def salt(batch: pa.Table) -> pa.Table:
        p_keys, p_s, reg = _cached_get(salts_ref)
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        refs = batch["ref"]
        if len(p_keys) == 0:
            s = _default_s(keys, reg)
            keep = s > 0
        else:
            idx = np.searchsorted(p_keys, keys)
            idx[idx >= len(p_keys)] = 0
            found = p_keys[idx] == keys
            s = np.where(found, p_s[idx], _default_s(keys, reg))
            keep = s > 0
        keys, s = keys[keep], s[keep]
        refs = refs.filter(pa.array(keep))
        bucket = (_u64_of_refs(np.asarray(refs)) % s.astype(np.uint64)).astype(np.int64)
        # replicate each emission once per bucket-pair group it joins:
        # ref in bucket u participates in groups (min(u,v), max(u,v)) ∀ v.
        reps = s  # s rows per emission
        ridx = np.repeat(np.arange(len(keys), dtype=np.int64), reps)
        v = _concat_ranges(reps) if len(reps) else np.empty(0, dtype=np.int64)
        u = bucket[ridx]
        gu = np.minimum(u, v)
        gv = np.maximum(u, v)
        return pa.table({
            "key": pa.array(keys[ridx]),
            "gu": pa.array(gu.astype(np.int32)),
            "gv": pa.array(gv.astype(np.int32)),
            "bucket": pa.array(u.astype(np.int32)),
            "ref": refs.take(pa.array(ridx)),
        })

    salted = keys_ds.map_batches(salt, batch_format="pyarrow")

    def pairgen_partition(df: pd.DataFrame) -> pd.DataFrame:
        """All (key, gu, gv) groups of one hash partition, vectorized: sort
        once, slice group runs, emit pairs per run with numpy.

        Output rows are (a, b, n) where ``n`` counts how many blocking keys
        of THIS partition generated the pair. Salting guarantees a pair is
        generated at most once per key, so summing ``n`` across partitions
        recovers the exact global co-key count (the min_cokeys predicate the
        DuckDB oracle computes with GROUP BY ... HAVING COUNT(*)). A plain
        (a, b) drop_duplicates here would silently collapse the same pair
        arising under two different keys hashed into one partition and
        undercount co-keys."""
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype=df["ref"].dtype),
                                 "b": pd.Series([], dtype=df["ref"].dtype),
                                 "n": pd.Series([], dtype="int64")})
        df = df.sort_values(["key", "gu", "gv"], kind="stable")
        keys = df["key"].to_numpy()
        gus = df["gu"].to_numpy()
        gvs = df["gv"].to_numpy()
        refs = df["ref"].to_numpy()
        buckets = df["bucket"].to_numpy()
        boundary = np.nonzero((keys[1:] != keys[:-1]) | (gus[1:] != gus[:-1])
                              | (gvs[1:] != gvs[:-1]))[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            gu, gv = gus[s], gvs[s]
            r, bk = refs[s:e], buckets[s:e]
            if gu == gv:
                members = np.unique(r[bk == gu])
                if len(members) < 2:
                    continue
                ia, ib = np.triu_indices(len(members), k=1)
                a, b = members[ia], members[ib]
            else:
                left = np.unique(r[bk == gu])
                right = np.unique(r[bk == gv])
                if len(left) == 0 or len(right) == 0:
                    continue
                a = np.repeat(left, len(right))
                b = np.tile(right, len(left))
                swap = a > b
                a, b = np.where(swap, b, a), np.where(swap, a, b)
            out_a.append(a)
            out_b.append(b)
        if not out_a:
            if pack_int32:
                return pd.DataFrame({"ab": pd.Series([], dtype="int64"),
                                     "n": pd.Series([], dtype="int64")})
            return pd.DataFrame({"a": pd.Series([], dtype=df["ref"].dtype),
                                 "b": pd.Series([], dtype=df["ref"].dtype),
                                 "n": pd.Series([], dtype="int64")})
        # collapse per-partition duplicates into a COUNT (not a distinct):
        # cuts shuffle volume while preserving the exact co-key multiplicity
        a_all = np.concatenate(out_a)
        b_all = np.concatenate(out_b)
        if pack_int32:
            packed = (a_all.astype(np.int64) << np.int64(32)) \
                | b_all.astype(np.int64)
            g = pd.Series(packed).value_counts(sort=False)
            return pd.DataFrame({"ab": g.index.to_numpy(dtype=np.int64),
                                 "n": g.to_numpy(dtype=np.int64)})
        out = pd.DataFrame({"a": a_all, "b": b_all})
        g = out.groupby(["a", "b"], sort=False).size()
        out = g.reset_index()
        out.columns = ["a", "b", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    from blurrily_ray.stages.common import partitioned_map

    raw_pairs = partitioned_map(salted, ["key", "gu", "gv"],
                                pairgen_partition, n_parts=cfg.join_partitions)
    if distinct:
        raw_pairs = distinct_pairs(raw_pairs, cfg)
    return raw_pairs, skew_stats


def _pairs_within_runs(starts: np.ndarray, sizes: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """All position pairs (i, j), i<j, within each run
    ``[starts[r], starts[r]+sizes[r])`` — fully vectorized (the per-group
    ``triu_indices`` loop this replaces was the pipeline's largest CPU
    sink at sf1.0: 114 CPU-s across 628 pairgen tasks).

    Element with local index l in a run of size c contributes pairs
    (p, p+1..p+c-1-l) where p is its global position; both sides come
    from two repeat/concat-ranges passes, no Python per-run work."""
    if not len(sizes) or not sizes.sum():
        e = np.empty(0, dtype=np.int64)
        return e, e
    l = _concat_ranges(sizes)
    pos = np.repeat(starts, sizes) + l
    cnt = np.repeat(sizes, sizes) - 1 - l
    ia = np.repeat(pos, cnt)
    ib = ia + _concat_ranges(cnt) + 1
    return ia, ib


def candidate_pairs_fused_blocking(keys_ds, cfg: ERConfig = DEFAULT, *,
                                   int_refs: bool | None = None):
    """ONE-shuffle candidate generation for composite blocking modes:
    partition the (key, ref) emissions by the key's LEADING TRIGRAM
    (t1 = key // 21952^(arity-1)) — every row of a key still colocates
    (key determines t1), so the exact per-key count, the stoplist, and
    pair generation all happen inside the partition, eliminating the
    separate key-histogram shuffle, the salt-plan broadcast, and the
    (key,gu,gv) routing columns.

    Partitioning by t1 instead of hash(key) exploits the composite-key
    structure: a matching pair with j shared rare trigrams is generated
    under ~C(j,2) co-keys, and all of its co-keys sharing a leading
    trigram now land in ONE partition, so the map-side value_counts
    collapses them to one (ab, n) row — the downstream exchange (row-
    rate-bound at ~2.3 M rows/s per the NOTES_r2 shuffle study) carries
    ~j-1 rows per pair instead of C(j,2). t1 load is near-uniform
    (rarest-trigram selection excludes hot trigrams; measured ≤ 1.8 %
    max share on 128 hash-partitions at sf1.0).

    Safe because the stoplist bounds any surviving key at
    ``block_cap * salt_factor_max`` emissions (≤ C(256,2) pairs), so no
    partition can blow up — the explicit bucket-pair salting machinery
    (candidate_pairs) remains for single-trigram mode, whose keys can
    cover a constant fraction of the corpus and must be dropped BEFORE
    the shuffle. The candidate-pair SET is identical to candidate_pairs'
    (equality-tested), so the DuckDB oracle is unchanged.

    Emissions must be int32-range surrogate ids; output is the packed
    (ab, n) form score_pairs_fused consumes. Returns (pairs_ds, stats).
    """
    cap = cfg.stoplist_cap or (cfg.block_cap * cfg.salt_factor_max)
    arity = {"trigram": 1, "trigram_pair": 2,
             "trigram_triple": 3}[cfg.blocking_mode]
    t1_div = np.int64(NUM_TRIGRAMS) ** np.int64(arity - 1)

    def pairgen_by_key(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ab": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        order = np.lexsort((df["ref"].to_numpy(), df["key"].to_numpy()))
        keys = df["key"].to_numpy()[order]
        refs = df["ref"].to_numpy()[order]
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        raw_sizes = ends - starts
        keep_run = (raw_sizes >= 2) & (raw_sizes <= cap)  # cap on RAW rows
        # first-occurrence mask under (key, ref) sort = per-run ref dedupe
        first = np.ones(len(keys), dtype=bool)
        first[1:] = (keys[1:] != keys[:-1]) | (refs[1:] != refs[:-1])
        cum = np.concatenate(([0], np.cumsum(first)))
        uniq_sizes = cum[ends] - cum[starts]
        in_kept = np.repeat(keep_run, raw_sizes) & first
        refs_d = refs[in_kept]
        sizes_k = uniq_sizes[keep_run]
        starts_k = np.concatenate(([0], np.cumsum(sizes_k)[:-1]))
        m = sizes_k >= 2
        ia, ib = _pairs_within_runs(starts_k[m], sizes_k[m])
        if not len(ia):
            return empty
        # refs ascend within a run (lexsort) → position order IS a < b
        packed = (refs_d[ia].astype(np.int64) << np.int64(32)) \
            | refs_d[ib].astype(np.int64)
        g = pd.Series(packed).value_counts(sort=False)
        return pd.DataFrame({"ab": g.index.to_numpy(dtype=np.int64),
                             "n": g.to_numpy(dtype=np.int64)})

    from blurrily_ray.stages.common import partitioned_map

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    # scale partition count with the cluster, never a fixed floor: at low
    # widths (2-8 CPUs) a 32-partition floor shreds the blob exchange into
    # n_blocks × 32 tiny rows and pays 16 scheduling waves per 2 cores,
    # fixed costs the wide run doesn't pay (the 2→8 exchange-floor study,
    # BASELINE.md)
    n_parts = max(8, 4 * n_cpus)

    def part_t1(batch: pa.Table) -> np.ndarray:
        k = batch["key"].to_numpy(zero_copy_only=False)
        t1 = (k // t1_div).astype(np.uint64)
        t1 ^= t1 >> np.uint64(33)
        t1 *= np.uint64(0x9E3779B97F4A7C15)
        t1 ^= t1 >> np.uint64(29)
        return (t1 % np.uint64(n_parts)).astype(np.int64)

    # surrogate-id emissions are pure ints → blob-packed exchange (the
    # all-to-all sees n_blocks × n_parts blob rows, not 20M+ scalar rows).
    # Wire dtypes are as NARROW as the value ranges allow — exchange bytes
    # drive the all-to-all's single-box cost superlinearly (common.py):
    # ref is an int32-range surrogate by contract (broadcast-path ids are
    # positional, bounded by er.py's broadcast_limit_bytes gate; the
    # packer's range guard raises OverflowError if that invariant ever
    # breaks); the composite key fits int32 up to arity 2 (21952² < 2^31)
    # and needs int64 at arity 3.
    # int_refs comes from the caller when known — ds.schema() here would
    # trigger a partial execution barrier (measured 10-16 s at sf1.0).
    if int_refs is None:
        sch = keys_ds.schema()
        int_refs = pa.types.is_integer(
            dict(zip(sch.names, sch.types))["ref"])
    key_dtype = np.int32 if arity <= 2 else np.int64
    pairs = partitioned_map(
        keys_ds, ["key"], pairgen_by_key, part_fn=part_t1, n_parts=n_parts,
        packed_cols={"key": key_dtype, "ref": np.int32} if int_refs else None)
    return pairs, {"mode": "fused_blocking", "stoplist_cap": cap}


def distinct_pairs(pairs, cfg: ERConfig = DEFAULT):
    """Global (a, b) dedupe — one coarse hash-partitioned shuffle.

    Input rows carry a per-partition co-key count ``n`` (pairgen_partition);
    the global co-key count of a pair is the SUM of its ``n`` values, which
    the min_cokeys predicate uses. Rows without ``n`` (other pair sources)
    count 1 each."""
    from blurrily_ray.stages.common import partitioned_map

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        if "ab" in df.columns:  # packed int32-pair form
            counts = df.groupby("ab", sort=False)["n"].sum()
            if cfg.min_cokeys > 1:
                counts = counts[counts >= cfg.min_cokeys]
            ab = counts.index.to_numpy(dtype=np.int64)
            return pd.DataFrame({"a": ab >> np.int64(32),
                                 "b": ab & np.int64(0xFFFFFFFF)})
        n = df["n"] if "n" in df.columns else pd.Series(
            np.ones(len(df), dtype=np.int64), index=df.index)
        if cfg.min_cokeys > 1:
            counts = df.assign(_n=n).groupby(["a", "b"], sort=False)["_n"].sum()
            return counts[counts >= cfg.min_cokeys].reset_index()[["a", "b"]]
        return df[["a", "b"]].drop_duplicates()

    psch = pairs.schema()
    if psch is None:  # zero-block pair stream (empty corpus): nothing to dedupe
        return pairs
    key_cols = ["ab"] if "ab" in psch.names else ["a", "b"]
    return partitioned_map(pairs, key_cols, dedupe,
                           n_parts=cfg.join_partitions)


_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.uint16)
_BITSET_BYTES = (NUM_TRIGRAMS + 7) // 8  # 2744


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (n, _BITSET_BYTES) uint8 array via SWAR on
    uint64 words. DESTROYS x (in-place ops, one scratch array instead of
    ~7 full-size temporaries — the allocation-churn version streamed 8×
    the bytes through DRAM and was 2.6× slower at memory-bound sizes).
    Callers pass a fresh AND temporary they own."""
    w = x.reshape(len(x), -1).view(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h = np.uint64(0x0101010101010101)
    t = np.right_shift(w, np.uint64(1))
    np.bitwise_and(t, m1, out=t)
    np.subtract(w, t, out=w)
    np.right_shift(w, np.uint64(2), out=t)
    np.bitwise_and(t, m2, out=t)
    np.bitwise_and(w, m2, out=w)
    np.add(w, t, out=w)
    np.right_shift(w, np.uint64(4), out=t)
    np.add(w, t, out=w)
    np.bitwise_and(w, m4, out=w)
    np.multiply(w, h, out=w)
    np.right_shift(w, np.uint64(56), out=w)
    return w.sum(axis=1).astype(np.int64)


_POP_CHUNK = 256  # rows/chunk: AND temp + SWAR scratch ≈ 1.4 MB, L2-resident


def _popcount_and(xa: np.ndarray, xb: np.ndarray,
                  chunk: int = _POP_CHUNK) -> np.ndarray:
    """popcount(xa[i] & xb[i]) per row (xb may be one broadcastable row),
    chunked so the AND temporary and the SWAR scratch stay cache-resident
    instead of streaming full-batch temporaries through DRAM (measured
    3.5× on 2 M pairs vs one 16,384-row pass)."""
    n = len(xa)
    m = np.empty(n, dtype=np.int64)
    one_row = xb.ndim == 1 or len(xb) == 1
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        m[s:e] = _popcount_rows(
            np.bitwise_and(xa[s:e], xb if one_row else xb[s:e]))
    return m


def _popcount_gather(bits: np.ndarray, ia: np.ndarray, ib: np.ndarray,
                     chunk: int = _POP_CHUNK) -> np.ndarray:
    """popcount(bits[ia[i]] & bits[ib[i]]) per pair, gathering from the
    (possibly GB-sized) bitset matrix in ia-ascending order — sequential-
    ish DRAM reads on the a-side halve the random-gather traffic (another
    ~1.4× on top of chunking)."""
    order = np.argsort(ia, kind="stable")
    m = np.empty(len(ia), dtype=np.int64)
    for s in range(0, len(order), chunk):
        idx = order[s:s + chunk]
        m[idx] = _popcount_rows(np.bitwise_and(bits[ia[idx]], bits[ib[idx]]))
    return m


def _scatter_bits(codes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Flat trigram codes (sorted & distinct within each row's run) +
    per-row counts → (n_rows, 2,744 B) bitset matrix. Bit scatter via
    flat-index masked folds (bitwise_or.at is an order of magnitude
    slower)."""
    n = len(counts)
    codes = codes.astype(np.int64, copy=False)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    flat = np.zeros(n * _BITSET_BYTES, dtype=np.uint8)
    pos = row_idx * _BITSET_BYTES + (codes >> 3)
    val = np.uint8(1) << (codes & 7).astype(np.uint8)
    # sorted distinct codes per row → byte positions repeat at most 8×;
    # fold with bitwise-or via 8 masked assignments
    for _ in range(8):
        first = np.ones(len(pos), dtype=bool)
        first[1:] = pos[1:] != pos[:-1]
        flat[pos[first]] |= val[first]
        pos, val = pos[~first], val[~first]
        if not len(pos):
            break
    return flat.reshape(n, _BITSET_BYTES)


def _list_csr(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<uint16> column → (flat codes, per-row counts), honoring
    any slice offset."""
    lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = lst.offsets.to_numpy()
    counts = np.diff(offsets)
    return lst.flatten().to_numpy(zero_copy_only=False), counts


def _bitset_batch(batch: pa.Table) -> pa.Table:
    """(ref, tris, …) → (ref, bits: fixed 2,744-byte bitset, ntri, weight).
    Runs distributed inside map_batches."""
    codes, counts = _list_csr(batch["tris"])
    n = len(batch)
    flat = _scatter_bits(codes, counts).reshape(-1)
    return pa.table({
        "ref": batch["ref"],
        "bits": pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(_BITSET_BYTES), n, [None, pa.py_buffer(flat.tobytes())]),
        "ntri": batch["ntri"].cast(pa.int64()),
        "weight": batch["weight"].cast(pa.int64()),
    })


def docsets_bitsets_ref(docsets, check_dups: bool = True):
    """Build the broadcast LUT WITHOUT the driver touching the byte
    matrix: per-block bitsets come from map_batches, and ONE Ray task
    concatenates them and returns the tuple (stored in plasma by the
    worker). Replaces the driver-serial iter_batches concat + 1 GB
    ``ray.put`` (a flat ~6 s term at sf1.0 at ANY cpu count). Returns an
    ObjectRef immediately — consumers block on first ``ray.get``, so the
    assembly overlaps the blocking/pairgen stages."""
    block_refs = docsets.select_columns(["ref", "tris", "ntri", "weight"]) \
        .map_batches(_bitset_batch, batch_format="pyarrow").to_arrow_refs()

    @ray.remote
    def assemble(*tables):
        return _lut_from_tables(tables, check_dups=check_dups)

    return assemble.remote(*block_refs)


def _docsets_bitsets(docsets):
    """Broadcast payload: per-doc trigram BITSETS (21,952 bits each) plus
    ntri/weight arrays and a ref → row index map. Bitsets are built
    DISTRIBUTED (map_batches); only fixed-size byte rows are concatenated
    (driver-side here — ``docsets_bitsets_ref`` is the off-driver
    variant). Intersection size = popcount(AND) — vectorized byte ops."""
    ds = docsets.select_columns(["ref", "tris", "ntri", "weight"]) \
        .map_batches(_bitset_batch, batch_format="pyarrow")
    # batch_size=None → whole blocks, no re-slicing copies on the driver
    return _lut_from_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow"))


def _lut_from_tables(tables, check_dups: bool = True):
    refs, ntris, wts, rows = [], [], [], []
    for batch in tables:
        if len(batch) == 0:  # empty blocks can carry an empty schema
            continue
        bits_col = batch["bits"].combine_chunks()
        buf = np.frombuffer(bits_col.buffers()[1], dtype=np.uint8)
        start = bits_col.offset * _BITSET_BYTES
        rows.append(buf[start:start + len(batch) * _BITSET_BYTES]
                    .reshape(len(batch), _BITSET_BYTES))
        r = np.asarray(batch["ref"].combine_chunks())
        refs.append(r.astype(str) if r.dtype == object else r)
        ntris.append(batch["ntri"].to_numpy(zero_copy_only=False))
        wts.append(batch["weight"].to_numpy(zero_copy_only=False))
    bits = np.concatenate(rows) if rows else np.zeros((0, _BITSET_BYTES), np.uint8)
    ntri = np.concatenate(ntris).astype(np.int64) if ntris else np.empty(0, np.int64)
    wt = np.concatenate(wts).astype(np.int64) if wts else np.empty(0, np.int64)
    # sorted-array index instead of a python dict: a dict of 10⁵–10⁶ refs
    # costs seconds to unpickle in EVERY worker; numpy arrays come out of
    # the object store zero-copy
    ref_arr = (np.concatenate(refs) if refs
               else np.empty(0, dtype=np.int64))
    order = np.argsort(ref_arr)
    srt = ref_arr[order]
    if check_dups and len(srt) > 1 and (srt[1:] == srt[:-1]).any():
        # duplicate refs corrupt every searchsorted lookup downstream;
        # most often caused by NON-contiguous input on the assume_grouped
        # fast path (a conversation assembled once per block) — fail
        # loudly here where the sorted pass makes the check free.
        # check_dups=False for callers that score positionally and accept
        # duplicate refs by contract (fuzzy_join catalogs).
        dup = srt[1:][srt[1:] == srt[:-1]][:5]
        raise ValueError(
            f"duplicate docset refs {dup.tolist()} — most often the "
            "assume_grouped fast path fed non-contiguous transcripts; "
            "re-run with assume_grouped=False or sort the input by "
            "(conv_id, turn_idx)")
    # indirection instead of permuting the 1 GB bits array: surrogate id i
    # = position in ref_sorted; bits row = perm[i]
    return (srt, bits, ntri, wt, order.astype(np.int64))


def docsets_inverted_ref(docsets):
    """Broadcast LUT for needle-side scans: the catalog as a LocalFinder-
    style INVERTED INDEX (per-trigram posting ranges over ref-sorted rows)
    instead of a dense bitset matrix — a needle then touches only the
    postings of its own ~L+1 trigrams, O(gathered), exactly the
    reference's find gather (storage.c:498-519), not O(catalog).

    Assembled OFF-driver in one Ray task (same pattern as
    :func:`docsets_bitsets_ref`); returns an ObjectRef to
    ``(refs, weights, offsets, post_rows)`` where rows are sorted by ref
    so POSITIONAL order is the FIND tie order (ref ASC) and ranking never
    needs a string sort. ``post_rows`` is int32 (catalog is dim-sized by
    the fuzzy_join contract; asserted). Duplicate refs are allowed —
    scoring is positional."""
    block_refs = docsets.select_columns(["ref", "tris", "weight"]) \
        .to_arrow_refs()

    @ray.remote
    def assemble(*tables):
        refs_l, wts_l, codes_l, counts_l = [], [], [], []
        for t in tables:
            if len(t) == 0:
                continue
            r = np.asarray(t["ref"].combine_chunks())
            refs_l.append(r.astype(str) if r.dtype == object else r)
            wts_l.append(t["weight"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
            c, n = _list_csr(t["tris"])
            codes_l.append(c.astype(np.int64, copy=False))
            counts_l.append(n)
        if not refs_l:
            return (np.empty(0, dtype=np.int64), np.empty(0, np.int64),
                    np.zeros(NUM_TRIGRAMS + 1, np.int64),
                    np.empty(0, np.int32))
        refs = np.concatenate(refs_l)
        if len(refs) >= 2**31:
            raise ValueError("fuzzy_join catalog exceeds int32 rows — use "
                             "the ER pair pipeline for two large sides")
        wts = np.concatenate(wts_l)
        counts = np.concatenate(counts_l)
        codes = np.concatenate(codes_l)
        order = np.argsort(refs, kind="stable")
        starts = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        lens_s = counts[order]
        # gather each row's code run into ref-sorted row order
        src = np.repeat(starts[:-1][order], lens_s) + _concat_ranges(lens_s)
        codes_s = codes[src]
        row_of = np.repeat(np.arange(len(refs), dtype=np.int64), lens_s)
        o2 = np.argsort(codes_s, kind="stable")
        post_rows = row_of[o2].astype(np.int32)
        offsets = np.zeros(NUM_TRIGRAMS + 1, dtype=np.int64)
        np.cumsum(np.bincount(codes_s, minlength=NUM_TRIGRAMS),
                  out=offsets[1:])
        return (refs[order], wts[order], offsets, post_rows)

    return assemble.remote(*block_refs)


def score_pairs(pairs, docsets, cfg: ERConfig = DEFAULT, *, mode: str = "auto"):
    """Candidate pairs → exact (a, b, matches, ntri_a, ntri_b, weight_a,
    weight_b). ``matches`` is the reference score: distinct shared trigrams.

    mode='broadcast': ship the docset lookup once via ray.put and score
    inside map_batches (no shuffle) — right when docsets fit in memory.
    mode='join': two hash joins (scale path).
    """
    if mode == "auto":
        est = docsets.count() * 700  # ~bytes/doc for codes+keys, rough
        mode = "broadcast" if est <= cfg.broadcast_limit_bytes else "join"

    psch = pairs.schema()
    if psch is None or "a" not in psch.names:
        # zero candidate pairs: Ray strips transformed-to-empty datasets
        # down to a None or ZERO-COLUMN schema and the Arrow hash join
        # crashes on the missing key field — return a TYPED empty result
        # instead (ref type from the docsets side, which always has one)
        from ray.data import from_arrow

        ds_schema = docsets.schema()
        ref_type = (dict(zip(ds_schema.names, ds_schema.types))["ref"]
                    if ds_schema is not None else pa.string())
        empty = pa.table({
            "a": pa.array([], type=ref_type),
            "b": pa.array([], type=ref_type),
            "matches": pa.array([], type=pa.int64()),
            "ntri_a": pa.array([], type=pa.int64()),
            "ntri_b": pa.array([], type=pa.int64()),
            "weight_a": pa.array([], type=pa.int64()),
            "weight_b": pa.array([], type=pa.int64())})
        return from_arrow(empty)

    if mode == "broadcast":
        lut_ref = ray.put(_docsets_bitsets(docsets))

        def score(batch: pa.Table) -> pa.Table:
            ref_sorted, bits, ntri, wts, perm = _cached_get(lut_ref)
            a = np.asarray(batch["a"])
            b = np.asarray(batch["b"])
            if a.dtype == object:
                a, b = a.astype(str), b.astype(str)
            ia = perm[np.searchsorted(ref_sorted, a)]
            ib = perm[np.searchsorted(ref_sorted, b)]
            m = _popcount_gather(bits, ia, ib)
            return pa.table({
                "a": batch["a"], "b": batch["b"],
                "matches": pa.array(m),
                "ntri_a": pa.array(ntri[ia]), "ntri_b": pa.array(ntri[ib]),
                "weight_a": pa.array(wts[ia]), "weight_b": pa.array(wts[ib])})

        # pairs arrive in a handful of big groupby output blocks; split so
        # the scoring map has ≥ one task per core (block count = task count)
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        pairs = pairs.repartition(max(64, 4 * n_cpus))
        return pairs.map_batches(score, batch_size=16384,
                                 batch_format="pyarrow")

    # scale path: two-sided hash join on ref. Arrow hash joins don't carry
    # list payloads, so the trigram set travels as its fixed-size BITSET
    # (plain binary, 2,744 bytes) and scoring stays popcount(AND).
    # NB: shuffle stages (groupby upstreams, the join itself) emit
    # ZERO-COLUMN empty blocks next to typed ones when partitions are
    # empty; those blocks BYPASS map_batches (so they cannot be
    # normalized away) and crash the Acero join's key-field resolution.
    # A repartition before each join coalesces them into typed blocks —
    # measured: repartition fixes the chained-join micro, materialize
    # and a normalizing map do not.
    cap = join_partitions_cap(cfg.join_partitions)
    pairs = pairs.repartition(cap)
    side = docsets.select_columns(["ref", "tris", "ntri", "weight"]) \
        .map_batches(_bitset_batch, batch_format="pyarrow") \
        .map_batches(lambda t: t.set_column(
            t.schema.get_field_index("bits"), "bits",
            t["bits"].cast(pa.binary())), batch_format="pyarrow")
    j = pairs.join(side.rename_columns({"ref": "a", "bits": "bits_a",
                                        "ntri": "ntri_a", "weight": "weight_a"}),
                   join_type="inner", on=("a",),
                   num_partitions=join_partitions_cap(cfg.join_partitions))

    j = j.repartition(cap)
    j = j.join(side.rename_columns({"ref": "b", "bits": "bits_b",
                                    "ntri": "ntri_b", "weight": "weight_b"}),
               join_type="inner", on=("b",),
               num_partitions=join_partitions_cap(cfg.join_partitions))

    def _bits_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fixed = col.cast(pa.binary(_BITSET_BYTES))
        buf = np.frombuffer(fixed.buffers()[1], dtype=np.uint8)
        start = fixed.offset * _BITSET_BYTES
        return buf[start:start + len(fixed) * _BITSET_BYTES] \
            .reshape(len(fixed), _BITSET_BYTES)

    def score_joined(batch: pa.Table) -> pa.Table:
        m = _popcount_and(_bits_matrix(batch["bits_a"]),
                          _bits_matrix(batch["bits_b"]))
        return pa.table({
            "a": batch["a"], "b": batch["b"], "matches": pa.array(m),
            "ntri_a": batch["ntri_a"].cast(pa.int64()),
            "ntri_b": batch["ntri_b"].cast(pa.int64()),
            "weight_a": batch["weight_a"].cast(pa.int64()),
            "weight_b": batch["weight_b"].cast(pa.int64())})

    return j.map_batches(score_joined, batch_format="pyarrow")


def rel_fraction(cfg: ERConfig) -> tuple[int, int]:
    """min_matches_rel as an exact integer fraction (num, den) — the
    threshold compare must be integer arithmetic so this engine and the
    DECIMAL-typed SQL oracle agree at exact boundaries (0.55 * 100 is
    55.000000000000004 in binary floats)."""
    from fractions import Fraction

    f = Fraction(cfg.min_matches_rel).limit_denominator(10_000)
    return f.numerator, f.denominator


def score_pairs_fused(raw_pairs, docsets=None, cfg: ERConfig = DEFAULT, *,
                      lut_ref=None, surrogate: bool = False,
                      packed: bool | None = None):
    """Fused dedupe + exact score + threshold in ONE hash-partitioned pass.

    Raw candidate pairs (duplicated once per shared blocking key) are
    hash-partitioned by (a, b) — so all duplicates land together — and each
    partition is deduped, scored against the broadcast bitsets and
    thresholded in a single vectorized function. Compared to running the
    stages separately this removes two materialization barriers and scores
    each distinct pair exactly once. Returns thresholded edges."""
    import ray as _ray

    from blurrily_ray.stages.common import partitioned_map

    if lut_ref is None:
        lut_ref = _ray.put(_docsets_bitsets(docsets))
    num, den = rel_fraction(cfg)

    def fused(df: pd.DataFrame) -> pd.DataFrame:
        ref_sorted, bits, ntri, wts, perm = _cached_get(lut_ref)
        # output a/b dtype: restored refs in surrogate mode, input otherwise
        packed = "ab" in df.columns
        ab_dtype = ref_sorted.dtype if surrogate else (
            np.int64 if packed else df["a"].dtype)
        # per-partition co-key counts ``n`` from pairgen_partition sum to
        # the exact global co-key count (all copies of a pair hash here)
        if packed:
            counts = df.groupby("ab", sort=False)["n"].sum()
            if cfg.min_cokeys > 1:
                counts = counts[counts >= cfg.min_cokeys]
            ab = counts.index.to_numpy(dtype=np.int64)
            a = ab >> np.int64(32)
            b = ab & np.int64(0xFFFFFFFF)
        else:
            n = df["n"] if "n" in df.columns else pd.Series(
                np.ones(len(df), dtype=np.int64), index=df.index)
            if cfg.min_cokeys > 1:
                counts = df.assign(_n=n).groupby(["a", "b"],
                                                 sort=False)["_n"].sum()
                counts = counts[counts >= cfg.min_cokeys]
                df = counts.reset_index()[["a", "b"]]
            else:
                df = df[["a", "b"]].drop_duplicates()
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
        if len(a) == 0:
            cols = {"a": pd.Series([], dtype=ab_dtype),
                    "b": pd.Series([], dtype=ab_dtype)}
            for c in ["matches", "ntri_a", "ntri_b", "weight_a", "weight_b"]:
                cols[c] = pd.Series([], dtype="int64")
            return pd.DataFrame(cols)
        if surrogate:
            ia, ib = perm[a], perm[b]  # surrogate id → bits row
        else:
            if a.dtype == object:
                a, b = a.astype(str), b.astype(str)
            ia = perm[np.searchsorted(ref_sorted, a)]
            ib = perm[np.searchsorted(ref_sorted, b)]
        m = _popcount_gather(bits, ia, ib)
        lo = np.minimum(ntri[ia], ntri[ib])
        keep = (m >= cfg.min_matches) & (m * den >= num * lo)
        out_a = np.asarray(a)[keep]
        out_b = np.asarray(b)[keep]
        if surrogate:  # restore real refs on the (tiny) surviving edges
            out_a = ref_sorted[out_a]
            out_b = ref_sorted[out_b]
        return pd.DataFrame({
            "a": out_a, "b": out_b,
            "matches": m[keep], "ntri_a": ntri[ia][keep],
            "ntri_b": ntri[ib][keep], "weight_a": wts[ia][keep],
            "weight_b": wts[ib][keep]})

    n_cpus = int(_ray.cluster_resources().get("CPU", 8))
    rsch = raw_pairs.schema()
    if rsch is None:  # zero-block pair stream (empty corpus)
        dsch = docsets.schema() if docsets is not None else None
        ref_type = (dict(zip(dsch.names, dsch.types))["ref"]
                    if dsch is not None else pa.string())
        return _ray.data.from_arrow(pa.table({
            "a": pa.array([], type=ref_type),
            "b": pa.array([], type=ref_type),
            "matches": pa.array([], type=pa.int64()),
            "ntri_a": pa.array([], type=pa.int64()),
            "ntri_b": pa.array([], type=pa.int64()),
            "weight_a": pa.array([], type=pa.int64()),
            "weight_b": pa.array([], type=pa.int64())}))
    if packed is None:
        packed = "ab" in rsch.names
    key_cols = ["ab"] if packed else ["a", "b"]
    # packed (ab, n) rows take the blob exchange — the (a,b)-hash
    # all-to-all is the pipeline's largest row count by far. Partition
    # count scales with the cluster (no fixed floor) so low-width runs
    # don't shred the exchange — see candidate_pairs_fused_blocking.
    # n rides the wire as uint16 (a pair's per-partition co-key count is
    # bounded by one doc's blocking keys ≤ C(14,3)=364 composite / ntri
    # single — far under 2^16), cutting the exchange 16 → 10 B/row.
    return partitioned_map(raw_pairs, key_cols, fused,
                           n_parts=max(8, 8 * n_cpus),
                           packed_cols={"ab": np.int64, "n": np.uint16}
                           if packed else None)


def threshold_edges(scored, cfg: ERConfig = DEFAULT):
    """Keep pairs whose exact score clears both the absolute floor and the
    relative floor (fraction of the smaller trigram set)."""
    num, den = rel_fraction(cfg)

    def keep(batch: pa.Table) -> pa.Table:
        m = batch["matches"].to_numpy(zero_copy_only=False)
        lo = np.minimum(batch["ntri_a"].to_numpy(zero_copy_only=False),
                        batch["ntri_b"].to_numpy(zero_copy_only=False))
        ok = (m >= cfg.min_matches) & (m * den >= num * lo)
        return batch.filter(pa.array(ok))

    return scored.map_batches(keep, batch_format="pyarrow")


def candidate_pairs_restored(raw_pairs, cfg: ERConfig = DEFAULT, *,
                             lut_ref=None, docsets=None):
    """The DISTINCT candidate-pair set in REF space — dedupe + min_cokeys
    applied, NO similarity threshold (the `cand` CTE of the SQL oracle).

    Exists for blocking AUDITS (stages/cluster.blocking_eval): the normal
    pipeline never materializes pre-threshold pairs with refs restored.
    Implemented as score_pairs_fused with both score floors zeroed — one
    hash-partitioned pass reusing the fused dedupe / min_cokeys / ref
    restoration (and its exact-score column, informative in an audit);
    the popcount it also runs is candidate-sized, never corpus-sized."""
    from dataclasses import replace

    nocut = replace(cfg, min_matches=0, min_matches_rel=0.0)
    return score_pairs_fused(raw_pairs, docsets, cfg=nocut, lut_ref=lut_ref,
                             surrogate=True, packed=True)
