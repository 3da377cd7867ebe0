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
from blurrily_ray.functions.trigram import NUM_TRIGRAMS, _concat_ranges

_GET_CACHE: dict = {}


def _cached_get(ref):
    """ray.get with a per-worker memo — broadcast objects are fetched and
    deserialized once per worker process, not once per batch."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _GET_CACHE:
        _GET_CACHE.clear()
        _GET_CACHE[key] = ray.get(ref)
    return _GET_CACHE[key]


def _u64_of_refs(refs: np.ndarray) -> np.ndarray:
    """Stable per-ref bucket hash (md5-based, process-independent)."""
    from blurrily_ray.functions.hashing import stable_u64

    return np.fromiter((stable_u64(str(r)) for r in refs), dtype=np.uint64,
                       count=len(refs))


def trigram_histogram(docsets) -> np.ndarray:
    """Exact global trigram → doc-count histogram (21,952 bins).

    Partial bincount inside map_batches (combiner), then one tiny groupby
    over ≤ 21,952 × n_batches sparse rows — never a full-postings shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        tris = batch["tris"].combine_chunks()
        codes = tris.flatten().to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, minlength=NUM_TRIGRAMS)
        nz = np.nonzero(counts)[0]
        return pa.table({"trigram": pa.array(nz.astype(np.int32)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    from ray.data.aggregate import Sum

    rows = docsets.map_batches(partial, batch_format="pyarrow") \
        .groupby("trigram").aggregate(Sum("n", alias_name="n")).take_all()
    hist = np.zeros(NUM_TRIGRAMS, dtype=np.int64)
    for r in rows:
        hist[int(r["trigram"])] = int(r["n"])
    return hist


def blocking_keys(docsets, hist: np.ndarray, cfg: ERConfig = DEFAULT,
                  max_keys_per_doc: int = 40):
    """docsets → (key:int32, ref) emissions: per doc, its globally-rarest
    trigrams (all rare ones up to ``max_keys_per_doc``, rarest first)."""
    hist_ref = ray.put(hist)

    def emit(batch: pa.Table) -> pa.Table:
        h = _cached_get(hist_ref)
        tris = batch["tris"].combine_chunks()
        offsets = tris.offsets.to_numpy()
        counts = np.diff(offsets)
        codes = tris.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        freq = h[codes]
        out_keys, out_idx = [], []
        pos = 0
        for i, c in enumerate(counts):
            f = freq[pos:pos + c]
            k = codes[pos:pos + c]
            pos += c
            if c == 0:
                continue
            if c > max_keys_per_doc:
                order = np.lexsort((k, f))[:max_keys_per_doc]
                k = k[order]
            out_keys.append(k)
            out_idx.append(np.full(len(k), i, dtype=np.int64))
        if not out_keys:
            return pa.table({"key": pa.array([], type=pa.int32()),
                             "ref": pa.array([], type=batch["ref"].type)})
        keys = np.concatenate(out_keys).astype(np.int32)
        idx = np.concatenate(out_idx)
        return pa.table({"key": pa.array(keys),
                         "ref": batch["ref"].take(pa.array(idx))})

    return docsets.map_batches(emit, batch_format="pyarrow")


def key_histogram(keys_ds) -> np.ndarray:
    """Histogram of *emitted* blocking keys (same combiner pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        codes = batch["key"].to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, minlength=NUM_TRIGRAMS)
        nz = np.nonzero(counts)[0]
        return pa.table({"trigram": pa.array(nz.astype(np.int32)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    from ray.data.aggregate import Sum

    rows = keys_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("trigram").aggregate(Sum("n", alias_name="n")).take_all()
    hist = np.zeros(NUM_TRIGRAMS, dtype=np.int64)
    for r in rows:
        hist[int(r["trigram"])] = int(r["n"])
    return hist


def candidate_pairs(keys_ds, key_hist: np.ndarray, cfg: ERConfig = DEFAULT):
    """(key, ref) emissions → distinct candidate (a, b) pairs, a < b.

    Returns (pairs_ds, skew_stats). Hot keys are salted into bucket pairs;
    super-hot keys are dropped and counted in skew_stats.
    """
    cap = cfg.block_cap
    salts = np.ceil(key_hist / cap).astype(np.int64)  # buckets per key
    salts[key_hist <= cap] = 1
    dropped = key_hist > cap * cfg.salt_factor_max
    salts[dropped] = 0
    skew_stats = {
        "keys_total": int((key_hist > 0).sum()),
        "keys_salted": int(((salts > 1)).sum()),
        "keys_dropped": int(dropped.sum()),
        "emissions_dropped": int(key_hist[dropped].sum()),
    }
    salts_ref = ray.put(salts)

    def salt(batch: pa.Table) -> pa.Table:
        s_arr = _cached_get(salts_ref)
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        refs = batch["ref"]
        s = s_arr[keys]
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
            "key": pa.array(keys[ridx].astype(np.int32)),
            "gu": pa.array(gu.astype(np.int32)),
            "gv": pa.array(gv.astype(np.int32)),
            "bucket": pa.array(u.astype(np.int32)),
            "ref": refs.take(pa.array(ridx)),
        })

    salted = keys_ds.map_batches(salt, batch_format="pyarrow")

    def pairgen_partition(df: pd.DataFrame) -> pd.DataFrame:
        """All (key, gu, gv) groups of one hash partition, vectorized: sort
        once, slice group runs, emit pairs per run with numpy."""
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype=df["ref"].dtype),
                                 "b": pd.Series([], dtype=df["ref"].dtype)})
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
            return pd.DataFrame({"a": pd.Series([], dtype=df["ref"].dtype),
                                 "b": pd.Series([], dtype=df["ref"].dtype)})
        # local dedupe cuts shuffle volume before the global distinct
        out = pd.DataFrame({"a": np.concatenate(out_a),
                            "b": np.concatenate(out_b)})
        return out.drop_duplicates()

    from blurrily_ray.stages.common import partitioned_map

    raw_pairs = partitioned_map(salted, ["key", "gu", "gv"],
                                pairgen_partition, n_parts=cfg.join_partitions)
    pairs = partitioned_map(raw_pairs, ["a", "b"],
                            lambda df: df.drop_duplicates(),
                            n_parts=cfg.join_partitions)
    return pairs, skew_stats


def _docsets_lookup(docsets) -> dict:
    """Driver-side {ref: (codes ndarray, ntri, weight)} for broadcast mode."""
    lut = {}
    for batch in docsets.select_columns(["ref", "tris", "ntri", "weight"]) \
            .iter_batches(batch_size=8192, batch_format="pyarrow"):
        tris = batch["tris"].combine_chunks()
        offsets = tris.offsets.to_numpy()
        codes = tris.flatten().to_numpy(zero_copy_only=False)
        refs = batch["ref"].to_pylist()
        ntri = batch["ntri"].to_numpy(zero_copy_only=False)
        wt = batch["weight"].to_numpy(zero_copy_only=False)
        base = offsets[0]
        for i, r in enumerate(refs):
            lut[r] = (codes[offsets[i] - base:offsets[i + 1] - base],
                      int(ntri[i]), int(wt[i]))
    return lut


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

    if mode == "broadcast":
        lut_ref = ray.put(_docsets_lookup(docsets))

        def score(batch: pa.Table) -> pa.Table:
            lut = _cached_get(lut_ref)
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            m = np.empty(len(a), dtype=np.int64)
            na = np.empty(len(a), dtype=np.int64)
            nb = np.empty(len(a), dtype=np.int64)
            wa = np.empty(len(a), dtype=np.int64)
            wb = np.empty(len(a), dtype=np.int64)
            for i in range(len(a)):
                ca, nta, wta = lut[a[i]]
                cb, ntb, wtb = lut[b[i]]
                m[i] = np.intersect1d(ca, cb, assume_unique=True).size
                na[i], nb[i], wa[i], wb[i] = nta, ntb, wta, wtb
            return pa.table({
                "a": batch["a"], "b": batch["b"],
                "matches": pa.array(m), "ntri_a": pa.array(na),
                "ntri_b": pa.array(nb), "weight_a": pa.array(wa),
                "weight_b": pa.array(wb)})

        return pairs.map_batches(score, batch_format="pyarrow")

    # scale path: two-sided hash join on ref
    side = docsets.select_columns(["ref", "tris", "ntri", "weight"])
    j = pairs.join(side.rename_columns({"ref": "a", "tris": "tris_a",
                                        "ntri": "ntri_a", "weight": "weight_a"}),
                   join_type="inner", on=("a",),
                   num_partitions=cfg.join_partitions)
    j = j.join(side.rename_columns({"ref": "b", "tris": "tris_b",
                                    "ntri": "ntri_b", "weight": "weight_b"}),
               join_type="inner", on=("b",),
               num_partitions=cfg.join_partitions)

    def score_joined(batch: pa.Table) -> pa.Table:
        ta = batch["tris_a"].combine_chunks()
        tb = batch["tris_b"].combine_chunks()
        oa, ob = ta.offsets.to_numpy(), tb.offsets.to_numpy()
        va = ta.flatten().to_numpy(zero_copy_only=False)
        vb = tb.flatten().to_numpy(zero_copy_only=False)
        m = np.empty(len(batch), dtype=np.int64)
        ba, bb = oa[0], ob[0]
        for i in range(len(batch)):
            m[i] = np.intersect1d(va[oa[i] - ba:oa[i + 1] - ba],
                                  vb[ob[i] - bb:ob[i + 1] - bb],
                                  assume_unique=True).size
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
