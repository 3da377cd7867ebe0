"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hash material is md5-derived (functions/hashing.py) so a DuckDB oracle
can regenerate every signature bit-for-bit; outputs are integer/string
columns only.

Scale notes: exact dedup is a hash groupby (one shuffle, combinable);
MinHash banding turns near-dup search into a bucket groupby (shuffle keyed
by band hash — the LSH literature's standard map-reduce layout); candidate
verification re-computes exact Jaccard from the shingle sets via the same
broadcast/join duality as pair scoring (stages/pairs.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from blurrily_ray.functions.hashing import MERSENNE61, md5_num, minhash_params
from blurrily_ray.stages.common import join_partitions_cap
from blurrily_ray.stages.pairs import _cached_get

_TOKEN_RE = re.compile(r"\S+")

# MinHash/LSH defaults — inlined into the SQL oracle; keep in sync.
NUM_PERM = 16
NUM_BANDS = 4  # 4 rows per band
SHINGLE_NGRAM = 3
JACCARD_THRESHOLD_NUM, JACCARD_THRESHOLD_DEN = 1, 2  # keep if inter*2 >= union
SIMHASH_BITS = 60  # 15 md5 hex chars → fits a signed int64


def exact_dedup(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the smallest id per identical text. Hash-partition by content
    digest (never by raw text — uniform keys, bounded groups).

    Min-per-group runs inside :func:`partitioned_map` like every sibling
    dedup operator — NOT Ray's native ``groupby().aggregate(Min)``, which
    this repo measured hanging >6 min at 7.5M rows (NOTES_r2, cluster.py's
    ban note); exact dedup is the most-run operator of any training-data
    pipeline, so it gets the shape that survives corpus-sized inputs."""

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "_h": df[text_col].fillna("").map(
                lambda s: hashlib.md5(s.encode()).hexdigest()),
        })

    from blurrily_ray.stages.common import partitioned_map

    def min_per_group(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("_h", sort=False, as_index=False)[id_col].min()

    return partitioned_map(docs.map_batches(digest, batch_format="pandas"),
                           ["_h"], min_per_group) \
        .select_columns([id_col])


def _shingles(text: str) -> list[str]:
    words = _TOKEN_RE.findall((text or "").lower())
    if len(words) < SHINGLE_NGRAM:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + SHINGLE_NGRAM])
            for i in range(len(words) - SHINGLE_NGRAM + 1)]


def _shingle_hashes(text: str) -> np.ndarray:
    """Distinct md5_number-mod-p hashes of the doc's shingles (aligned with
    DuckDB's md5_number so the SQL oracle reproduces them)."""
    hs = {md5_num(s) % MERSENNE61 for s in _shingles(text)}
    return np.array(sorted(hs), dtype=np.uint64)


def minhash_signatures(docs, *, id_col: str = "doc_id", text_col: str = "text",
                       num_perm: int = NUM_PERM, seed: int = 42):
    """(id, sig: list<int64>) MinHash signatures over word-shingle sets.

    The (a*h+b) mod p math is the 128-bit-split vectorized mulmod
    (functions/hashing.mulmod61): all docs of a batch are flattened into one
    hash array and each permutation is one vector op + a segment-min
    (np.minimum.reduceat) — no per-doc per-perm Python loop. Values are
    bit-identical to the DuckDB HUGEINT oracle.
    """
    from blurrily_ray.functions.hashing import _mod61, mulmod61

    a, b = minhash_params(num_perm, seed)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        per_doc = [_shingle_hashes(t) for t in df[text_col]]
        counts = np.array([len(h) for h in per_doc], dtype=np.int64)
        sig_mat = np.zeros((len(df), num_perm), dtype=np.int64)
        nz = np.nonzero(counts)[0]
        if len(nz):
            flat = (np.concatenate([per_doc[i] for i in nz])
                    .astype(np.uint64))
            starts = np.concatenate(([0], np.cumsum(counts[nz])[:-1]))
            for j in range(num_perm):
                v = _mod61(mulmod61(a[j], flat) + np.uint64(b[j]))
                sig_mat[nz, j] = np.minimum.reduceat(v, starts).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col], "sig": list(sig_mat)})

    return docs.map_batches(fn, batch_format="pandas")


def lsh_candidate_pairs(sigs, *, id_col: str = "doc_id",
                        num_bands: int = NUM_BANDS, distinct: bool = True):
    """Signatures → candidate (a, b) pairs via banding: docs whose
    signature agrees on ALL rows of any band share that band's bucket.
    ``distinct=False`` skips the global dedupe shuffle (pairs may repeat
    once per matching band) — callers that score-then-threshold dedupe
    the much smaller verified set instead."""
    rows_per_band = NUM_PERM // num_bands

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        """Band keys built COLUMN-WISE from the signature matrix: the
        'v-v-v-v' strings render as Arrow kernels (int→string cast +
        binary_join_element_wise) over the sig columns, leaving only the
        md5 call itself per row — 1.8× the per-row f-string/join shape
        on a wide batch, byte-identical keys. The md5-of-this-exact-
        string format is the oracle-parity contract (DuckDB md5() over
        the identical rendering in sql_minhash_pairs_docs)."""
        n = len(df)
        if n == 0:
            return pd.DataFrame({id_col: df[id_col],
                                 "bkey": pd.Series([], dtype=object)})
        sig_mat = np.stack(df["sig"].to_numpy()).astype(np.int64)
        out_keys = np.empty((n, num_bands), dtype=object)
        md5 = hashlib.md5
        for band in range(num_bands):
            cols = [pc.cast(pa.array(sig_mat[:, band * rows_per_band + c]),
                            pa.string())
                    for c in range(rows_per_band)]
            joined = pc.binary_join_element_wise(*cols, "-").cast(pa.binary())
            pb = f"b{band}|".encode()
            out_keys[:, band] = [md5(pb + s).hexdigest()
                                 for s in joined.to_pylist()]
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), num_bands),
            "bkey": out_keys.reshape(-1)})

    def pairgen_partition(df: pd.DataFrame) -> pd.DataFrame:
        """Pairs within every bucket of one hash partition, vectorized."""
        empty = pd.DataFrame({"a": pd.Series([], dtype=df[id_col].dtype),
                              "b": pd.Series([], dtype=df[id_col].dtype)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["bkey", id_col], kind="stable")
        keys = df["bkey"].to_numpy()
        ids = df[id_col].to_numpy()
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            members = np.unique(ids[s:e])
            if len(members) < 2:
                continue
            ia, ib = np.triu_indices(len(members), k=1)
            out_a.append(members[ia])
            out_b.append(members[ib])
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    from blurrily_ray.stages.common import partitioned_map

    raw = partitioned_map(sigs.map_batches(bands, batch_format="pandas"),
                          ["bkey"], pairgen_partition)
    if not distinct:
        return raw
    return partitioned_map(raw, ["a", "b"], lambda df: df.drop_duplicates())


def _shingle_blob_table(docs, id_col: str, text_col: str):
    """docs → (ref, shb: binary blob of the sorted distinct u64 shingle
    hashes, nsh). Built DISTRIBUTED in map_batches — blobs are plain binary
    so they survive Ray's Arrow hash joins (list payloads do not)."""

    def build(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        per_doc = [_shingles(t) for t in texts]
        counts = np.array([len(s) for s in per_doc], dtype=np.int64)
        # md5 once per DISTINCT shingle in the batch (docs repeat shingles)
        flat = [s for doc in per_doc for s in doc]
        if flat:
            uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
            p = MERSENNE61
            uh = np.fromiter((md5_num(s) % p for s in uniq),
                             dtype=np.uint64, count=len(uniq))
            all_h = uh[inv]
        else:
            all_h = np.empty(0, dtype=np.uint64)
        blobs, pos = [], 0
        for c in counts:
            blobs.append(np.unique(all_h[pos:pos + c]).tobytes())
            pos += c
        return pa.table({
            "ref": batch[id_col],
            "shb": pa.array(blobs, type=pa.binary()),
            "nsh": pa.array([len(b) // 8 for b in blobs], type=pa.int64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        build, batch_format="pyarrow")


def _intersect_counts(pair_idx_a, ha_flat, pair_idx_b, hb_flat, n_pairs):
    """Vectorized per-pair set-intersection counts: each side's hashes are
    distinct within a pair, so a (pair, hash) value appearing twice in the
    concatenation appears once per side → one lexsort, no per-pair loop."""
    all_k = np.concatenate([pair_idx_a, pair_idx_b])
    all_h = np.concatenate([ha_flat, hb_flat])
    order = np.lexsort((all_h, all_k))
    sk, sh = all_k[order], all_h[order]
    dup = (sk[1:] == sk[:-1]) & (sh[1:] == sh[:-1])
    return np.bincount(sk[1:][dup], minlength=n_pairs).astype(np.int64)


def _blob_arrays(col) -> tuple[np.ndarray, np.ndarray]:
    """Binary column of u64 blobs → (flat u64 values, element counts)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    blobs = col.to_pylist()
    counts = np.array([len(b) // 8 for b in blobs], dtype=np.int64)
    flat = (np.frombuffer(b"".join(blobs), dtype=np.uint64)
            if counts.sum() else np.empty(0, np.uint64))
    return flat, counts


def _jaccard_filter(df: pd.DataFrame) -> pd.DataFrame:
    keep = (df["n_inter"] * JACCARD_THRESHOLD_DEN
            >= df["n_union"] * JACCARD_THRESHOLD_NUM) & (df["n_union"] > 0)
    return df[keep]


def verify_jaccard(pairs, docs, *, id_col: str = "doc_id",
                   text_col: str = "text", mode: str = "auto",
                   broadcast_limit_bytes: int = 256 << 20, blobs=None):
    """Exact shingle-set Jaccard for candidate pairs →
    (a, b, n_inter, n_union), keeping pairs with
    inter * DEN >= union * NUM (default Jaccard ≥ 1/2).

    Same broadcast-or-join duality as stages/pairs.score_pairs: the shingle
    sets are built DISTRIBUTED as binary blobs; mode='broadcast' ships the
    concatenated arrays once via ray.put (no Python dict, no driver
    per-doc loop), mode='join' attaches blobs via two hash joins (the
    corpus-scale path). Scoring is one vectorized lexsort per batch.
    Pass ``blobs`` to reuse an already-computed shingle-blob table."""
    side = blobs if blobs is not None \
        else _shingle_blob_table(docs, id_col, text_col)

    if mode == "auto":
        est = docs.count() * 400  # ~bytes/doc of shingle hashes, rough
        mode = "broadcast" if est <= broadcast_limit_bytes else "join"

    if mode == "broadcast":
        refs, flats, counts = [], [], []
        for batch in side.iter_batches(batch_size=None, batch_format="pyarrow"):
            f, c = _blob_arrays(batch["shb"])
            flats.append(f)
            counts.append(c)
            r = np.asarray(batch["ref"].combine_chunks())
            refs.append(r.astype(str) if r.dtype == object else r)
        ref_arr = np.concatenate(refs) if refs else np.empty(0, np.int64)
        cnt = (np.concatenate(counts) if counts
               else np.empty(0, np.int64))
        flat = (np.concatenate(flats) if flats else np.empty(0, np.uint64))
        order = np.argsort(ref_arr, kind="stable")
        starts_unordered = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        lut_ref = ray.put((ref_arr[order], flat,
                           starts_unordered[order], cnt[order]))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            ref_sorted, fl, starts, cn = _cached_get(lut_ref)
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            if a.dtype == object:
                a, b = a.astype(str), b.astype(str)
            ia = np.searchsorted(ref_sorted, a)
            ib = np.searchsorted(ref_sorted, b)
            idx_a = np.repeat(np.arange(len(df)), cn[ia])
            idx_b = np.repeat(np.arange(len(df)), cn[ib])
            ha = fl[_concat_slices(starts[ia], cn[ia])]
            hb = fl[_concat_slices(starts[ib], cn[ib])]
            inter = _intersect_counts(idx_a, ha, idx_b, hb, len(df))
            union = cn[ia] + cn[ib] - inter
            return _jaccard_filter(df.assign(n_inter=inter, n_union=union))

        return pairs.map_batches(score, batch_format="pandas")

    # scale path: attach blobs via two hash joins, score per batch
    j = pairs.join(side.rename_columns({"ref": "a", "shb": "shb_a",
                                        "nsh": "nsh_a"}),
                   join_type="inner", on=("a",), num_partitions=join_partitions_cap(32))
    j = j.join(side.rename_columns({"ref": "b", "shb": "shb_b",
                                    "nsh": "nsh_b"}),
               join_type="inner", on=("b",), num_partitions=join_partitions_cap(32))

    def score_joined(batch: pa.Table) -> pa.Table:
        ha, ca = _blob_arrays(batch["shb_a"])
        hb, cb = _blob_arrays(batch["shb_b"])
        n = len(batch)
        idx_a = np.repeat(np.arange(n), ca)
        idx_b = np.repeat(np.arange(n), cb)
        inter = _intersect_counts(idx_a, ha, idx_b, hb, n)
        union = ca + cb - inter
        out = pa.table({
            "a": batch["a"], "b": batch["b"],
            "n_inter": pa.array(inter), "n_union": pa.array(union)})
        keep = (inter * JACCARD_THRESHOLD_DEN >= union * JACCARD_THRESHOLD_NUM) \
            & (union > 0)
        return out.filter(pa.array(keep))

    return j.map_batches(score_joined, batch_format="pyarrow")


def _concat_slices(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Index array selecting flat[starts[i] : starts[i]+counts[i]] for all i
    concatenated — vectorized gather indices."""
    from blurrily_ray.functions.trigram import _concat_ranges

    if int(counts.sum()) == 0:
        return np.empty(0, dtype=np.int64)
    return np.repeat(starts, counts) + _concat_ranges(counts)


def signatures_from_blobs(blobs, *, num_perm: int = NUM_PERM,
                          seed: int = 42):
    """(ref, shb, nsh) → (ref, sig): the minhash math over pre-computed
    shingle-hash blobs — md5 work is NOT repeated."""
    from blurrily_ray.functions.hashing import _mod61, mulmod61

    a, b = minhash_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        flat, counts = _blob_arrays(batch["shb"])
        sig_mat = np.zeros((len(batch), num_perm), dtype=np.int64)
        nz = np.nonzero(counts)[0]
        if len(nz):
            nz_counts = counts[nz]
            starts = np.concatenate(([0], np.cumsum(nz_counts)[:-1]))
            for j in range(num_perm):
                v = _mod61(mulmod61(a[j], flat) + np.uint64(b[j]))
                sig_mat[nz, j] = np.minimum.reduceat(v, starts).astype(np.int64)
        return pa.table({"doc_id": batch["ref"],
                         "sig": pa.array(list(sig_mat))})

    return blobs.map_batches(fn, batch_format="pyarrow")


def minhash_dedup_pairs(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Full near-dup pipeline: shingle → minhash → LSH bands → exact-Jaccard
    verify. Returns (a, b, n_inter, n_union) for verified near-duplicates.

    The shingle-hash blobs are computed ONCE (the md5 pass dominates) and
    shared by the signature stage and the exact verify."""
    blobs = _shingle_blob_table(docs, id_col, text_col).materialize()
    sigs = signatures_from_blobs(blobs)
    if id_col != "doc_id":
        sigs = sigs.rename_columns({"doc_id": id_col})
    cands = lsh_candidate_pairs(sigs, id_col=id_col)
    return verify_jaccard(cands, docs, id_col=id_col, text_col=text_col,
                          blobs=blobs)


def jaccard_ngram_pairs(docs, *, id_col: str = "doc_id",
                        text_col: str = "text"):
    """EXACT n-gram (word-shingle) Jaccard similarity join via prefix
    filtering — the deterministic-recall complement of the MinHash+LSH
    pipeline (which can miss pairs with band-probability < 1).

    Prefix-filtering lemma (the standard exact set-similarity-join
    bound): order every shingle set by one global total order (here the
    u64 shingle hash, ascending — blobs are already stored sorted). If
    J(A,B) ≥ τ then |A∩B| ≥ ceil(τ·|A|), so at most |A| − ceil(τ·|A|)
    elements of A precede the smallest shared element — it lies within
    A's first |A| − ceil(τ·|A|) + 1 elements, and symmetrically for B.
    Docs therefore only need to emit that PREFIX as blocking keys: every
    qualifying pair collides on ≥ 1 prefix hash (exact recall), while
    the emission volume is ~(1−τ) of full-shingle blocking. Candidates
    are verified with the same exact intersection count as
    verify_jaccard; shingle blobs are built once and shared by both
    stages.

    Returns (a, b, n_inter, n_union) with n_inter·den ≥ n_union·num
    (τ = JACCARD_THRESHOLD_NUM/DEN, shared with verify_jaccard so the
    prefix bound and the verify predicate can never diverge)."""
    thr_num, thr_den = JACCARD_THRESHOLD_NUM, JACCARD_THRESHOLD_DEN
    blobs = _shingle_blob_table(docs, id_col, text_col).materialize()

    def emit_prefix(batch: pa.Table) -> pa.Table:
        flat, counts = _blob_arrays(batch["shb"])
        plen = counts - ((counts * thr_num + thr_den - 1) // thr_den) + 1
        plen = np.where(counts == 0, 0, np.maximum(plen, 0))
        starts = np.concatenate(([0], np.cumsum(counts)[:-1])) \
            if len(counts) else np.empty(0, np.int64)
        idx = _concat_slices(starts, plen)
        ridx = np.repeat(np.arange(len(batch), dtype=np.int64), plen)
        return pa.table({
            "h": pa.array(flat[idx].astype(np.int64)),
            "ref": batch["ref"].take(pa.array(ridx)),
        })

    def pairgen_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=df["ref"].dtype),
                              "b": pd.Series([], dtype=df["ref"].dtype)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["h", "ref"], kind="stable")
        keys = df["h"].to_numpy()
        ids = df["ref"].to_numpy()
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            members = np.unique(ids[s:e])
            if len(members) < 2:
                continue
            ia, ib = np.triu_indices(len(members), k=1)
            out_a.append(members[ia])
            out_b.append(members[ib])
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    from blurrily_ray.stages.common import partitioned_map

    emissions = blobs.map_batches(emit_prefix, batch_format="pyarrow")
    raw = partitioned_map(emissions, ["h"], pairgen_partition)
    cands = partitioned_map(raw, ["a", "b"], lambda df: df.drop_duplicates())
    return verify_jaccard(cands, docs, id_col=id_col, text_col=text_col,
                          blobs=blobs)


SIMHASH_HAMMING_MAX = 3
SIMHASH_PAIR_BANDS = 4  # 15 bits each; pigeonhole: ham<=3 ⇒ ≥1 equal band


def simhash_pairs(docs, *, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = SIMHASH_HAMMING_MAX,
                  n_bands: int = SIMHASH_PAIR_BANDS, sigs=None):
    """Near-dup pairs by SimHash Hamming distance → (a, b, hamming ≤
    max_hamming). Banding pigeonhole: a pair differing in fewer bits
    than there are bands must agree EXACTLY on ≥ 1 of the n_bands
    bit-bands, so every doc emits one (band, band_value) bucket key per
    band and only bucket-mates are compared — exact recall, never
    all-pairs. The 8-byte signature rides along with each emission, so
    verification (XOR + SWAR popcount) happens IN the bucket partition:
    no second lookup, no broadcast, one shuffle + the tiny pair-distinct
    shuffle. Pass ``sigs`` to reuse already-computed signatures."""
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole needs n_bands > max_hamming")
    if SIMHASH_BITS % n_bands:
        raise ValueError("n_bands must divide SIMHASH_BITS")
    band_bits = SIMHASH_BITS // n_bands
    mask = np.int64((1 << band_bits) - 1)
    if sigs is None:
        sigs = simhash(docs, id_col=id_col, text_col=text_col)

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        sig = df["simhash"].to_numpy(np.int64)
        rep_ids = np.repeat(df[id_col].to_numpy(), n_bands)
        rep_sig = np.repeat(sig, n_bands)
        b = np.tile(np.arange(n_bands, dtype=np.int64), n)
        bval = (rep_sig >> (b * band_bits)) & mask
        return pd.DataFrame({id_col: rep_ids, "sig": rep_sig,
                             "k": (b << band_bits) | bval})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        from blurrily_ray.stages.pairs import _popcount_rows

        empty = pd.DataFrame({
            "a": pd.Series([], dtype=df[id_col].dtype),
            "b": pd.Series([], dtype=df[id_col].dtype),
            "hamming": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["k", id_col], kind="stable")
        keys = df["k"].to_numpy()
        ids = df[id_col].to_numpy()
        sig = df["sig"].to_numpy(np.int64)
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ia, ib = np.triu_indices(e - s, k=1)
            x = (sig[s:e][ia] ^ sig[s:e][ib]).astype(np.uint64)
            ham = _popcount_rows(x.view(np.uint8).reshape(len(x), 8))
            keep = ham <= max_hamming
            out_a.append(ids[s:e][ia[keep]])
            out_b.append(ids[s:e][ib[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    from blurrily_ray.stages.common import partitioned_map

    emissions = sigs.map_batches(bands, batch_format="pandas")
    raw = partitioned_map(emissions, ["k"], bucket_pairs)
    # a pair can match in up to n_bands bands (hamming identical on
    # every copy) — one distinct pass on the tiny verified set
    return partitioned_map(raw, ["a", "b"],
                           lambda df: df.drop_duplicates(["a", "b"]))


PARA_WORDS = 10  # fixed word-window "paragraph" (docs carry no newlines)


def dedup_paragraphs(docs, *, id_col: str = "doc_id", text_col: str = "text",
                     words_per_para: int = PARA_WORDS):
    """C4/RefinedWeb-style paragraph-level exact dedup: split every doc
    into fixed ``words_per_para``-word windows, keep only the FIRST
    occurrence of each distinct paragraph corpus-wide (ordered by
    (doc_id, para_idx)), and reassemble the surviving paragraphs per doc.
    Returns (doc_id, text, n_kept, n_orig); docs whose every paragraph
    lost drop out.

    Scale shape: the first exchange ships only (doc_id, pidx, h) int64
    rows — paragraph TEXT never enters the winner shuffle. Winners (one
    row per distinct paragraph) co-partition with the doc table by
    doc_id (partitioned_map2) and each partition re-derives its own
    docs' paragraphs locally, so the corpus text moves exactly once.
    """
    from blurrily_ray.stages.common import partitioned_map, partitioned_map2

    mod = 1 << 63

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids, pidx, paras = [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            toks = (t or "").split(" ")
            for p0 in range(0, len(toks), words_per_para):
                ids.append(i)
                pidx.append(p0 // words_per_para)
                paras.append(" ".join(toks[p0:p0 + words_per_para]))
        if paras:
            # md5 once per DISTINCT paragraph in the batch
            uniq, inv = np.unique(np.asarray(paras, dtype=object),
                                  return_inverse=True)
            uh = np.fromiter((md5_num(s) % mod for s in uniq),
                             dtype=np.int64, count=len(uniq))
            hs = uh[inv]
        else:
            hs = np.empty(0, dtype=np.int64)
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype=df[id_col].dtype),
            "pidx": pd.Series(pidx, dtype=np.int64),
            "h": hs})

    def winners_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df[[id_col, "pidx"]]
        df = df.sort_values(["h", id_col, "pidx"], kind="stable")
        h = df["h"].to_numpy()
        keep = np.concatenate(([True], h[1:] != h[:-1]))
        return df.loc[keep, [id_col, "pidx"]]

    emissions = docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pandas")
    winners = partitioned_map(emissions, ["h"], winners_part)
    # select_columns on a zero-row dataset loses the schema — derive the
    # typed contracts from the pre-select docs schema for the empty case
    dsch = docs.schema()
    dtypes = (dict(zip(dsch.names, dsch.types)) if dsch is not None
              else {id_col: pa.int64(), text_col: pa.string()})
    docs_schema = pa.schema([(id_col, dtypes[id_col]),
                             (text_col, dtypes[text_col])])
    winners_schema = pa.schema([(id_col, dtypes[id_col]),
                                ("pidx", pa.int64())])

    def reassemble(docs_df: pd.DataFrame, win_df: pd.DataFrame) -> pd.DataFrame:
        if len(docs_df) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "text": pd.Series([], dtype=object),
                "n_kept": pd.Series([], dtype=np.int64),
                "n_orig": pd.Series([], dtype=np.int64)})
        rows = []
        for i, t in zip(docs_df[id_col], docs_df[text_col]):
            toks = (t or "").split(" ")
            for p0 in range(0, len(toks), words_per_para):
                rows.append((i, p0 // words_per_para,
                             " ".join(toks[p0:p0 + words_per_para])))
        paras = pd.DataFrame(rows, columns=[id_col, "pidx", "para"])
        n_orig = paras.groupby(id_col, sort=False).size().rename("n_orig")
        kept = paras.merge(win_df, on=[id_col, "pidx"], how="inner") \
            .sort_values([id_col, "pidx"], kind="stable")
        g = kept.groupby(id_col, sort=False)
        out = pd.DataFrame({
            "text": g["para"].agg(" ".join),
            "n_kept": g.size().astype(np.int64)})
        out = out.join(n_orig.astype(np.int64)).reset_index()
        return out[[id_col, "text", "n_kept", "n_orig"]]

    return partitioned_map2(docs.select_columns([id_col, text_col]),
                            winners, [id_col], [id_col], reassemble,
                            left_schema=docs_schema,
                            right_schema=winners_schema)


def decontaminate(docs, *, id_col: str = "doc_id", text_col: str = "text",
                  bench_lo: int = 0, bench_hi: int = 10, buckets: int = 100,
                  salt: str = "split", mode: str = "auto",
                  broadcast_limit_bytes: int = 256 << 20):
    """Benchmark decontamination: for every NON-benchmark doc, count how
    many of its distinct word-shingle hashes also occur in ANY benchmark
    doc → (doc_id, n_shingles, n_shared). The benchmark set is the
    deterministic md5-bucket split [bench_lo, bench_hi) (stages/sample),
    i.e. exactly the docs ``deterministic_split`` would hold out — so a
    training pipeline can score train-split contamination against its
    own eval split with no extra input.

    Broadcast-or-join duality (same rule as score_pairs/verify_jaccard):
    'broadcast' ships the benchmark's sorted distinct hash array once via
    ray.put and membership is one searchsorted per batch (zero shuffles);
    'join' is the corpus-scale path — the benchmark hash set is deduped
    by hash partition and matches are counted via two-sided
    co-partitioning on the hash, so nothing is driver-materialized."""
    import pyarrow.compute as pc

    from blurrily_ray.stages.sample import _bucket_array

    blobs = _shingle_blob_table(docs, id_col, text_col)

    def tag(batch: pa.Table) -> pa.Table:
        b = _bucket_array(batch["ref"].to_pylist(), salt, buckets)
        return batch.append_column("_bk", pa.array(b, type=pa.int64()))

    tagged = blobs.map_batches(tag, batch_format="pyarrow").materialize()

    def _split(batch: pa.Table, keep_bench: bool) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["_bk"], pa.scalar(bench_lo)),
                    pc.less(batch["_bk"], pa.scalar(bench_hi)))
        return batch.filter(m if keep_bench else pc.invert(m))

    bench = tagged.map_batches(lambda b: _split(b, True),
                               batch_format="pyarrow")
    rest = tagged.map_batches(lambda b: _split(b, False),
                              batch_format="pyarrow")

    if mode == "auto":
        est = bench.count() * 400  # ~bytes/doc of shingle hashes, rough
        mode = "broadcast" if est <= broadcast_limit_bytes else "join"

    if mode == "broadcast":
        hs = []
        for batch in bench.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
            f, _ = _blob_arrays(batch["shb"])
            hs.append(np.unique(f))
        bench_h = (np.unique(np.concatenate(hs)) if hs
                   else np.empty(0, np.uint64))
        ref_h = ray.put(bench_h)

        def score(batch: pa.Table) -> pa.Table:
            bh = _cached_get(ref_h)
            flat, counts = _blob_arrays(batch["shb"])
            if len(flat) and len(bh):
                pos = np.searchsorted(bh, flat)
                hit = (pos < len(bh)) & (bh[np.minimum(pos, len(bh) - 1)]
                                         == flat)
            else:
                hit = np.zeros(len(flat), dtype=bool)
            doc_idx = np.repeat(np.arange(len(batch)), counts)
            n_shared = np.bincount(doc_idx[hit], minlength=len(batch))
            return pa.table({
                id_col: batch["ref"],
                "n_shingles": pa.array(counts, type=pa.int64()),
                "n_shared": pa.array(n_shared.astype(np.int64))})

        return rest.map_batches(score, batch_format="pyarrow")

    # join path: explode to (ref, h) / distinct h, co-partition on h,
    # count partial matches per partition, sum per ref, attach nsh
    from blurrily_ray.stages.common import partitioned_map, partitioned_map2

    def explode(batch: pa.Table, with_ref: bool) -> pa.Table:
        flat, counts = _blob_arrays(batch["shb"])
        cols = {"h": pa.array(flat.astype(np.int64))}
        if with_ref:
            ridx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
            cols["ref"] = batch["ref"].take(pa.array(ridx))
        return pa.table(cols)

    bench_h = partitioned_map(
        bench.map_batches(lambda b: explode(b, False), batch_format="pyarrow"),
        ["h"], lambda df: df.drop_duplicates())
    rest_h = rest.map_batches(lambda b: explode(b, True),
                              batch_format="pyarrow")

    def count_matches(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = rest (ref, h); right = bench distinct h — all copies of
        # an h co-partitioned, so membership is exact in-partition
        if len(left) == 0:
            return pd.DataFrame({"ref": pd.Series([], dtype=left["ref"].dtype),
                                 "n": pd.Series([], dtype=np.int64)})
        hit = left[left["h"].isin(set(right["h"]))] if len(right) else \
            left.iloc[0:0]
        g = hit.groupby("ref", sort=False).size()
        return pd.DataFrame({"ref": g.index.to_numpy(),
                             "n": g.to_numpy().astype(np.int64)})

    partials = partitioned_map2(rest_h, bench_h, ["h"], ["h"], count_matches)

    def attach(rest_df: pd.DataFrame, n_df: pd.DataFrame) -> pd.DataFrame:
        if len(rest_df) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=rest_df["ref"].dtype),
                "n_shingles": pd.Series([], dtype=np.int64),
                "n_shared": pd.Series([], dtype=np.int64)})
        n = n_df.groupby("ref", sort=False)["n"].sum() if len(n_df) \
            else pd.Series(dtype=np.int64)
        return pd.DataFrame({
            id_col: rest_df["ref"].to_numpy(),
            "n_shingles": rest_df["nsh"].to_numpy().astype(np.int64),
            "n_shared": rest_df["ref"].map(n).fillna(0)
                        .to_numpy().astype(np.int64)})

    rest_meta = rest.select_columns(["ref", "nsh"])
    return partitioned_map2(rest_meta, partials, ["ref"], ["ref"], attach)


def simhash(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, simhash): 60-bit SimHash over word tokens; bit j of the output
    is 1 iff the count-weighted majority of token-hash bits j is 1 (ties →
    0). Token hash = md5_number mod 2^60 (60 bits → fits int64)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: md5 once per DISTINCT token in the batch, then the
        60-bit accumulate/sign runs as numpy matrix ops (no per-token
        per-bit Python loop)."""
        tok_lists = [_TOKEN_RE.findall((t or "").lower()) for t in df[text_col]]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        if counts.sum() == 0:
            return pd.DataFrame({id_col: df[id_col],
                                 "simhash": np.zeros(len(df), dtype=np.int64)})
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in tok_lists if t])
        doc_idx = np.repeat(np.arange(len(df)), counts)
        # md5 per DISTINCT token only (corpora repeat tokens heavily)
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        mod = 1 << SIMHASH_BITS
        h = np.fromiter((md5_num(w) % mod for w in uniq), dtype=np.uint64,
                        count=len(uniq))
        bits = ((h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        contrib = 2 * bits - 1                      # (n_uniq, 60) in {-1, +1}
        acc = np.zeros((len(df), SIMHASH_BITS), dtype=np.int64)
        np.add.at(acc, doc_idx, contrib[inv])
        out = ((acc > 0).astype(np.uint64)
               << np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]).sum(
                   axis=1, dtype=np.uint64).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col], "simhash": out})

    return docs.map_batches(fn, batch_format="pandas")


def dedup_keep_best(ds, *, key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
                    text_col: str = "text", n_parts: int = 64):
    """Priority dedup across near-identical corpus variants: group rows by
    md5(normalized text) and keep ONE best row per group — longest RAW
    text first (most information preserved), then smallest key. This is
    the reference's first-put-wins PUT (storage.c:408) generalized to
    best-put-wins with an explicit rank instead of arrival order.

    One digest-keyed shuffle; each partition resolves ALL of its groups
    with a single vectorized sort + drop_duplicates (never per-group).
    Normalization is the reference normalizer (functions/normalize.py);
    the DuckDB mirror is oracles.NORM_FOLD — it folds decomposable
    accents, drops remaining non-ASCII joining halves (the engine's
    ascii-'ignore') and expands the common compatibility ligatures, so
    parity holds on every pinned hazard; exotic NFKD compatibility
    mappings beyond NORM_FOLD's table stay engine-only.
    """
    from blurrily_ray.functions.normalize import normalize_array
    from blurrily_ray.stages.common import partitioned_map

    def add_h(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col])
        h = pa.array([hashlib.md5((s or "").encode()).hexdigest()
                      for s in norm.to_pylist()], type=pa.string())
        return batch.append_column("_h", h)

    keys = list(key_cols)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            _len=df[text_col].fillna("").str.len().astype(np.int64))
        df = df.sort_values(["_h", "_len"] + keys,
                            ascending=[True, False] + [True] * len(keys),
                            kind="stable")
        return df.drop_duplicates("_h", keep="first") \
            .drop(columns=["_len", "_h"])

    tagged = ds.map_batches(add_h, batch_format="pyarrow")
    return partitioned_map(tagged, ["_h"], keep, n_parts=n_parts)


def near_dedup_canonical(docs, *, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Corpus near-dedup with a canonical survivor: MinHash+LSH verified
    pairs (:func:`minhash_dedup_pairs`) → transitive closure
    (``cluster.connected_components`` — label = smallest id in the
    component) → keep exactly one representative per duplicate cluster.

    This is THE standard corpus-level near-dedup a training-data pipeline
    runs (find near-dup clusters, keep one doc, drop the rest), composed
    from stages that are each independently oracled. Returns
    ``(id_col, cluster_id, keep)`` for EVERY input doc — ``keep = 1`` iff
    the doc is its cluster's canonical (smallest-id) representative, so
    ``filter(keep == 1)`` is the deduplicated corpus and the full table is
    the audit trail (which doc each duplicate collapsed into).

    Scale shape: the pair pipeline is banded-bucket bounded, the closure
    is pointer-jumping over the (tiny) verified edge set, and the final
    tag is a pure map — nothing corpus-sized leaves the object store.
    """
    import pyarrow.compute as pc

    from blurrily_ray.stages.cluster import connected_components

    pairs = minhash_dedup_pairs(docs, id_col=id_col, text_col=text_col)
    edges = pairs.select_columns(["a", "b"])
    nodes = docs.select_columns([id_col])
    if id_col != "ref":
        nodes = nodes.rename_columns({id_col: "ref"})
    labeled = connected_components(edges, nodes)

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.cast(pc.equal(batch["ref"], batch["cluster_id"]),
                       pa.int64())
        return pa.table({id_col: batch["ref"],
                         "cluster_id": batch["cluster_id"],
                         "keep": keep})

    return labeled.map_batches(tag, batch_format="pyarrow")


def dup_ngram_stats(docs, *, id_col: str = "doc_id", text_col: str = "text",
                    window: int = 10, prefilter: bool = False,
                    cms_bits: int = 22):
    """Exact duplicated-substring metrics (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — the sliding-window
    variant of the suffix-array ExactSubstr analysis): every OVERLAPPING
    ``window``-token span is hashed, a span is *duplicated* when its
    content occurs ≥2 times corpus-wide (any doc, including its own), and
    each doc reports integer-exact counts:

      (doc_id, n_tokens, n_windows, n_dup_windows, n_dup_tokens)

    where ``n_dup_tokens`` is the size of the UNION of all duplicated
    spans' token ranges — the "fraction of the doc that is copied text"
    numerator quality filters threshold on. All-integer output ⇒ exact
    under any partitioning.

    Scale shape (same discipline as :func:`dedup_paragraphs`): the only
    exchange ships (doc_id, pos, h) int64 rows — window TEXT never
    leaves the producing task; duplicate detection runs co-partitioned
    by h (all occurrences of a hash land together, so the partition-local
    count IS the global count); surviving (doc_id, pos) rows co-partition
    back with the doc table by doc_id and the coverage union is one
    vectorized lag-min pass per partition. The window hash is engine-
    internal (the SQL oracle groups the raw window strings, and the dup
    decision needs only content EQUALITY), so windows never materialize
    as strings: md5 once per DISTINCT TOKEN, then a vectorized Horner
    roll combines the w token hashes per window in uint64 — the Rabin-
    Karp shape, w numpy passes per batch instead of a Python loop
    building ~n·w characters of window text. Each window carries TWO
    independent 64-bit hashes (the two md5 digest halves per token,
    rolled with different bases) and duplication requires BOTH to agree
    — an effective ~127-bit key, matching dedup_paragraphs' 128-bit md5
    precedent (a single 63-bit key expects thousands of false-dup
    windows at the 100-TB scale of ≥1e12 windows).
    """
    from blurrily_ray.functions.hashing import stable_u64_pair_array
    from blurrily_ray.stages.common import partitioned_map, partitioned_map2

    mod = 1 << 63
    w = int(window)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "pos": pd.Series([], dtype=np.int64),
            "h": pd.Series([], dtype=np.int64),
            "h2": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        toks_list = [(t or "").split(" ") for t in df[text_col]]
        n_tok = np.fromiter((len(t) for t in toks_list), dtype=np.int64,
                            count=len(toks_list))
        cw = np.maximum(n_tok - w + 1, 0)  # windows per doc
        total = int(cw.sum())
        if total == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks_list])
        uniq, inv = np.unique(flat, return_inverse=True)
        ua, ub = stable_u64_pair_array(uniq)  # one md5 per DISTINCT token
        th, th2 = ua[inv], ub[inv]
        doc_start = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=doc_start[1:])
        win_offs = np.zeros(len(cw), dtype=np.int64)
        np.cumsum(cw[:-1], out=win_offs[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(win_offs, cw)
        base = np.repeat(doc_start[:-1], cw) + pos  # flat idx of win start
        B = np.uint64(0x100000001B3)  # FNV-1a prime as the Horner base
        B2 = np.uint64(0x9E3779B97F4A7C15)  # independent second base
        h = np.zeros(total, dtype=np.uint64)
        h2 = np.zeros(total, dtype=np.uint64)
        for i in range(w):
            h = h * B + th[base + i]  # uint64 wraparound by design
            h2 = h2 * B2 + th2[base + i]
        return pd.DataFrame({
            id_col: pd.Series(
                np.repeat(df[id_col].to_numpy(np.int64), cw),
                dtype=np.int64),
            "pos": pd.Series(pos, dtype=np.int64),
            "h": pd.Series((h % np.uint64(mod)).astype(np.int64)),
            "h2": pd.Series(h2.view(np.int64))})

    def dup_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df[[id_col, "pos"]]
        # shuffle key is h (co-partitioning needs only it); the dup
        # decision groups on BOTH hashes so a 63-bit collision alone
        # can't mark unrelated windows duplicated
        counts = df.groupby(["h", "h2"])["h"].transform("size").to_numpy()
        return df.loc[counts >= 2, [id_col, "pos"]]

    emissions = docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pandas")
    if prefilter:
        # Exchange pre-filter (a one-row count-min register, saturating
        # at 2 — the only question is "could this window occur ≥2×?"):
        # each emission block bincounts its window hashes into 2^cms_bits
        # cells capped at 2, the driver sums the (4 MB) register blobs —
        # a combiner tree with a driver root, never a shuffle — and
        # broadcasts the ≥2 cells as a packed bitmap (2^(cms_bits-3)
        # bytes). Windows whose cell never reaches 2 corpus-wide CANNOT
        # be duplicated (counts never undercount), so dropping them
        # before the h-shuffle is exact; collisions only FALSE-KEEP,
        # and the in-partition exact count still decides. Emissions
        # materialize once (int64 rows, producer-local — no all-to-all)
        # so the filter pass never recomputes the md5/Horner work. At
        # corpus scale size cms_bits toward the distinct-window count —
        # a saturated register keeps everything and the filter degrades
        # to a no-op, never to an error.
        #
        # DEFAULT OFF: on one box the h-shuffle is cheap (~1M int rows
        # at sf0.1) and the materialize barrier + register combine cost
        # MORE than they save (measured 5.9-10.8 s vs 4.1-5.0 s at
        # sf0.1/32). The lever exists for multi-node runs where the
        # h-shuffle crosses the network while the register combine
        # stays node-local — there the 11x exchange-row cut (sf0.01
        # synth corpus) is the win this trades for.
        import ray as _ray

        from blurrily_ray.stages.pairs import _cached_get

        emissions = emissions.materialize()
        cw = 1 << cms_bits
        cell_mask = np.int64(cw - 1)

        def cms_partial(df: pd.DataFrame) -> pd.DataFrame:
            cells = df["h"].to_numpy() & cell_mask
            c = np.minimum(np.bincount(cells, minlength=cw), 2) \
                .astype(np.uint8)
            return pd.DataFrame({"v": [c.tobytes()]})

        acc = np.zeros(cw, dtype=np.int64)
        # batch_size=None: ONE register per block — the default 1024-row
        # batches would emit a full 2^cms_bits-byte register per ~1024
        # emissions (~100x the combine traffic)
        for batch in emissions.map_batches(
                cms_partial, batch_format="pandas",
                batch_size=None).iter_batches(
                batch_size=64, batch_format="pyarrow"):
            for blob in batch["v"].to_pylist():
                acc += np.frombuffer(blob, dtype=np.uint8)
        bm_ref = _ray.put(np.packbits(acc >= 2))

        def keep_maybe_dup(df: pd.DataFrame) -> pd.DataFrame:
            bm = _cached_get(bm_ref)
            cells = (df["h"].to_numpy() & cell_mask).astype(np.int64)
            bit = (bm[cells >> 3] >> (7 - (cells & 7)).astype(np.uint8)) & 1
            return df[bit.astype(bool)]

        emissions = emissions.map_batches(keep_maybe_dup,
                                          batch_format="pandas")
    dup_rows = partitioned_map(emissions, ["h"], dup_part)

    def finalize(docs_df: pd.DataFrame, dup_df: pd.DataFrame) -> pd.DataFrame:
        if len(docs_df) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "n_windows": pd.Series([], dtype=np.int64),
                "n_dup_windows": pd.Series([], dtype=np.int64),
                "n_dup_tokens": pd.Series([], dtype=np.int64)})
        n_tok = (docs_df[text_col].fillna("").str.count(" ") + 1) \
            .to_numpy(np.int64)
        base = pd.DataFrame({
            id_col: docs_df[id_col].to_numpy(np.int64),
            "n_tokens": n_tok,
            "n_windows": np.maximum(n_tok - w + 1, 0)})
        if len(dup_df):
            d = dup_df.sort_values([id_col, "pos"], kind="stable")
            ids = d[id_col].to_numpy(np.int64)
            ps = d["pos"].to_numpy(np.int64)
            same = np.concatenate(([False], ids[1:] == ids[:-1]))
            gap = np.full(len(d), w, dtype=np.int64)
            idx = np.flatnonzero(same)
            gap[idx] = np.minimum(ps[idx] - ps[idx - 1], w)
            agg = pd.DataFrame({id_col: ids, "gap": gap}).groupby(
                id_col, sort=False).agg(
                n_dup_windows=("gap", "size"), n_dup_tokens=("gap", "sum"))
            base = base.merge(agg, on=id_col, how="left")
            base["n_dup_windows"] = base["n_dup_windows"].fillna(0)
            base["n_dup_tokens"] = base["n_dup_tokens"].fillna(0)
        else:
            base["n_dup_windows"] = 0
            base["n_dup_tokens"] = 0
        for c in ("n_dup_windows", "n_dup_tokens"):
            base[c] = base[c].astype(np.int64)
        return base

    dsch = docs.schema()
    dtypes = (dict(zip(dsch.names, dsch.types)) if dsch is not None
              else {id_col: pa.int64(), text_col: pa.string()})
    return partitioned_map2(
        docs.select_columns([id_col, text_col]), dup_rows,
        [id_col], [id_col], finalize,
        left_schema=pa.schema([(id_col, dtypes[id_col]),
                               (text_col, dtypes[text_col])]),
        right_schema=pa.schema([(id_col, pa.int64()),
                                ("pos", pa.int64())]))
