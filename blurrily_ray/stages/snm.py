"""Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995).

The OTHER classic blocking family next to key-based blocking
(stages/pairs.py): sort every record by a sorting key, slide a window
of ``w`` consecutive records over the sorted order, and emit every pair
that co-occurs inside the window — i.e. exactly the pairs whose global
rank distance is < w. Candidate volume is linear (n·(w−1) pairs) and
skew-free by construction: a hot key crowds a NEIGHBORHOOD, never a
quadratic block.

Distributed shape (exact, two data passes, no global sort barrier):

1. Each row gets an ORDER-PRESERVING range partition id from a fixed
   byte-prefix of its sort key (numpy 'S{k}' truncation — vectorized,
   zero-pad sorts below every real byte). Prefix ranges are contiguous
   in the total order (skey, ref), so each partition owns a contiguous
   run of global ranks.
2. ONE hash exchange co-locates each range partition; inside, rows sort
   locally and emit (a) all in-partition window pairs vectorized (the
   d-shifted zips for d = 1..w−1) and (b) tiny metadata: the partition's
   first/last w−1 rows ("boundary rows", with their local rank) and its
   size.
3. The driver turns the ≤ P size rows into exact global rank offsets
   (cumsum in pid order), assigns every boundary row its TRUE global
   rank, and generates the cross-partition pairs — any window pair not
   emitted in step 2 has both endpoints in the boundary set (each is
   within w−1 ranks of its partition's edge), so matching granks at
   exact distance d = 1..w−1 with differing pids is complete and
   duplicate-free. Driver work is O(P·w) rows — constant-size metadata,
   never corpus data.

At 100 TB the prefix length (``prefix_len``) is the partition-count
lever: post-normalize text over ~37 symbols gives ~37^k contiguous
ranges (k=2 → ~1.4k, k=3 → ~50k); a skewed prefix only inflates one
partition's local sort, never the pair count. The window semantics and
the emitted pair set are partitioning-invariant (pinned by test).

Oracle: ``row_number() OVER (ORDER BY s, ref)`` self-join in DuckDB
(oracles.sql_snm_pairs) — both sides sort by codepoint on the pure-ASCII
normalized strings, ties broken by the unique ref.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from blurrily_ray.stages.editdist import normalized_texts

__all__ = ["snm_pairs", "snm_pairs_multi"]


def snm_pairs(docs, *, window: int = 4, ref_col: str = "doc_id",
              text_col: str = "text", n_parts: int = 64,
              prefix_len: int = 2, key_transform: str = "identity"):
    """Sorted-neighborhood candidate pairs over one document table:
    (a, b, rank_dist) for every pair within ``window`` consecutive
    positions of the (sort-key, ref) order; ``a`` is the earlier record
    in that order, 1 ≤ rank_dist ≤ window−1.

    ``key_transform``: 'identity' sorts by the normalized text;
    'reverse' sorts by the codepoint-reversed normalized text — the
    classic second pass of multi-pass SNM (a typo in the first
    characters destroys a record's forward neighborhood but not its
    reversed one). See :func:`snm_pairs_multi`."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if key_transform not in ("identity", "reverse"):
        raise ValueError(f"unknown key_transform {key_transform!r}")
    from blurrily_ray.stages.common import (join_partitions_cap,
                                            partitioned_map)

    w = window
    n_parts = join_partitions_cap(n_parts)
    texts = normalized_texts(docs, ref_col=ref_col, text_col=text_col)
    if key_transform == "reverse":
        def rev(batch: pa.Table) -> pa.Table:
            # Arrow codepoint reverse — matches DuckDB reverse() and
            # Python s[::-1] on this domain
            return pa.table({"ref": batch["ref"],
                             "_nt": pc.utf8_reverse(batch["_nt"])})

        texts = texts.map_batches(rev, batch_format="pyarrow")

    def add_pid(batch: pa.Table) -> pa.Table:
        s = batch["_nt"].combine_chunks().to_numpy(zero_copy_only=False)
        # numpy 'S{k}' conversion truncates to k bytes, zero-padding the
        # tail — vectorized, and the 0 pad sorts below every real byte,
        # so pid order == lexicographic prefix-range order (ASCII domain:
        # the engine normalizer strips everything else)
        b = s.astype(f"S{prefix_len}").view(np.uint8)
        b = b.reshape(-1, prefix_len).astype(np.int64)
        pid = np.zeros(len(s), dtype=np.int64)
        for k in range(prefix_len):
            pid = pid * 256 + b[:, k]
        return batch.append_column("_pid", pa.array(pid))

    keyed = texts.map_batches(add_pid, batch_format="pyarrow")

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        ref_dtype = df["ref"].dtype
        a_out, b_out, d_out = [], [], []
        m_ref, m_rank, m_pid, m_kind = [], [], [], []
        for pid, g in df.groupby("_pid", sort=False):
            g = g.sort_values(["_nt", "ref"], kind="stable")
            refs = g["ref"].to_numpy()
            n = len(g)
            for d in range(1, min(w, n)):
                a_out.append(refs[:-d])
                b_out.append(refs[d:])
                d_out.append(np.full(n - d, d, dtype=np.int64))
            lrank = np.arange(n, dtype=np.int64)
            bmask = (lrank < w - 1) | (lrank >= n - (w - 1))
            m_ref.append(refs[bmask])
            m_rank.append(lrank[bmask])
            m_pid.append(np.full(int(bmask.sum()), pid, dtype=np.int64))
            m_kind.append(np.ones(int(bmask.sum()), dtype=np.int64))
            # size row (kind=2): rank_dist carries the partition size
            m_ref.append(refs[:1])
            m_rank.append(np.array([n], dtype=np.int64))
            m_pid.append(np.array([pid], dtype=np.int64))
            m_kind.append(np.array([2], dtype=np.int64))

        def cat(parts, dtype=None):
            if not parts:
                return np.array([], dtype=dtype if dtype is not None
                                else ref_dtype)
            return np.concatenate(parts)

        pairs_n = sum(len(x) for x in a_out)
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(pairs_n, dtype=np.int64),
                                    cat(m_kind, np.int64)]),
            "a": np.concatenate([cat(a_out), cat(m_ref)]),
            "b": np.concatenate([cat(b_out), cat(m_ref)]),
            "rank_dist": np.concatenate([cat(d_out, np.int64),
                                         cat(m_rank, np.int64)]),
            "pid": np.concatenate([np.full(pairs_n, -1, dtype=np.int64),
                                   cat(m_pid, np.int64)]),
        })

    out = partitioned_map(keyed, ["_pid"], gen,
                          n_parts=n_parts).materialize()

    def only_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 0))
        return t.select(["a", "b", "rank_dist"])

    pairs_ds = out.map_batches(only_pairs, batch_format="pyarrow")

    # --- driver reconciliation over O(P·w) metadata rows, never corpus
    # data: the kind>0 filter runs DISTRIBUTED (map_batches), so only the
    # boundary/size rows — not the n·(w−1) pair rows — reach the driver
    def only_meta(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["kind"], 0))
        return t.select(["kind", "a", "rank_dist", "pid"])

    metas = []
    for t in out.map_batches(only_meta, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            metas.append(t.to_pandas())
    if not metas:
        return pairs_ds
    meta = pd.concat(metas, ignore_index=True)
    sizes = (meta[meta["kind"] == 2].set_index("pid")["rank_dist"]
             .sort_index())
    offsets = sizes.cumsum().shift(fill_value=0)
    bd = meta[meta["kind"] == 1]
    grank = (bd["pid"].map(offsets) + bd["rank_dist"]).to_numpy()
    order = np.argsort(grank, kind="stable")
    gr = grank[order]
    refs = bd["a"].to_numpy()[order]
    pids = bd["pid"].to_numpy()[order]
    xa, xb, xd = [], [], []
    for d in range(1, w):
        j = np.searchsorted(gr, gr + d)
        ok = (j < len(gr))
        jj = np.where(ok, j, 0)
        ok &= (gr[jj] == gr + d) & (pids[jj] != pids)
        xa.append(refs[ok])
        xb.append(refs[jj[ok]])
        xd.append(np.full(int(ok.sum()), d, dtype=np.int64))
    cross = pd.DataFrame({"a": np.concatenate(xa),
                          "b": np.concatenate(xb),
                          "rank_dist": np.concatenate(xd)})
    if not len(cross):
        return pairs_ds
    import ray.data

    return pairs_ds.union(ray.data.from_pandas(cross))


def snm_pairs_multi(docs, *, window: int = 4, ref_col: str = "doc_id",
                    text_col: str = "text", n_parts: int = 64,
                    prefix_len: int = 2):
    """Multi-pass sorted neighborhood (the standard production recipe —
    Hernández & Stolfo run several cheap passes under DIFFERENT sort
    keys and union the candidates, because one key's sort order is
    blind to typos at its own front): pass 1 sorts by the normalized
    text, pass 2 by its codepoint reverse. Output is the canonical
    union — (a, b, passes) with a < b in ref order and passes ∈ {1, 2}
    the number of passes that proposed the pair (2 ⇒ both neighborhoods
    agree — a confidence signal meta-blocking can weight).

    The union/dedup is ONE pair-keyed partition over rows that are
    already candidate-sized; each pass's internal exchange is snm_pairs'
    own."""
    import pyarrow.compute as pc

    from blurrily_ray.stages.common import join_partitions_cap, \
        partitioned_map

    fwd = snm_pairs(docs, window=window, ref_col=ref_col,
                    text_col=text_col, n_parts=n_parts,
                    prefix_len=prefix_len, key_transform="identity")
    rev = snm_pairs(docs, window=window, ref_col=ref_col,
                    text_col=text_col, n_parts=n_parts,
                    prefix_len=prefix_len, key_transform="reverse")

    def canon(t: pa.Table) -> pa.Table:
        # orient a < b in REF order (each pass orients by its own sort)
        lo = pc.min_element_wise(t["a"], t["b"])
        hi = pc.max_element_wise(t["a"], t["b"])
        return pa.table({"a": lo, "b": hi})

    both = fwd.map_batches(canon, batch_format="pyarrow").union(
        rev.map_batches(canon, batch_format="pyarrow"))

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], sort=False).size().reset_index()
        out.columns = ["a", "b", "passes"]
        # a pair can repeat WITHIN one pass only if it repeats in the
        # window — impossible (distinct rank pairs) — so size() counts
        # passes exactly
        out["passes"] = out["passes"].astype(np.int64)
        return out

    n_parts = join_partitions_cap(n_parts)
    return partitioned_map(both, ["a", "b"], dedup, n_parts=n_parts)
