"""The trigram index as Ray Data stages — the reference Map's verbs.

PUT    → :func:`build_postings` (batch; first-put-wins dedup available via
         :func:`dedup_first_put`)                 [storage.c:398-473]
FIND   → :func:`find`                              [storage.c:477-580]
DELETE → :func:`delete`                            [storage.c:584-612]
stats  → :func:`stats`                             [storage.c:616-621]
save   → :func:`save` / load → :func:`load`        [storage.c:299-377, 210-266]

The index IS a dataset of postings rows (ref, trigram:uint16, weight:uint32),
checkpointed as partitioned Parquet instead of the reference's mmap image.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from blurrily_ray.functions.normalize import normalize_string
from blurrily_ray.functions.trigram import NUM_TRIGRAMS, tokenize
from blurrily_ray.stages.tokenize import postings_from_docs

LIMIT_DEFAULT = 10  # defaults.rb:6
LIMIT_RANGE = (1, 1024)  # defaults.rb:7


def dedup_first_put(docs, *, ref_col: str = "ref", seq_col: str = "seq"):
    """First-put-wins semantics (storage.c:408; map_spec.rb:43-47): keep the
    row with the smallest ``seq`` per ref. ``seq`` is the caller's put order.
    One coarse hash-partitioned shuffle (``partitioned_map`` — every row of
    a ref co-locates, all refs of a partition dedupe in ONE vectorized
    sort + drop_duplicates, never a UDF call per ref); skip when refs are
    known unique.
    """
    from blurrily_ray.stages.common import partitioned_map

    def first_per_ref(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(seq_col, kind="stable") \
            .drop_duplicates(ref_col, keep="first")

    return partitioned_map(docs, [ref_col], first_per_ref)


def build_postings(docs, *, ref_col: str = "ref", text_col: str = "text",
                   weight_col: str | None = None):
    """docs → postings. If ``weight_col`` is given, a non-zero value there
    overrides the default length weight (storage.h:60-68, storage.c:409)."""
    if weight_col is None:
        return postings_from_docs(docs, ref_col=ref_col, text_col=text_col)

    from blurrily_ray.stages.tokenize import _docsets_batch, postings_from_docsets

    def batch_with_override(b: pa.Table) -> pa.Table:
        out = _docsets_batch(b, ref_col, text_col)
        ov = pc.cast(b[weight_col], pa.uint32()).to_numpy(zero_copy_only=False)
        w = out["weight"].to_numpy(zero_copy_only=False)
        w = np.where(ov > 0, ov, w).astype(np.uint32)  # 0 ⇒ default length
        return out.set_column(out.schema.get_field_index("weight"),
                              "weight", pa.array(w, type=pa.uint32()))

    return postings_from_docsets(
        docs.map_batches(batch_with_override, batch_format="pyarrow"))


def needle_mask(needle: str) -> tuple[np.ndarray, int]:
    """Boolean mask over the 21,952 trigram codes for a query needle."""
    codes = tokenize(normalize_string(needle))
    mask = np.zeros(NUM_TRIGRAMS, dtype=bool)
    mask[codes] = True
    return mask, len(codes)


def find(postings, needle: str, limit: int = LIMIT_DEFAULT, *,
         merge: str = "driver"):
    """Reference find (storage.c:477-580): gather postings of the needle's
    trigrams, count distinct shared trigrams per ref, rank by
    (matches DESC, weight ASC) — we additionally fix ref ASC so distributed
    runs are deterministic (the reference's qsort is unstable there).

    The needle side is tiny (L+1 codes) → broadcast as a closure mask.
    ``merge="driver"`` (default): each block combines its hits to partial
    (ref, matches, weight) rows — at most its DISTINCT hit refs — and the
    driver sums + ranks the partials: ONE map pass, no shuffle, no sort
    barrier (this query's answer is ≤1024 rows by protocol, so a
    groupby+sort dataflow spends two all-to-alls producing a page of
    results). Assumption: the needle's distinct hit refs fit the driver;
    for a pathological corpus-spanning needle at corpus scale use
    ``merge="shuffle"``, the original distributed groupby+sort dataflow.
    Returns a Dataset with columns (ref, matches, weight).
    """
    if not (LIMIT_RANGE[0] <= limit <= LIMIT_RANGE[1]):
        raise ValueError(f"limit must be in {LIMIT_RANGE}")
    mask, _ = needle_mask(needle)

    def gather(batch: pa.Table) -> pa.Table:
        tri = batch["trigram"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(mask[tri]))

    if merge == "shuffle":
        # count + min-weight per ref inside hash partitions (the
        # partitioned_map shape every sibling uses) — NOT the native
        # groupby().aggregate(Count, Min), which hangs on corpus-sized
        # key sets (NOTES_r2; this branch exists precisely for needles
        # whose hit set is corpus-sized). The post-aggregate sort ranks
        # one row per distinct hit ref.
        from blurrily_ray.stages.common import partitioned_map

        hits = postings.map_batches(gather, batch_format="pyarrow")

        def agg_part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("ref", sort=False)["weight"] \
                .agg(matches="size", weight="min").reset_index()
            g["matches"] = g["matches"].astype(np.int64)
            return g

        agg = partitioned_map(hits, ["ref"], agg_part)
        return agg.sort(["matches", "weight", "ref"],
                        descending=[True, False, False]).limit(limit)

    def partial(batch: pa.Table) -> pa.Table:
        sub = gather(batch)
        refs = np.asarray(sub["ref"])
        if refs.dtype == object:
            refs = refs.astype(str)
        uniq, inv = (np.unique(refs, return_inverse=True) if len(refs)
                     else (refs, np.empty(0, np.int64)))
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # weight is constant per ref (storage.c:409) — first occurrence
        first = np.empty(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(refs) - 1, -1, -1, dtype=np.int64)
        return pa.table({
            "ref": pa.array(uniq, type=batch["ref"].type),
            "matches": pa.array(cnt),
            "weight": sub["weight"].take(pa.array(first))
            if len(uniq) else sub["weight"].slice(0, 0),
        })

    parts = [t for t in postings.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    import ray.data

    all_t = pa.concat_tables(parts) if parts \
        else pa.table({"ref": pa.array([], pa.int64()),
                       "matches": pa.array([], pa.int64()),
                       "weight": pa.array([], pa.int64())})
    refs = np.asarray(all_t["ref"])
    if refs.dtype == object:
        refs = refs.astype(str)
    uniq, inv = (np.unique(refs, return_inverse=True) if len(refs)
                 else (refs, np.empty(0, np.int64)))
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, all_t["matches"].to_numpy(zero_copy_only=False))
    wts = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    if len(refs):
        np.minimum.at(wts, inv, all_t["weight"].to_numpy(
            zero_copy_only=False).astype(np.int64))
    order = np.lexsort((uniq, wts, -cnt))[:limit]
    wtype = all_t["weight"].type if len(parts) else pa.int64()
    return ray.data.from_arrow(pa.table({
        "ref": pa.array(uniq[order], type=all_t["ref"].type),
        "matches": pa.array(cnt[order]),
        "weight": pa.array(wts[order]).cast(wtype),
    }))


def find_many(docsets, needles: list[str], limit: int = LIMIT_DEFAULT, *,
              merge: str = "driver"):
    """Batch FIND: score every needle against every doc in one streamed scan.

    The reference server answers FINDs one at a time over a mmap index
    (server.rb event loop); here the NEEDLES are inverted into a tiny
    posting table (trigram code → needle ids, broadcast once via ray.put)
    and each docsets batch gathers, per doc trigram, only the needles
    sharing it — O(shared trigram occurrences), the transpose of the
    reference's find gather (storage.c:498-519), instead of the dense
    Q × batch popcount scan this replaced (which read every doc's full
    2,744-byte bitset once PER NEEDLE). One bincount over
    (doc, needle) keys scores the whole batch; batch-local top-k per
    needle is a single lexsort over the nonzero hits. The corpus side
    streams — nothing corpus-sized is broadcast or driver-materialized.

    ``merge="driver"`` (default) concatenates the batch-local top-k
    partials on the driver — bounded by Q × limit × n_blocks rows — and
    ranks them in one vectorized pass. For very large needle sets use
    ``merge="shuffle"``: one hash-partitioned exchange of the partials
    (still ≤ Q × limit × n_blocks rows) ranked per partition.

    Returns (needle, ref, matches, weight, rank) with the reference
    ordering (matches DESC, weight ASC, ref ASC) as rank ≤ limit per
    needle; needles sharing no trigram with any doc emit no rows.
    """
    import ray

    from blurrily_ray.functions.normalize import normalize_string
    from blurrily_ray.functions.trigram import _concat_ranges
    from blurrily_ray.stages.pairs import _cached_get, _list_csr

    if not (LIMIT_RANGE[0] <= limit <= LIMIT_RANGE[1]):
        raise ValueError(f"limit must be in {LIMIT_RANGE}")
    q_codes, q_ids = [], []
    for qi, needle in enumerate(needles):
        codes = np.unique(tokenize(normalize_string(needle)))
        q_codes.append(codes)
        q_ids.append(np.full(len(codes), qi, dtype=np.int64))
    flat_c = (np.concatenate(q_codes) if q_codes
              else np.empty(0, dtype=np.int64)).astype(np.int64)
    flat_q = (np.concatenate(q_ids) if q_ids
              else np.empty(0, dtype=np.int64))
    order = np.argsort(flat_c, kind="stable")
    n_offs = np.zeros(NUM_TRIGRAMS + 1, dtype=np.int64)
    np.cumsum(np.bincount(flat_c, minlength=NUM_TRIGRAMS), out=n_offs[1:])
    q_ref = ray.put((list(needles), n_offs, flat_q[order]))
    n_q = len(needles)

    def local_topk(batch: pa.Table) -> pa.Table:
        names, offs_n, post_n = _cached_get(q_ref)
        n_rows = len(batch)
        codes, counts = _list_csr(batch["tris"])
        codes = codes.astype(np.int64, copy=False)
        nb_starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=nb_starts[1:])
        wts_all = batch["weight"].to_numpy(zero_copy_only=False)
        refs = batch["ref"]
        r_vals = np.asarray(refs)
        if r_vals.dtype == object:
            r_vals = r_vals.astype(str)  # lexsort needs a sortable dtype
        # chunk rows so the (rows × needles) count vector stays small
        # (≤ ~16 MB — large fresh allocations fault in at page-touch
        # speed on this box; see fuzzy_join's measured note)
        step = max(1, 2_000_000 // max(n_q, 1))
        outs = []
        for lo in range(0, n_rows if n_q else 0, step):
            hi = min(lo + step, n_rows)
            c = codes[nb_starts[lo]:nb_starts[hi]]
            plens = offs_n[c + 1] - offs_n[c]
            g = post_n[np.repeat(offs_n[c], plens) + _concat_ranges(plens)]
            doc_of = np.repeat(np.repeat(
                np.arange(lo, hi, dtype=np.int64), counts[lo:hi]), plens)
            # both sides hold DISTINCT trigram codes, so the bincount of
            # (doc, needle) coincidences IS the shared-trigram count
            cnt = np.bincount((doc_of - lo) * n_q + g,
                              minlength=(hi - lo) * n_q)
            nz = np.nonzero(cnt)[0]
            d_nz, q_nz = nz // n_q + lo, nz % n_q
            m_nz = cnt[nz]
            wts = wts_all[d_nz]
            # one lexsort ranks every needle's chunk-local hits at once:
            # grouped by needle, FIND order within (matches DESC, weight
            # ASC, ref ASC) — then keep the first ``limit`` of each group
            so = np.lexsort((r_vals[d_nz], wts, -m_nz, q_nz))
            qs = q_nz[so]
            starts = np.zeros(len(qs), dtype=np.int64)
            if len(qs):
                grp = np.nonzero(np.diff(qs))[0] + 1
                starts[grp] = grp
                np.maximum.accumulate(starts, out=starts)
            keep = so[(np.arange(len(qs)) - starts) < limit]
            outs.append(pa.table({
                "needle": pa.array(
                    np.asarray(names, dtype=object)[q_nz[keep]],
                    type=pa.string()),
                "ref": refs.take(pa.array(d_nz[keep])),
                "matches": pa.array(m_nz[keep].astype(np.int64),
                                    type=pa.int64()),
                "weight": pa.array(wts[keep].astype(np.int64),
                                   type=pa.int64()),
            }))
        if outs:
            return pa.concat_tables(outs)
        return pa.table({
            "needle": pa.array([], type=pa.string()),
            "ref": pa.array([], type=refs.type),
            "matches": pa.array([], type=pa.int64()),
            "weight": pa.array([], type=pa.int64()),
        })

    partials = docsets.map_batches(local_topk, batch_format="pyarrow")

    def rank_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["needle", "matches", "weight", "ref"],
                            ascending=[True, False, True, True],
                            kind="stable")
        df["rank"] = df.groupby("needle", sort=False).cumcount() + 1
        return df[df["rank"] <= limit]

    if merge == "shuffle":
        from blurrily_ray.stages.common import partitioned_map

        return partitioned_map(partials, ["needle"], rank_partials)
    # driver merge: ≤ Q × limit × n_blocks rows by construction
    all_p = partials.to_pandas()
    if "needle" not in all_p.columns or not len(all_p):
        # zero-block corpus / no hits: from_pandas would infer null-typed
        # columns for an empty object frame — return a typed Arrow empty
        return ray.data.from_arrow(pa.table({
            "needle": pa.array([], type=pa.string()),
            "ref": pa.array([], type=pa.string()),
            "matches": pa.array([], type=pa.int64()),
            "weight": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64())}))
    return ray.data.from_pandas(rank_partials(all_p).reset_index(drop=True))


def find_triples(postings, needle: str, limit: int = LIMIT_DEFAULT) -> list[list]:
    """find() materialized to the reference's [[ref, matches, weight], ...]."""
    out = find(postings, needle, limit).take_all()
    return [[r["ref"], int(r["matches"]), int(r["weight"])] for r in out]


def delete(postings, refs):
    """Anti-join against a tombstone set (storage.c:584-612). The tombstone
    side is a sorted array broadcast ONCE via ray.put (fetched per worker,
    not shipped per task); for huge tombstone sets use a hash join."""
    import ray

    from blurrily_ray.stages.pairs import _cached_get

    tomb = np.sort(np.unique(np.asarray(list(refs))))
    if tomb.dtype == object:
        tomb = tomb.astype(str)
    tomb_ref = ray.put(tomb)

    def drop(batch: pa.Table) -> pa.Table:
        t = _cached_get(tomb_ref)
        r = np.asarray(batch["ref"])
        if r.dtype == object:
            r = r.astype(str)
        if len(t) == 0:
            return batch
        idx = np.searchsorted(t, r)
        idx[idx >= len(t)] = 0
        keep = t[idx] != r
        return batch.filter(pa.array(keep))

    return postings.map_batches(drop, batch_format="pyarrow")


def stats(postings) -> dict:
    """{references, trigrams} totals (storage.c:616-621)."""
    n_postings = postings.count()
    if n_postings == 0:
        return {"references": 0, "trigrams": 0}
    return {"references": len(postings.unique("ref")),
            "trigrams": int(n_postings)}


class LocalFinder:
    """In-memory serving kernel: the reference's find algorithm verbatim
    (gather posting ranges of the needle's trigrams → count per ref →
    rank), backed by numpy arrays built ONCE from a postings Dataset.

    This is what a scorer/serving ACTOR holds per shard: memory is the
    postings themselves (~10 B/posting), a find is O(gathered) — the
    1–2 ms regime the reference serves from its mmap image
    (storage.c:477-580, README.md:15-17). Dataset-based :func:`find`
    remains the batch path; LocalFinder is the latency path (used by
    server.py for wire FINDs)."""

    def __init__(self, postings=None):
        # accepts a postings Dataset, a pyarrow Table (the Ray-free
        # serving-load path, namespaces.local_postings), or None (empty)
        if postings is None:
            batches = []
        elif isinstance(postings, pa.Table):
            batches = [postings]
        else:
            batches = postings.iter_batches(batch_size=None,
                                            batch_format="pyarrow")
        tris_l, refs_l, wts_l = [], [], []
        for batch in batches:
            tris_l.append(batch["trigram"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            r = np.asarray(batch["ref"])
            refs_l.append(r.astype(str) if r.dtype == object else r)
            wts_l.append(batch["weight"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        if tris_l:
            tri = np.concatenate(tris_l)
            refs = np.concatenate(refs_l)
            wts = np.concatenate(wts_l)
        else:
            tri = np.empty(0, np.int64)
            refs = np.empty(0, np.int64)
            wts = np.empty(0, np.int64)
        # ref dictionary (sorted) + int ids; weight is constant per ref
        self.refs, inv = np.unique(refs, return_inverse=True)
        self.weights = np.zeros(len(self.refs), dtype=np.int64)
        self.weights[inv] = wts
        # postings sorted by trigram → per-code ranges via one cumsum
        order = np.argsort(tri, kind="stable")
        self.ref_ids = inv[order].astype(np.int64)
        counts = np.bincount(tri, minlength=NUM_TRIGRAMS)
        self.offsets = np.zeros(NUM_TRIGRAMS + 1, dtype=np.int64)
        np.cumsum(counts, out=self.offsets[1:])

    @classmethod
    def from_arrays(cls, refs, weights, ref_ids, offsets) -> "LocalFinder":
        """Adopt prebuilt serving arrays VERBATIM (the mmap sidecar load
        path, state/sidecar.py) — no Parquet decode, no unique/argsort.
        Arrays may be read-only memory maps: every mutation path
        (put_rows/delete_refs/_rebuild_postings) replaces whole arrays,
        never writes in place."""
        f = cls.__new__(cls)
        f.refs = refs
        f.weights = weights
        f.ref_ids = ref_ids
        f.offsets = offsets
        return f

    def to_arrays(self) -> dict:
        return {"refs": self.refs, "weights": self.weights,
                "ref_ids": self.ref_ids, "offsets": self.offsets}

    def find(self, needle: str, limit: int = LIMIT_DEFAULT) -> list[list]:
        if not (LIMIT_RANGE[0] <= limit <= LIMIT_RANGE[1]):
            raise ValueError(f"limit must be in {LIMIT_RANGE}")
        codes = tokenize(normalize_string(needle))
        gathered = np.concatenate(
            [self.ref_ids[self.offsets[c]:self.offsets[c + 1]]
             for c in codes]) if len(codes) else np.empty(0, np.int64)
        if not len(gathered):
            return []
        # count per ref: O(n) bincount over the dense int ids when the
        # dictionary is comparable to the gather (the common serving
        # case — np.unique's O(n log n) sort was 5x slower at ~100k
        # gathered rows); the unique path remains for a huge-dictionary /
        # tiny-needle shard where a refs-sized counter would dominate
        if len(self.refs) <= 4 * len(gathered):
            counts = np.bincount(gathered, minlength=len(self.refs))
            hit = np.flatnonzero(counts)
            matches = counts[hit]
        else:
            hit, matches = np.unique(gathered, return_counts=True)
        w = self.weights[hit]
        # top-k via the match-count plateau: one composite argpartition
        # (matches DESC, weight ASC packed into one int64 — matches is
        # bounded by the needle's trigram count, weight < 2^31 < 2^40),
        # then the exact lexsort runs only on rows tied-or-better than
        # the k-th — identical output to sorting everything. hit is
        # ascending == ref ascending (the dictionary is sorted), giving
        # the deterministic ref tie-break without touching self.refs.
        if len(hit) > 4 * limit and int(w.max()) < (1 << 40):
            comp = (matches.astype(np.int64) << 40) - w
            top = np.argpartition(comp, len(comp) - limit)[-limit:]
            kth = comp[top].min()
            plateau = np.flatnonzero(comp >= kth)
            hit, matches, w = hit[plateau], matches[plateau], w[plateau]
        order = np.lexsort((hit, w, -matches))[:limit]
        return [[self.refs[hit[o]].item(), int(matches[o]), int(w[o])]
                for o in order]

    def stats(self) -> dict:
        return {"references": int(len(self.refs)),
                "trigrams": int(len(self.ref_ids))}

    def _rebuild_postings(self, tri: np.ndarray, rid: np.ndarray) -> None:
        order = np.argsort(tri, kind="stable")
        self.ref_ids = rid[order].astype(np.int64)
        counts = np.bincount(tri, minlength=NUM_TRIGRAMS)
        self.offsets = np.zeros(NUM_TRIGRAMS + 1, dtype=np.int64)
        np.cumsum(counts, out=self.offsets[1:])

    def _tri_column(self) -> np.ndarray:
        """Reconstruct the (sorted) trigram column from the range offsets."""
        return np.repeat(np.arange(NUM_TRIGRAMS, dtype=np.int64),
                         np.diff(self.offsets))

    def put_rows(self, rows) -> int:
        """Incremental PUT: merge ``[{ref, text, weight}]`` rows into the
        live arrays — the serving-path analogue of the reference's in-place
        append (storage.c:398-473, ~100 µs PUT with the next FIND at 1-2
        ms). A wire PUT must not cost a Ray job + full rebuild on the next
        FIND; here it is tokenize-the-new-rows + one stable re-sort of the
        postings, all local numpy. First-put-wins against refs already
        live (storage.c:408) and within ``rows``; weight 0 defaults to the
        normalized length (storage.c:409). Returns rows actually added."""
        if not rows:
            return 0
        want_str = self.refs.dtype.kind in "UO"
        new_refs, new_wts, code_lists = [], [], []
        seen: set = set()
        for r in rows:
            ref = str(r["ref"]) if want_str else int(r["ref"])
            if ref in seen:
                continue
            if len(self.refs):
                p = int(np.searchsorted(self.refs, ref))
                if p < len(self.refs) and self.refs[p] == ref:
                    continue  # first-put-wins: ref already live
            seen.add(ref)
            norm = normalize_string(r.get("text") or "")
            w = int(r.get("weight") or 0) or len(norm)
            new_refs.append(ref)
            new_wts.append(w)
            code_lists.append(np.asarray(tokenize(norm), dtype=np.int64))
        if not new_refs:
            return 0
        new_arr = np.asarray(new_refs)
        combined = np.unique(np.concatenate([self.refs, new_arr])
                             if len(self.refs) else new_arr)
        old_map = np.searchsorted(combined, self.refs)
        new_map = np.searchsorted(combined, new_arr)
        weights = np.zeros(len(combined), dtype=np.int64)
        weights[old_map] = self.weights
        weights[new_map] = np.asarray(new_wts, dtype=np.int64)
        tri = np.concatenate([self._tri_column()] + code_lists)
        rid = np.concatenate(
            [old_map[self.ref_ids],
             np.repeat(new_map, [len(c) for c in code_lists])])
        self.refs = combined
        self.weights = weights
        self._rebuild_postings(tri, rid)
        return len(new_refs)

    def delete_refs(self, refs) -> int:
        """Incremental DELETE: drop the postings and dictionary entries of
        ``refs``; missing refs are no-ops (storage.c:584-612). Returns the
        number of refs actually removed."""
        if not len(self.refs):
            return 0
        want_str = self.refs.dtype.kind in "UO"
        arr = np.unique(np.asarray(
            [str(r) if want_str else int(r) for r in refs]))
        pos = np.searchsorted(self.refs, arr)
        ok = pos < len(self.refs)
        match = np.zeros(len(arr), dtype=bool)
        match[ok] = self.refs[pos[ok]] == arr[ok]
        del_ids = pos[match]
        if not len(del_ids):
            return 0
        keep_ref = np.ones(len(self.refs), dtype=bool)
        keep_ref[del_ids] = False
        keep_post = keep_ref[self.ref_ids]
        tri = self._tri_column()[keep_post]
        remap = np.cumsum(keep_ref) - 1  # old id → compacted id
        rid = remap[self.ref_ids[keep_post]]
        self.refs = self.refs[keep_ref]
        self.weights = self.weights[keep_ref]
        self._rebuild_postings(tri, rid)
        return int(len(del_ids))


def save(postings, path: str) -> str:
    """Checkpoint the index as Parquet + manifest (atomic, resumable)."""
    from blurrily_ray.state.checkpoint import write_checkpoint

    return write_checkpoint(postings, path, kind="postings")


def load(path: str):
    from blurrily_ray.state.checkpoint import read_checkpoint

    return read_checkpoint(path)


def fuzzy_join(needles, catalog, *, needle_id: str = "ref",
               needle_text: str = "text", catalog_ref: str = "ref",
               catalog_text: str = "text", k: int = 3):
    """Dataset-scale fuzzy linkage: for every needle row, the top-``k``
    catalog rows by shared-trigram score with the reference's FIND
    ordering (matches DESC, weight ASC, ref ASC; storage.c:477-580).

    This is the reference's find GATHER (storage.c:498-519) with the
    needle side a streamed Dataset of any size: the catalog — assumed
    dim-sized (a canonical entity/record table; the same assumption as
    ``relational.broadcast_join``) — is built ONCE, off-driver, into an
    inverted index (``pairs.docsets_inverted_ref``: per-trigram posting
    ranges over ref-sorted rows), and every needle touches only the
    postings of its own ~L+1 trigrams — O(gathered postings) per needle,
    not O(catalog) (the dense bitset scan this replaced was ~100 MB of
    DRAM reads PER NEEDLE at sf0.1). Scoring is a per-needle vectorized
    gather + bincount + integer lexsort over CACHE-RESIDENT arrays
    (~130 k gathered postings, one n_cat-sized count vector) — a fully
    chunk-vectorized variant building 66 M-element (needle, row) keys was
    measured 8× SLOWER on this box (large fresh allocations fault in at
    page-touch speed; small per-needle temps stay in L2). The catalog is
    complete in every task, so there is NO merge shuffle. For two large
    fuzzy sides use the ER pair pipeline or the sharded scorer engine
    instead.

    Returns (needle_id, ref, matches, weight); needles sharing zero
    trigrams with every catalog row emit no rows (matches >= 1 otherwise).
    """
    from blurrily_ray.functions.trigram import _concat_ranges
    from blurrily_ray.stages.pairs import (
        _cached_get, _list_csr, docsets_inverted_ref)
    from blurrily_ray.stages.tokenize import _docsets_batch, docsets_from_docs

    lut_ref = docsets_inverted_ref(
        docsets_from_docs(catalog, ref_col=catalog_ref,
                          text_col=catalog_text))

    def score_batch(batch: pa.Table) -> pa.Table:
        refs_s, wts_s, offsets, post_rows = _cached_get(lut_ref)
        n_cat = len(refs_s)
        qpos, hits, ms = [], [], []
        if n_cat and len(batch):
            nb = _docsets_batch(batch, needle_id, needle_text)
            codes, counts = _list_csr(nb["tris"])
            codes = codes.astype(np.int64, copy=False)
            nb_starts = np.zeros(len(counts) + 1, np.int64)
            np.cumsum(counts, out=nb_starts[1:])
            plens = offsets[codes + 1] - offsets[codes]
            for qi in range(len(batch)):
                c = codes[nb_starts[qi]:nb_starts[qi + 1]]
                pl = plens[nb_starts[qi]:nb_starts[qi + 1]]
                g = post_rows[np.repeat(offsets[c], pl)
                              + _concat_ranges(pl)]
                cnt = np.bincount(g, minlength=n_cat)
                hit = np.nonzero(cnt)[0]
                m = cnt[hit]
                # FIND order (matches DESC, weight ASC, ref ASC): rows
                # are ref-sorted, so hit ascending IS ref ascending.
                # A long needle hits most of a dim-sized catalog (every
                # shared trigram counts), so lexsorting ALL hits per
                # needle dominated the scan (2.7 → 1.2 ms/needle on sf0.1
                # docs); O(n) partition down to the >=k-th match-count
                # plateau first, then order only those candidates — ties
                # on the k-th count stay in the plateau, so the final
                # top-k is EXACTLY the full-sort answer.
                if len(hit) > k:
                    kth = np.partition(m, len(m) - k)[len(m) - k]
                    cand = np.nonzero(m >= kth)[0]
                    order = cand[np.lexsort(
                        (hit[cand], wts_s[hit[cand]], -m[cand]))[:k]]
                else:
                    order = np.lexsort((hit, wts_s[hit], -m))[:k]
                hit = hit[order]
                qpos.append(np.full(len(hit), qi, dtype=np.int64))
                hits.append(hit)
                ms.append(m[order])
        qp = (np.concatenate(qpos) if qpos
              else np.empty(0, dtype=np.int64))
        hi = (np.concatenate(hits) if hits
              else np.empty(0, dtype=np.int64))
        mv = (np.concatenate(ms) if ms else np.empty(0, dtype=np.int64))
        return pa.table({
            needle_id: batch[needle_id].take(pa.array(qp)),
            "ref": pa.array(refs_s[hi]),
            "matches": pa.array(mv.astype(np.int64)),
            "weight": pa.array(wts_s[hi].astype(np.int64)),
        })

    return needles.map_batches(score_batch, batch_format="pyarrow",
                               batch_size=512)
