"""Named index namespaces — the MapGroup equivalent, with INCREMENTAL
maintenance.

The reference's MapGroup (lib/blurrily/map_group.rb:5-38) holds multiple
named Maps and persists each to ``<dir>/<name>.trigrams``; its PUT/DELETE
are online O(1)/O(index) mutations (storage.c:398-473, 584-612). Here a
namespace is a directory of Parquet index SEGMENTS plus tombstone files:

    <root>/<name>/
        SEGMENTS.json            ordered op log: segments + tombstones
        seg-000001/              checkpoint dir (data/*.parquet + MANIFEST)
        seg-000002/
        tomb-000003.parquet      (ref) tombstones, sequenced

- ``put_bulk`` appends ONE new segment (first-put-wins: incoming refs
  already live are dropped) — existing segments are never rewritten.
- ``delete`` appends ONE tombstone file — no segment rewrite.
- A ref's live postings are the segments with seq greater than the ref's
  last tombstone: put → delete → re-put replays exactly like the
  reference (map_spec.rb:78-115 delete/re-add semantics).
- ``compact`` folds everything into a single segment and clears
  tombstones (the Ray-native analogue of the reference's save producing
  one clean image).

Verbs keep the reference's validation (command_processor.rb:26-51).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from blurrily_ray.functions.validators import (
    LIMIT_DEFAULT,
    check_db_name,
    check_limit,
    check_needle,
)
from blurrily_ray.stages.index import build_postings, find_triples, stats
from blurrily_ray.state.checkpoint import (
    checkpoint_valid,
    read_checkpoint,
    write_checkpoint,
)

SEGMENTS = "SEGMENTS.json"


def _drop_refs(postings, refs_arr: np.ndarray):
    """Filter postings rows whose ref is in the sorted broadcast array."""
    import ray

    if len(refs_arr) == 0:
        return postings
    ref_obj = ray.put(refs_arr)

    def drop(batch: pa.Table) -> pa.Table:
        from blurrily_ray.stages.pairs import _cached_get

        tomb = _cached_get(ref_obj)
        r = np.asarray(batch["ref"])
        if r.dtype == object:
            r = r.astype(str)
        idx = np.searchsorted(tomb, r)
        idx[idx >= len(tomb)] = 0
        keep = tomb[idx] != r
        return batch.filter(pa.array(keep))

    return postings.map_batches(drop, batch_format="pyarrow")


class IndexGroup:
    """A directory of named trigram indexes (load-or-create per name)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._cache: dict = {}

    # ------------------------------------------------------------ layout

    def _path(self, name: str) -> str:
        return os.path.join(self.root, check_db_name(name))

    def _log(self, name: str) -> list[dict]:
        p = os.path.join(self._path(name), SEGMENTS)
        if not os.path.exists(p):
            return []
        with open(p) as fh:
            return json.load(fh)["ops"]

    def _write_log(self, name: str, ops: list[dict]) -> None:
        d = self._path(name)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, SEGMENTS + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"ops": ops, "format_version": 2}, fh, indent=1)
        os.replace(tmp, os.path.join(d, SEGMENTS))
        self._cache.pop(name, None)

    def _migrate_legacy(self, name: str) -> list[dict]:
        """A pre-segment checkpoint (MANIFEST.json at the top level)
        becomes seg-000001 of the new layout — one rewrite, once."""
        p = self._path(name)
        ops = self._log(name)
        if ops or not checkpoint_valid(p):
            return ops
        legacy = read_checkpoint(p).materialize()
        tmp_seg = p + ".migrate"
        write_checkpoint(legacy, tmp_seg, kind="postings")
        shutil.rmtree(p)
        os.makedirs(p)
        os.rename(tmp_seg, os.path.join(p, "seg-000001"))
        ops = [{"op": "seg", "dir": "seg-000001", "seq": 1}]
        self._write_log(name, ops)
        return ops

    def _tomb_refs(self, name: str, after_seq: int) -> np.ndarray:
        """Sorted refs tombstoned strictly after ``after_seq``."""
        parts = []
        for op in self._log(name):
            if op["op"] == "tomb" and op["seq"] > after_seq:
                t = pq.read_table(os.path.join(self._path(name), op["file"]))
                r = np.asarray(t["ref"].combine_chunks())
                parts.append(r.astype(str) if r.dtype == object else r)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.unique(np.concatenate(parts)))

    # ------------------------------------------------------------- reads

    def db(self, name: str):
        """Live postings Dataset for ``name`` (None when empty) — the
        union over segments of rows not tombstoned after the segment."""
        if name in self._cache:
            return self._cache[name]
        ops = self._migrate_legacy(name)
        ds = None
        for op in ops:
            if op["op"] != "seg":
                continue
            seg = read_checkpoint(os.path.join(self._path(name), op["dir"]))
            tomb = self._tomb_refs(name, op["seq"])
            if len(tomb):
                seg = _drop_refs(seg, tomb)
            ds = seg if ds is None else ds.union(seg)
        self._cache[name] = ds
        return ds

    def local_postings(self, name: str) -> "pa.Table | None":
        """Serving-path replay: the same segments ⊖ tombstones union as
        :meth:`db`, read DIRECTLY with pyarrow — no Ray job, no Dataset.
        This is the LOAD analogue of the reference's ~10 ms mmap open
        (storage.c:210-266): a few parquet reads + one numpy tombstone
        filter, milliseconds-not-seconds, so a serving process (server.py)
        can become query-ready without paying Ray scheduling. The Dataset
        path (:meth:`db`) remains the batch/pipeline surface."""
        import glob as _glob

        ops = self._migrate_legacy(name)
        tables = []
        for op in ops:
            if op["op"] != "seg":
                continue
            files = sorted(_glob.glob(os.path.join(
                self._path(name), op["dir"], "data", "*.parquet")))
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            tomb = self._tomb_refs(name, op["seq"])
            if len(tomb) and len(t):
                r = np.asarray(t["ref"].combine_chunks())
                if r.dtype == object:
                    r = r.astype(str)
                idx = np.searchsorted(tomb, r)
                idx[idx >= len(tomb)] = 0
                t = t.filter(pa.array(tomb[idx] != r))
            tables.append(t)
        if not tables:
            return None
        return pa.concat_tables(tables)

    def local_finder(self, name: str):
        """Durable segments → serving-ready :class:`LocalFinder`, fully
        driver-local (see :meth:`local_postings`). None when empty."""
        from blurrily_ray.stages.index import LocalFinder

        t = self.local_postings(name)
        return None if t is None else LocalFinder(t)

    def find(self, name: str, needle: str, limit: int = LIMIT_DEFAULT):
        check_needle(needle)
        check_limit(limit)
        ix = self.db(name)
        return [] if ix is None else find_triples(ix, needle, limit)

    def stats(self, name: str) -> dict:
        ix = self.db(name)
        return {"references": 0, "trigrams": 0} if ix is None else stats(ix)

    def _live_refs(self, name: str) -> np.ndarray:
        ix = self.db(name)
        if ix is None:
            return np.empty(0, dtype=np.int64)
        refs = ix.unique("ref")
        if not refs:
            return np.empty(0, dtype=np.int64)
        arr = np.sort(np.asarray(refs))
        return arr.astype(str) if arr.dtype == object else arr

    # ------------------------------------------------------------ writes

    def _next_seq(self, name: str) -> int:
        ops = self._log(name)
        return (max(op["seq"] for op in ops) + 1) if ops else 1

    def put_bulk(self, name: str, docs, **kw) -> None:
        """Batch PUT as a DELTA SEGMENT append — existing segments are not
        rewritten. First-put-wins (storage.c:408; map_spec.rb:43-47):
        incoming postings whose ref is already live are dropped."""
        ops = self._migrate_legacy(name)
        postings = build_postings(docs, **kw)
        live = self._live_refs(name)
        if len(live):
            postings = _drop_refs(postings, live)
        seq = self._next_seq(name)
        seg_name = f"seg-{seq:06d}"
        seg_path = os.path.join(self._path(name), seg_name)
        write_checkpoint(postings, seg_path, kind="postings")
        from blurrily_ray.state.checkpoint import read_manifest

        if ops and (read_manifest(seg_path) or {}).get("rows", 0) == 0:
            shutil.rmtree(seg_path)  # nothing new: don't grow the log
            return
        self._write_log(name, ops + [{"op": "seg", "dir": seg_name,
                                      "seq": seq}])

    def delete(self, name: str, refs) -> None:
        """DELETE as a tombstone append — no segment rewrite; a later put
        of the same ref re-adds it (tombstones are sequenced)."""
        ops = self._migrate_legacy(name)
        if not ops:
            return  # empty index: reference DELETE of missing ref is a no-op
        arr = np.unique(np.asarray(list(refs)))
        if arr.dtype == object:
            arr = arr.astype(str)
        seq = self._next_seq(name)
        fname = f"tomb-{seq:06d}.parquet"
        pq.write_table(pa.table({"ref": pa.array(arr)}),
                       os.path.join(self._path(name), fname))
        self._write_log(name, ops + [{"op": "tomb", "file": fname,
                                      "seq": seq}])

    def compact(self, name: str) -> None:
        """Fold all segments minus tombstones into one segment and drop
        the tombstones — bounds read amplification after many deltas."""
        ix = self.db(name)
        if ix is None:
            return
        d = self._path(name)
        tmp_seg = d + ".compact"
        write_checkpoint(ix.materialize(), tmp_seg, kind="postings")
        for op in self._log(name):
            target = os.path.join(d, op.get("dir", op.get("file", "")))
            if os.path.isdir(target):
                shutil.rmtree(target)
            elif os.path.exists(target):
                os.remove(target)
        os.rename(tmp_seg, os.path.join(d, "seg-000001"))
        self._write_log(name, [{"op": "seg", "dir": "seg-000001", "seq": 1}])

    def clear(self, name: str) -> None:
        p = self._path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
        self._cache.pop(name, None)

    def save(self, name: str, postings) -> None:
        """Replace the whole namespace with one segment (legacy full-save
        surface, used by save_all and external callers)."""
        d = self._path(name)
        tmp_seg = d + ".save"
        write_checkpoint(postings, tmp_seg, kind="postings")
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
        os.rename(tmp_seg, os.path.join(d, "seg-000001"))
        self._write_log(name, [{"op": "seg", "dir": "seg-000001", "seq": 1}])

    def save_all(self) -> None:
        """Persist every cached index (map_group.rb:16-25). Segments are
        already durable on write, so this only compacts loaded names."""
        for name in list(self._cache):
            if self._cache.get(name) is not None:
                self.compact(name)
