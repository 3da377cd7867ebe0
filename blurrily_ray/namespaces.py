"""Named index namespaces — the MapGroup equivalent.

The reference's MapGroup (lib/blurrily/map_group.rb:5-38) holds multiple
named Maps and persists each to ``<dir>/<name>.trigrams``. Here a namespace
is a directory of Parquet index checkpoints, ``<root>/<name>/``, with
lazy load-or-build semantics and the reference's 4 verbs (PUT → build,
FIND, DELETE, CLEAR — command_processor.rb:26-51) as methods.
"""

from __future__ import annotations

import os
import shutil

from blurrily_ray.functions.validators import (
    LIMIT_DEFAULT,
    check_db_name,
    check_limit,
    check_needle,
)
from blurrily_ray.stages.index import build_postings, delete, find_triples, stats
from blurrily_ray.state.checkpoint import checkpoint_valid, read_checkpoint, write_checkpoint


def _drop_existing_refs(postings, existing):
    """Anti-semi-join: drop postings rows whose ref is already indexed.

    The existing-ref set is broadcast once (ray.put of a sorted array) —
    refs are ≪ postings rows; at billions of refs swap for a hash anti-join.
    """
    import numpy as np
    import pyarrow as pa
    import ray

    refs = existing.unique("ref")
    if not refs:
        return postings
    arr = np.sort(np.asarray(refs))
    if arr.dtype == object:
        arr = arr.astype(str)
    ref_obj = ray.put(arr)

    def drop(batch: pa.Table) -> pa.Table:
        from blurrily_ray.stages.pairs import _cached_get

        existing_sorted = _cached_get(ref_obj)
        r = np.asarray(batch["ref"])
        if r.dtype == object:
            r = r.astype(str)
        idx = np.searchsorted(existing_sorted, r)
        idx[idx >= len(existing_sorted)] = 0
        keep = existing_sorted[idx] != r
        return batch.filter(pa.array(keep))

    return postings.map_batches(drop, batch_format="pyarrow")


class IndexGroup:
    """A directory of named trigram indexes (load-or-create per name)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._cache: dict = {}

    def _path(self, name: str) -> str:
        return os.path.join(self.root, check_db_name(name))

    def db(self, name: str):
        """Lazy load-or-None (map_group.rb:12-14, 29-33)."""
        if name not in self._cache:
            p = self._path(name)
            self._cache[name] = read_checkpoint(p) if checkpoint_valid(p) else None
        return self._cache[name]

    def put_bulk(self, name: str, docs, **kw) -> None:
        """Batch PUT: build (or extend) the named index.

        First-put-wins (storage.c:408 returns 0 for an existing ref;
        map_spec.rb:43-47): incoming rows whose ref already exists in the
        index are dropped before the union, so re-putting a ref never
        duplicates its postings."""
        postings = build_postings(docs, **kw)
        existing = self.db(name)
        if existing is not None:
            postings = _drop_existing_refs(postings, existing)
            postings = existing.union(postings)
        self.save(name, postings)

    def find(self, name: str, needle: str, limit: int = LIMIT_DEFAULT):
        check_needle(needle)
        check_limit(limit)
        ix = self.db(name)
        return [] if ix is None else find_triples(ix, needle, limit)

    def delete(self, name: str, refs) -> None:
        ix = self.db(name)
        if ix is not None:
            self.save(name, delete(ix, refs))

    def clear(self, name: str) -> None:
        p = self._path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
        self._cache.pop(name, None)

    def stats(self, name: str) -> dict:
        ix = self.db(name)
        return {"references": 0, "trigrams": 0} if ix is None else stats(ix)

    def save(self, name: str, postings) -> None:
        write_checkpoint(postings, self._path(name), kind="postings")
        self._cache.pop(name, None)

    def save_all(self) -> None:
        """Persist every cached index (map_group.rb:16-25)."""
        for name, ix in list(self._cache.items()):
            if ix is not None:
                self.save(name, ix)
