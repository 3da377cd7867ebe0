"""Memory-mappable serving sidecar — the O(1)-warm-load analogue of the
reference's mmap image open (storage.c:210-266, ~10 ms LOAD).

A postings segment (Parquet + MANIFEST, state/checkpoint.py) stays the
durable, schema'd source of truth; next to it, ``<segment>/finder/`` holds
the EXACT arrays a :class:`~blurrily_ray.stages.index.LocalFinder` serves
from, dumped as raw ``.npy``:

    refs.npy      sorted ref dictionary (int64 or fixed-width unicode)
    weights.npy   int64, aligned with refs
    ref_ids.npy   int64 posting -> ref-dict position, trigram-sorted
    offsets.npy   int64[NUM_TRIGRAMS + 1] per-trigram posting ranges
    META.json     row counts + the parent manifest's row count

so a restarting serving process skips BOTH the Parquet decode and the
unique/argsort index build: ``np.load(mmap_mode="r")`` maps the files and
the kernel pages them in on first gather. The sidecar is derived data —
written atomically (tmp dir + rename) AFTER its segment commits, validated
against the segment manifest's row count on load, and silently absent
means "rebuild from Parquet" (namespaces.local_postings), never an error.

Segments above ``MAX_SIDECAR_POSTINGS`` skip the sidecar: a single-process
finder at that size is the wrong tool — shard across scorer actors
(stages/scorer.py) instead.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from blurrily_ray.functions.trigram import NUM_TRIGRAMS

SIDECAR_DIR = "finder"
META = "META.json"
_ARRAYS = ("refs", "weights", "ref_ids", "offsets")
MAX_SIDECAR_POSTINGS = 50_000_000  # ~1 GB of arrays; shard beyond this


def write_sidecar(seg_path: str) -> bool:
    """Build serving arrays from a committed segment's Parquet and dump
    them as mmap-able npy. Returns False (and writes nothing) when the
    segment is oversized or has no manifest; any partial write is
    discarded by the atomic rename."""
    from blurrily_ray.stages.index import LocalFinder
    from blurrily_ray.state.checkpoint import read_manifest

    manifest = read_manifest(seg_path)
    if manifest is None or manifest["rows"] > MAX_SIDECAR_POSTINGS:
        return False
    table = _read_segment_table(seg_path)
    finder = LocalFinder(table)
    tmp = os.path.join(seg_path, f"{SIDECAR_DIR}.tmp.{os.getpid()}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    arrays = finder.to_arrays()
    for name in _ARRAYS:
        np.save(os.path.join(tmp, f"{name}.npy"), arrays[name],
                allow_pickle=False)
    meta = {
        "postings": int(len(arrays["ref_ids"])),
        "references": int(len(arrays["refs"])),
        "manifest_rows": int(manifest["rows"]),
        "format_version": 1,
    }
    with open(os.path.join(tmp, META), "w") as fh:
        json.dump(meta, fh)
    final = os.path.join(seg_path, SIDECAR_DIR)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return True


def load_sidecar(seg_path: str) -> dict | None:
    """mmap the segment's serving arrays; None when the sidecar is
    missing, unreadable, or stale against the segment manifest (the
    caller falls back to the Parquet replay)."""
    from blurrily_ray.state.checkpoint import read_manifest

    d = os.path.join(seg_path, SIDECAR_DIR)
    mf = os.path.join(d, META)
    if not os.path.exists(mf):
        return None
    try:
        with open(mf) as fh:
            meta = json.load(fh)
        manifest = read_manifest(seg_path)
        if manifest is None or meta.get("manifest_rows") != manifest["rows"]:
            return None
        out = {}
        for name in _ARRAYS:
            out[name] = np.load(os.path.join(d, f"{name}.npy"),
                                mmap_mode="r", allow_pickle=False)
        if (len(out["ref_ids"]) != meta["postings"]
                or len(out["refs"]) != meta["references"]
                or len(out["offsets"]) != NUM_TRIGRAMS + 1):
            return None
        return out
    except (OSError, ValueError, KeyError):
        return None


def _read_segment_table(seg_path: str):
    """Driver-local Parquet read of one segment (no Ray job)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(seg_path, "data", "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def filter_tombstones(arrays: dict, tomb: np.ndarray) -> dict:
    """Drop every posting of a tombstoned ref from serving arrays,
    compacting the ref dictionary — trigram order is preserved, so no
    re-sort. All O(postings) vectorized numpy."""
    refs = np.asarray(arrays["refs"])
    if not len(tomb) or not len(refs):
        return arrays
    tomb = (tomb.astype(str) if refs.dtype.kind in "UO"
            else tomb.astype(np.int64))
    tomb = np.sort(tomb)
    idx = np.searchsorted(tomb, refs)
    idx[idx >= len(tomb)] = 0
    keep_ref = tomb[idx] != refs
    if keep_ref.all():
        return arrays
    ref_ids = np.asarray(arrays["ref_ids"])
    offsets = np.asarray(arrays["offsets"])
    keep_post = keep_ref[ref_ids]
    tri = np.repeat(np.arange(NUM_TRIGRAMS, dtype=np.int64),
                    np.diff(offsets))[keep_post]
    remap = np.cumsum(keep_ref) - 1
    new_offsets = np.zeros(NUM_TRIGRAMS + 1, dtype=np.int64)
    np.cumsum(np.bincount(tri, minlength=NUM_TRIGRAMS),
              out=new_offsets[1:])
    return {
        "refs": refs[keep_ref],
        "weights": np.asarray(arrays["weights"])[keep_ref],
        "ref_ids": remap[ref_ids[keep_post]],
        "offsets": new_offsets,
    }
