"""Checkpoint + lineage manifests with atomic commit, enabling resume.

The Ray-native analogue of the reference's save discipline (storage.c:
299-377): write to a temp sibling, fsync-equivalent (Parquet close), then
one atomic ``rename(2)`` — a checkpoint either fully exists or doesn't.

Layout:  <path>/data/*.parquet  +  <path>/MANIFEST.json

The manifest records row count, schema, the producing stage, the config
digest and the input digests, so a resumed run can (a) trust the data
without rescanning it and (b) detect stale checkpoints when config or
inputs changed. ``run_stage`` is the resume primitive: it skips any stage
whose checkpoint is valid for the current (config, inputs) lineage.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Any, Callable

import pyarrow.parquet as pq
import ray.data

MANIFEST = "MANIFEST.json"


def _parquet_rows(data_dir: str) -> int:
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(data_dir, "*.parquet")))


def write_checkpoint(ds, path: str, *, kind: str = "data",
                     lineage: dict | None = None) -> str:
    """Materialize ``ds`` at ``path`` atomically; returns ``path``."""
    tmp = f"{path}.tmp.{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    data_dir = os.path.join(tmp, "data")
    # write the new data BEFORE touching the old checkpoint: ``ds`` may be
    # a lazy pipeline that reads from ``path`` itself (delete-and-resave)
    ds.write_parquet(data_dir)
    schema = [f for f in (pq.read_schema(f) for f in glob.glob(
        os.path.join(data_dir, "*.parquet"))[:1])]
    manifest = {
        "kind": kind,
        "rows": _parquet_rows(data_dir),
        "columns": [c.name for c in schema[0]] if schema else [],
        "created_at": time.time(),
        "lineage": lineage or {},
        "format_version": 1,
    }
    with open(os.path.join(tmp, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)  # the atomic commit (storage.c:371-374)
    return path


def read_manifest(path: str) -> dict | None:
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        return None
    with open(mf) as fh:
        return json.load(fh)


def checkpoint_valid(path: str, *, lineage: dict | None = None) -> bool:
    """A checkpoint is valid if its manifest exists, its Parquet row count
    matches, and (when given) its recorded lineage equals the expected one."""
    m = read_manifest(path)
    if m is None:
        return False
    data_dir = os.path.join(path, "data")
    if not os.path.isdir(data_dir) or _parquet_rows(data_dir) != m["rows"]:
        return False
    if lineage is not None and m.get("lineage") != lineage:
        return False
    return True


def read_checkpoint(path: str):
    m = read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no checkpoint manifest at {path}")
    if not checkpoint_valid(path):
        raise ValueError(f"corrupt/incomplete checkpoint at {path}")
    return ray.data.read_parquet(os.path.join(path, "data"))


def input_fingerprint(ds) -> str:
    """Cheap content-identity digest of a Dataset's input: source file
    paths + sizes + mtimes when it reads files, else row count + schema.
    Recorded in stage lineage so a checkpoint is invalidated when the
    INPUT changes, not just the config (same-config different-data reruns
    must not silently reuse stale checkpoints)."""
    import hashlib

    h = hashlib.md5()
    files = []
    try:
        files = sorted(ds.input_files() or [])
    except Exception:
        files = []
    if files:
        for f in files:
            h.update(f.encode())
            local = f[7:] if f.startswith("file://") else f
            try:
                st = os.stat(local)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                pass
    else:
        h.update(str(ds.count()).encode())
        h.update(str(ds.schema()).encode())
    return h.hexdigest()[:16]


def run_stage(name: str, path: str, fn: Callable[[], Any], *,
              lineage: dict | None = None, force: bool = False):
    """Resume primitive: return the checkpointed Dataset for ``name`` if its
    manifest matches ``lineage``; otherwise compute via ``fn()``, checkpoint,
    and return the re-read (so downstream stages read stable Parquet, not a
    live lineage re-execution)."""
    if not force and checkpoint_valid(path, lineage=lineage):
        return read_checkpoint(path)
    ds = fn()
    write_checkpoint(ds, path, kind=name, lineage=lineage)
    return read_checkpoint(path)
