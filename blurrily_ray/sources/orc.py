"""ORC source/sink (Ray 2.49 has no read_orc; pyarrow.orc does the
column-projected decode).

Read: one task per file — ``read_binary_files`` distributes the I/O and
each task decodes with ``pyarrow.orc`` (column projection pushed down,
so a 2-column read never materializes the rest). Only ``*.orc`` files
are read, so stale temp files from a crashed writer are ignored. At
100 TB the stripe is the natural split unit; per-file tasks are the
honest granularity this wrapper offers — write many files (the sink
below does) rather than one giant ORC.

Write: one ORC file per block, CONTENT-ADDRESSED (named by the block's
byte hash). Re-runs are idempotent — same bytes, same name, skip — and
byte-identical duplicate BLOCKS dedupe to one stored object, visibly:
the manifest records one (path, rows) row per block, so a path
repeated in the manifest IS the dedup signal (callers that must
preserve duplicate blocks check it). Each write lands via a UNIQUE
temp file + atomic rename (no shared-temp race); the ``-n`` suffix
branch exists only for the hash-collision case (same name, different
size).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyarrow as pa
import ray.data


def read_orc(paths, *, columns: list[str] | None = None):
    """ORC file(s)/dir → Dataset; ``columns`` prunes at the decoder."""
    import pyarrow.orc as po

    def decode(batch: pa.Table):
        # generator UDF: an empty input batch yields NO output block —
        # returning a schema-less pa.table({}) would conflict with the
        # decoded blocks' ORC schema downstream
        for data in batch["bytes"].to_pylist():
            yield po.ORCFile(pa.BufferReader(data)).read(columns=columns)

    return ray.data.read_binary_files(paths, file_extensions=["orc"]) \
        .map_batches(decode, batch_format="pyarrow", batch_size=None)


def _place(out_dir: str, stem: str, buf: bytes) -> str:
    """Land ``buf`` at ``out_dir/<stem>[-n].orc`` atomically: unique
    ``.inprogress`` temp file + ONE ``os.replace`` — the final name is
    never claimed ahead of the rename, so no crash window can leave a
    partial/zero-byte ``*.orc`` (readers only see complete files; stale
    temps are ignored by the ``*.orc``-only read filter). An existing
    same-size file under the stem already holds these bytes (content
    address) → skip idempotently; concurrent writers of the same content
    race to identical bytes, so last-writer-wins is a no-op. A different
    size (md5 collision) falls through to a suffixed name."""
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".inprogress")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(buf)
        n = 0
        while True:
            name = f"{stem}.orc" if n == 0 else f"{stem}-{n}.orc"
            path = os.path.join(out_dir, name)
            try:
                existing = os.path.getsize(path)
            except FileNotFoundError:
                os.replace(tmp, path)
                return path
            if existing == len(buf):
                os.unlink(tmp)
                return path  # identical content already landed
            n += 1
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_orc_manifest(manifest, *, columns: list[str] | None = None):
    """Read honoring a :func:`write_orc` manifest: one decode per MANIFEST
    ROW, so a path the sink recorded twice (byte-identical duplicate
    blocks deduped to one stored object) yields its rows TWICE — the
    round-trip preserves legitimately duplicated data that the plain
    directory-scan :func:`read_orc` would collapse. ``manifest`` is the
    (path, rows) Dataset ``write_orc`` returns (or a re-read of its
    persisted form)."""
    import pyarrow.orc as po

    def decode(batch: pa.Table):
        # generator UDF — a zero-row manifest block yields no output
        # block instead of a schema-less table (see read_orc.decode)
        for p in batch["path"].to_pylist():
            yield po.ORCFile(p).read(columns=columns)

    return manifest.map_batches(decode, batch_format="pyarrow",
                                batch_size=None)


def write_orc(ds, out_dir: str):
    """Dataset → ``out_dir/part-<contenthash>[-n].orc`` per block;
    returns the (path, rows) manifest Dataset (consume it — e.g.
    ``.count()`` — to drive the lazy write).

    Byte-identical duplicate blocks dedupe to ONE stored file; a plain
    :func:`read_orc` of the directory therefore drops the duplicates.
    Callers that must preserve duplicate blocks read back through
    :func:`read_orc_manifest`, which replays one decode per manifest row."""
    import pyarrow.orc as po

    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        po.write_table(batch, sink)
        buf = sink.getvalue().to_pybytes()
        path = _place(out_dir, f"part-{hashlib.md5(buf).hexdigest()}", buf)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(batch)], pa.int64())})

    return ds.map_batches(write, batch_format="pyarrow")
