"""ORC source/sink (Ray 2.49 has no read_orc; pyarrow.orc does the
column-projected decode).

Read: one task per file — ``read_binary_files`` distributes the I/O and
each task decodes with ``pyarrow.orc`` (column projection pushed down,
so a 2-column read never materializes the rest). At 100 TB the stripe is
the natural split unit; per-file tasks are the honest granularity this
wrapper offers — write many files (the sink below does) rather than one
giant ORC.

Write: one ORC file per block, named by the CONTENT HASH of the block —
deterministic and idempotent, so a resumed run overwrites identical
files instead of duplicating rows (the resumable-output discipline).
Returns the manifest Dataset (path, rows) the caller can count/verify.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data


def read_orc(paths, *, columns: list[str] | None = None):
    """ORC file(s)/dir → Dataset; ``columns`` prunes at the decoder."""
    import pyarrow.orc as po

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for data in batch["bytes"].to_pylist():
            f = po.ORCFile(pa.BufferReader(data))
            tables.append(f.read(columns=columns))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(paths) \
        .map_batches(decode, batch_format="pyarrow", batch_size=None)


def write_orc(ds, out_dir: str):
    """Dataset → ``out_dir/part-<contenthash>.orc`` per block; returns
    the (path, rows) manifest Dataset (consume it — e.g. ``.count()`` —
    to drive the lazy write)."""
    import pyarrow.orc as po

    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        po.write_table(batch, sink)
        buf = sink.getvalue().to_pybytes()
        name = f"part-{hashlib.md5(buf).hexdigest()}.orc"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(buf)
        os.replace(tmp, path)  # atomic, idempotent on content collision
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(batch)], pa.int64())})

    return ds.map_batches(write, batch_format="pyarrow")
