"""CSV source/sink for the transcripts and documents tables.

``ray.data.read_csv`` already distributes parsing (one task per file /
block via Arrow's CSV reader); what this module adds is the repo's
schema contract on top: column projection + dtype coercion so a CSV
export of the transcripts table round-trips into the exact Dataset
``pipelines.er`` consumes (int64 ids, string text, no inferred-type
drift — Arrow CSV infers int32/float64 freely), plus a partitioned
writer (one file per block — resumable, never one giant file).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

TRANSCRIPT_SCHEMA = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),  # parity with the parquet/jsonl paths
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


REQUIRED_COLS = ("conv_id", "turn_idx", "text")  # the ER path's inputs


def read_transcripts_csv(paths, *, columns: list[str] | None = None):
    """CSV → transcripts Dataset with the pipeline's exact dtypes.
    Unknown columns are dropped; a missing REQUIRED column (or any
    explicitly requested one) fails loudly AT THE READ — the jsonl
    source's discipline — instead of three stages later with an opaque
    missing-column error."""
    unknown = [c for c in (columns or []) if c not in TRANSCRIPT_SCHEMA]
    if unknown:
        raise ValueError(f"unknown transcript column(s) {unknown}; "
                         f"schema has {list(TRANSCRIPT_SCHEMA)}")
    want = {c: TRANSCRIPT_SCHEMA[c] for c in (columns or TRANSCRIPT_SCHEMA)}
    need = set(columns) if columns else set(REQUIRED_COLS)

    def coerce(batch: pa.Table) -> pa.Table:
        missing = need - set(batch.column_names)
        if missing:
            raise ValueError(
                f"CSV transcripts missing required column(s) "
                f"{sorted(missing)}; got {batch.column_names}")
        cols = {}
        for name, typ in want.items():
            if name not in batch.column_names:
                continue
            col = batch[name]
            if col.type != typ:
                col = col.cast(typ)
            cols[name] = col
        return pa.table(cols)

    return ray.data.read_csv(paths).map_batches(coerce,
                                                batch_format="pyarrow")


def write_csv(ds, out_dir: str) -> str:
    """Partitioned CSV sink: one file per block under ``out_dir`` —
    never one giant file. NOT idempotent across re-runs (Ray names CSV
    files per run): re-export into a FRESH directory, or use the
    content-addressed ``sources.orc.write_orc`` / parquet checkpoints
    when resume matters."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    return out_dir
