"""JSONL source/sink — the lingua franca of LLM training-data dumps.

The reference only speaks gzip TSV (bin/bench:56-71 → sources/tsv.py);
real corpora arrive as JSON-lines shards. Reading stays distributed
(``ray.data.read_json`` — one task per file/block, Arrow-native parse)
with schema projection + validation so a malformed dump fails loudly at
the read, not three stages later. Writing shards the dataset into one
``part-*.jsonl`` file per block (resumable layout: rerunning a failed
export can skip finished shards).
"""

from __future__ import annotations

import pyarrow as pa


def read_transcripts_jsonl(paths, *, columns: list[str] | None = None,
                           ts_unit: str | None = None):
    """JSONL shards → transcript Dataset. Default projection is the
    BASELINE.json input_hint schema (conv_id, turn_idx, role, text, tool,
    ts); pass ``columns`` to prune harder. Raises on missing columns and
    casts turn_idx to int32 / ts to timestamp[us] for parity with the
    parquet path.

    ``ts_unit`` fixes the epoch scale ('s'|'ms'|'us'|'ns') for integer ts
    columns. When None it is detected ONCE for the whole dataset (max
    magnitude aggregated across all blocks) — never per batch, which could
    silently decode different blocks of one column at different scales
    (e.g. a block of pre-1973 millisecond values reads as seconds)."""
    import ray.data

    want = columns or ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ds = ray.data.read_json(paths)
    if "ts" in want and ts_unit is None:
        ts_unit = _detect_epoch_unit(ds)

    def project(batch: pa.Table) -> pa.Table:
        missing = [c for c in want if c not in batch.column_names]
        if missing:
            raise ValueError(
                f"JSONL transcript shard missing columns {missing}; "
                f"has {batch.column_names}")
        cols = {}
        for c in want:
            col = batch[c]
            if c == "turn_idx":
                col = col.cast(pa.int32())
            elif c == "ts" and not pa.types.is_timestamp(col.type):
                col = _parse_epoch(col, unit=ts_unit)
            cols[c] = col
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def _unit_for_magnitude(mx: int) -> str:
    """Epoch unit from max |value| (the four units differ by 10^3 each so
    current-era values disambiguate)."""
    if mx < 10**11:        # seconds until year ~5138
        return "s"
    if mx < 10**14:        # milliseconds
        return "ms"
    if mx < 10**17:        # microseconds
        return "us"
    return "ns"


def _detect_epoch_unit(ds) -> str | None:
    """One cheap extra pass: per-block max |ts| (one row per block leaves
    each task), maxed on the driver. Returns None when ts is already a
    timestamp / string everywhere (nothing to detect)."""
    import pyarrow.compute as pc

    def block_max(batch: pa.Table) -> pa.Table:
        if "ts" not in batch.column_names:
            return pa.table({"mx": pa.array([], type=pa.int64())})
        col = batch["ts"]
        if (pa.types.is_timestamp(col.type) or pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)):
            return pa.table({"mx": pa.array([], type=pa.int64())})
        m = pc.max(pc.abs(col.cast(pa.int64()))).as_py()
        return pa.table({"mx": pa.array([0 if m is None else m],
                                        type=pa.int64())})

    rows = ds.map_batches(block_max, batch_format="pyarrow").take_all()
    if not rows:
        return None
    return _unit_for_magnitude(max(r["mx"] for r in rows))


def _parse_epoch(col, *, unit: str | None = None) -> pa.Array:
    """Integer epoch → timestamp[us] at a FIXED unit; callers that read
    multi-block datasets must detect the unit once dataset-wide
    (``_detect_epoch_unit``) — per-batch magnitude inference can decode
    sibling blocks at different scales. ``unit=None`` falls back to
    batch-local detection for single-table/driver use only. String
    columns parse as ISO timestamps."""
    import pyarrow.compute as pc

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col.cast(pa.timestamp("us"))
    col = col.cast(pa.int64())
    if unit is None:
        unit = _unit_for_magnitude(pc.max(pc.abs(col)).as_py() or 0)
    if unit == "ns":
        return pc.divide(col, 1_000).cast(pa.timestamp("us"))
    mult = {"s": 1_000_000, "ms": 1_000, "us": 1}[unit]
    return pc.multiply(col, mult).cast(pa.timestamp("us"))


def write_jsonl(ds, out_dir: str) -> str:
    """Dataset → ``out_dir/part-<i>.jsonl`` shards, one per block,
    written distributed via ``ray.data.Dataset.write_json``."""
    ds.write_json(out_dir)
    return out_dir


def write_needle_tsv(docs, path: str, *, ref_col: str = "ref",
                     text_col: str = "text") -> str:
    """docs → ONE gzip TSV file of ``<ref>\\t<text>`` lines — the
    reference's bulk-import interchange format (bin/bench:56-71), so an
    index exported here loads straight into the original tool. Tabs and
    newlines inside text are replaced with spaces (the TSV line format
    cannot carry them). Single-file gzip is inherently serial — this is
    an interchange EXPORT for dim-sized doc sets, not a corpus sink; use
    parquet checkpoints or ``write_jsonl`` shards at scale."""
    import gzip

    with gzip.open(path, "wt", encoding="utf-8") as f:
        for batch in docs.select_columns([ref_col, text_col]) \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            refs = batch[ref_col].to_pylist()
            texts = batch[text_col].to_pylist()
            for r, t in zip(refs, texts):
                t = (t or "").replace("\t", " ").replace("\n", " ") \
                             .replace("\r", " ")
                f.write(f"{r}\t{t}\n")
    return path
