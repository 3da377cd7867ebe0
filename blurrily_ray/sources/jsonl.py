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


def read_transcripts_jsonl(paths, *, columns: list[str] | None = None):
    """JSONL shards → transcript Dataset. Default projection is the
    BASELINE.json input_hint schema (conv_id, turn_idx, role, text, tool,
    ts); pass ``columns`` to prune harder. Raises on missing columns and
    casts turn_idx to int32 / ts to timestamp[us] for parity with the
    parquet path."""
    import ray.data

    want = columns or ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ds = ray.data.read_json(paths)

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
                col = _parse_epoch(col)
            cols[c] = col
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def _parse_epoch(col) -> pa.Array:
    """Integer epoch → timestamp[us], unit detected by magnitude (JSON
    writers disagree: pandas-style emits seconds, Arrow emits ms/us; the
    four units differ by 10^3 each so current-era values disambiguate).
    String columns parse as ISO timestamps."""
    import pyarrow.compute as pc

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col.cast(pa.timestamp("us"))
    col = col.cast(pa.int64())
    mx = pc.max(pc.abs(col)).as_py() or 0
    if mx < 10**11:        # seconds until year ~5138
        mult = 1_000_000
    elif mx < 10**14:      # milliseconds
        mult = 1_000
    elif mx < 10**17:      # microseconds
        mult = 1
    else:                  # nanoseconds
        return pc.divide(col, 1_000).cast(pa.timestamp("us"))
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
                t = (t or "").replace("\t", " ").replace("\n", " ")
                f.write(f"{r}\t{t}\n")
    return path
