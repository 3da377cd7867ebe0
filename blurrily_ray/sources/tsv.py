"""Bulk-load source: gzip TSV → Dataset (the reference's import path).

bin/bench:56-71 in the reference streams gzip TSV lines ``<ref>\\t<needle>``
into ``map.put``. Here the same file becomes a docs Dataset (ref, text)
feeding build_postings — read via ray.data.read_text so decompression and
parsing stay distributed (one task per file / block).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def read_needle_tsv(paths, *, ref_first: bool = True):
    """Read (gzip) TSV of (ref, needle) lines into a docs Dataset
    (ref:int64, text:string). Lines with no tab are skipped; arrow
    compression inference handles .gz via read_text."""

    def parse(batch: pa.Table) -> pa.Table:
        refs, texts = [], []
        for line in batch["text"].to_pylist():
            if not line or "\t" not in line:
                continue
            left, right = line.split("\t", 1)
            ref_s, needle = (left, right) if ref_first else (right, left)
            try:
                ref = int(ref_s)
            except ValueError:
                continue
            refs.append(ref)
            texts.append(needle.rstrip("\n"))
        return pa.table({"ref": pa.array(refs, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")


def bulk_load_postings(paths, **kw):
    """gzip TSV → postings index (the bench bulk-import path end to end)."""
    from blurrily_ray.stages.index import build_postings

    return build_postings(read_needle_tsv(paths, **kw))
