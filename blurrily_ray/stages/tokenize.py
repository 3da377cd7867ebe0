"""Document assembly, normalization and trigram-explode stages.

All stages are ``map_batches`` over zero-copy Arrow batches; the only
shuffle is the one ``groupby(conv_id)`` needed to assemble multi-turn
documents (turns of one conversation may span input blocks/files).

Dataset shapes:

- transcripts:  (conv_id, turn_idx, role, text, tool, ts)  [input_hint]
- docs:         (ref, text)           one row per document/conversation
- docsets:      (ref, ntri, weight, tris:list<uint16>)
- postings:     (ref, trigram:uint16, weight:uint32)   the inverted index
                rows — the Ray-native analogue of the reference's
                trigram_map_t posting lists (storage.c:47-75).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.functions.normalize import normalize_array
from blurrily_ray.functions.trigram import explode_batch


def assemble_docs(transcripts, *, id_col: str = "conv_id", order_col: str = "turn_idx",
                  text_col: str = "text", assume_grouped: bool = False):
    """transcripts → docs: concatenate each conversation's turns in stable
    ``turn_idx`` order, space-separated (FIXTURES.md §1 — the normalizer
    collapses whitespace, so a single space is the canonical joiner).

    Default path: one coarse hash-partitioned shuffle (stages/common.py);
    each partition concatenates all its conversations vectorized — never
    one UDF call per conversation.

    ``assume_grouped=True``: when each conversation's turns are CONTIGUOUS
    in file row order (how transcript tables are naturally written), the
    bulk text never shuffles — every block assembles its interior
    conversations locally and only the ≤2 conversations touching block
    boundaries go through the (tiny) shuffle. At 100 TB this is the
    difference between moving the corpus once and not moving it at all;
    results are identical either way.
    """
    from blurrily_ray.stages.common import partitioned_map

    def all_convs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, order_col], kind="stable")
        g = df.groupby(id_col, sort=False)[text_col].agg(" ".join)
        return pd.DataFrame({"ref": g.index.to_numpy(), "text": g.to_numpy()})

    ts = transcripts.select_columns([id_col, order_col, text_col])
    if not assume_grouped:
        return partitioned_map(ts, [id_col], all_convs)

    def split_batch(df: pd.DataFrame) -> pd.DataFrame:
        """Assemble interior conversations; pass boundary turns through raw
        (is_doc=0) for the small cross-block fix-up shuffle."""
        if len(df) == 0:
            return pd.DataFrame({"ref": pd.Series([], dtype=object),
                                 "text": pd.Series([], dtype=object),
                                 "turn_idx": pd.Series([], dtype="int64"),
                                 "is_doc": pd.Series([], dtype="int64")})
        ids = df[id_col]
        edge = (ids == ids.iloc[0]) | (ids == ids.iloc[-1])
        interior = all_convs(df[~edge]) if (~edge).any() else \
            pd.DataFrame({"ref": [], "text": []})
        out = pd.DataFrame({
            "ref": interior["ref"], "text": interior["text"]})
        out["turn_idx"] = np.int64(-1)
        out["is_doc"] = np.int64(1)
        frag = pd.DataFrame({
            "ref": df.loc[edge, id_col].to_numpy(),
            "text": df.loc[edge, text_col].to_numpy(),
            "turn_idx": df.loc[edge, order_col].to_numpy(dtype=np.int64),
            "is_doc": np.int64(0)})
        return pd.concat([out, frag], ignore_index=True)

    mixed = ts.map_batches(split_batch, batch_size=None,
                       batch_format="pandas").materialize()
    docs = mixed.filter(expr="is_doc == 1").select_columns(["ref", "text"])
    frags = mixed.filter(expr="is_doc == 0") \
        .rename_columns({"ref": id_col, "turn_idx": order_col})
    fixed = partitioned_map(frags.select_columns([id_col, order_col, "text"]),
                            [id_col], all_convs, n_parts=16)
    return docs.union(fixed)


def docsets_grouped(transcripts, *, id_col: str = "conv_id",
                    order_col: str = "turn_idx", text_col: str = "text"):
    """transcripts (conversation-contiguous in file order) → docsets with
    the corpus TEXT never materialized: each block assembles AND tokenizes
    its interior conversations in one pass — only per-doc trigram sets
    (~8× smaller than text) are pinned — while the ≤2 conversations
    touching block boundaries pass their raw turns to the tiny fix-up
    shuffle. Equal output to ``docsets_from_docs(assemble_docs(...,
    assume_grouped=True))``; at 100 TB the difference is whether the whole
    corpus text sits in the object store or never leaves the read stage.
    """
    from blurrily_ray.stages.common import partitioned_map

    def all_convs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, order_col], kind="stable")
        g = df.groupby(id_col, sort=False)[text_col].agg(" ".join)
        return pd.DataFrame({"ref": g.index.to_numpy(),
                             "text": g.to_numpy()})

    empty_tris = pa.list_(pa.uint16())

    def split_tokenize(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.table({
                "ref": pa.array([], pa.string()),
                "ntri": pa.array([], pa.uint32()),
                "weight": pa.array([], pa.uint32()),
                "tris": pa.array([], empty_tris),
                "text": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "is_doc": pa.array([], pa.int64())})
        ids = df[id_col]
        edge = (ids == ids.iloc[0]) | (ids == ids.iloc[-1])
        if (~edge).any():
            docs = all_convs(df[~edge])
            dsets = _docsets_batch(
                pa.table({"ref": pa.array(docs["ref"]),
                          "text": pa.array(docs["text"])}), "ref", "text")
        else:
            dsets = None
        n_d = len(dsets) if dsets is not None else 0
        frag = df.loc[edge]
        n_f = len(frag)
        cols = {
            "ref": pa.concat_arrays(
                ([dsets["ref"].combine_chunks()] if n_d else [])
                + [pa.array(frag[id_col].to_numpy(), pa.string())]),
            "ntri": pa.concat_arrays(
                ([dsets["ntri"].combine_chunks()] if n_d else [])
                + [pa.nulls(n_f, pa.uint32())]),
            "weight": pa.concat_arrays(
                ([dsets["weight"].combine_chunks()] if n_d else [])
                + [pa.nulls(n_f, pa.uint32())]),
            "tris": pa.concat_arrays(
                ([dsets["tris"].combine_chunks()] if n_d else [])
                + [pa.nulls(n_f, empty_tris)]),
            "text": pa.concat_arrays(
                [pa.nulls(n_d, pa.string())]
                + [pa.array(frag[text_col].to_numpy(), pa.string())]),
            "turn_idx": pa.concat_arrays(
                [pa.array(np.full(n_d, -1, dtype=np.int64))]
                + [pa.array(frag[order_col].to_numpy(dtype=np.int64))]),
            "is_doc": pa.concat_arrays(
                [pa.array(np.ones(n_d, dtype=np.int64))]
                + [pa.array(np.zeros(n_f, dtype=np.int64))]),
        }
        return pa.table(cols)

    ts = transcripts.select_columns([id_col, order_col, text_col])
    mixed = ts.map_batches(split_tokenize, batch_size=None,
                           batch_format="pandas").materialize()
    interior = mixed.filter(expr="is_doc == 1").select_columns(
        ["ref", "ntri", "weight", "tris"])
    frags = mixed.filter(expr="is_doc == 0").select_columns(
        ["ref", "turn_idx", "text"]).rename_columns(
        {"ref": id_col, "turn_idx": order_col})
    fixed = partitioned_map(frags, [id_col], all_convs, n_parts=16)
    return interior.union(docsets_from_docs(fixed))


def _docsets_batch(batch: pa.Table, ref_col: str, text_col: str) -> pa.Table:
    norm = normalize_array(batch[text_col])
    doc_idx, codes, lengths = explode_batch(norm)
    n = len(batch)
    counts = np.bincount(doc_idx, minlength=n) if len(doc_idx) else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    tris = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(codes, type=pa.uint16()))
    # the normalized text itself is NOT kept: nothing downstream reads it
    # (weight already captures its length) and docsets are materialized —
    # carrying it would double the corpus bytes pinned in the object store
    return pa.table({
        "ref": batch[ref_col],
        "ntri": pa.array(counts.astype(np.uint32), type=pa.uint32()),
        "weight": pa.array(lengths.astype(np.uint32), type=pa.uint32()),
        "tris": tris,
    })


def docsets_from_docs(docs, *, ref_col: str = "ref", text_col: str = "text"):
    """docs → docsets: normalize + tokenize, one row per doc with its
    distinct sorted trigram codes. ``weight`` defaults to the normalized
    length exactly like the reference (storage.c:409). Pure map — no shuffle.
    """
    return docs.map_batches(lambda b: _docsets_batch(b, ref_col, text_col),
                            batch_format="pyarrow")


def _flatten_batch(batch: pa.Table) -> pa.Table:
    tris = batch["tris"].combine_chunks()
    counts = np.diff(tris.offsets.to_numpy())  # diff is slice-safe
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    return pa.table({
        "ref": batch["ref"].take(pa.array(idx)),
        "trigram": tris.flatten(),  # flatten() honors any slice offset
        "weight": batch["weight"].take(pa.array(idx)),
    })


def postings_from_docsets(docsets):
    """docsets → postings: explode the per-doc trigram sets to rows. Pure map."""
    return docsets.map_batches(_flatten_batch, batch_format="pyarrow")


def postings_from_docs(docs, **kwargs):
    return postings_from_docsets(docsets_from_docs(docs, **kwargs))
