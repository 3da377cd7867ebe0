"""Two-table record linkage: block + score records of table A against
table B.

The canonical cross-source entity-resolution task (Fellegi & Sunter
1969 frame it exactly as linking two files): given two record tables,
emit the cross-table candidate pairs whose trigram similarity clears
the pipeline's thresholds. Deduplication (one table against itself —
the rest of this engine) and linkage (A × B) differ only in which pairs
are admissible; this module reuses the ENTIRE one-shuffle blocking +
fused-scoring machinery by tagging each record's ref with its side and
filtering to cross-side pairs on the (tiny) surviving edge stream.

Key semantic: the blocking statistics (trigram document frequencies,
rare-key selection, stoplist) are computed over the UNION of both
tables — the standard shared-key-space construction, and what the
DuckDB mirror (oracles.sql_link_tables) reproduces by running the
candidate CTE chain over the tagged union.

Ref collisions across tables are legal (A's id 7 and B's id 7 are
different records): refs travel internally as 2-byte-prefixed strings
('A|<ref>' / 'B|<ref>'), split by POSITION on output, so any ref value
round-trips. Output columns are (a_ref, b_ref, matches, ...) with
a_ref always from table A, restored to the input dtype.

100-TB note: same-side pairs are generated and scored before the
cross-side filter drops them — correct, and acceptable when the two
tables are comparably sized (≤2× waste); when one side is dim-sized use
stages/index.fuzzy_join (broadcast catalog, zero waste), and a
side-aware pairgen (emit only cross-side pairs inside the key runs) is
the documented optimization path if both sides are huge and self-pairs
dominate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from blurrily_ray.config import ERConfig
from blurrily_ray.stages.editdist import PAIR_MODE

_PFX = 2  # 'A|' / 'B|'


def _tag_side(ds, side: str, ref_col: str, text_col: str):
    def tag(t: pa.Table) -> pa.Table:
        ref = pc.binary_join_element_wise(
            side + "|", pc.cast(t[ref_col], pa.string()), "")
        return pa.table({"ref": ref, "text": t[text_col]})

    return ds.map_batches(tag, batch_format="pyarrow")


def parity_halves(docs, col: str):
    """Deterministic even/odd split on an integer id column — the
    harness/bench recipe for exercising :func:`link_tables` on a single
    table (must stay in sync with the oracle's ``CASE {col} % 2``
    tagging — this is the one shared implementation)."""
    def half(p: int):
        return docs.map_batches(
            lambda t, q=p: t.filter(
                pc.equal(pc.bit_wise_and(t[col], 1), q)),
            batch_format="pyarrow")

    return half(0), half(1)


def link_tables(docs_a, docs_b, cfg: ERConfig = PAIR_MODE, *,
                ref_col: str = "ref", text_col: str = "text",
                ref_col_b: str | None = None, text_col_b: str | None = None):
    """Blocked, thresholded linkage of ``docs_a`` × ``docs_b``:
    (a_ref, b_ref, matches, ntri_a, ntri_b, weight_a, weight_b) for
    every CROSS-table pair clearing cfg's score floors, under blocking
    statistics computed over the union of both tables. a_ref is always
    the table-A record, restored to table A's ref dtype (likewise
    b_ref). Reference anchor: this is storage.c:477-580's find() run
    symmetrically over two corpora instead of needle-vs-index."""
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    def _ref_dtype(ds, col):
        sch = ds.schema()
        t = dict(zip(sch.names, sch.types)).get(col) if sch else None
        return t if isinstance(t, pa.DataType) else pa.string()

    type_a = _ref_dtype(docs_a, ref_col)
    type_b = _ref_dtype(docs_b, ref_col_b or ref_col)
    union = _tag_side(docs_a, "A", ref_col, text_col).union(
        _tag_side(docs_b, "B", ref_col_b or ref_col,
                  text_col_b or text_col))
    docsets = docsets_from_docs(union).materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, cfg, lut_ref=lut_ref)
    raw, _ = candidate_pairs_fused_blocking(keys, cfg, int_refs=True)
    edges = score_pairs_fused(raw, cfg=cfg, lut_ref=lut_ref,
                              surrogate=True, packed=True)

    stat_cols = ["matches", "ntri_a", "ntri_b", "weight_a", "weight_b"]

    def finish(t: pa.Table) -> pa.Table:
        side = pc.utf8_slice_codeunits  # Arrow kernels end to end
        cross = pc.not_equal(side(t["a"], 0, 1), side(t["b"], 0, 1))
        t = t.filter(cross)
        swap = pc.equal(side(t["a"], 0, 1), "B").to_numpy(
            zero_copy_only=False)  # orient: a_ref from table A
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        strip = 1 << 30

        def untag(v, typ):
            return pc.cast(side(pa.array(v, type=pa.string()),
                                _PFX, strip), typ)

        cols = {"a_ref": untag(np.where(swap, b, a), type_a),
                "b_ref": untag(np.where(swap, a, b), type_b)}
        for c in stat_cols:
            # the per-side stats swap with the refs
            if c.endswith(("_a", "_b")):
                other = c[:-2] + ("_b" if c.endswith("_a") else "_a")
                v = np.where(swap, t[other].to_numpy(zero_copy_only=False),
                             t[c].to_numpy(zero_copy_only=False))
                cols[c] = pa.array(v, type=pa.int64())
            else:
                cols[c] = t[c]
        return pa.table(cols)

    esch = edges.schema()
    if esch is None:  # empty corpus
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {"a_ref": pa.array([], type=type_a),
             "b_ref": pa.array([], type=type_b),
             **{c: pa.array([], type=pa.int64()) for c in stat_cols}}))
    return edges.map_batches(finish, batch_format="pyarrow")
