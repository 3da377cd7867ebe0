"""Edit-distance verify stage (stages/editdist.py).

The Myers bit-parallel kernel is pinned three independent ways: the
classic DP (levenshtein_dp), DuckDB's levenshtein(), and hypothesis
property sweeps including the early-abandon contract (a skip must be
provable — never a false skip, never a wrong value under the cutoff).
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blurrily_ray.stages.editdist import (
    edit_verify_edges,
    edit_verify_pairs,
    levenshtein_dp,
    myers_distance,
    normalized_texts,
)

TXT = st.text(alphabet="ab c", max_size=40)


@settings(max_examples=300, deadline=None)
@given(TXT, TXT)
def test_myers_matches_dp(a, b):
    assert myers_distance(a, b) == levenshtein_dp(a, b)


@settings(max_examples=300, deadline=None)
@given(TXT, TXT, st.integers(min_value=0, max_value=12))
def test_myers_cutoff_contract(a, b, d):
    true = levenshtein_dp(a, b)
    got = myers_distance(a, b, max_dist=d)
    if true <= d:
        assert got == true
    else:
        assert got is None


ASCII = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1, max_size=30)


@settings(max_examples=100, deadline=None)
@given(ASCII, ASCII)
def test_myers_matches_duckdb(a, b):
    # DuckDB levenshtein counts UTF-8 BYTES, Myers counts characters —
    # they agree exactly on ASCII, which is the oracle's domain: every
    # string reaching the verify is normalize_string output ([a-z ] plus
    # any ASCII survivors), never multi-byte (sql_edit_pairs docstring)
    exp = duckdb.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert myers_distance(a, b) == exp


def test_myers_edges():
    assert myers_distance("", "") == 0
    assert myers_distance("", "abc") == 3
    assert myers_distance("abc", "") == 3
    assert myers_distance("kitten", "sitting") == 3
    assert myers_distance("same", "same") == 0
    # length gate: provably > max_dist without scanning
    assert myers_distance("a" * 100, "a", max_dist=5) is None


def _docs_ds():
    import ray.data

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy cat"},
        {"doc_id": 3, "text": "The QUICK brown fox jumped over a lazy dog!"},
        {"doc_id": 4, "text": "completely unrelated payload about parquet"},
        {"doc_id": 5, "text": "another unrelated string with zero overlap"},
    ]
    return ray.data.from_items(rows)


def test_edit_verify_pairs_end_to_end():
    out = edit_verify_pairs(_docs_ds(), max_dist=10).to_pandas()
    got = {(min(a, b), max(a, b)): d
           for a, b, d in zip(out["a"], out["b"], out["dist"])}
    # 1↔2: one substitution cluster ('dog'→'cat' = 3 edits)
    assert got[(1, 2)] == 3
    # 1↔3 after normalization: 'jumps over the' vs 'jumped over a'
    assert (1, 3) in got
    for (a, b) in got:
        assert not {a, b} & {4, 5}, "unrelated docs must not pair"
    # distances are exact vs DuckDB on the engine-normalized strings
    texts = {r["ref"]: r["_nt"]
             for r in normalized_texts(_docs_ds()).take_all()}
    for (a, b), d in got.items():
        exp = duckdb.execute("SELECT levenshtein(?, ?)",
                             [texts[a], texts[b]]).fetchone()[0]
        assert d == exp


def test_edit_verify_threshold_excludes():
    # the closest pair (1, 2) is at distance 3 — a max_dist=2 verify keeps
    # nothing (Ray drops the empty blocks; schema-less empty is the repo's
    # empty-result convention, accepted by the driver compare)
    out = edit_verify_pairs(_docs_ds(), max_dist=2).to_pandas()
    assert len(out) == 0


def test_edit_verify_broadcast_join_pinned_equal():
    """The size-gated broadcast attach and the two-sided co-partition
    attach must produce identical rows (decontaminate precedent)."""
    import ray.data

    from blurrily_ray.stages.editdist import PAIR_MODE
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docs = _docs_ds()
    docsets = docsets_from_docs(docs, ref_col="doc_id",
                                text_col="text").materialize()
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, trigram_histogram(docsets), PAIR_MODE,
                         lut_ref=lut_ref)
    pairs, _ = candidate_pairs_fused_blocking(keys, PAIR_MODE, int_refs=True)
    edges = score_pairs_fused(pairs, cfg=PAIR_MODE, lut_ref=lut_ref,
                              surrogate=True, packed=True).materialize()
    texts = normalized_texts(docs).materialize()
    key = ["a", "b", "matches", "dist"]

    def run(mode):
        df = edit_verify_edges(edges, texts, max_dist=10,
                               mode=mode).to_pandas()
        return df[key].sort_values(key).reset_index(drop=True)

    pd.testing.assert_frame_equal(run("broadcast"), run("join"))


def test_edit_verify_edges_missing_ref_drops():
    """An edge ref absent from the texts side drops (inner attach)."""
    import ray.data

    edges = ray.data.from_items(
        [{"a": 1, "b": 2, "matches": 7}, {"a": 1, "b": 99, "matches": 5}])
    texts = normalized_texts(_docs_ds())
    out = edit_verify_edges(edges, texts, max_dist=50).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(1, 2)}


# ── true Damerau-Levenshtein (dl_distance / dl_verify_pairs) ──────────

from blurrily_ray.stages.editdist import (  # noqa: E402
    dl_distance,
    dl_distance_dp,
    dl_verify_pairs,
)


@settings(max_examples=300, deadline=None)
@given(TXT, TXT)
def test_dl_matches_dp(a, b):
    assert dl_distance(a, b) == dl_distance_dp(a, b)


@settings(max_examples=300, deadline=None)
@given(TXT, TXT, st.integers(min_value=0, max_value=12))
def test_dl_cutoff_contract(a, b, d):
    true = dl_distance_dp(a, b)
    got = dl_distance(a, b, max_dist=d)
    if true <= d:
        assert got == true
    else:
        assert got is None


@settings(max_examples=150, deadline=None)
@given(ASCII, ASCII)
def test_dl_matches_duckdb(a, b):
    # DuckDB damerau_levenshtein counts UTF-8 bytes; the kernel scans
    # bytes too, so they agree on every input (the pipeline domain is
    # pure-ASCII post-normalize anyway)
    exp = duckdb.execute("SELECT damerau_levenshtein(?, ?)",
                         [a, b]).fetchone()[0]
    assert dl_distance(a, b) == exp


def test_dl_is_true_dl_not_osa():
    # the canonical OSA-vs-true-DL discriminator: 'CA' -> 'ABC' is 2 in
    # unrestricted Damerau-Levenshtein (transpose CA->AC, insert B;
    # edits inside a transposed pair allowed), 3 in restricted OSA
    assert dl_distance("ca", "abc") == 2
    assert dl_distance_dp("ca", "abc") == 2
    # transposition is ONE edit (Levenshtein says 2)
    assert dl_distance("ab", "ba") == 1
    assert levenshtein_dp("ab", "ba") == 2
    assert dl_distance("", "abc") == 3
    assert dl_distance("a" * 100, "a", max_dist=5) is None


@settings(max_examples=300, deadline=None)
@given(TXT, TXT)
def test_dl_le_lev_and_ge_half(a, b):
    """DL ≤ Lev ≤ 2·DL — the metric sandwich both prefilter bounds
    lean on."""
    lev = levenshtein_dp(a, b)
    dl = dl_distance(a, b)
    assert dl <= lev <= 2 * dl or (dl == lev == 0)


def test_dl_verify_pairs_end_to_end():
    import ray.data

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        # adjacent transpositions: 'qucik' and 'borwn' — DL counts 2,
        # Levenshtein 4
        {"doc_id": 2, "text": "the qucik borwn fox jumps over the lazy dog"},
        {"doc_id": 3, "text": "completely unrelated payload about parquet"},
    ]
    docs = ray.data.from_items(rows)
    out = dl_verify_pairs(docs, max_dist=10).to_pandas()
    got = {(min(a, b), max(a, b)): d
           for a, b, d in zip(out["a"], out["b"], out["dist"])}
    assert got[(1, 2)] == 2
    assert myers_distance(
        "the quick brown fox jumps over the lazy dog",
        "the qucik borwn fox jumps over the lazy dog") == 4
    for (a, b) in got:
        assert 3 not in (a, b)


def test_dl_qgram4_prefilter_no_false_drops():
    """The qgram_per_edit=4 bound must drop nothing a full verify keeps:
    run the verify with the prefilter active (normal path) and with the
    bound disabled (max_dist huge at the prefilter via direct kernel),
    on the same blocked edges — row sets must match."""
    import ray.data

    from blurrily_ray.stages.editdist import (PAIR_MODE, dl_verify_edges,
                                              edit_verify_edges)
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    rows = [{"doc_id": i,
             "text": t}
            for i, t in enumerate([
                "the quick brown fox jumps over the lazy dog",
                "the qucik borwn fox jumps over the lazy dgo",
                "the quick brown fox jumped over a lazy dog",
                "a quick brown fox lepas over the lazy dog",
                "the quick brwon fox jumps оver the lazy dog",
            ])]
    docs = ray.data.from_items(rows)
    docsets = docsets_from_docs(docs, ref_col="doc_id",
                                text_col="text").materialize()
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, trigram_histogram(docsets), PAIR_MODE,
                         lut_ref=lut_ref)
    pairs, _ = candidate_pairs_fused_blocking(keys, PAIR_MODE, int_refs=True)
    edges = score_pairs_fused(pairs, cfg=PAIR_MODE, lut_ref=lut_ref,
                              surrogate=True, packed=True).materialize()
    texts = normalized_texts(docs).materialize()

    def rows_of(ds):
        df = ds.to_pandas()
        return set(zip(df["a"], df["b"], df["dist"]))

    for md in (2, 5, 10):
        fast = rows_of(dl_verify_edges(edges, texts, max_dist=md,
                                       weights_are_lengths=True))
        # qgram_per_edit so large the trigram gate never fires = brute
        slow = rows_of(edit_verify_edges(edges, texts, max_dist=md,
                                         kernel=dl_distance,
                                         qgram_per_edit=10 ** 6))
        assert fast == slow
