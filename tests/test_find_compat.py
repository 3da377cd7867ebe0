"""Golden find/put/delete parity fixtures (FIXTURES.md §4-5).

Every expectation is verbatim from the reference specs; the pipeline must
reproduce the exact ordered (ref, matches, weight) triples.
"""

import pytest
import ray.data

from blurrily_ray.stages.index import (
    build_postings,
    dedup_first_put,
    delete,
    find_triples,
    stats,
)


def make_index(puts):
    """puts: list of (needle, ref) or (needle, ref, weight). Applies
    first-put-wins dedup like the reference refs set (storage.c:408)."""
    rows = []
    for seq, p in enumerate(puts):
        needle, ref = p[0], p[1]
        weight = p[2] if len(p) > 2 else 0
        rows.append({"ref": ref, "text": needle, "w": weight, "seq": seq})
    docs = ray.data.from_items(rows)
    docs = dedup_first_put(docs)
    return build_postings(docs, weight_col="w")


def test_london_exact_triple():  # map_spec.rb:158-161
    ix = make_index([("london", 123, 0)])
    assert find_triples(ix, "london") == [[123, 7, 6]]


def test_paris_and_typo():  # integration_spec.rb:31-35
    ix = make_index([("paris", 123)])
    assert find_triples(ix, "paris") == [[123, 6, 5]]
    assert find_triples(ix, "pariis") == [[123, 5, 5]]


def test_exact_match_first():  # map_spec.rb:163-168
    ix = make_index([("lon", 125, 0), ("london city airport", 124, 0),
                     ("london", 123, 0)])
    res = find_triples(ix, "london")
    assert res[0][0] == 123


def test_matchiness_ordering():  # map_spec.rb:195-202
    ix = make_index([("New York", 1001, 0), ("Yorkshire", 1002, 0),
                     ("York", 1003, 0), ("Yorkisthan", 1004, 0)])
    refs = [r[0] for r in find_triples(ix, "York")]
    assert refs == [1003, 1001, 1002, 1004]


def test_weight_tiebreak():  # map_spec.rb:204-209
    ix = make_index([("london", 103, 103), ("london", 101, 101),
                     ("london", 102, 102)])
    refs = [r[0] for r in find_triples(ix, "london")]
    assert refs == [101, 102, 103]


def test_limit():  # map_spec.rb:136-142
    ix = make_index([("london", i, 0) for i in range(5)])
    assert len(find_triples(ix, "london", 2)) == 2


def test_duplicate_ref_first_put_wins():  # map_spec.rb:144-149
    ix = make_index([("london", 123), ("london2", 123)])
    res = find_triples(ix, "london")
    assert len(res) == 1 and res[0] == [123, 7, 6]


def test_great_london_protocol_triples():  # command_processor_spec.rb:15-19
    ix = make_index([("great london", 12), ("greater masovian", 13)])
    assert find_triples(ix, "great") == [[12, 6, 12], [13, 5, 16]]


@pytest.mark.parametrize("typo", ["lonXdon", "lodon", "lodnon"])
def test_typo_tolerance(typo):  # map_spec.rb:176-193
    ix = make_index([("london", 123, 0)])
    assert len(find_triples(ix, typo)) > 0


def test_empty_index():  # map_spec.rb:123-127
    ix = make_index([("anything", 1, 0)])
    ix = delete(ix, [1])
    assert find_triples(ix, "london") == []


def test_delete_then_readd():  # map_spec.rb:109-114
    ix = make_index([("london", 123, 0)])
    ix = delete(ix, [123])
    assert find_triples(ix, "london") == []
    ix2 = ix.union(make_index([("paris", 123, 0)]))
    assert find_triples(ix2, "paris") == [[123, 6, 5]]


def test_stats():  # map_spec.rb:32-36
    ix = make_index([("foobar", 1, 0)])
    assert stats(ix) == {"references": 1, "trigrams": 7}
    ix = delete(ix, [1])
    assert stats(ix) == {"references": 0, "trigrams": 0}


def test_save_load_roundtrip(tmp_path):  # map_spec.rb:219-269 analogue
    from blurrily_ray.stages.index import load, save

    ix = make_index([("london", 123, 0), ("paris", 7, 0)])
    path = str(tmp_path / "ix")
    save(ix, path)
    ix2 = load(path)
    assert find_triples(ix2, "london")[0] == [123, 7, 6]
    assert stats(ix2) == stats(ix)


def test_find_many_matches_single_find():
    """Batch find over docsets must equal per-needle find over postings."""
    import ray.data

    from blurrily_ray.stages.index import find_many
    from blurrily_ray.stages.tokenize import docsets_from_docs

    puts = [("london", 123, 0), ("london city airport", 124, 0),
            ("lon", 125, 0), ("paris", 7, 0)]
    rows = [{"ref": r, "text": t, "w": w, "seq": i}
            for i, (t, r, w) in enumerate(puts)]
    docs = ray.data.from_items(rows)
    docsets = docsets_from_docs(docs).materialize()
    postings = make_index(puts)
    out = find_many(docsets, ["london", "paris", "zzz"], 10).take_all()
    by_needle = {}
    for r in sorted(out, key=lambda r: (r["needle"], r["rank"])):
        by_needle.setdefault(r["needle"], []).append(
            [r["ref"], r["matches"], r["weight"]])
    assert by_needle["london"] == find_triples(postings, "london")
    assert by_needle["paris"] == find_triples(postings, "paris")
    assert "zzz" not in by_needle  # no shared trigram with any doc


def test_fuzzy_join_links_variants_to_canonical():
    """Every variant conversation's TOP match in the v0 catalog is its own
    entity's canonical record (synthetic ground truth)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from blurrily_ray.sources.synth import ensure_transcripts
    from blurrily_ray.stages.index import fuzzy_join
    from blurrily_ray.stages.tokenize import assemble_docs

    p = ensure_transcripts(0.001)["transcripts"]
    ts = rd.read_parquet(p, columns=["conv_id", "turn_idx", "text"])
    docs = assemble_docs(ts, assume_grouped=True)
    needles = docs.map_batches(
        lambda b: b.rename_columns(["needle_ref", "text"]),
        batch_format="pyarrow")
    catalog = docs.map_batches(
        lambda b: b.filter(pc.ends_with(b["ref"], "v0")),
        batch_format="pyarrow")
    out = fuzzy_join(needles, catalog, needle_id="needle_ref", k=1).to_pandas()
    assert len(out) > 0
    ent = out.needle_ref.str.slice(0, 6)
    cat_ent = out.ref.str.slice(0, 6)
    assert (ent == cat_ent).mean() > 0.999  # top-1 = own entity's v0
    # k respected and scores positive
    assert (out.matches >= 1).all()


def test_find_merge_modes_equal():
    """The driver-merge fast path must rank identically to the distributed
    groupby+sort dataflow (same (matches DESC, weight ASC, ref ASC))."""
    from blurrily_ray.stages.index import find

    postings = make_index([("london", 10, 0), ("londonderry", 11, 0),
                           ("greater london", 12, 0), ("paris", 13, 0),
                           ("great london", 14, 3)])
    for needle in ["london", "great", "zzz no hits here"]:
        drv = [(r["ref"], r["matches"], r["weight"])
               for r in find(postings, needle, 10).take_all()]
        shf = [(r["ref"], r["matches"], r["weight"])
               for r in find(postings, needle, 10,
                             merge="shuffle").take_all()]
        assert drv == shf
