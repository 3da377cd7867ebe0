"""TSV bulk-load source (reference bin/bench import path) + join-mode
scoring parity (the distributed scale path must equal broadcast)."""

import gzip

import ray.data


def test_tsv_bulk_load(tmp_path):
    from blurrily_ray.sources.tsv import bulk_load_postings, read_needle_tsv
    from blurrily_ray.stages.index import find_triples, stats

    p = tmp_path / "cities.tsv.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("123\tLondon\n")
        fh.write("124\tParis\n")
        fh.write("garbage-no-tab\n")
        fh.write("notanint\tRome\n")
        fh.write("125\tTokyo\n")
    docs = read_needle_tsv(str(p))
    rows = sorted(docs.take_all(), key=lambda r: r["ref"])
    assert [(r["ref"], r["text"]) for r in rows] == [
        (123, "London"), (124, "Paris"), (125, "Tokyo")]
    ix = bulk_load_postings(str(p))
    assert stats(ix)["references"] == 3
    assert find_triples(ix, "london")[0] == [123, 7, 6]


def test_score_join_mode_matches_broadcast():
    from blurrily_ray.config import ERConfig
    from blurrily_ray.sources.synth import ensure_transcripts
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, score_pairs,
        trigram_histogram)
    from blurrily_ray.stages.tokenize import assemble_docs, docsets_from_docs

    cfg = ERConfig(join_partitions=4)
    paths = ensure_transcripts(0.001)
    ts = ray.data.read_parquet(paths["transcripts"],
                               columns=["conv_id", "turn_idx", "text"])
    docsets = docsets_from_docs(assemble_docs(ts)).materialize()
    hist = trigram_histogram(docsets)
    keys = blocking_keys(docsets, hist, cfg).materialize()
    pairs, _ = candidate_pairs(keys, key_histogram(keys), cfg)
    pairs = pairs.materialize()

    def canon(ds):
        return sorted(
            ((r["a"], r["b"], r["matches"], r["ntri_a"], r["ntri_b"],
              r["weight_a"], r["weight_b"]) for r in ds.take_all()))

    bc = canon(score_pairs(pairs, docsets, cfg, mode="broadcast"))
    jn = canon(score_pairs(pairs, docsets, cfg, mode="join"))
    assert len(bc) > 0
    assert bc == jn
