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


def test_jsonl_roundtrip_matches_parquet_path(tmp_path):
    """parquet transcripts → write_jsonl → read_transcripts_jsonl == the
    parquet read (schema + values), and ER over either input matches."""
    import pandas as pd
    import ray.data as rd

    from blurrily_ray.sources.jsonl import (read_transcripts_jsonl,
                                            write_jsonl)
    from blurrily_ray.sources.synth import ensure_transcripts

    p = ensure_transcripts(0.001)["transcripts"]
    orig = rd.read_parquet(p)
    out = str(tmp_path / "shards")
    write_jsonl(orig, out)
    back = read_transcripts_jsonl(out)
    a = orig.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = back.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(b.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    for c in ["conv_id", "turn_idx", "role", "text", "tool"]:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    assert (pd.to_datetime(a["ts"]).to_numpy()
            == pd.to_datetime(b["ts"]).to_numpy()).all()


def test_jsonl_missing_column_raises(tmp_path):
    import json

    import pytest
    import ray

    from blurrily_ray.sources.jsonl import read_transcripts_jsonl

    f = tmp_path / "bad.jsonl"
    f.write_text(json.dumps({"conv_id": "a", "text": "x"}) + "\n")
    with pytest.raises(Exception, match="missing columns"):
        read_transcripts_jsonl(str(f)).materialize()


def test_tsv_export_reimports(tmp_path):
    """write_needle_tsv output loads back through read_needle_tsv with
    identical (ref, text) rows — the reference-interchange round trip."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from blurrily_ray.sources.jsonl import write_needle_tsv
    from blurrily_ray.sources.tsv import read_needle_tsv

    docs = pd.DataFrame({
        "ref": np.arange(50, dtype=np.int64),
        "text": [f"needle text {i}" + ("\twith tab" if i % 7 == 0 else "")
                 for i in range(50)]})
    path = str(tmp_path / "export.tsv.gz")
    write_needle_tsv(rd.from_pandas(docs), path)
    back = read_needle_tsv(path).to_pandas().sort_values("ref").reset_index(drop=True)
    assert len(back) == 50
    assert (back["ref"].to_numpy() == docs["ref"].to_numpy()).all()
    # tabs were flattened to spaces on export
    assert back.loc[0, "text"] == "needle text 0 with tab"


def test_csv_roundtrip_transcripts(tmp_path):
    """write_csv → read_transcripts_csv round-trips the transcripts table
    with the pipeline's exact dtypes (Arrow CSV inference drift coerced
    away) and the same rows."""
    import pyarrow as pa

    from blurrily_ray.sources.csv import read_transcripts_csv, write_csv

    rows = [{"conv_id": f"c{i // 3}", "turn_idx": i % 3,
             "role": f"s{i % 2}",
             "text": f"turn {i} text with, comma and \"quote\""}
            for i in range(30)]
    out = write_csv(ray.data.from_items(rows), str(tmp_path / "csv"))
    back = read_transcripts_csv(out)
    sch = dict(zip(back.schema().names, back.schema().types))
    assert sch == {"conv_id": pa.string(), "turn_idx": pa.int32(),
                   "role": pa.string(), "text": pa.string()}
    key = lambda r: (r["conv_id"], r["turn_idx"])
    assert sorted(map(dict, back.take_all()), key=key) == \
        sorted(rows, key=key)
    # projection keeps only the ER-needed columns
    slim = read_transcripts_csv(out, columns=["conv_id", "turn_idx", "text"])
    assert set(slim.schema().names) == {"conv_id", "turn_idx", "text"}
    # unknown requested columns fail at the call; a schema column the
    # FILE lacks fails loudly at the read
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown transcript column"):
        read_transcripts_csv(out, columns=["conv_id", "nope"])
    with _pt.raises(Exception, match="missing required column"):
        read_transcripts_csv(out, columns=["conv_id", "ts"]).count()


def test_orc_roundtrip_documents(tmp_path):
    """write_orc → read_orc round-trips the documents table; column
    projection prunes at the decoder; the sink is idempotent (re-write
    produces the same content-hash files, no duplicate rows)."""
    import os

    from blurrily_ray.sources.orc import read_orc, write_orc

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "orc")
    manifest = write_orc(docs, d).take_all()
    assert sum(r["rows"] for r in manifest) == docs.count()
    files1 = sorted(os.listdir(d))

    back = read_orc(d)
    key = lambda r: r["doc_id"]
    assert sorted(map(dict, back.take_all()), key=key) == \
        sorted(map(dict, docs.take_all()), key=key)

    slim = read_orc(d, columns=["doc_id", "text"])
    assert set(slim.schema().names) == {"doc_id", "text"}
    assert slim.count() == docs.count()

    write_orc(docs, d).take_all()  # idempotent re-write
    assert sorted(os.listdir(d)) == files1
