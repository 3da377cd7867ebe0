"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship ER pipeline at sf0.001; ``queries()`` exposes
every implemented operator over the sf_dir tables (documents / embeddings /
events) and the deterministic synthetic transcripts (BASELINE.json
input_hint shape; /tmp-cached, seed 42); ``oracle_sql()`` returns the
independent DuckDB re-implementations from blurrily_ray/oracles.py.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

FIND_NEEDLE = "customer query batch window"
FIND_NEEDLES = ["customer query batch window", "custmer qeury bach windw",
                "hash join", "vector scan filter", "ze row cop py arrow",
                "table"]


def _i64(ds):
    """Cast every integer column to int64 so Ray results hash identically
    to the BIGINT-typed oracle results."""

    def cast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, col in zip(batch.column_names, batch.columns):
            if pa.types.is_integer(col.type) and col.type != pa.int64():
                col = col.cast(pa.int64())
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(cast, batch_format="pyarrow")


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _docs_postings(sf_dir: str):
    from blurrily_ray.stages.index import build_postings

    return build_postings(_docs(sf_dir), ref_col="doc_id", text_col="text")


def _transcripts_path(sf_dir: str) -> str:
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir

    return ensure_transcripts(sf_from_dir(sf_dir))["transcripts"]


def entry() -> Any:
    """Flagship: entity resolution over sf0.001 synthetic transcripts."""
    from blurrily_ray.pipelines.er import run_er_grouped

    res = run_er_grouped(_transcripts_path("/root/testdata/sf0.001"))
    return res["clusters"]


# ---------------------------------------------------------------- queries

def _q_normalize(sf_dir: str):
    from blurrily_ray.functions.normalize import normalize_array

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "norm_text": normalize_array(batch["text"])})

    return _i64(_docs(sf_dir).map_batches(fn, batch_format="pyarrow"))


def _q_postings(sf_dir: str):
    return _i64(_docs_postings(sf_dir))


def _q_stats(sf_dir: str):
    from blurrily_ray.stages.index import stats

    s = stats(_docs_postings(sf_dir))
    return pa.table({"references": pa.array([s["references"]], pa.int64()),
                     "trigrams": pa.array([s["trigrams"]], pa.int64())})


def _q_find(sf_dir: str):
    from blurrily_ray.stages.index import find

    return _i64(find(_docs_postings(sf_dir), FIND_NEEDLE, 10))


def _q_find_many(sf_dir: str):
    from blurrily_ray.stages.index import find_many
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(_docs(sf_dir), ref_col="doc_id",
                                text_col="text")
    out = find_many(docsets, FIND_NEEDLES, 10)
    return _i64(out.select_columns(["needle", "rank", "ref", "matches",
                                    "weight"]))


def _docs_edges(sf_dir: str):
    from blurrily_ray.config import ERConfig
    from blurrily_ray.oracles import MAX_KEYS_PER_DOC
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, score_pairs,
        threshold_edges, trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    cfg = ERConfig(blocking_mode="trigram", min_cokeys=1,
                   stoplist_cap=None)  # = sql_candidate_pairs_docs
    docsets = docsets_from_docs(_docs(sf_dir), ref_col="doc_id",
                                text_col="text").materialize()
    hist = trigram_histogram(docsets)
    keys = blocking_keys(docsets, hist, cfg,
                         max_keys_per_doc=MAX_KEYS_PER_DOC).materialize()
    pairs, _ = candidate_pairs(keys, key_histogram(keys), cfg)
    return threshold_edges(score_pairs(pairs, docsets, cfg), cfg)


def _q_pairs(sf_dir: str):
    return _i64(_docs_edges(sf_dir).select_columns(["a", "b", "matches"]))


def _q_pairs_triple(sf_dir: str):
    """Candidate pairs under trigram_triple blocking (C(R,3) composite
    keys — the 10^10+-doc headroom mode)."""
    from blurrily_ray.config import ERConfig
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, score_pairs,
        threshold_edges, trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    cfg = ERConfig(blocking_mode="trigram_triple")
    docsets = docsets_from_docs(_docs(sf_dir), ref_col="doc_id",
                                text_col="text").materialize()
    hist = trigram_histogram(docsets)
    keys = blocking_keys(docsets, hist, cfg).materialize()
    pairs, _ = candidate_pairs(keys, key_histogram(keys), cfg,
                               distinct=False)
    from blurrily_ray.stages.pairs import score_pairs_fused

    edges = score_pairs_fused(pairs, docsets, cfg)
    return _i64(edges.select_columns(["a", "b", "matches"]))


def _q_edit_pairs(sf_dir: str):
    """Record-linkage verify cascade: pair-blocked candidates filtered by
    EXACT Levenshtein ≤ 40 (Myers bit-parallel; stages/editdist.py)."""
    from blurrily_ray.stages.editdist import edit_verify_pairs

    return _i64(edit_verify_pairs(_docs(sf_dir), max_dist=40))


def _q_dl_pairs(sf_dir: str):
    """Record-linkage verify cascade, typo edition: pair-blocked
    candidates filtered by EXACT true Damerau-Levenshtein ≤ 40
    (adjacent transposition = one edit; row-vectorized Lowrance-Wagner;
    stages/editdist.py)."""
    from blurrily_ray.stages.editdist import dl_verify_pairs

    return _i64(dl_verify_pairs(_docs(sf_dir), max_dist=40))


def _q_meta_wep(sf_dir: str):
    """Meta-blocking (Papadakis et al.): CBS-weighted blocking graph +
    weighted edge pruning — co-blocked pairs whose exact co-key count
    clears the global mean (integer cross-multiplication, no float)."""
    from blurrily_ray.stages.metablock import meta_block_wep

    return _i64(meta_block_wep(_docs(sf_dir)))


def _q_link_tables(sf_dir: str):
    """Two-table record linkage: even-doc_id documents linked against
    odd-doc_id documents under shared (union) blocking statistics."""
    from blurrily_ray.stages.linkage import link_tables, parity_halves

    a, b = parity_halves(_docs(sf_dir), "doc_id")
    return _i64(link_tables(a, b, ref_col="doc_id"))


def _turn_docs(sf_dir: str):
    """Assembled transcript conversations as (ref, text) docs — the
    name/entity-rich corpus word-level blocking is built for."""
    import ray.data

    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir
    from blurrily_ray.stages.tokenize import assemble_docs

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    ts = ray.data.read_parquet(paths["transcripts"],
                               columns=["conv_id", "turn_idx", "text"])
    return assemble_docs(ts, assume_grouped=True)


def _q_token_pairs(sf_dir: str):
    """Schema-agnostic token blocking (block purging + salting): the
    candidate edge list with exact common-token weights."""
    from blurrily_ray.stages.tokenblock import token_blocking_pairs

    return _i64(token_blocking_pairs(_turn_docs(sf_dir), ref_col="ref"))


def _q_token_wep(sf_dir: str):
    """The published meta-blocking workflow on its canonical input:
    token blocking → CBS weights → weighted edge pruning."""
    from blurrily_ray.stages.tokenblock import token_meta_wep

    return _i64(token_meta_wep(_turn_docs(sf_dir), ref_col="ref"))


def _q_token_blocking_eval(sf_dir: str):
    """Blocking-quality audit (RR / PC / PQ) of the token-blocking
    scheme against the labeled ground truth — the comparative number
    beside `blocking_eval`'s trigram audit."""
    import ray.data

    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir
    from blurrily_ray.stages.cluster import blocking_eval
    from blurrily_ray.stages.tokenblock import token_blocking_pairs

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    docs = _turn_docs(sf_dir).materialize()
    pairs = token_blocking_pairs(docs, ref_col="ref") \
        .select_columns(["a", "b"])
    truth = ray.data.read_parquet(paths["ground_truth"])
    return blocking_eval(pairs, truth, docs.select_columns(["ref"]))


def _q_meta_cnp(sf_dir: str):
    """Meta-blocking cardinality node pruning: per-node top-k incident
    edges by exact CBS weight (RANK tie-keeping), OR-combined endpoints."""
    from blurrily_ray.stages.metablock import meta_block_cnp

    return _i64(meta_block_cnp(_docs(sf_dir), k=5))


def _q_wjac_pairs(sf_dir: str):
    """IDF-style rescoring of the blocked candidates: rarity-weighted
    trigram Jaccard (w = N·10⁶ // df), exact integer arithmetic end to
    end (stages/wjaccard.py)."""
    from blurrily_ray.stages.wjaccard import wjac_pairs

    return _i64(wjac_pairs(_docs(sf_dir), min_micro=200_000))


def _q_jw_pairs(sf_dir: str):
    """Record-linkage verify cascade, Jaro-Winkler edition: pair-blocked
    candidates kept at exact JW >= 0.8 (bit-parallel matching scan,
    DuckDB-dialect-pinned; stages/stringsim.py)."""
    from blurrily_ray.stages.stringsim import jw_verify_pairs

    return _i64(jw_verify_pairs(_docs(sf_dir), min_sim=0.8))


def _q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): pairs
    within a 4-record window of the normalized-text sort order — linear
    candidate volume, skew-free by construction (stages/snm.py)."""
    from blurrily_ray.stages.snm import snm_pairs

    return _i64(snm_pairs(_docs(sf_dir), window=4))


def _q_fs_counts(sf_dir: str):
    """Fellegi-Sunter agreement-pattern histogram — the 2^K-count
    sufficient statistic the unsupervised EM runs on (one streaming
    bincount-combiner pass; stages/fellegi.py)."""
    import numpy as np

    from blurrily_ray.stages.fellegi import fs_candidates, fs_pattern_counts

    counts = fs_pattern_counts(fs_candidates(_docs(sf_dir)))
    nz = np.nonzero(counts)[0]
    return pa.table({"pattern": pa.array(nz, pa.int64()),
                     "n": pa.array(counts[nz], pa.int64())})


def _q_fs_scores(sf_dir: str):
    """Fellegi-Sunter match weights per candidate pair: EM-learned m/u
    over the pattern histogram, fixed-order float64 log-weight sum,
    micro-int export (stages/fellegi.py)."""
    from blurrily_ray.stages.fellegi import fs_score_pairs

    scored, _params = fs_score_pairs(_docs(sf_dir))
    return _i64(scored)


def _q_snm_multi(sf_dir: str):
    """Multi-pass sorted neighborhood: forward + reversed-key passes,
    canonical union with a per-pair pass count (stages/snm.py)."""
    from blurrily_ray.stages.snm import snm_pairs_multi

    return _i64(snm_pairs_multi(_docs(sf_dir), window=4))


def _q_er_clusters(sf_dir: str):
    from blurrily_ray.pipelines.er import run_er_grouped

    return run_er_grouped(_transcripts_path(sf_dir))["clusters"]


def _q_er_eval(sf_dir: str):
    """North-rule metric as an operator: distributed pairwise-F1 counts
    (tp/pred/truth same-cluster pairs) of the ER clusters against the
    labeled ground-truth table (stages/cluster.cluster_eval)."""
    import ray.data

    from blurrily_ray.pipelines.er import run_er_grouped
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir
    from blurrily_ray.stages.cluster import cluster_eval

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    clusters = run_er_grouped(paths["transcripts"])["clusters"]
    truth = ray.data.read_parquet(paths["ground_truth"])
    return cluster_eval(clusters, truth)


def _q_er_cluster_stats(sf_dir: str):
    """Per-cluster linkage-confidence stats: member/edge counts +
    min/max/sum intra-edge scores (over-merge triage signal)."""
    from blurrily_ray.pipelines.er import run_er_grouped
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir
    from blurrily_ray.stages.cluster import cluster_edge_stats

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    res = run_er_grouped(paths["transcripts"])
    return cluster_edge_stats(res["clusters"], res["edges"])


def _q_er_refined(sf_dir: str):
    """Merge-and-refine second ER pass (Swoosh family): clusters whose
    MERGED member texts match fuse into superclusters."""
    from blurrily_ray.pipelines.er import run_er_refined
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    return run_er_refined(paths["transcripts"])["clusters"]


def _q_er_tiered(sf_dir: str):
    """Two-resolution single-linkage: strict auto-merge tier nested
    inside the loose review tier, one edge computation."""
    from blurrily_ray.pipelines.er import run_er_tiered
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    return run_er_tiered(paths["transcripts"])["clusters"]


def _q_er_eval_bcubed(sf_dir: str):
    """B-cubed precision/recall integer sums of the ER clusters against
    the labeled ground truth — item-weighted evaluation beside er_eval's
    pair-weighted F1 (stages/cluster.cluster_eval_bcubed)."""
    import ray.data

    from blurrily_ray.pipelines.er import run_er_grouped
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir
    from blurrily_ray.stages.cluster import cluster_eval_bcubed

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    clusters = run_er_grouped(paths["transcripts"])["clusters"]
    truth = ray.data.read_parquet(paths["ground_truth"])
    return cluster_eval_bcubed(clusters, truth)


def _q_er_golden(sf_dir: str):
    """Survivorship / golden-record rollup of the ER clusters: canonical
    member + exact integer merge stats per entity
    (stages/cluster.cluster_golden)."""
    import ray.data

    from blurrily_ray.pipelines.er import run_er_grouped
    from blurrily_ray.stages.cluster import cluster_golden

    tpath = _transcripts_path(sf_dir)
    clusters = run_er_grouped(tpath)["clusters"]
    transcripts = ray.data.read_parquet(tpath, columns=["conv_id", "text"])
    return _i64(cluster_golden(clusters, transcripts))


def _q_blocking_eval(sf_dir: str):
    """Blocking-quality audit (reduction ratio / pair completeness / pair
    quality, Christen 2012) of the DEFAULT composite-key blocking against
    the labeled ground truth — integer pair counts + exact floor-division
    micro-ratios, no quadratic enumeration (stages/cluster.blocking_eval)."""
    import ray.data

    from blurrily_ray.config import DEFAULT
    from blurrily_ray.sources.synth import ensure_transcripts, sf_from_dir
    from blurrily_ray.stages.cluster import blocking_eval
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           candidate_pairs_restored,
                                           docsets_bitsets_ref,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_grouped

    paths = ensure_transcripts(sf_from_dir(sf_dir))
    transcripts = ray.data.read_parquet(paths["transcripts"])
    docsets = docsets_grouped(transcripts).materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, DEFAULT, lut_ref=lut_ref)
    pairs, _ = candidate_pairs_fused_blocking(keys, DEFAULT, int_refs=True)
    cand = candidate_pairs_restored(pairs, DEFAULT, lut_ref=lut_ref)
    truth = ray.data.read_parquet(paths["ground_truth"])
    return blocking_eval(cand, truth, docsets.select_columns(["ref"]))


def _q_er_clusters_sharded(sf_dir: str):
    """The beyond-heap scale path, driver-verified: the partitioned
    scorer actor pool (nothing corpus-sized broadcast or on the driver)
    must produce the exact clusters the broadcast path does — same
    DuckDB oracle as er_clusters."""
    from blurrily_ray.pipelines.er import run_er_grouped

    return run_er_grouped(_transcripts_path(sf_dir),
                          score_mode="sharded")["clusters"]


def _q_dedup_exact(sf_dir: str):
    from blurrily_ray.stages.dedup import exact_dedup

    return _i64(exact_dedup(_docs(sf_dir)))


def _q_repetition(sf_dir: str):
    from blurrily_ray.stages.textstats import repetition_stats

    return _i64(repetition_stats(_docs(sf_dir)))


def _q_length_quantiles(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.textstats import group_quantiles

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "n_chars"])
    return group_quantiles(docs)


def _q_para_dedup(sf_dir: str):
    from blurrily_ray.stages.dedup import dedup_paragraphs

    return _i64(dedup_paragraphs(_docs(sf_dir)))


def _q_token_count(sf_dir: str):
    from blurrily_ray.stages.textstats import token_count

    return _i64(token_count(_docs(sf_dir)))


def _q_token_count_bpe(sf_dir: str):
    from blurrily_ray.stages.textstats import token_count_bpe

    return _i64(token_count_bpe(_docs(sf_dir)))


def _q_quality(sf_dir: str):
    from blurrily_ray.stages.textstats import quality_stats

    return _i64(quality_stats(_docs(sf_dir)))


def _q_langid(sf_dir: str):
    from blurrily_ray.stages.textstats import langid

    return _i64(langid(_docs(sf_dir)))


def _q_fingerprint(sf_dir: str):
    from blurrily_ray.stages.textstats import fingerprint

    return _i64(fingerprint(_docs(sf_dir)))


def _q_minhash_pairs(sf_dir: str):
    from blurrily_ray.stages.dedup import minhash_dedup_pairs

    return _i64(minhash_dedup_pairs(_docs(sf_dir)))


def _q_simhash(sf_dir: str):
    from blurrily_ray.stages.dedup import simhash

    return _i64(simhash(_docs(sf_dir)))


def _q_simhash_pairs(sf_dir: str):
    from blurrily_ray.stages.dedup import simhash_pairs

    return _i64(simhash_pairs(_docs(sf_dir)))


def _q_decontaminate(sf_dir: str):
    from blurrily_ray.stages.dedup import decontaminate

    return _i64(decontaminate(_docs(sf_dir)))


def _q_knn(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.simsearch import knn_brute

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(knn_brute(emb, query_ids=range(10), k=10))


def _q_ivf_knn(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.simsearch import ivf_knn

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(ivf_knn(emb, query_ids=range(10), k=10))


def _q_ivf_knn_kmeans(sf_dir: str):
    # distributed spherical-kmeans centroids: the Lloyd iteration itself
    # is not SQL-expressible (determinism + exactness-at-full-probe are
    # pytest-pinned); the oracle checks assignment + probing + ranking
    # against the engine's EXPORTED centroid matrix embedded as a SQL
    # literal (oracles.sql_ivf_knn_kmeans)
    import ray.data

    from blurrily_ray.stages.simsearch import ivf_knn

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(ivf_knn(emb, query_ids=range(10), k=10,
                        centroid_mode="kmeans"))


def _q_embed_neardup(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.simsearch import neardup_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(neardup_pairs(emb, threshold=0.4))


def _q_embed_neardup_lsh(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.simsearch import lsh_neardup_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(lsh_neardup_pairs(emb, threshold=0.4, n_planes=4, n_tables=2))


def _q_sessionize(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.windows import sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return _i64(sessionize(ev, gap_minutes=30))


def _q_image_features(sf_dir: str):
    """Multimodal actor-pool stage over binary payloads (real pure-numpy
    BMP/PNG decode). The md5-seeded 8×8 payload pixels tile the 16 digest
    bytes, so each channel's mean equals the digest-byte mean — giving
    decode + feature math a FULL DuckDB oracle (quadrant features and std
    stay pytest-covered)."""
    from blurrily_ray.stages.multimodal import (
        attach_binary_payload, extract_image_features)

    media = attach_binary_payload(_docs(sf_dir))
    feats = extract_image_features(media)

    def unpack(batch: pa.Table) -> pa.Table:
        import numpy as np

        f = batch["feature"].combine_chunks()
        flat = f.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(batch), -1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": batch["width"].cast(pa.int64()),
            "height": batch["height"].cast(pa.int64()),
            "mean_r": pa.array(mat[:, 0]),
            "mean_g": pa.array(mat[:, 1]),
            "mean_b": pa.array(mat[:, 2])})

    return _i64(feats.map_batches(unpack, batch_format="pyarrow"))


def _q_jaccard_ngram(sf_dir: str):
    """Exact prefix-filtered n-gram Jaccard similarity join — the
    deterministic-recall complement of minhash_pairs_docs."""
    from blurrily_ray.stages.dedup import jaccard_ngram_pairs

    return _i64(jaccard_ngram_pairs(_docs(sf_dir)))


def _q_sample(sf_dir: str):
    """Deterministic hash-bucket split (reproducible train/val sampling;
    pure map, no shuffle)."""
    from blurrily_ray.stages.sample import deterministic_split

    return _i64(deterministic_split(_docs(sf_dir), key_col="doc_id",
                                    lo=0, hi=10))


def _q_vocab(sf_dir: str):
    """Corpus token-frequency table (map-side combining; one row per
    distinct token per block crosses the shuffle)."""
    from blurrily_ray.stages.textstats import vocab_top_k

    return _i64(vocab_top_k(_docs(sf_dir), k=100))


def _q_top_events(sf_dir: str):
    """Keep-best-k curation primitive: each user's top-3 events by value."""
    import ray.data

    from blurrily_ray.stages.windows import top_k_per_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])
    return _i64(top_k_per_group(ev, by="user_id", order_col="value", k=3,
                                tiebreak_col="event_id"))


def _q_curate(sf_dir: str):
    """Composed pretraining curation chain (quality/langid/token-budget
    filters fused into one map pass + digest-keyed exact dedup) — the
    pipeline-of-operators query."""
    from blurrily_ray.pipelines.curate import curate_corpus

    return _i64(curate_corpus(_docs(sf_dir)))


def _q_video_frames(sf_dir: str):
    """Multimodal video actor-pool stage (REAL motion-BMP container: a
    frame index walk seeks to every sampled frame and decodes it with the
    pure-numpy BMP codec). The oracle reproduces the sampled-frame
    inventory from the md5 seed; per-frame channel means are
    pytest-covered."""
    from blurrily_ray.stages.multimodal import (
        attach_video_payload, sample_video_frames)

    media = attach_video_payload(_docs(sf_dir))
    return _i64(sample_video_frames(media, stride=2).select_columns(
        ["doc_id", "frame_idx", "width", "height"]))


def _q_audio_features(sf_dir: str):
    """Multimodal audio actor-pool stage (REAL pure-numpy RIFF/WAV PCM
    decode). The oracle reproduces each clip's duration from the md5 seed;
    rms/zcr/peak aren't SQL-expressible and are pytest-covered against
    closed-form sine expectations."""
    from blurrily_ray.stages.multimodal import (
        attach_audio_payload, extract_audio_features)

    media = attach_audio_payload(_docs(sf_dir))
    return extract_audio_features(media).select_columns(
        ["doc_id", "duration_sec"])


def _events_us(sf_dir: str, cols: list[str], renames: dict[str, str] | None
               = None, event_type: str | None = None):
    """events with ``ts`` pre-cast to epoch-microsecond int64 (``ts_us``)
    so join/window operators and the BIGINT-typed oracles hash alike."""
    import ray.data

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    if event_type is not None:
        ev = ev.filter(expr=f"event_type == '{event_type}'")

    def cast(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            if c == "event_type":
                continue
            name = "ts_us" if c == "ts" else c
            col = batch[c].cast(pa.int64()) if c == "ts" else batch[c]
            out[(renames or {}).get(name, name)] = col
        return pa.table(out)

    return ev.map_batches(cast, batch_format="pyarrow")


def _q_window_agg(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.windows import window_agg

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "user_id",
                                        "value"])
    return _i64(window_agg(ev, window_minutes=60))


def _q_hopping_window(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.windows import hopping_window_agg

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "user_id",
                                        "value"])
    return _i64(hopping_window_agg(ev, window_minutes=60, hop_minutes=15))


def _q_asof_purchase_click(sf_dir: str):
    from blurrily_ray.stages.joins import asof_join

    pur = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type"],
                     event_type="purchase")
    clk = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type"],
                     renames={"event_id": "click_event_id",
                              "user_id": "click_user",
                              "ts_us": "click_ts_us"},
                     event_type="click")
    out = asof_join(pur, clk, by="user_id", on="ts_us",
                    right_by="click_user", right_on="click_ts_us")

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": batch["event_id"], "user_id": batch["user_id"],
            "ts_us": batch["ts_us"],
            "click_event_id": pc.fill_null(
                batch["click_event_id"].cast(pa.int64()), -1),
            "click_ts_us": pc.fill_null(
                batch["click_ts_us"].cast(pa.int64()), -1)})

    return _i64(out.map_batches(fill, batch_format="pyarrow"))


def _q_range_join(sf_dir: str):
    from blurrily_ray.stages.joins import range_join_count

    ev = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    return _i64(range_join_count(ev, ev, id_col="event_id", on="ts_us",
                                 lo=0, hi=300_000_000, by="user_id",
                                 out_col="n_next"))


def _q_pricing_summary(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.relational import pricing_summary

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"])
    return _i64(pricing_summary(li))


def _q_revenue_by_nation(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.relational import revenue_by_nation

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    customer = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey", "c_nationkey"])
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"])
    return _i64(revenue_by_nation(orders, customer, nation))


def _q_keep_best_turns(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.dedup import dedup_keep_best

    turns = ray.data.read_parquet(_transcripts_path(sf_dir),
                                  columns=["conv_id", "turn_idx", "text"])
    return _i64(dedup_keep_best(turns))


def _q_unigram_rank(sf_dir: str):
    from blurrily_ray.stages.textstats import unigram_rank_score

    return _i64(unigram_rank_score(_docs(sf_dir), top_v=20))


def _q_fuzzy_join(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data

    from blurrily_ray.stages.index import fuzzy_join
    from blurrily_ray.stages.tokenize import assemble_docs

    ts = ray.data.read_parquet(_transcripts_path(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    docs = assemble_docs(ts, assume_grouped=True)
    needles = docs.map_batches(
        lambda b: b.rename_columns(["needle_ref", "text"]),
        batch_format="pyarrow")
    catalog = docs.map_batches(
        lambda b: b.filter(pc.ends_with(b["ref"], "v0")),
        batch_format="pyarrow")
    return _i64(fuzzy_join(needles, catalog, needle_id="needle_ref", k=3))


def _q_curate_full(sf_dir: str):
    from blurrily_ray.pipelines.curate import curate_corpus_full

    return _i64(curate_corpus_full(_docs(sf_dir)))


def _q_hll_registers(sf_dir: str):
    import ray.data

    from blurrily_ray.stages.sketch import hll_token_registers

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"])
    return _i64(hll_token_registers(docs))


def _q_redact_tickets(sf_dir: str):
    import ray.data

    from blurrily_ray.sources.synth import ensure_tickets
    from blurrily_ray.stages.redact import redact_pii

    path = ensure_tickets(sf_dir)
    return _i64(redact_pii(ray.data.read_parquet(path)))


STRATA_RATES = {"en": 25, "zh": 100}
STRATA_DEFAULT = 60
BM25_QUERIES = ["customer query batch window", "slow merge join",
                "spark stream filter big"]


def _q_bm25(sf_dir: str):
    """BM25 top-k retrieval (two streamed passes; integer nano-unit
    scores so parity is exact under any partitioning)."""
    from blurrily_ray.stages.retrieval import bm25_topk

    return _i64(bm25_topk(_docs(sf_dir), BM25_QUERIES, k=10))


def _q_near_dedup_canonical(sf_dir: str):
    """Corpus near-dedup with canonical survivors: MinHash+LSH pairs →
    transitive closure → keep = 1 on each cluster's smallest doc_id."""
    from blurrily_ray.stages.dedup import near_dedup_canonical

    return _i64(near_dedup_canonical(_docs(sf_dir)))


def _q_stratified_sample(sf_dir: str):
    """Per-language deterministic sampling (downsample dominant strata,
    keep rare ones whole); pure map, md5-bucket stable."""
    import ray.data

    from blurrily_ray.stages.sample import stratified_sample

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    return _i64(stratified_sample(docs, key_col="doc_id",
                                  strata_col="lang", rates=STRATA_RATES,
                                  default_keep=STRATA_DEFAULT))


def _q_sq_knn(sf_dir: str):
    """Scalar-quantized int8 MIPS top-k: all-integer scores, bit-exact
    oracle (no float rounding smoothing)."""
    import ray.data

    from blurrily_ray.stages.simsearch import sq_knn

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(sq_knn(emb, query_ids=range(10), k=10))


def _q_dup_ngram(sf_dir: str):
    """Lee-et-al exact duplicated-substring metrics: per-doc duplicated
    sliding-window counts + covered-token union, all-integer."""
    from blurrily_ray.stages.dedup import dup_ngram_stats

    return _i64(dup_ngram_stats(_docs(sf_dir), window=10))


def _q_cms(sf_dir: str):
    """Count-min sketch register table per source: mergeable heavy-hitter
    summary, SUM-combined, bit-exact vs SQL."""
    import ray.data

    from blurrily_ray.stages.sketch import cms_token_registers

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"])
    return _i64(cms_token_registers(docs))


def _q_value_quantiles(sf_dir: str):
    """Float-column quantiles via micro-int histogram combine."""
    import ray.data

    from blurrily_ray.stages.textstats import float_group_quantiles

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return _i64(float_group_quantiles(ev, group_col="event_type",
                                      value_col="value"))


def _q_collocations(sf_dir: str):
    """Top-k bigram collocations with integer PMI count columns."""
    from blurrily_ray.stages.textstats import collocations_top_k

    return _i64(collocations_top_k(_docs(sf_dir), k=50))


def _q_funnel(sf_dir: str):
    """Per-user view->click->purchase funnel depth + conversion times."""
    import ray.data

    from blurrily_ray.stages.windows import funnel

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    return _i64(funnel(ev))


def _q_pq_knn(sf_dir: str):
    """Product-quantized ADC kNN: all-integer micro distances, codebooks
    re-trained deterministically (exported as a literal for the oracle)."""
    import ray.data

    from blurrily_ray.stages.simsearch import pq_knn

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(pq_knn(emb, query_ids=range(10), k=10))


def _q_cluster_size_hist(sf_dir: str):
    """Cluster-size distribution of the flagship ER output: two tiny
    aggregates over the labels (cluster sizes are bounded by entity
    multiplicity; both groupbys ship one int row per distinct key per
    block)."""
    from blurrily_ray.pipelines.er import run_er_grouped

    clusters = run_er_grouped(_transcripts_path(sf_dir))["clusters"]
    sizes = clusters.groupby("cluster_id").count() \
        .rename_columns({"count()": "cluster_size"})
    hist = sizes.groupby("cluster_size").count() \
        .rename_columns({"count()": "n_clusters"})
    return _i64(hist)


def _connector_export_dir(name: str, sf_dir: str, write) -> str:
    """Export a table once per (name, sf_dir) into a /tmp-cached directory:
    ``write(tmp_dir)`` runs against a unique temp dir which is then
    atomically renamed into place — queries() entries run many times per
    driver session and the CSV sink is not idempotent across re-runs, so
    the export must happen exactly once and losers of the rename race
    discard their copy."""
    import hashlib
    import os
    import shutil
    import tempfile

    root = "/tmp/blurrily_connector_cache"
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    final = os.path.join(root, f"{name}-{key}")
    if os.path.isdir(final):
        return final
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=f"{name}-{key}.")
    try:
        write(tmp)
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(final):
            raise  # a real export failure, not a lost rename race
    return final


def _q_csv_roundtrip(sf_dir: str):
    """Connector round-trip: transcripts → partitioned CSV export →
    ``read_transcripts_csv`` (the schema contract re-coerces Arrow CSV's
    inferred dtypes) → canonical projection. The oracle reads the same
    projection straight off the source parquet — the round-trip must be
    value-lossless."""
    import ray.data

    from blurrily_ray.sources.csv import read_transcripts_csv, write_csv

    tpath = _transcripts_path(sf_dir)

    def write(d: str) -> None:
        write_csv(ray.data.read_parquet(
            tpath, columns=["conv_id", "turn_idx", "text"]), d)

    d = _connector_export_dir("csv_turns", sf_dir, write)
    return _i64(read_transcripts_csv(
        d, columns=["conv_id", "turn_idx", "text"]))


def _q_orc_roundtrip(sf_dir: str):
    """Connector round-trip: documents → content-addressed ORC sink →
    ``read_orc`` (per-file pyarrow.orc decode, projection pushed down).
    The oracle is the same projection off the source parquet."""
    import glob

    import ray.data

    from blurrily_ray.sources.orc import read_orc, write_orc

    cols = ["doc_id", "text", "lang", "source"]

    def write(d: str) -> None:
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=cols)
        write_orc(docs, d).materialize()  # consume to drive the lazy write

    d = _connector_export_dir("orc_docs", sf_dir, write)
    if not glob.glob(f"{d}/*.orc"):  # zero-row source → no files landed
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string()),
                         "lang": pa.array([], pa.string()),
                         "source": pa.array([], pa.string())})
    return _i64(read_orc(d, columns=cols))


def _q_ivfpq_knn(sf_dir: str):
    """IVF-PQ (IVFADC): cosine cell probing + integer ADC ranking —
    both halves keep their oracle-exact contracts."""
    import ray.data

    from blurrily_ray.stages.simsearch import ivfpq_knn

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _i64(ivfpq_knn(emb, query_ids=range(10), k=10))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "normalize_docs": _q_normalize,
        "postings_docs": _q_postings,
        "stats_docs": _q_stats,
        "find_docs": _q_find,
        "find_many_docs": _q_find_many,
        "pairs_docs": _q_pairs,
        "pairs_docs_triple": _q_pairs_triple,
        "edit_pairs_docs": _q_edit_pairs,
        "dl_pairs_docs": _q_dl_pairs,
        "wjac_pairs_docs": _q_wjac_pairs,
        "meta_wep_docs": _q_meta_wep,
        "meta_cnp_docs": _q_meta_cnp,
        "link_tables_docs": _q_link_tables,
        "token_pairs_turns": _q_token_pairs,
        "token_wep_turns": _q_token_wep,
        "token_blocking_eval": _q_token_blocking_eval,
        "jw_pairs_docs": _q_jw_pairs,
        "snm_pairs_docs": _q_snm_pairs,
        "snm_multi_pairs_docs": _q_snm_multi,
        "fs_counts_docs": _q_fs_counts,
        "fs_scores_docs": _q_fs_scores,
        "er_clusters": _q_er_clusters,
        "er_clusters_sharded": _q_er_clusters_sharded,
        "er_eval": _q_er_eval,
        "er_eval_bcubed": _q_er_eval_bcubed,
        "er_refined": _q_er_refined,
        "er_cluster_stats": _q_er_cluster_stats,
        "er_tiered": _q_er_tiered,
        "blocking_eval": _q_blocking_eval,
        "er_golden": _q_er_golden,
        "dedup_exact_docs": _q_dedup_exact,
        "dedup_paragraphs_docs": _q_para_dedup,
        "repetition_docs": _q_repetition,
        "length_quantiles_docs": _q_length_quantiles,
        "token_count_docs": _q_token_count,
        "token_count_bpe_docs": _q_token_count_bpe,
        "quality_docs": _q_quality,
        "langid_docs": _q_langid,
        "fingerprint_docs": _q_fingerprint,
        "minhash_pairs_docs": _q_minhash_pairs,
        "jaccard_ngram_pairs_docs": _q_jaccard_ngram,
        "simhash_docs": _q_simhash,
        "simhash_pairs_docs": _q_simhash_pairs,
        "decontaminate_docs": _q_decontaminate,
        "knn_embeddings": _q_knn,
        "ivf_knn_embeddings": _q_ivf_knn,
        "ivf_knn_kmeans_embeddings": _q_ivf_knn_kmeans,
        "embed_neardup": _q_embed_neardup,
        "embed_neardup_lsh": _q_embed_neardup_lsh,
        "sessionize_events": _q_sessionize,
        "window_agg_events": _q_window_agg,
        "hopping_window_events": _q_hopping_window,
        "asof_purchase_click": _q_asof_purchase_click,
        "range_join_events": _q_range_join,
        "image_features": _q_image_features,
        "curate_corpus_docs": _q_curate,
        "top_events_per_user": _q_top_events,
        "vocab_top100_docs": _q_vocab,
        "sample_docs_10pct": _q_sample,
        "video_frames": _q_video_frames,
        "audio_features": _q_audio_features,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "redact_tickets": _q_redact_tickets,
        "keep_best_turns": _q_keep_best_turns,
        "unigram_rank_docs": _q_unigram_rank,
        "hll_registers_docs": _q_hll_registers,
        "curate_full_docs": _q_curate_full,
        "fuzzy_join_turns": _q_fuzzy_join,
        "near_dedup_canonical_docs": _q_near_dedup_canonical,
        "stratified_sample_docs": _q_stratified_sample,
        "bm25_topk_docs": _q_bm25,
        "sq_knn_embeddings": _q_sq_knn,
        "dup_ngram_docs": _q_dup_ngram,
        "cms_registers_docs": _q_cms,
        "value_quantiles_events": _q_value_quantiles,
        "collocations_docs": _q_collocations,
        "funnel_events": _q_funnel,
        "pq_knn_embeddings": _q_pq_knn,
        "cluster_size_hist": _q_cluster_size_hist,
        "ivfpq_knn_embeddings": _q_ivfpq_knn,
        "csv_roundtrip_turns": _q_csv_roundtrip,
        "orc_roundtrip_docs": _q_orc_roundtrip,
    }


def _cached_export(name: str, sf: float, compute):
    """Disk-cache a deterministic oracle export (PQ codebooks / k-means
    centroids are bit-identical across reruns — simsearch.py docstrings).

    Lookup order: the committed repo cache (blurrily_ray/data/oracle_cache,
    populated for the oracle sfs so the driver's ``oracle_sql()`` call runs
    ZERO Ray work), then /tmp (warm from a prior call this boot), else
    ``compute()`` (a Ray job) and persist to /tmp. Without this,
    ``oracle_sql()`` re-trained both models on every call — the likely
    cause of the empty CORRECTNESS_r04.json artifact (VERDICT r4 #1)."""
    import os

    import numpy as np

    fname = f"{name}_sf{sf:g}.npy"
    repo_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "blurrily_ray", "data", "oracle_cache", fname)
    tmp_dir = "/tmp/blurrily_oracle_cache"
    tmp_path = os.path.join(tmp_dir, fname)
    for path in (repo_path, tmp_path):
        if os.path.exists(path):
            return np.load(path)
    arr = compute()
    if arr is not None:
        os.makedirs(tmp_dir, exist_ok=True)
        # np.save APPENDS '.npy' to names that lack it — the temp name
        # must already end in .npy or the following replace can't find it
        tmp = f"{tmp_path}.{os.getpid()}.inprogress.npy"
        np.save(tmp, arr)
        os.replace(tmp, tmp_path)
    return arr


def _oracle_pq_codebooks(sf: float):
    """The engine's PQ codebooks for the oracle-sf embeddings table —
    deterministic re-train, exported as a SQL literal (sql_pq_knn)."""
    def compute():
        import ray.data

        from blurrily_ray.stages.simsearch import pq_codebooks

        emb = ray.data.read_parquet(
            f"/root/testdata/sf{sf:g}/embeddings.parquet")
        return pq_codebooks(emb)

    return _cached_export("pq_codebooks", sf, compute)


def _oracle_fs_weights(sf: float):
    """The engine's EM-learned FS weight matrix for the oracle-sf
    documents table — deterministic re-train (fixed init / iteration
    count), exported as repr-exact SQL literals (sql_fs_scores)."""
    def compute():
        import ray.data

        from blurrily_ray.stages.fellegi import fs_score_pairs

        docs = ray.data.read_parquet(
            f"/root/testdata/sf{sf:g}/documents.parquet",
            columns=["doc_id", "text"])
        return fs_score_pairs(docs)[1]["weights"]

    return _cached_export("fs_weights", sf, compute)


def _oracle_kmeans_centroids(sf: float):
    """The engine's distributed k-means centroids for the oracle-sf
    embeddings table, exported so sql_ivf_knn_kmeans can embed them as a
    literal (the run is deterministic per session — pytest-pinned)."""
    def compute():
        import ray.data

        from blurrily_ray.stages.simsearch import kmeans_centroids

        emb = ray.data.read_parquet(
            f"/root/testdata/sf{sf:g}/embeddings.parquet")
        return kmeans_centroids(emb, 16)

    return _cached_export("kmeans_centroids", sf, compute)


def oracle_sql() -> dict[str, str]:
    """Per-key failure isolation: every entry is built in its own
    try/except, so one bad export / synth table / SQL builder degrades
    exactly that query to the driver's rows-only check instead of
    blanking the whole artifact (the r4 failure mode)."""
    import sys

    from blurrily_ray import oracles  # noqa: F401  (used by _oracle_entries)

    sf, entries = _oracle_entries()
    out: dict[str, str] = {}
    for key, thunk in entries.items():
        try:
            out[key] = thunk()
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            print(f"oracle_sql: {key} failed ({exc!r}) — omitted",
                  file=sys.stderr)
    return out


def _oracle_entries():
    """(sf, {query_key: thunk returning its SQL string}). Thunks defer
    every side effect (synth-table ensure, cached-export load) so
    ``oracle_sql()`` can isolate failures per key."""
    import os

    from blurrily_ray import oracles
    from blurrily_ray.sources.synth import ensure_tickets, ensure_transcripts

    # the driver runs oracles at sf0.01 (the env override lets
    # scripts/check_oracles.py verify other scales); synth parquets are
    # /tmp-cached and only the keys that read them pay the ensure
    sf = float(os.environ.get("GRAFT_ORACLE_SF", "0.01"))

    def tpath() -> str:
        return ensure_transcripts(sf)["transcripts"]

    return sf, {
        "normalize_docs": lambda: oracles.sql_normalize_docs(),
        "postings_docs": lambda: oracles.sql_postings_docs(),
        "stats_docs": lambda: oracles.sql_stats_docs(),
        "find_docs": lambda: oracles.sql_find_docs(FIND_NEEDLE, 10),
        "find_many_docs": lambda: oracles.sql_find_many_docs(FIND_NEEDLES, 10),
        "pairs_docs": lambda: oracles.sql_candidate_pairs_docs(),
        "pairs_docs_triple": lambda: oracles.sql_candidate_pairs_docs(
            oracles.TRIPLE_MODE),
        "edit_pairs_docs": lambda: oracles.sql_edit_pairs(),
        "dl_pairs_docs": lambda: oracles.sql_dl_pairs(),
        "wjac_pairs_docs": lambda: oracles.sql_wjac_pairs(),
        "meta_wep_docs": lambda: oracles.sql_meta_wep(),
        "meta_cnp_docs": lambda: oracles.sql_meta_cnp(k=5),
        "link_tables_docs": lambda: oracles.sql_link_tables(),
        "token_pairs_turns": lambda: oracles.sql_token_pairs(tpath()),
        "token_wep_turns": lambda: oracles.sql_token_meta_wep(tpath()),
        "token_blocking_eval": lambda: oracles.sql_token_blocking_eval(
            tpath(), ensure_transcripts(sf)["ground_truth"]),
        "jw_pairs_docs": lambda: oracles.sql_jw_pairs(),
        "snm_pairs_docs": lambda: oracles.sql_snm_pairs(),
        "snm_multi_pairs_docs": lambda: oracles.sql_snm_pairs_multi(),
        "fs_counts_docs": lambda: oracles.sql_fs_counts(),
        "fs_scores_docs": lambda: oracles.sql_fs_scores(
            _oracle_fs_weights(sf)),
        "er_clusters": lambda: oracles.sql_er_clusters(tpath()),
        "er_clusters_sharded": lambda: oracles.sql_er_clusters(tpath()),
        "er_eval": lambda: oracles.sql_er_eval(
            tpath(), ensure_transcripts(sf)["ground_truth"]),
        "er_eval_bcubed": lambda: oracles.sql_er_eval_bcubed(
            tpath(), ensure_transcripts(sf)["ground_truth"]),
        "er_refined": lambda: oracles.sql_er_refined(tpath()),
        "er_cluster_stats": lambda: oracles.sql_er_cluster_stats(tpath()),
        "er_tiered": lambda: oracles.sql_er_tiered(tpath()),
        "blocking_eval": lambda: oracles.sql_blocking_eval(
            tpath(), ensure_transcripts(sf)["ground_truth"]),
        "er_golden": lambda: oracles.sql_er_golden(tpath()),
        "dedup_exact_docs": lambda: oracles.sql_exact_dedup_docs(),
        "dedup_paragraphs_docs": lambda: oracles.sql_dedup_paragraphs(),
        "repetition_docs": lambda: oracles.sql_repetition_stats(),
        "length_quantiles_docs": lambda: oracles.sql_group_quantiles(),
        "token_count_docs": lambda: oracles.sql_token_count_docs(),
        "token_count_bpe_docs": lambda: oracles.sql_token_count_bpe_docs(),
        "quality_docs": lambda: oracles.sql_quality_docs(),
        "langid_docs": lambda: oracles.sql_langid_docs(),
        "fingerprint_docs": lambda: oracles.sql_fingerprint_docs(),
        "minhash_pairs_docs": lambda: oracles.sql_minhash_pairs_docs(),
        "jaccard_ngram_pairs_docs": lambda: oracles.sql_jaccard_ngram_pairs(),
        "simhash_docs": lambda: oracles.sql_simhash_docs(),
        "simhash_pairs_docs": lambda: oracles.sql_simhash_pairs(),
        "decontaminate_docs": lambda: oracles.sql_decontaminate(),
        "knn_embeddings": lambda: oracles.sql_knn_embeddings(10, 10),
        "ivf_knn_embeddings": lambda: oracles.sql_ivf_knn(10, 10),
        "ivf_knn_kmeans_embeddings": lambda: oracles.sql_ivf_knn_kmeans(
            _oracle_kmeans_centroids(sf), 10, 10),
        "embed_neardup": lambda: oracles.sql_embed_neardup(0.4),
        "embed_neardup_lsh": lambda: oracles.sql_embed_neardup_lsh(
            0.4, n_planes=4, n_tables=2),
        "sessionize_events": lambda: oracles.sql_sessionize_events(30),
        "window_agg_events": lambda: oracles.sql_window_agg_events(60),
        "hopping_window_events": lambda: oracles.sql_hopping_window_events(60, 15),
        "asof_purchase_click": lambda: oracles.sql_asof_purchase_click(),
        "range_join_events": lambda: oracles.sql_range_join_events(300),
        "video_frames": lambda: oracles.sql_video_frames(2),
        "curate_corpus_docs": lambda: oracles.sql_curate_corpus(),
        "top_events_per_user": lambda: oracles.sql_top_events_per_user(3),
        "vocab_top100_docs": lambda: oracles.sql_vocab_top_k(100),
        "sample_docs_10pct": lambda: oracles.sql_sample_docs(0, 10),
        "image_features": lambda: oracles.sql_image_features(),
        # image_features: multimodal stub — rows-only check by design
        "audio_features": lambda: oracles.sql_audio_duration(),
        "pricing_summary": lambda: oracles.sql_pricing_summary(),
        "revenue_by_nation": lambda: oracles.sql_revenue_by_nation(),
        "redact_tickets": lambda: oracles.sql_redact_tickets(ensure_tickets(sf)),
        "keep_best_turns": lambda: oracles.sql_dedup_keep_best(tpath()),
        "unigram_rank_docs": lambda: oracles.sql_unigram_rank(20),
        "hll_registers_docs": lambda: oracles.sql_hll_registers(),
        "curate_full_docs": lambda: oracles.sql_curate_full(),
        "fuzzy_join_turns": lambda: oracles.sql_fuzzy_join(tpath()),
        "near_dedup_canonical_docs": lambda: oracles.sql_near_dedup_canonical(),
        "stratified_sample_docs": lambda: oracles.sql_stratified_sample(
            STRATA_RATES, STRATA_DEFAULT),
        "bm25_topk_docs": lambda: oracles.sql_bm25_topk(BM25_QUERIES, 10),
        "sq_knn_embeddings": lambda: oracles.sql_sq_knn(10, 10),
        "dup_ngram_docs": lambda: oracles.sql_dup_ngram_stats(10),
        "cms_registers_docs": lambda: oracles.sql_cms_registers(4, 256),
        "value_quantiles_events": lambda: oracles.sql_value_quantiles_events(),
        "collocations_docs": lambda: oracles.sql_collocations(50),
        "funnel_events": lambda: oracles.sql_funnel_events(),
        "pq_knn_embeddings": lambda: oracles.sql_pq_knn(
            _oracle_pq_codebooks(sf), 10, 10),
        "cluster_size_hist": lambda: oracles.sql_cluster_size_hist(tpath()),
        "ivfpq_knn_embeddings": lambda: oracles.sql_ivfpq_knn(
            _oracle_pq_codebooks(sf), 10, 10),
        "csv_roundtrip_turns": lambda: oracles.sql_csv_roundtrip(tpath()),
        "orc_roundtrip_docs": lambda: oracles.sql_orc_roundtrip(),
    }
