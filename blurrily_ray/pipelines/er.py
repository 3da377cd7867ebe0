"""Flagship pipeline: transcripts → entity clusters.

read_parquet(transcripts)
  → assemble_docs            (one groupby: turns → conversation docs)
  → docsets_from_docs        (map: normalize + trigram sets, zero-copy Arrow)
  → trigram_histogram        (combiner + tiny groupby: exact skew stats)
  → blocking_keys            (map: rarest-trigram emissions)
  → candidate_pairs          (salted groupby: bounded blocks → distinct pairs)
  → score_pairs              (broadcast or hash join: exact shared-trigram score)
  → threshold_edges          (map filter)
  → connected_components     (driver union-find / distributed hash-min)
  → clusters (ref, cluster_id)

Every materialized stage can checkpoint under ``checkpoint_dir`` with a
lineage manifest; a resumed run skips stages whose (config, input) lineage
matches (state/checkpoint.py).
"""

from __future__ import annotations

import os

import ray.data

from blurrily_ray.config import DEFAULT, ERConfig
from blurrily_ray.stages.cluster import connected_components
from blurrily_ray.stages.pairs import (
    blocking_keys,
    candidate_pairs,
    key_histogram,
    score_pairs,
    threshold_edges,
    trigram_histogram,
)
from blurrily_ray.stages.tokenize import assemble_docs, docsets_from_docs
from blurrily_ray.state.checkpoint import run_stage
from blurrily_ray.state.metrics import Metrics


def run_er(transcripts, cfg: ERConfig = DEFAULT, *,
           checkpoint_dir: str | None = None,
           metrics: Metrics | None = None,
           cc_mode: str = "auto",
           score_mode: str = "auto",
           assume_grouped: bool = False):
    """Run entity resolution; returns dict with 'clusters' (Dataset of
    (ref, cluster_id)), 'edges', and 'skew' stats."""
    metrics = metrics or Metrics()

    if checkpoint_dir is not None:
        from blurrily_ray.state.checkpoint import input_fingerprint

        in_digest = input_fingerprint(transcripts)

    def ckpt(name, fn):
        if checkpoint_dir is None:
            return fn()
        # lineage includes the INPUT identity (rerunning with the same
        # config but different transcripts must invalidate the checkpoint)
        # AND the assemble mode: a docsets checkpoint written by the
        # assume_grouped fast path on bad input must NOT satisfy the
        # assume_grouped=False re-run our own error message recommends
        lineage = {"config": cfg.digest(), "stage": name, "input": in_digest,
                   "assemble": "grouped" if assume_grouped else "shuffle"}
        return run_stage(name, os.path.join(checkpoint_dir, name), fn,
                         lineage=lineage)

    with metrics.timeit("docsets"):
        if assume_grouped:
            # fused assemble+tokenize: the corpus TEXT never enters the
            # object store — only per-doc trigram sets (~8× smaller) are
            # pinned. At 100 TB this is the difference between spilling
            # the corpus and never moving it past the read stage.
            from blurrily_ray.stages.tokenize import docsets_grouped

            docsets = ckpt("docsets", lambda: docsets_grouped(transcripts))
        else:
            docs = assemble_docs(transcripts, assume_grouped=False)
            docsets = ckpt("docsets", lambda: docsets_from_docs(docs))
        docsets = docsets.materialize()  # reused by 4 downstream stages
        # NB contiguity guard: the assume_grouped fast path would emit
        # DUPLICATE refs on interleaved input. The broadcast path detects
        # this for free inside the LUT's sorted-ref pass
        # (pairs._lut_from_tables raises); every other scoring path runs
        # the explicit refs-only check before scoring (below).
    with metrics.timeit("histogram"):
        hist = trigram_histogram(docsets)

    # scoring-mode dispatch: 'auto' honors broadcast_limit_bytes — below it
    # the per-doc bitsets broadcast once (fastest at sandbox scale); above
    # it the partitioned scorer actor pool streams pairs against Parquet
    # bitset shards and NOTHING corpus-sized ever touches the driver.
    from blurrily_ray.stages.pairs import _BITSET_BYTES

    if score_mode == "auto":
        est = docsets.count() * (_BITSET_BYTES + 64)
        score_mode = "broadcast" if est <= cfg.broadcast_limit_bytes \
            else "sharded"
        metrics.stage("score_dispatch", mode=score_mode, est_bytes=est)

    # sharded + composite blocking runs entirely in coordination-free
    # surrogate-id space: the shard build assigns (shard << 21) | rank
    # ids and its per-shard sort detects duplicate refs for free
    use_sur = score_mode == "sharded" and cfg.blocking_mode != "trigram"

    if assume_grouped and score_mode != "broadcast" and not use_sur:
        # every non-broadcast scoring path that skips both dup detectors
        # (the LUT's sorted-ref pass, the sur builder's shard sort) needs
        # the explicit refs-only check
        _validate_unique_refs(docsets)

    lut_ref = None
    docsets_sur = None
    if score_mode == "broadcast":
        with metrics.timeit("bitsets"):
            # one broadcast serves blocking (ref → surrogate id), scoring
            # (bitsets) and the final ref restoration
            from blurrily_ray.stages.pairs import docsets_bitsets_ref

            lut_ref = docsets_bitsets_ref(docsets)
    elif score_mode == "sharded":
        import tempfile

        from blurrily_ray.stages.scorer import (build_bitset_shards,
                                                build_bitset_shards_sur)

        with metrics.timeit("bitset_shards"):
            shard_dir = (os.path.join(checkpoint_dir, "bitset_shards")
                         if checkpoint_dir else
                         tempfile.mkdtemp(prefix="blurrily_shards_"))
            if use_sur:
                # ONE corpus co-partition writes the shard files AND
                # yields (sur, tris, ntri, weight) for int-key blocking.
                # Not manifest-resumable (the surrogates ride the
                # dataflow) — the edges checkpoint subsumes resume here.
                docsets_sur = build_bitset_shards_sur(
                    docsets, shard_dir, cfg.score_shards)
            else:
                build_bitset_shards(
                    docsets, shard_dir, cfg.score_shards,
                    lineage={"config": cfg.digest(),
                             **({"input": in_digest}
                                if checkpoint_dir is not None else {})})

    # composite blocking takes the ONE-shuffle path (broadcast surrogates
    # from the LUT, sharded surrogates from the shard build): partition
    # emissions by the key's leading trigram; exact per-key counts,
    # stoplist and pair generation all happen in-partition (no
    # key-histogram shuffle, no salt broadcast). Single-trigram mode
    # keeps the salted path — its keys can cover a constant corpus
    # fraction and must drop map-side. (Fusing SCORING into the same
    # partition to skip the (a,b) exchange entirely was measured and
    # REJECTED — see NOTES: the exchange is cheaper than the extra
    # per-partition popcount gathers it avoids.)
    fused_blocking = (cfg.blocking_mode != "trigram"
                      and (score_mode == "broadcast" or use_sur))
    if fused_blocking:
        from blurrily_ray.stages.pairs import candidate_pairs_fused_blocking

        with metrics.timeit("blocking"):
            if use_sur:
                keys = blocking_keys(
                    docsets_sur.rename_columns({"sur": "ref"}), hist, cfg)
            else:
                keys = blocking_keys(docsets, hist, cfg, lut_ref=lut_ref)
        with metrics.timeit("pairs"):
            # surrogate ids (broadcast LUT or sharded sur) ⇒ int64 keys
            pairs, skew = candidate_pairs_fused_blocking(
                keys, cfg, int_refs=use_sur or lut_ref is not None)
            metrics.stage("pairs", **skew)
    else:
        with metrics.timeit("blocking"):
            keys = blocking_keys(docsets, hist, cfg,
                                 lut_ref=lut_ref).materialize()
            khist = key_histogram(keys, cfg)
        with metrics.timeit("pairs"):
            # surrogate ids are < 2^31 → pack (a,b) into one int64 so the
            # co-key shuffle moves half the bytes and groups on one
            # column. (The salted path cannot score in-partition: a
            # pair's bucket-pair copies span partitions, so the exchange
            # must happen before dedupe/score.)
            pairs, skew = candidate_pairs(
                keys, khist, cfg, distinct=False,
                pack_int32=(score_mode == "broadcast"))
            metrics.stage("pairs", **skew)
    with metrics.timeit("scoring"):
        if score_mode == "broadcast":
            # fused dedupe+score+threshold: one (a,b)-hash shuffle on int64
            # surrogate ids, each distinct pair scored exactly once
            from blurrily_ray.stages.pairs import score_pairs_fused

            edges = ckpt("edges", lambda: score_pairs_fused(
                pairs, cfg=cfg, lut_ref=lut_ref, surrogate=True,
                packed=True))
        elif score_mode == "sharded":
            if use_sur:
                from blurrily_ray.stages.scorer import score_pairs_sharded_sur

                edges = ckpt("edges", lambda: score_pairs_sharded_sur(
                    pairs, shard_dir, cfg))
            else:
                from blurrily_ray.stages.scorer import score_pairs_sharded

                edges = ckpt("edges", lambda: score_pairs_sharded(
                    pairs, shard_dir, cfg))
        else:
            from blurrily_ray.stages.pairs import distinct_pairs

            scored = score_pairs(distinct_pairs(pairs, cfg), docsets, cfg,
                                 mode=score_mode)
            edges = ckpt("edges", lambda: threshold_edges(scored, cfg))
        if checkpoint_dir is None:
            # edges are consumed ≥2× (count + clustering); pin the small
            # result instead of re-executing the whole upstream lineage
            edges = edges.materialize()
    with metrics.timeit("clustering"):
        clusters = ckpt("clusters", lambda: connected_components(
            edges, docsets, cfg, mode=cc_mode))
    if checkpoint_dir is not None:
        metrics.save(os.path.join(checkpoint_dir, "metrics.json"))
    return {"clusters": clusters, "edges": edges, "skew": skew,
            "metrics": metrics}


def run_er_from_paths(transcripts_path: str, cfg: ERConfig = DEFAULT, **kw):
    kwargs = {}
    if os.path.isfile(transcripts_path):
        # Ray sizes read parallelism by FILE size; a single compressed
        # file under the block-size target becomes ONE decode task (a
        # flat ~6 s serial term at sf1.0). Split by row group instead.
        import pyarrow.parquet as pq

        nrg = pq.ParquetFile(transcripts_path).metadata.num_row_groups
        if nrg > 1:
            kwargs["override_num_blocks"] = nrg
    ts = ray.data.read_parquet(transcripts_path,
                               columns=["conv_id", "turn_idx", "text"],
                               **kwargs)
    return run_er(ts, cfg, **kw)


def _validate_unique_refs(docsets) -> None:
    """Raise if any ref appears in more than one docset row — the symptom
    of feeding NON-contiguous transcripts to the assume_grouped fast path
    (a conversation interior to two different blocks assembles twice).
    Cost: one shuffle of the ref column alone (n_docs tiny rows)."""
    import pandas as pd

    from blurrily_ray.stages.common import partitioned_map

    def dups(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["ref"].duplicated(), ["ref"]].drop_duplicates()
        return d

    bad = partitioned_map(docsets.select_columns(["ref"]), ["ref"], dups,
                          n_parts=16).take(5)
    if bad:
        refs = [r["ref"] for r in bad]
        raise ValueError(
            "assume_grouped input is not conversation-contiguous: refs "
            f"assembled more than once, e.g. {refs}. Re-run with "
            "assume_grouped=False (full shuffle assemble) or sort the "
            "input by (conv_id, turn_idx) first.")


def run_er_grouped(transcripts_path: str, cfg: ERConfig = DEFAULT, **kw):
    """run_er over a transcript table whose conversations are contiguous in
    file order (the natural write layout) — bulk text never shuffles."""
    return run_er_from_paths(transcripts_path, cfg, assume_grouped=True, **kw)


def run_er_tiered(transcripts_path: str, cfg: ERConfig = DEFAULT, *,
                  tight_cfg: ERConfig | None = None, **kw):
    """Two-resolution single-linkage ER (the dendrogram cut at two
    heights — hierarchical dedup practice: a strict tier for auto-merge,
    a loose tier for review queues): candidate edges are computed ONCE
    at the loose thresholds; the tight tier is a pure RE-THRESHOLD of
    the carried (matches, ntri) stats (stages/pairs.threshold_edges —
    no second blocking or scoring pass), followed by its own closure.
    Tight edges ⊆ loose edges, so tight clusters NEST inside loose ones
    (pinned by test). Returns {'clusters': (ref, cluster_tight,
    cluster_loose), 'base': the loose-pass result}."""
    import pandas as pd

    from blurrily_ray.stages.cluster import connected_components
    from blurrily_ray.stages.common import partitioned_map2
    from blurrily_ray.stages.pairs import threshold_edges

    if tight_cfg is None:
        from dataclasses import replace

        tight_cfg = replace(cfg, min_matches=max(8, cfg.min_matches),
                            min_matches_rel=0.75)
    if (tight_cfg.min_matches < cfg.min_matches
            or tight_cfg.min_matches_rel < cfg.min_matches_rel):
        # the tight tier re-filters edges ALREADY cut at the loose
        # thresholds — a looser tight_cfg would silently return the
        # loose labels under the tight name
        raise ValueError(
            "tight_cfg must be at least as strict as cfg on both "
            f"thresholds (min_matches {tight_cfg.min_matches} vs "
            f"{cfg.min_matches}, rel {tight_cfg.min_matches_rel} vs "
            f"{cfg.min_matches_rel}); swap the configs or relax cfg")
    res = run_er_grouped(transcripts_path, cfg, **kw)
    clusters = res["clusters"].materialize()
    tedges = threshold_edges(res["edges"], tight_cfg)
    lab_t = connected_components(tedges, clusters.select_columns(["ref"]),
                                 tight_cfg)

    def combine(l_df: pd.DataFrame, t_df: pd.DataFrame) -> pd.DataFrame:
        t = t_df.rename(columns={"cluster_id": "cluster_tight"})
        lo = l_df.rename(columns={"cluster_id": "cluster_loose"})
        return lo.merge(t, on="ref", how="inner")[
            ["ref", "cluster_tight", "cluster_loose"]]

    out = partitioned_map2(clusters, lab_t, ["ref"], ["ref"], combine,
                           n_parts=cfg.join_partitions)
    return {"clusters": out, "base": res}


def run_er_refined(transcripts_path: str, cfg: ERConfig = DEFAULT, *,
                   refine_cfg: ERConfig | None = None, **kw):
    """Merge-and-refine second pass (the Swoosh insight — Benjelloun et
    al. VLDBJ 2009: a MERGED record can match records none of its
    sources matched alone): after the base ER, each cluster's member
    texts concatenate (ref order) into one merged record; a second
    blocking + scoring + closure pass runs over the merged records, and
    clusters whose merged texts match fuse into superclusters. Returns
    {'clusters': (ref, cluster_id) with the refined labels, 'edges2':
    the cluster-level match edges, 'base': the pass-1 result}.

    Scale shape: the second pass is cluster-count-sized (≤ corpus, and
    each merged text is bounded by entity multiplicity); the only new
    corpus-sized exchanges are the ref-keyed label attach and the
    cluster-keyed text merge. The pass itself runs through
    :func:`run_er` (merged records reshaped as single-turn transcripts
    — contiguous by construction, each cluster merges in exactly one
    partition), so it inherits the full broadcast/sharded score
    dispatch: a mostly-singleton corpus, where merged-record count ≈
    corpus size, takes the sharded path instead of overflowing the
    bitset broadcast. Refine with ``refine_cfg`` (defaults to ``cfg``):
    even at identical thresholds the pass is NOT vacuous — merged texts
    have more trigrams, different rare-key selections and a different
    corpus histogram, so cluster pairs can match where no member pair
    did (oracle: oracles.sql_er_refined)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from blurrily_ray.stages.common import partitioned_map, partitioned_map2

    refine_cfg = refine_cfg or cfg
    kw2 = dict(kw)
    kw2.pop("assume_grouped", None)  # pass 2's layout is ours, not the
    # caller's; checkpoints get a sub-directory so stage names don't
    # collide with pass 1's
    if kw.get("checkpoint_dir"):
        kw2["checkpoint_dir"] = os.path.join(kw["checkpoint_dir"], "refine")
    res = run_er_grouped(transcripts_path, cfg, **kw)
    clusters = res["clusters"].materialize()

    ts = ray.data.read_parquet(transcripts_path,
                               columns=["conv_id", "turn_idx", "text"])
    docs = assemble_docs(ts, assume_grouped=True)

    def attach(d_df: pd.DataFrame, c_df: pd.DataFrame) -> pd.DataFrame:
        return d_df.merge(c_df, on="ref",
                          how="inner")[["cluster_id", "ref", "text"]]

    tagged = partitioned_map2(docs, clusters, ["ref"], ["ref"], attach,
                              n_parts=cfg.join_partitions)

    def merge_text(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "ref"], kind="stable")
        g = df.groupby("cluster_id", sort=False)["text"].agg(" ".join)
        return pd.DataFrame({"ref": g.index.to_numpy(),
                             "text": g.to_numpy()})

    merged = partitioned_map(tagged, ["cluster_id"], merge_text,
                             n_parts=cfg.join_partitions).materialize()

    def as_transcripts(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t["ref"],
            "turn_idx": pa.array(np.zeros(len(t), dtype=np.int32)),
            "text": t["text"]})

    res2 = run_er(merged.map_batches(as_transcripts,
                                     batch_format="pyarrow"),
                  refine_cfg, assume_grouped=True, **kw2)
    edges2 = res2["edges"]
    label2 = res2["clusters"]

    def compose(c_df: pd.DataFrame, l_df: pd.DataFrame) -> pd.DataFrame:
        lmap = l_df.rename(columns={"ref": "cluster_id",
                                    "cluster_id": "_super"})
        out = c_df.merge(lmap, on="cluster_id", how="inner")
        return pd.DataFrame({"ref": out["ref"],
                             "cluster_id": out["_super"]})

    final = partitioned_map2(clusters, label2, ["cluster_id"], ["ref"],
                             compose, n_parts=cfg.join_partitions)
    return {"clusters": final, "edges2": edges2, "base": res}
