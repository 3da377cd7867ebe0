"""CLI entrypoint — the ``ray job submit`` surface.

On a real cluster:

    ray job submit --working-dir . -- \\
        python -m blurrily_ray.cli er \\
            --input  s3://bucket/transcripts/ \\
            --output s3://bucket/clusters/ \\
            --checkpoint-dir s3://bucket/ckpt/run1 \\
            --num-cpus-per-stage auto

In this sandbox it runs against local parquet. The CLI owns the Ray
session (guarded init — the library itself never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_er(args) -> int:
    _ensure_ray()
    from blurrily_ray.config import ERConfig
    from blurrily_ray.pipelines.er import run_er_from_paths

    cfg = ERConfig(blocking_mode=args.blocking_mode,
                   min_matches=args.min_matches,
                   min_matches_rel=args.min_matches_rel)
    res = run_er_from_paths(args.input, cfg,
                            checkpoint_dir=args.checkpoint_dir)
    res["clusters"].write_parquet(args.output)
    summary = {"clusters_path": args.output, "skew": res["skew"],
               "stages": res["metrics"].data["stages"]}
    print(json.dumps(summary))
    return 0


def cmd_find(args) -> int:
    _ensure_ray()
    from blurrily_ray.stages.index import find_triples, load

    ix = load(args.index)
    for triple in find_triples(ix, args.needle, args.limit):
        print("\t".join(str(x) for x in triple))
    return 0


def cmd_build(args) -> int:
    _ensure_ray()
    import ray.data

    from blurrily_ray.stages.index import build_postings, save, stats

    docs = ray.data.read_parquet(args.input, columns=[args.ref_col, args.text_col])
    ix = build_postings(docs, ref_col=args.ref_col, text_col=args.text_col)
    save(ix, args.index)
    print(json.dumps(stats(load(args.index))))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="blurrily_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    er = sub.add_parser("er", help="entity resolution over transcripts")
    er.add_argument("--input", required=True, help="transcripts parquet path")
    er.add_argument("--output", required=True, help="clusters parquet dir")
    er.add_argument("--checkpoint-dir", default=None)
    er.add_argument("--blocking-mode", default="trigram_pair",
                    choices=["trigram", "trigram_pair"])
    er.add_argument("--min-matches", type=int, default=5)
    er.add_argument("--min-matches-rel", type=float, default=0.55)
    er.set_defaults(fn=cmd_er)

    bd = sub.add_parser("build", help="build a trigram index from parquet docs")
    bd.add_argument("--input", required=True)
    bd.add_argument("--index", required=True)
    bd.add_argument("--ref-col", default="doc_id")
    bd.add_argument("--text-col", default="text")
    bd.set_defaults(fn=cmd_build)

    fd = sub.add_parser("find", help="query a saved index")
    fd.add_argument("--index", required=True)
    fd.add_argument("--needle", required=True)
    fd.add_argument("--limit", type=int, default=10)
    fd.set_defaults(fn=cmd_find)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
