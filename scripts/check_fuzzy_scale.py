"""fuzzy_join oracle at BENCH scale (sf0.1) via deterministic needle sampling.

The full-needle SQL mirror (oracles.sql_fuzzy_join) is quadratic in
common-trigram frequency and exhausts DuckDB at sf0.1 (~106 GB RSS,
NOTES_r3).  Per-needle scoring is independent of every other needle, so
restricting BOTH sides to the same deterministic needle sample — md5(ref)
hex prefix, reproduced identically by hashlib and DuckDB's md5() — yields
an oracle that is EXACT on the sampled needles while cutting DuckDB's join
work by the sampling factor.  The catalog side stays FULL, so the engine's
inverted-index gather, top-k plateau partition and tie ordering are all
exercised against the complete sf0.1 catalog.

Usage: python scripts/check_fuzzy_scale.py [sf_dir] [hex_lt]
  sf_dir  default /root/testdata/sf0.1
  hex_lt  2-hex-digit sample bound, default '04' (= 1/64 of needles)
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hex_lt = sys.argv[2] if len(sys.argv) > 2 else "04"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc
    import ray.data

    from __ray_entry__ import _transcripts_path
    from blurrily_ray.stages.index import fuzzy_join
    from blurrily_ray.stages.tokenize import assemble_docs

    tpath = _transcripts_path(sf_dir)
    ts = ray.data.read_parquet(tpath, columns=["conv_id", "turn_idx", "text"])
    docs = assemble_docs(ts, assume_grouped=True)

    import pyarrow as pa

    def sample_needles(b):
        refs = b["ref"].to_pylist()
        keep = pa.array([hashlib.md5(r.encode()).hexdigest()[:2] < hex_lt
                         for r in refs])
        return b.filter(keep).rename_columns(["needle_ref", "text"])

    needles = docs.map_batches(sample_needles, batch_format="pyarrow")
    catalog = docs.map_batches(
        lambda b: b.filter(pc.ends_with(b["ref"], "v0")),
        batch_format="pyarrow")

    t0 = time.time()
    eng = fuzzy_join(needles, catalog, needle_id="needle_ref", k=3).to_pandas()
    t_eng = time.time() - t0
    for c in eng.columns:
        if eng[c].dtype.kind in "iu":
            eng[c] = eng[c].astype("int64")
    eng = eng[sorted(eng.columns)].sort_values(
        list(sorted(eng.columns))).reset_index(drop=True)
    n_needles = eng["needle_ref"].nunique()
    print(f"engine: {len(eng)} rows over {n_needles} sampled needles "
          f"(hex<{hex_lt}) in {t_eng:.1f}s")

    import duckdb

    from blurrily_ray.oracles import sql_fuzzy_join

    pred = f"substr(md5(ref), 1, 2) < '{hex_lt}'"
    t0 = time.time()
    ora = duckdb.sql(sql_fuzzy_join(tpath, needle_pred=pred)).df()
    t_ora = time.time() - t0
    ora = ora[sorted(ora.columns)].sort_values(
        list(sorted(ora.columns))).reset_index(drop=True)
    print(f"oracle: {len(ora)} rows in {t_ora:.1f}s")

    ok = len(eng) == len(ora) and list(eng.columns) == list(ora.columns) \
        and eng.equals(ora)
    if not ok:
        print("MISMATCH")
        neq = (eng != ora).any(axis=1) if len(eng) == len(ora) else None
        if neq is not None:
            print(eng[neq].head(5).to_string())
            print(ora[neq].head(5).to_string())
        ray.shutdown()
        sys.exit(1)
    print(f"PASS — engine == oracle on {n_needles} needles x full catalog "
          f"at {sf_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
