"""Two-table record linkage (stages/linkage.link_tables) tests."""

import pyarrow as pa
import ray.data as rd

from blurrily_ray.stages.linkage import link_tables


def _docs(rows, ref_type=pa.int64()):
    return rd.from_arrow(pa.table({
        "ref": pa.array([r for r, _ in rows], type=ref_type),
        "text": pa.array([t for _, t in rows], type=pa.string())}))


def test_cross_side_only_and_ref_collision():
    """Same ref value on both sides is two distinct records; near-dups
    WITHIN one table must not be emitted."""
    a = _docs([(1, "uncommon zebra quartz flying machine"),
               (2, "uncommon zebra quartz flying machines")])  # within-A dup
    b = _docs([(1, "uncommon zebra quartz flying machine!"),
               (9, "totally different payload words here")])
    out = link_tables(a, b).to_pandas()
    pairs = set(zip(out["a_ref"], out["b_ref"]))
    assert (1, 1) in pairs and (2, 1) in pairs
    assert all(p[1] in (1, 9) for p in pairs)  # b_ref always from B
    assert (1, 2) not in pairs and (2, 2) not in pairs


def test_orientation_and_stat_swap():
    """a_ref is always the table-A record and the per-side stats follow
    the refs: A's trigram count lands in ntri_a even when the internal
    edge had the B record first."""
    a = _docs([(7, "uncommon zebra quartz")])          # shorter → fewer tris
    b = _docs([(3, "uncommon zebra quartz flying")])   # longer
    out = link_tables(a, b).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["a_ref"]), int(r["b_ref"])) == (7, 3)
    assert int(r["ntri_a"]) < int(r["ntri_b"])
    assert int(r["weight_a"]) < int(r["weight_b"])


def test_string_refs_round_trip():
    """Arbitrary string refs (including the tag separator char) restore
    exactly — untagging is by position, not by splitting."""
    a = _docs([("x|weird:id", "uncommon zebra quartz flying machine")],
              ref_type=pa.string())
    b = _docs([("B|other", "uncommon zebra quartz flying machine")],
              ref_type=pa.string())
    out = link_tables(a, b).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["a_ref"] == "x|weird:id"
    assert out.iloc[0]["b_ref"] == "B|other"


def test_empty_side_yields_no_pairs():
    a = _docs([(1, "uncommon zebra quartz flying machine"),
               (2, "uncommon zebra quartz flying machines")])
    b = _docs([], ref_type=pa.int64())
    out = link_tables(a, b).to_pandas()
    assert len(out) == 0
