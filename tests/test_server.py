"""Wire-protocol server tests — golden response strings ported from
/root/reference/spec/blurrily/command_processor_spec.rb and
server_spec.rb/integration_spec.rb behaviors (persistent connection,
multi-db isolation, save-on-shutdown)."""

import pytest

from blurrily_ray.namespaces import IndexGroup
from blurrily_ray.server import BlurrilyServer, Client, CommandProcessor


@pytest.fixture()
def proc(tmp_path):
    return CommandProcessor(IndexGroup(str(tmp_path / "srv")))


def test_put_and_find_golden(proc):
    # command_processor_spec.rb:15-19
    assert proc.process_command("PUT\tlocations_en\tgreat london\t12") == "OK"
    assert proc.process_command("PUT\tlocations_en\tgreater masovian\t13") == "OK"
    assert proc.process_command("FIND\tlocations_en\tgreat") == \
        "OK\t12\t6\t12\t13\t5\t16"


def test_find_empty_ok(proc):
    assert proc.process_command("FIND\tlocations_en\tgreat london") == "OK"


def test_error_taxonomy(proc):
    # command_processor_spec.rb:27-49
    assert proc.process_command("Some stuff").startswith("ERROR\tUnknown command")
    assert proc.process_command("FIND\tbad db name\tWhatever string") \
        .startswith("ERROR\tInvalid database name")
    assert proc.process_command("FIND\tdb\tWhatever string\tlimit") \
        .startswith("ERROR\tLimit must be a number")
    assert proc.process_command("PUT\tdb\tWhatever string\t12\tweight") \
        .startswith("ERROR\tInvalid weight")
    assert proc.process_command("PUT\tdb\tWhatever string\tref") \
        .startswith("ERROR\tInvalid reference")
    assert proc.process_command(
        "PUT\tdb\tWhatever string\tref\tweight\targument too much") \
        .startswith("ERROR\twrong number ")
    assert proc.process_command("FIND\tdb\tWhatever string\t2") == "OK"
    assert proc.process_command("PUT\tdb\tWhatever string\t12\t1") == "OK"


def test_delete_and_clear(proc):
    assert proc.process_command("PUT\tdb\tlondon\t123") == "OK"
    assert proc.process_command("FIND\tdb\tlondon") == "OK\t123\t7\t6"
    assert proc.process_command("DELETE\tdb\t123") == "OK"
    assert proc.process_command("FIND\tdb\tlondon") == "OK"
    assert proc.process_command("PUT\tdb\tlondon\t123") == "OK"
    assert proc.process_command("CLEAR\tdb") == "OK"
    assert proc.process_command("FIND\tdb\tlondon") == "OK"


def test_put_idempotent_through_protocol(proc):
    # map_spec.rb:43-47 via the wire: re-PUT of a ref is ignored
    assert proc.process_command("PUT\tdb\tlondon\t123") == "OK"
    assert proc.process_command("PUT\tdb\tlondon\t123") == "OK"
    assert proc.process_command("FIND\tdb\tlondon") == "OK\t123\t7\t6"


def test_weight_override(proc):
    # storage.h:60-63: caller weight overrides the length default
    proc.process_command("PUT\tdb\tlondon\t1\t100")
    proc.process_command("PUT\tdb\tlondon\t2\t1")
    # equal-score tie broken by weight ascending → ref 2 first
    reply = proc.process_command("FIND\tdb\tlondon")
    vals = [int(x) for x in reply.split("\t")[1:]]
    triples = [vals[i:i + 3] for i in range(0, len(vals), 3)]
    assert triples == [[2, 7, 1], [1, 7, 100]]


def test_local_finder_matches_dataset_find(tmp_path):
    """The serving kernel must reproduce the Dataset find path exactly
    (same triples, same ordering) over real documents."""
    import ray.data as rd

    from blurrily_ray.stages.index import LocalFinder, build_postings, find_triples

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    postings = build_postings(docs, ref_col="doc_id",
                              text_col="text").materialize()
    lf = LocalFinder(postings)
    for needle in ("customer query batch window", "custmer qeury bach windw",
                   "zzzz none such", "table", ""):
        assert lf.find(needle, 10) == find_triples(postings, needle, 10)
    assert lf.stats()["references"] == 500
    with pytest.raises(ValueError):
        lf.find("x", 0)


def test_tcp_roundtrip(tmp_path):
    # server_spec.rb: responds over TCP, connection persists across
    # commands, multiple dbs isolated (integration_spec.rb:51-60)
    srv = BlurrilyServer(str(tmp_path / "srv"), port=0, save_interval=9999)
    srv.start()
    try:
        c = Client(port=srv.port)
        c.put("paris_db", "paris", 123)
        c.put("tokyo_db", "tokyo", 456)
        assert c.find("paris_db", "paris") == [[123, 6, 5]]
        assert c.find("paris_db", "pariis") == [[123, 5, 5]]  # integration_spec.rb:31-35
        assert c.find("tokyo_db", "paris") == []
        with pytest.raises(RuntimeError):
            c.request("NOPE\tdb") and c.find("bad db", "x")
        # same socket still serves after an error line
        assert c.request("FIND\tparis_db\tparis") == "OK\t123\t6\t5"
        c.close()
    finally:
        srv.stop()
    # save-on-shutdown: buffered puts became durable segments
    g = IndexGroup(str(tmp_path / "srv"))
    assert g.find("paris_db", "paris") == [[123, 6, 5]]


def test_put_find_incremental_latency(tmp_path):
    """A wire PUT followed by FIND must stay in the reference's ms regime
    on a 5k-doc index (bin/bench:107-118's stress mix is exactly this):
    the buffered rows merge into the live LocalFinder arrays instead of
    triggering a Ray flush + full rebuild."""
    import time

    import ray.data as rd

    g = IndexGroup(str(tmp_path / "srv"))
    docs = rd.read_parquet("/root/testdata/sf0.1/documents.parquet",
                           columns=["doc_id", "text"])
    g.put_bulk("docs", docs, ref_col="doc_id", text_col="text")
    proc = CommandProcessor(g)
    assert proc.process_command("FIND\tdocs\twarm the finder") \
        .startswith("OK")
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        assert proc.process_command(
            f"PUT\tdocs\tcustomer query batch window {i}\t{900000 + i}") == "OK"
        reply = proc.process_command(
            f"FIND\tdocs\tcustomer query batch window {i}")
        best = min(best, time.perf_counter() - t0)
        assert reply.startswith("OK\t") and str(900000 + i) in reply
    assert best < 0.1, f"PUT;FIND took {best * 1000:.1f} ms (want < 100 ms)"


def test_incremental_serving_matches_rebuild(tmp_path):
    """Interleaved PUT/FIND/DELETE served incrementally must equal a fresh
    processor replaying the durable state (flush + rebuild path)."""
    proc = CommandProcessor(IndexGroup(str(tmp_path / "srv")))
    assert proc.process_command("PUT\tdb\tgreat london\t12") == "OK"
    assert proc.process_command("FIND\tdb\tgreat") == "OK\t12\t6\t12"
    # PUT after the finder exists → incremental merge on next FIND
    assert proc.process_command("PUT\tdb\tgreater masovian\t13") == "OK"
    live = proc.process_command("FIND\tdb\tgreat")
    assert live == "OK\t12\t6\t12\t13\t5\t16"
    # DELETE applies to the live arrays without a rebuild
    assert proc.process_command("DELETE\tdb\t12") == "OK"
    assert proc.process_command("FIND\tdb\tgreat") == "OK\t13\t5\t16"
    # re-PUT of a deleted ref re-adds (tombstones are sequenced)
    assert proc.process_command("PUT\tdb\tgreat london\t12") == "OK"
    live = proc.process_command("FIND\tdb\tgreat")
    proc.flush_all()
    fresh = CommandProcessor(IndexGroup(str(tmp_path / "srv")))
    assert fresh.process_command("FIND\tdb\tgreat") == live \
        == "OK\t12\t6\t12\t13\t5\t16"


def test_local_finder_matches_dataset_path(tmp_path):
    """The Ray-free serving load (local_postings/local_finder) must replay
    segments ⊖ tombstones identically to the Dataset path, including after
    delete + re-put."""
    from blurrily_ray.stages.index import LocalFinder

    g = IndexGroup(str(tmp_path / "srv"))
    import ray.data as rd

    g.put_bulk("db", rd.from_items(
        [{"ref": i, "text": t} for i, t in enumerate(
            ["great london", "greater masovian", "gray lantern", "paris"])]))
    g.delete("db", [1])
    g.put_bulk("db", rd.from_items([{"ref": 1, "text": "greta gardens"}]))
    local = g.local_finder("db")
    ds = LocalFinder(g.db("db"))
    for needle in ["great", "gre", "paris", "zzz"]:
        assert local.find(needle, 10) == ds.find(needle, 10)
    assert local.stats() == ds.stats()
