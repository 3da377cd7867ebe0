"""Robustness sweep: EVERY queries() entry must run (not crash) against a
scale dir whose tables all have ZERO rows — the classic Ray Data failure
mode is an all-empty block emitting null-typed columns that poison a
downstream union/groupby schema. Transcript-backed queries synthesize
their own (tiny) input from the dir's sf value, so they exercise the
near-empty synth path instead."""

import glob
import os

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty") / "sf0.0002"
    d.mkdir()
    for f in glob.glob(f"{SRC}/*.parquet"):
        schema = pq.read_schema(f)
        pq.write_table(schema.empty_table(),
                       str(d / os.path.basename(f)))
    return str(d)


def _rows(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    return res.count()


def test_every_query_survives_empty_tables(empty_sf_dir):
    import __ray_entry__ as entry

    failures = {}
    for name, fn in entry.queries().items():
        try:
            n = _rows(fn(empty_sf_dir))
            assert n >= 0
        except Exception as e:  # noqa: BLE001 — collecting the sweep
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures
