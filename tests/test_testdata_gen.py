"""The local scale-tier generator (tools/testdata_gen.py) must stay
byte-compatible with the driver's testdata layout — it exists to measure
scaling slopes (VERDICT r11 #4), and a slope measured on drifted schemas
or shapes would be meaningless. Pins: identical arrow schemas per table,
linear row counts, and the workload-relevant shape facts the generator
documents (ascending event ts, unit-norm embeddings, planted doc dups).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMOKE

from tools.testdata_gen import ROWS_PER_SF, generate


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gensf0001"))
    generate(out, 0.001)
    return out


def test_generated_schemas_match_shipped(gen_dir):
    shipped = sorted(glob.glob(os.path.join(SF_SMOKE, "*.parquet")))
    assert shipped, SF_SMOKE
    for path in shipped:
        name = os.path.basename(path)
        got = pq.read_schema(os.path.join(gen_dir, name))
        want = pq.read_schema(path)
        got_pairs = [(f.name, f.type) for f in got]
        want_pairs = [(f.name, f.type) for f in want]
        assert got_pairs == want_pairs, name


def test_generated_row_counts_linear(gen_dir):
    for t, per_sf in ROWS_PER_SF.items():
        n = pq.read_metadata(os.path.join(gen_dir, f"{t}.parquet")).num_rows
        assert n == max(1, round(per_sf * 0.001)), t
    for t, n in (("region", 5), ("nation", 25)):
        assert pq.read_metadata(
            os.path.join(gen_dir, f"{t}.parquet")
        ).num_rows == n


def test_generated_shape_facts(gen_dir):
    ev = pq.read_table(os.path.join(gen_dir, "events.parquet"))
    ts = ev.column("ts").to_numpy()
    assert (np.diff(ts.astype("datetime64[us]").astype(np.int64)) >= 0).all()
    assert set(ev.column("event_type").to_pylist()) <= {
        "view", "click", "purchase", "signup", "error"
    }
    emb = pq.read_table(os.path.join(gen_dir, "embeddings.parquet"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    assert vecs.shape[1] == 64
    assert np.allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)
    docs = pq.read_table(os.path.join(gen_dir, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    n_chars = docs.column("n_chars").to_pylist()
    assert [len(t) for t in texts] == n_chars


def test_generated_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(a, 0.001)
    generate(b, 0.001)
    for path in sorted(glob.glob(os.path.join(a, "*.parquet"))):
        name = os.path.basename(path)
        assert pq.read_table(path).equals(
            pq.read_table(os.path.join(b, name))
        ), name
