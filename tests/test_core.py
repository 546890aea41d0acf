"""Core layer tests: hashing/curve math, fixtures determinism,
manifest round-trip, table commit/scan/pins (SURVEY.md §5.1/§5.2)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from fupi_ray import manifest as mf
from fupi_ray.fixtures import generate_rows, sequences_dataset, write_fragmented_table
from fupi_ray.functions.hashing import hilbert_key, stable_hash, zorder_key
from fupi_ray.schema import validate_batch
from fupi_ray.table import Table


def test_stable_hash_deterministic():
    a = stable_hash(np.array(["a", "b", "a"], dtype=object))
    b = stable_hash(pa.array(["a", "b", "a"]))
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert a[0] == a[2] != a[1]


def test_zorder_known_vectors():
    # interleave of single set bits lands on known positions
    z = zorder_key(np.array([1]), np.array([0]), np.array([0]))
    assert z[0] == 4  # d0 bit0 → key bit 2
    z = zorder_key(np.array([0]), np.array([1]), np.array([0]))
    assert z[0] == 2
    z = zorder_key(np.array([0]), np.array([0]), np.array([1]))
    assert z[0] == 1
    z = zorder_key(np.array([3]), np.array([3]), np.array([3]))
    assert z[0] == 0b111111


def test_zorder_locality_monotone_blocks():
    # all keys with d0 < 2^20 sort before any with d0 >= 2^20 when other dims equal
    lo = zorder_key(np.array([5]), np.array([7]), np.array([9]))
    hi = zorder_key(np.array([1 << 20]), np.array([7]), np.array([9]))
    assert lo[0] < hi[0]


def test_hilbert_bijective_small():
    bits = 3
    n = 1 << bits
    g = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n)), -1).reshape(-1, 3)
    keys = hilbert_key(g[:, 0], g[:, 1], g[:, 2], bits=bits)
    assert len(np.unique(keys)) == len(keys)  # bijection on the cube
    assert keys.max() == n**3 - 1


def test_hilbert_adjacent_steps():
    # walking the curve in key order moves exactly 1 step in one dim
    bits = 2
    n = 1 << bits
    g = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n)), -1).reshape(-1, 3)
    keys = hilbert_key(g[:, 0], g[:, 1], g[:, 2], bits=bits)
    order = np.argsort(keys)
    pts = g[order]
    d = np.abs(np.diff(pts.astype(int), axis=0)).sum(axis=1)
    assert (d == 1).all()


def test_fixture_determinism_and_invariant():
    a = generate_rows(100, 50)
    b = generate_rows(100, 50)
    assert a.equals(b)
    validate_batch(a)
    # partition-independence: same rows regardless of batch boundaries
    c = pa.concat_tables([generate_rows(100, 20), generate_rows(120, 30)])
    assert a.equals(c)
    assert a["doc_id"][0].as_py() == "doc-000000000100"


def test_fixture_skew_profile():
    t = generate_rows(0, 5000)
    n = t["n_tok"].to_numpy()
    assert n.min() >= 8 and n.max() <= 8192
    src = t["source"].to_pylist()
    from collections import Counter

    counts = Counter(src)
    assert counts["cc"] > counts["forums"]  # zipf skew present


def test_table_commit_scan_roundtrip(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 1000, rows_per_fragment=200)
    assert t.latest_version() == 1
    m = t.manifest()
    assert m.total_rows == 1000
    assert len(m.fragments) == 5
    for f in m.fragments:
        # every zone-eligible scalar column is mapped (tokens is a
        # list payload — never zone-mapped)
        assert set(f.zone_map) == {"doc_id", "n_tok", "source"}
        assert "tokens" not in f.zone_map
        assert f.sum_n_tok > 0
    out = t.scan().sort("doc_id").take_all()
    assert len(out) == 1000
    assert out[0]["doc_id"] == "doc-000000000000"
    exp = generate_rows(0, 1000)
    got_first = out[0]["tokens"]
    assert list(got_first) == exp["tokens"][0].as_py()


def test_append_and_overwrite_versions(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 400, rows_per_fragment=200)
    v1 = t.latest_version()
    t.commit_append(sequences_dataset(200, start=400, rows_per_partition=200))
    v2 = t.latest_version()
    assert v2 == v1 + 1
    assert t.manifest(v2).total_rows == 600
    assert t.manifest(v1).total_rows == 400  # old snapshot intact
    t.commit_overwrite(sequences_dataset(100, rows_per_partition=100))
    assert t.manifest().total_rows == 100
    assert t.manifest(v2).total_rows == 600  # still readable


def test_pins(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 200, rows_per_fragment=100)
    v = t.pin("reader-a")
    assert t.pins() == {"reader-a": v}
    with pytest.raises(ValueError):
        t.pin("bad", version=99)
    t.unpin("reader-a")
    assert t.pins() == {}


def test_scan_predicate_pruning(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 1000, rows_per_fragment=100)
    # doc_id range predicate prunes fragments (ids are written in order)
    pred = [("doc_id", "between", ("doc-000000000000", "doc-000000000099"))]
    paths = t.fragment_paths(predicate=pred)
    assert len(paths) == 1
    ds = t.scan(predicate=pred)
    assert ds.count() == 100


def test_optimistic_commit_conflict(tmp_table_dir):
    from fupi_ray.manifest import Manifest
    from fupi_ray.state import commit as cm

    t = write_fragmented_table(tmp_table_dir, 100, rows_per_fragment=100)
    stale_parent = t.latest_version() - 1
    m = Manifest(-1, None, "append", [], [], [])
    with pytest.raises(Exception) as ei:
        cm.commit(tmp_table_dir, m, expected_parent=stale_parent)
    assert "optimistic" in str(ei.value)


def test_zone_map_predicate_ops():
    """'=' and '==' are synonyms; unknown ops are an error, not a
    silent full-scan (regression: '=' used to pass every fragment)."""
    import pytest

    from fupi_ray.manifest import FragmentMeta, fragment_may_match

    frag = FragmentMeta(
        path="x", rows=1, bytes=1, sum_n_tok=1,
        zone_map={"source": {"min": "books", "max": "cc"}},
    )
    assert fragment_may_match(frag, [("source", "=", "cc")])
    assert fragment_may_match(frag, [("source", "==", "cc")])
    assert not fragment_may_match(frag, [("source", "=", "wiki")])
    assert not fragment_may_match(frag, [("source", "==", "wiki")])
    with pytest.raises(ValueError):
        fragment_may_match(frag, [("source", "equals", "cc")])


def test_table_history_and_jsonl_source(tmp_table_dir, tmp_path):
    import gzip
    import json as _json

    import ray.data

    from fupi_ray.fixtures import generate_rows, write_fragmented_table
    from fupi_ray.ops import compact
    from fupi_ray.sources import readers

    t = write_fragmented_table(tmp_table_dir, 200, rows_per_fragment=40)
    compact(t)
    h = t.history()
    assert [e["operation"] for e in h] == ["compact", "append", "create"]
    assert h[0]["rows"] == 200
    assert h[0]["parent_version"] == h[1]["version"]
    assert h[0]["properties"]["fragments_in"] >= 2

    # S1: JSONL.gz reader (reference: read_json_auto of a .jsonl.gz,
    # fupi/data.py:64) — auto-decompressed, lazily read
    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(25):
            f.write(_json.dumps({"doc_id": i, "text": f"t{i}"}) + "\n")
    ds = readers.read_jsonl(str(p))
    got = sorted(r["doc_id"] for r in ds.take_all())
    assert got == list(range(25))


def test_zone_maps_cover_arbitrary_scalar_columns(tmp_path):
    """Zone maps are automatic for every zone-eligible scalar column —
    pruning works on user schemas beyond the canonical one (and a
    predicate scan on such a column reads fewer fragments)."""
    import pyarrow as pa
    import ray.data

    from fupi_ray.table import Table

    t = Table.create(
        str(tmp_path / "t"),
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("score", pa.float64()),
                ("lang", pa.string()),
                ("payload", pa.list_(pa.int32())),
            ]
        ),
    )
    rows = pa.table(
        {
            "doc_id": [f"d{i:04d}" for i in range(400)],
            "score": [float(i) for i in range(400)],
            "lang": [("bg" if i < 200 else "en") for i in range(400)],
            "payload": [[j] for j in range(400)],
        }
    )
    t.commit_append(ray.data.from_arrow(rows), target_fragment_rows=100)
    m = t.manifest()
    assert len(m.fragments) == 4
    for f in m.fragments:
        assert {"doc_id", "score", "lang"} <= set(f.zone_map)
        assert "payload" not in f.zone_map
    # score is monotone across fragments → a range predicate prunes
    assert len(t.fragment_paths(predicate=[("score", ">", 350.0)])) == 1
    assert t.scan(predicate=[("score", ">", 350.0)]).count() == 49
    # lang equality prunes the en-only fragments
    assert len(t.fragment_paths(predicate=[("lang", "==", "bg")])) == 2
