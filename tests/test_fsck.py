"""check_table (ops/fsck.py): every finding code is provoked on
purpose — a healthy table is all-green, then we corrupt one invariant
at a time and expect exactly that finding."""

import json
import os

import numpy as np
import ray.data

from fupi_ray.ops import bucket_table, check_table, delete_where
from fupi_ray.fixtures import write_fragmented_table
from fupi_ray.table import Table


def _codes(rep):
    return sorted(f["code"] for f in rep["findings"])


def _build(d, n=400):
    return write_fragmented_table(str(d), n, rows_per_fragment=100)


def test_healthy_table_green_both_tiers(tmp_path):
    t = _build(tmp_path / "t")
    delete_where(t, [("doc_id", "==", "doc-000000000007")], mode="dv")
    rep = check_table(t)
    assert rep["ok"], rep["findings"]
    deep = check_table(t, deep=True)
    assert deep["ok"], deep["findings"]
    assert deep["fragments_checked"] == len(t.manifest().fragments)


def test_missing_fragment_and_missing_dv(tmp_path):
    t = _build(tmp_path / "t")
    delete_where(t, [("doc_id", "==", "doc-000000000007")], mode="dv")
    m = t.manifest()
    victim = next(f for f in m.fragments if f.dv_path)
    os.remove(os.path.join(t.table_dir, victim.dv_path))
    other = next(f for f in m.fragments if not f.dv_path)
    os.remove(os.path.join(t.table_dir, other.path))
    rep = check_table(t)
    assert not rep["ok"]
    assert "missing-dv" in _codes(rep) and "missing-fragment" in _codes(rep)


def test_dv_out_of_range_and_unsorted(tmp_path):
    from fupi_ray.ops.dv import write_dv

    t = _build(tmp_path / "t")
    delete_where(t, [("doc_id", "==", "doc-000000000007")], mode="dv")
    m = t.manifest()
    victim = next(f for f in m.fragments if f.dv_path)
    # overwrite the sidecar with positions past the fragment's rows
    bad = np.array([victim.rows + 5], dtype=np.int64)
    rel = write_dv(t.table_dir, victim.path, bad)
    os.replace(
        os.path.join(t.table_dir, rel), os.path.join(t.table_dir, victim.dv_path)
    )
    rep = check_table(t)
    codes = _codes(rep)
    assert "dv-position-out-of-range" in codes
    assert "dv-count-mismatch" not in codes or victim.dv_rows != 1


def test_deep_catches_rows_and_zone_map_lies(tmp_path):
    t = _build(tmp_path / "t")
    # tamper the newest manifest: shrink one fragment's rows and
    # narrow its doc_id zone map below the real data
    v = t.latest_version()
    mp = os.path.join(t.table_dir, "manifest", f"v{v:012d}.json")
    if not os.path.exists(mp):
        import glob

        cands = glob.glob(os.path.join(t.table_dir, "manifest", "*.json"))
        mp = max(c for c in cands if f"{v}" in os.path.basename(c))
    doc = json.loads(open(mp).read())
    frag = doc["fragments"][0]
    frag["rows"] = frag["rows"] - 1
    frag["zone_map"]["doc_id"]["max"] = frag["zone_map"]["doc_id"]["min"]
    open(mp, "w").write(json.dumps(doc))
    rep = check_table(t, deep=True)
    codes = _codes(rep)
    assert "rows-mismatch" in codes
    assert "zone-map-narrower-than-data" in codes
    # metadata tier alone does NOT need footer reads to stay green here
    shallow = check_table(t)
    assert "rows-mismatch" not in _codes(shallow)


def test_zone_map_inverted_is_metadata_tier(tmp_path):
    t = _build(tmp_path / "t")
    v = t.latest_version()
    import glob

    mp = max(glob.glob(os.path.join(t.table_dir, "manifest", "*.json")))
    doc = json.loads(open(mp).read())
    zm = doc["fragments"][0]["zone_map"]["n_tok"]
    zm["min"], zm["max"] = zm["max"] + 10, zm["min"]
    open(mp, "w").write(json.dumps(doc))
    rep = check_table(t)
    assert "zone-map-inverted" in _codes(rep)


def test_bucket_contract_broken_after_raw_append(tmp_path):
    t = _build(tmp_path / "t")
    bucket_table(t, key="doc_id", num_buckets=4)
    assert check_table(t)["ok"]
    # a raw append writes untagged fragments -> contract finding
    from fupi_ray.fixtures import sequences_dataset

    t.commit_append(sequences_dataset(50, start=10_000))
    rep = check_table(t)
    assert "bucket-contract-broken" in _codes(rep)


def test_corrupt_manifest_and_dv_are_findings_not_raises(tmp_path):
    import glob

    t = _build(tmp_path / "t")
    delete_where(t, [("doc_id", "==", "doc-000000000007")], mode="dv")
    # garbage DV sidecar: must be a dv-unreadable finding
    victim = next(f for f in t.manifest().fragments if f.dv_path)
    with open(os.path.join(t.table_dir, victim.dv_path), "wb") as fh:
        fh.write(b"not a deletion vector")
    rep = check_table(t)
    assert "dv-unreadable" in _codes(rep)
    # garble the audited manifest itself: findings returned, no raise
    mp = max(glob.glob(os.path.join(t.table_dir, "manifest", "*.json")))
    with open(mp, "w") as fh:
        fh.write("{truncated")
    rep2 = check_table(t)
    assert not rep2["ok"]
    assert any(
        f["code"] in ("audited-manifest-unreadable", "manifest-unreadable")
        for f in rep2["findings"]
    )


def test_empty_bucketed_table_is_healthy(tmp_path):
    t = _build(tmp_path / "t", n=100)
    bucket_table(t, key="doc_id", num_buckets=4)
    delete_where(t, [("n_tok", ">", -1)])  # COW-delete every row
    assert t.scan().count() == 0
    rep = check_table(t)
    assert rep["ok"], rep["findings"]
