"""Policy-driven maintenance (ops/maintain.py): metadata-only
decisions — compaction when small files exist, recluster only past the
drift threshold, bucket-layout repair, expiry; idempotent on a healthy
table."""

import pandas as pd

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import bucket_table, cluster, maintain
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024, expire_keep_last=2)


def test_maintain_compacts_and_expires(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 1_000, rows_per_fragment=100, config=CFG)
    n_before = len(t.manifest().fragments)
    out = maintain(t, keep_last=1, older_than_seconds=0.0)
    assert out["compact"] is not None
    assert len(t.manifest().fragments) < n_before
    assert t.scan().count() == 1_000
    # healthy table → all no-op, no new version
    v = t.latest_version()
    out2 = maintain(t, keep_last=10)
    assert out2["compact"] is None and out2["version"] == v


def test_maintain_reclusters_on_drift_only(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 1_000, rows_per_fragment=200, config=CFG)
    cluster(t, curve="zorder")
    # small append: below the 20% drift threshold → skip
    t.commit_append(sequences_dataset(100, start=50_000, rows_per_partition=100))
    out = maintain(t, keep_last=10)
    assert out["recluster"]["skipped"] and out["recluster"]["drift_fraction"] < 0.2
    # big append: past the threshold → recluster with the same curve
    t.commit_append(sequences_dataset(600, start=60_000, rows_per_partition=200))
    out = maintain(t, keep_last=10)
    assert out["recluster"].get("version") is not None
    assert out["recluster"]["curve"] == "zorder"
    assert t.scan().count() == 1_700


def test_maintain_repairs_bucket_layout_and_skips_recluster(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 800, rows_per_fragment=200, config=CFG)
    bucket_table(t, key="doc_id", num_buckets=4)
    t.commit_append(sequences_dataset(400, start=70_000, rows_per_partition=100))
    assert any(f.bucket is None for f in t.manifest().fragments)
    out = maintain(t, keep_last=10)
    assert out["rebucket"]["untagged_fragments"] > 0
    assert out["recluster"] is None  # bucket contract outranks clustering
    m = t.manifest()
    assert all(f.bucket is not None for f in m.fragments)
    assert t.scan().count() == 1_200
    # second call: layout healthy → skip
    out2 = maintain(t, keep_last=10)
    assert out2["rebucket"] == {"skipped": True}
