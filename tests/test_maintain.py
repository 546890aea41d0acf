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


def test_maintain_dedup_growth_gate(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data

    def seqs(ids, payload_seed):
        toks = [
            np.random.default_rng(payload_seed(i)).integers(0, 50000, 300).tolist()
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array([f"d-{i:05d}" for i in ids], pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
                "n_tok": pa.array([300] * len(ids), pa.int32()),
                "source": pa.array(["s"] * len(ids), pa.string()),
            }
        )

    t = Table.create(str(tmp_path / "t"), config=CFG)
    # 10 unique docs + 4 copies of doc 0's content under other ids
    t.commit_append(
        ray.data.from_arrow(seqs(range(10), lambda i: i)), target_fragment_rows=5
    )
    t.commit_append(
        ray.data.from_arrow(seqs(range(100, 104), lambda i: 0)),
        target_fragment_rows=5,
    )
    out = maintain(t, dedup_threshold=0.8)
    assert out["dedup"]["rows_deleted"] == 4  # d-00000 survives the family
    assert t.scan().count() == 10

    # the next cycle's compaction materializes the sweep's DVs (every
    # path changes), so the path-based gate conservatively re-sweeps
    # ONCE (finds nothing, re-records) — after that, a healthy table
    # settles to skipped with zero growth
    out2 = maintain(t, dedup_threshold=0.8)
    assert out2["dedup"].get("rows_deleted", 0) == 0
    out3 = maintain(t, dedup_threshold=0.8)
    assert out3["dedup"] == {"skipped": True, "grown_fraction": 0.0}

    # >20% growth re-arms the sweep (new rows are unique -> no deletes,
    # but the sweep RAN and re-recorded)
    t.commit_append(
        ray.data.from_arrow(seqs(range(200, 205), lambda i: i)),
        target_fragment_rows=5,
    )
    out4 = maintain(t, dedup_threshold=0.8)
    assert "rows_deleted" in out4["dedup"] and out4["dedup"]["rows_deleted"] == 0
    # a different threshold invalidates the recorded check
    out5 = maintain(t, dedup_threshold=0.5)
    assert "rows_deleted" in out5["dedup"]


def test_maintain_dedup_rebases_after_shrink(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fupi_ray.ops import delete_where

    def seqs(ids, payload_seed):
        toks = [
            np.random.default_rng(payload_seed(i)).integers(0, 50000, 300).tolist()
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array([f"d-{i:05d}" for i in ids], pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
                "n_tok": pa.array([300] * len(ids), pa.int32()),
                "source": pa.array(["s"] * len(ids), pa.string()),
            }
        )

    t = Table.create(str(tmp_path / "t"), config=CFG)
    t.commit_append(ray.data.from_arrow(seqs(range(100), lambda i: i)))
    maintain(t, dedup_threshold=0.8)  # records base=100

    # shrink well below the base, then append duplicate-heavy rows that
    # are SMALLER than the deficit — the stale base must not mask them
    delete_where(t, [("doc_id", "<", "d-00060")])  # 40 rows remain
    dup = seqs(range(200, 230), lambda i: 70)  # 30 copies of doc 70's content
    t.commit_append(ray.data.from_arrow(dup))
    out = maintain(t, dedup_threshold=0.8)
    assert out["dedup"].get("rows_deleted") == 30  # d-00070 survives
