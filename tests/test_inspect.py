"""Metadata tables (Table.files / Table.snapshots) — Iceberg-style
inspection surface: per-fragment stats, DV state, bucket tags, and the
snapshot log, all from manifest metadata only."""

import pyarrow as pa

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import write_fragmented_table
from fupi_ray.ops import bucket_table, delete_where

CFG = EngineConfig(target_fragment_bytes=256 * 1024)


def test_files_and_snapshots(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 600, rows_per_fragment=200, config=CFG)
    bucket_table(t, key="doc_id", num_buckets=2)
    delete_where(t, [("n_tok", "between", (100, 200))], mode="dv")

    files = t.files()
    assert isinstance(files, pa.Table)
    assert sum(files["rows"].to_pylist()) == 600  # physical rows
    live = sum(files["live_rows"].to_pylist())
    dv = sum(files["dv_rows"].to_pylist())
    assert live + dv == 600 and dv > 0
    assert set(files["bucket"].to_pylist()) == {0, 1}
    assert all(p and p.startswith("data/") for p in files["path"].to_pylist())
    assert live == t.scan().count()

    # pinned snapshot's files: the pre-delete version has no DVs
    pre = t.files(version=t.manifest().parent_version)
    assert sum(pre["dv_rows"].to_pylist()) == 0

    snaps = t.snapshots()
    ops = snaps["operation"].to_pylist()
    assert ops[0] == "delete-dv" and "bucket" in ops and ops[-1] == "create"
    versions = snaps["version"].to_pylist()
    assert versions == sorted(versions, reverse=True)
