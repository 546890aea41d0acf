"""Two-level (sharded) manifest tests: O(delta) commit metadata,
shard reuse across commits, shard-level zone pruning, expiry GC of
orphan shards, and inline↔sharded transitions."""

import json
import os

import pandas as pd
import pytest

from fupi_ray import manifest as mf
from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import cluster, delete_where, expire_snapshots
from fupi_ray.table import Table

SMALL_FRAGS = EngineConfig(target_fragment_bytes=64 * 1024)


@pytest.fixture(autouse=True)
def small_shards(monkeypatch):
    monkeypatch.setattr(mf, "SHARD_MIN_FRAGMENTS", 8)
    monkeypatch.setattr(mf, "SHARD_TARGET_FRAGMENTS", 4)
    mf._SHARD_CACHE.clear()
    yield
    mf._SHARD_CACHE.clear()


def shard_names(t: Table, version=None) -> list[str]:
    return [r["path"] for r in (t.manifest(version).fragment_shards or [])]


def manifest_json(t: Table, version=None) -> dict:
    v = t.latest_version() if version is None else version
    with open(mf.manifest_path(t.table_dir, v)) as f:
        return json.load(f)


def test_big_commit_is_sharded_and_scan_identical(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 2_000, rows_per_fragment=100)
    d = manifest_json(t)
    assert d["fragments"] == []  # members live in shard files only
    assert len(d["fragment_shards"]) == 5  # 20 fragments / target 4
    assert sum(r["count"] for r in d["fragment_shards"]) == 20
    # resolved manifest and scan behave exactly like the inline layout
    assert len(t.manifest().fragments) == 20
    assert t.scan().count() == 2_000


def test_append_reuses_parent_shards(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 2_000, rows_per_fragment=100)
    before = set(shard_names(t))
    t.commit_append(sequences_dataset(400, seed=3, start=50_000), target_fragment_rows=100)
    after = shard_names(t)
    assert before <= set(after)  # every parent shard carried by reference
    assert len(set(after) - before) == 1  # 4 new fragments -> exactly 1 new shard
    assert t.scan().count() == 2_400


def test_partial_swap_rewrites_only_touched_shards(tmp_path):
    t = write_fragmented_table(
        str(tmp_path / "t"), 2_000, rows_per_fragment=100, config=SMALL_FRAGS
    )
    cluster(t, curve="zorder")  # tight n_tok ranges per fragment
    assert t.manifest().fragment_shards  # still sharded post-cluster
    before = set(shard_names(t))
    hi = int(t.scan(columns=["n_tok"]).to_pandas().n_tok.max())
    delete_where(t, [("n_tok", ">=", hi - 1)])
    after = set(shard_names(t))
    assert before & after  # untouched shards reused verbatim
    assert after != before


def test_sharded_scan_prunes_whole_shards(tmp_path):
    # ingest order gives each fragment a tight doc_id range, so each
    # 4-fragment shard covers one contiguous id band — a point-range
    # predicate must drop whole shards before reading their members
    t = write_fragmented_table(str(tmp_path / "t"), 4_000, rows_per_fragment=100)
    pred = [("doc_id", "between", ("doc-000000000000", "doc-000000000150"))]
    pruned = mf.read_manifest_pruned(t.table_dir, t.latest_version(), pred)
    full = t.manifest()
    assert len(pruned.fragments) <= 4 < len(full.fragments)
    assert t.scan(predicate=pred).count() == 151


def test_pruned_read_never_drops_evolved_column_fragments(tmp_path):
    from fupi_ray.ops import add_column, merge_into

    t = write_fragmented_table(str(tmp_path / "t"), 1_000, rows_per_fragment=100)
    add_column(t, "quality", "double", default=0.5)
    # old fragments lack `quality`: a predicate on it must not prune
    # their shards (the default applies to every row)
    got = t.scan(predicate=[("quality", "==", 0.5)]).count()
    assert got == 1_000


def test_expire_gcs_unreferenced_shards(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 2_000, rows_per_fragment=100)
    t.commit_overwrite(sequences_dataset(1_000, seed=5, rows_per_partition=100))
    all_before = set(os.listdir(os.path.join(t.table_dir, "manifest", "shards")))
    res = expire_snapshots(t, keep_last=1, gc_grace_seconds=0.0)
    assert res["gc_shards"] > 0
    live = {n.rsplit("/", 1)[-1] for n in shard_names(t)}
    left = set(os.listdir(os.path.join(t.table_dir, "manifest", "shards")))
    assert left == live < all_before
    assert t.scan().count() == 1_000


def test_inline_to_sharded_and_back(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 400, rows_per_fragment=100)
    assert t.manifest().fragment_shards is None  # 4 fragments: inline
    t.commit_append(sequences_dataset(1_600, seed=2, start=10_000), target_fragment_rows=100)
    assert t.manifest().fragment_shards is not None  # 20: sharded
    t.commit_overwrite(sequences_dataset(100, seed=9))
    assert t.manifest().fragment_shards is None  # back under threshold
    assert t.scan().count() == 100


def test_shard_cache_cold_read(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 2_000, rows_per_fragment=100)
    want = t.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)
    mf._SHARD_CACHE.clear()  # fresh process simulation
    t2 = Table.open(t.table_dir)
    got = t2.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.drop(columns=["tokens"]), want.drop(columns=["tokens"])
    )


def test_sharded_vs_inline_equivalence(tmp_path, monkeypatch):
    """The same op sequence over a sharded and an inline table must
    produce identical scans after every commit — the shard layer is
    pure metadata plumbing, invisible to query results."""
    import numpy as np

    from fupi_ray.ops import compact, delete_where, merge_into, update_where
    from fupi_ray.fixtures import sequences_dataset

    def run(table_dir, min_frags):
        monkeypatch.setattr(mf, "SHARD_MIN_FRAGMENTS", min_frags)
        mf._SHARD_CACHE.clear()
        t = write_fragmented_table(table_dir, 1_500, rows_per_fragment=100)
        snaps = []

        def snap():
            df = t.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)
            df["tokens"] = df["tokens"].map(lambda a: tuple(np.asarray(a).tolist()))
            snaps.append(df)

        snap()
        t.commit_append(sequences_dataset(300, seed=4, start=30_000), target_fragment_rows=100)
        snap()
        delete_where(t, [("n_tok", "between", (200, 260))])
        snap()
        merge_into(t, sequences_dataset(200, seed=6, start=500, token_salt=3))
        snap()
        update_where(t, [("n_tok", ">", 500)], {"source": "big"})
        snap()
        compact(t)
        snap()
        return snaps

    a = run(str(tmp_path / "sharded"), 8)
    b = run(str(tmp_path / "inline"), 10**9)
    for step, (x, y) in enumerate(zip(a, b)):
        pd.testing.assert_frame_equal(x, y), step
