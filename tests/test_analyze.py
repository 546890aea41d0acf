"""NDV column statistics (ops/analyze.py): per-fragment HLL sketch
sidecars, incremental ensure, metadata-only estimates, layout
invariance, GC with the owning fragment."""

import os
import time

import pytest

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import (
    column_ndv,
    compact,
    ensure_ndv_sketches,
    expire_snapshots,
    maintain,
)
from fupi_ray.ops.analyze import ndv_path
from fupi_ray.state import fs as _fs

CFG = EngineConfig(target_fragment_bytes=256 * 1024, expire_keep_last=1)


def test_ndv_estimates_and_incremental_ensure(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    res = ensure_ndv_sketches(t, columns=("doc_id", "source"))
    nfrags = len(t.manifest().fragments)
    assert res == {"built": nfrags, "cached": 0}
    # second ensure: all cached, no rebuild
    assert ensure_ndv_sketches(t, columns=("doc_id", "source")) == {
        "built": 0,
        "cached": nfrags,
    }
    stats: dict = {}
    ndv = column_ndv(t, columns=("doc_id", "source"), stats_out=stats)
    assert stats["fragments_missing"] == 0
    # doc_id is unique: estimate within HLL error (p=12 → ~1.6% σ)
    assert abs(ndv["doc_id"] - 2_000) / 2_000 < 0.06
    # source has a handful of distinct values: linear-counting regime
    # makes the estimate essentially exact
    exact_sources = len(set(r["source"] for r in t.scan().take_all()))
    assert round(ndv["source"]) == exact_sources

    # append: only the new fragments pay a build
    t.commit_append(sequences_dataset(500, start=90_000, rows_per_partition=250))
    res = ensure_ndv_sketches(t, columns=("doc_id", "source"))
    assert res["built"] == len(t.manifest().fragments) - nfrags
    ndv2 = column_ndv(t, columns=("doc_id",))
    assert abs(ndv2["doc_id"] - 2_500) / 2_500 < 0.06


def test_ndv_is_layout_invariant(tmp_table_dir):
    """The same rows partitioned differently merge to the IDENTICAL
    estimate: register-max over the same hash set is associative and
    layout-independent."""
    t = write_fragmented_table(tmp_table_dir, 1_500, rows_per_fragment=150, config=CFG)
    before = column_ndv(t, columns=("doc_id", "source"))
    compact(t)  # repack: fewer, bigger fragments, same rows
    after = column_ndv(t, columns=("doc_id", "source"))
    assert before == after


def test_sidecar_extension_and_lower_bound(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 800, rows_per_fragment=200, config=CFG)
    ensure_ndv_sketches(t, columns=("source",))
    # extending to a second column keeps the first (one sidecar, union)
    ensure_ndv_sketches(t, columns=("doc_id",))
    stats: dict = {}
    ndv = column_ndv(t, columns=("doc_id", "source"), build=False, stats_out=stats)
    assert stats["fragments_missing"] == 0
    assert ndv["doc_id"] > 0 and ndv["source"] > 0
    # build=False with un-analyzed fragments: lower bound + honest count
    t.commit_append(sequences_dataset(400, start=70_000, rows_per_partition=200))
    stats2: dict = {}
    low = column_ndv(t, columns=("doc_id",), build=False, stats_out=stats2)
    assert stats2["fragments_missing"] > 0
    assert low["doc_id"] <= ndv["doc_id"] * 1.01


def test_nested_column_refused(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 200, rows_per_fragment=100, config=CFG)
    with pytest.raises(ValueError, match="nested"):
        ensure_ndv_sketches(t, columns=("tokens",))
    with pytest.raises(ValueError, match="unknown column"):
        ensure_ndv_sketches(t, columns=("nope",))


def test_sidecars_gc_with_their_fragments(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 600, rows_per_fragment=100, config=CFG)
    ensure_ndv_sketches(t, columns=("doc_id",))
    old_paths = [f.path for f in t.manifest().fragments]
    compact(t)
    res = expire_snapshots(t, keep_last=1, gc_grace_seconds=0.0)
    assert res["gc_files"] > 0
    for rel in old_paths:
        assert not _fs.exists(ndv_path(os.path.join(t.table_dir, rel)))
    # surviving fragments' sidecars (none yet post-compact) rebuild fine
    ndv = column_ndv(t, columns=("doc_id",))
    assert abs(ndv["doc_id"] - 600) / 600 < 0.06


def test_maintain_analyze_arm(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 600, rows_per_fragment=150, config=CFG)
    out = maintain(t, keep_last=10, analyze_columns=("doc_id", "source"))
    assert out["analyze"]["built"] > 0
    # untouched table → all cached
    out2 = maintain(t, keep_last=10, analyze_columns=("doc_id", "source"))
    assert out2["analyze"]["built"] == 0 and out2["analyze"]["cached"] > 0
