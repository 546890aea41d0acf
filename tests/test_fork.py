"""Zero-copy fork tests: isolation in both directions, copy-on-first-
write divergence, DV interplay, CDC merge-back equality, pin-protected
source GC, and fork-name collision handling."""

import os

import pandas as pd
import pytest

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import (
    apply_changelog,
    compact,
    delete_where,
    drop_fork,
    expire_snapshots,
    fork_base_version,
    fork_source,
    fork_table,
    update_where,
)
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024)


def canon(t: Table, version=None) -> pd.DataFrame:
    df = t.scan(version).to_pandas()
    df["tokens"] = df["tokens"].map(lambda a: tuple(a))
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture()
def src(tmp_path):
    return write_fragmented_table(
        str(tmp_path / "src"), 2_000, rows_per_fragment=400, config=CFG
    )


def test_fork_is_zero_copy_and_reads_source(src, tmp_path):
    before = canon(src)
    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    assert os.listdir(os.path.join(fork.table_dir, "data")) == []
    pd.testing.assert_frame_equal(canon(fork), before)
    assert src.pins()["fork-dev"] == fork_source(fork)[1]
    # predicate scan + zone-map prune work over foreign fragments
    assert fork.scan(predicate=[("source", "=", "wiki")]).count() == int(
        (before.source == "wiki").sum()
    )


def test_fork_isolation_both_directions(src, tmp_path):
    before = canon(src)
    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    # fork-side writes never touch the source
    delete_where(fork, [("source", "=", "forums")], mode="dv")
    update_where(fork, [("n_tok", "<", 50)], {"source": "tiny"})
    fork.commit_append(sequences_dataset(300, seed=5, start=10_000_000))
    pd.testing.assert_frame_equal(canon(src), before)
    # source-side writes never move the fork (it reads the PINNED version)
    delete_where(src, [("source", "=", "cc")])
    f = canon(fork)
    assert (f.source == "cc").any()
    # divergence is copy-on-write: only the fork's own mutation outputs
    own = os.listdir(os.path.join(fork.table_dir, "data"))
    assert own and all(n.endswith((".parquet", ".bloom")) or ".dv-" in n for n in own)


def test_fork_of_dv_source_reads_masked(src, tmp_path):
    delete_where(src, [("n_tok", "between", (100, 400))], mode="dv")
    want = canon(src)
    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    pd.testing.assert_frame_equal(canon(fork), want)
    # and the fork can materialize the foreign DVs via compaction
    compact(fork)
    pd.testing.assert_frame_equal(canon(fork), want)
    assert not any(f.dv_path for f in fork.manifest().fragments)


def test_fork_merge_back_exactly_once(src, tmp_path):
    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    delete_where(fork, [("source", "=", "books")], mode="dv")
    update_where(fork, [("n_tok", ">", 800)], {"source": "long"})
    base_v = fork_base_version(fork)
    v = apply_changelog(fork, src, from_version=base_v)
    pd.testing.assert_frame_equal(canon(src), canon(fork))
    # retry returns the same version (exactly-once watermark)
    assert apply_changelog(fork, src, from_version=base_v) == v


def test_fork_pin_blocks_source_gc(src, tmp_path):
    import time

    forked_v = src.latest_version()
    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    want = canon(fork)
    # source rewrites everything, then expires aggressively
    delete_where(src, [("n_tok", ">=", 0)])
    time.sleep(1.1)
    expire_snapshots(src, keep_last=1, gc_grace_seconds=0.0, clear_stale_lineage_seconds=1.0)
    assert forked_v in src.versions()  # pinned snapshot survived
    pd.testing.assert_frame_equal(canon(fork), want)  # fork still reads
    # releasing the pin lets the next expiry reclaim it
    drop_fork(src, fork)
    res = expire_snapshots(src, keep_last=1, gc_grace_seconds=0.0)
    assert forked_v not in src.versions()
    assert res["gc_files"] > 0


def test_fork_name_collision_refused(src, tmp_path):
    fork_table(src, str(tmp_path / "dev"), name="dev")
    with pytest.raises(ValueError, match="already pins"):
        fork_table(src, str(tmp_path / "dev2"), name="dev")


def test_fork_from_relative_source_dir(tmp_path, monkeypatch):
    """Regression: a fork of a table opened via a RELATIVE path must
    store absolute references (worker tasks and the detached commit
    actor have their own cwd)."""
    write_fragmented_table(str(tmp_path / "src"), 500, rows_per_fragment=250, config=CFG)
    monkeypatch.chdir(tmp_path)
    fork = fork_table(Table.open("src"), "dev", name="dev")
    n = fork.scan().count()
    monkeypatch.chdir("/")
    assert Table.open(str(tmp_path / "dev")).scan().count() == n == 500


def test_merge_fork_clean_and_idempotent(src, tmp_path):
    from fupi_ray.ops import merge_fork

    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    delete_where(fork, [("source", "=", "books")], mode="dv")
    update_where(fork, [("n_tok", ">", 800)], {"source": "long"})
    fork.commit_append(sequences_dataset(50, start=90_000))
    r = merge_fork(fork)
    pd.testing.assert_frame_equal(canon(src), canon(fork))
    assert r["keys_merged"] > 0 and r["version"] == src.latest_version()
    # idempotent rerun (cdc_apply watermark)
    assert merge_fork(fork)["version"] == r["version"]


def test_merge_fork_conflict_detection(src, tmp_path):
    from fupi_ray.ops import ForkConflict, merge_fork

    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    # both sides touch n_tok>900 keys: default merge must refuse
    update_where(fork, [("n_tok", ">", 900)], {"source": "fork-side"})
    update_where(src, [("n_tok", ">", 900)], {"source": "src-side"})
    with pytest.raises(ForkConflict):
        merge_fork(fork)
    # fork-wins override applies the fork's version of the keys
    r = merge_fork(fork, on_conflict="fork")
    got = canon(src)
    assert (got.loc[got.n_tok > 900, "source"] == "fork-side").all()
    assert r["keys_merged"] > 0


def test_merge_fork_disjoint_sides_no_conflict(src, tmp_path):
    from fupi_ray.ops import merge_fork

    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    update_where(fork, [("n_tok", "<", 100)], {"source": "fork-low"})
    update_where(src, [("n_tok", ">", 900)], {"source": "src-high"})
    r = merge_fork(fork, drop=True)
    got = canon(src)
    # both sides' disjoint edits survive the merge
    assert (got.loc[got.n_tok < 100, "source"] == "fork-low").all()
    assert (got.loc[got.n_tok > 900, "source"] == "src-high").all()
    assert r["dropped"] and f"fork-dev" not in src.pins()


def test_merge_fork_nothing_to_merge(src, tmp_path):
    from fupi_ray.ops import merge_fork

    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    v0 = src.latest_version()
    r = merge_fork(fork)
    assert r["version"] == v0 and r["keys_merged"] == 0


def test_merge_fork_sequential_merges(src, tmp_path):
    """The review repro: merge, keep editing the fork, merge again —
    the second merge must NOT read the first merge's keys (or its
    cdc_apply commit on the source) as conflicts, and must replay only
    the NEW divergence."""
    from fupi_ray.ops import merge_fork

    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    update_where(fork, [("n_tok", ">", 900)], {"source": "wave-1"})
    r1 = merge_fork(fork)
    assert r1["keys_merged"] > 0
    # second wave on DISJOINT keys: no conflict, only wave-2 replays
    update_where(fork, [("n_tok", "<", 100)], {"source": "wave-2"})
    r2 = merge_fork(fork)
    assert r2["keys_merged"] > 0
    got = canon(src)
    assert (got.loc[got.n_tok > 900, "source"] == "wave-1").all()
    assert (got.loc[got.n_tok < 100, "source"] == "wave-2").all()
    # a THIRD merge with nothing new is a no-op at the source's version
    assert merge_fork(fork)["keys_merged"] == 0


def test_merge_fork_refuses_interleaved_source_commit(src, tmp_path, monkeypatch):
    """A source commit landing between the conflict check and the
    apply must fail the merge loudly, never be silently overwritten."""
    import importlib

    # ops/__init__ re-exports a FUNCTION named `changelog`, shadowing
    # the submodule attribute — resolve the module itself
    ch_mod = importlib.import_module("fupi_ray.ops.changelog")
    from fupi_ray.ops import merge_fork
    from fupi_ray.state.commit import CommitError

    fork = fork_table(src, str(tmp_path / "dev"), name="dev")
    update_where(fork, [("n_tok", ">", 900)], {"source": "fork-side"})

    real_apply = ch_mod.apply_changelog

    def racing_apply(*a, **k):
        # interleave a source commit INSIDE the race window
        update_where(src, [("n_tok", ">", 950)], {"source": "racer"})
        return real_apply(*a, **k)

    import fupi_ray.ops.fork as fork_mod

    monkeypatch.setattr(ch_mod, "apply_changelog", racing_apply)
    with pytest.raises(CommitError, match="advanced"):
        merge_fork(fork)
