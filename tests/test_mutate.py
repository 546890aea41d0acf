"""DELETE WHERE / UPDATE WHERE / rollback / changelog / append-rebase
tests (round 3): COW mutation correctness incl. token-array equality of
untouched rows, zone-map prune evidence, CDC netting, and concurrent
append commits."""

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import (
    add_column,
    changelog,
    cluster,
    delete_where,
    expire_snapshots,
    rollback,
    update_where,
)
from fupi_ray.state import commit as commit_mod
from fupi_ray.table import Table, write_dataset_fragments

CFG = EngineConfig(target_fragment_bytes=256 * 1024)


def full_df(t: Table, version=None) -> pd.DataFrame:
    df = t.scan(version).to_pandas()
    df["tokens"] = df["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture()
def tbl(tmp_path):
    return write_fragmented_table(
        str(tmp_path / "tbl"), 2_000, rows_per_fragment=250, config=CFG
    )


# -- DELETE WHERE ------------------------------------------------------------


def test_delete_where_golden(tbl):
    before = full_df(tbl)
    v = delete_where(tbl, [("n_tok", "between", (100, 400))])
    assert v == tbl.latest_version()
    got = full_df(tbl)
    want = before[~before.n_tok.between(100, 400)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)  # incl. token arrays
    props = tbl.manifest().properties
    assert props["rows_matched"] == int(before.n_tok.between(100, 400).sum())


def test_delete_where_prunes_by_zone_map(tbl):
    cluster(tbl, curve="zorder")  # tight n_tok zone maps per fragment
    n_frags = len(tbl.manifest().fragments)
    hi = int(full_df(tbl).n_tok.max())
    delete_where(tbl, [("n_tok", ">=", hi - 1)])
    props = tbl.manifest().properties
    assert props["fragments_hit"] < n_frags  # prune really happened
    assert full_df(tbl).n_tok.max() < hi - 1


def test_delete_where_noop_returns_parent(tbl):
    parent = tbl.latest_version()
    v = delete_where(tbl, [("source", "==", "no-such-source")])
    assert v == parent == tbl.latest_version()


def test_delete_requires_predicate(tbl):
    with pytest.raises(ValueError):
        delete_where(tbl, [])


def test_mutate_task_idempotent(tbl):
    from fupi_ray.ops.mutate import _mutate_fragment_task

    f = tbl.manifest().fragments[0]
    args = (tbl.table_dir, "job-x", 0, f.path, [("n_tok", ">", 0)], [], None)
    r1 = ray.get(_mutate_fragment_task.remote(*args))
    files = set(os.listdir(os.path.join(tbl.table_dir, "data")))
    r2 = ray.get(_mutate_fragment_task.remote(*args))
    assert r1 == r2
    assert set(os.listdir(os.path.join(tbl.table_dir, "data"))) == files


# -- UPDATE WHERE ------------------------------------------------------------


def test_update_where_scalar_keeps_other_rows_and_tokens(tbl):
    before = full_df(tbl)
    update_where(tbl, [("n_tok", "<", 300)], {"source": "curated"})
    got = full_df(tbl)
    want = before.copy()
    want.loc[want.n_tok < 300, "source"] = "curated"
    pd.testing.assert_frame_equal(got, want)  # tokens byte-identical everywhere


def test_update_where_callable_assignment(tbl):
    before = full_df(tbl)
    update_where(
        tbl,
        [("source", "==", before.source.iloc[0])],
        {"n_tok": lambda b: pa.compute.add(b["n_tok"], 1000)},
    )
    got = full_df(tbl)
    m = before.source == before.source.iloc[0]
    want = before.copy()
    want.loc[m, "n_tok"] = want.loc[m, "n_tok"] + 1000
    pd.testing.assert_frame_equal(got, want)


def test_update_evolved_column_pad_path(tbl):
    add_column(tbl, "quality", "double", default=0.5)
    # fragments physically lack `quality`: predicate + assignment both
    # run over the padded view; rewritten fragments materialize it
    update_where(
        tbl, [("quality", "==", 0.5), ("n_tok", "<", 200)], {"quality": 0.9}
    )
    df = tbl.scan(columns=["n_tok", "quality"]).to_pandas()
    assert (df.loc[df.n_tok < 200, "quality"] == 0.9).all()
    assert (df.loc[df.n_tok >= 200, "quality"] == 0.5).all()


def test_update_unknown_column_refused(tbl):
    with pytest.raises(ValueError, match="not in the table schema"):
        update_where(tbl, [("n_tok", ">", 0)], {"nope": 1})


# -- rollback ----------------------------------------------------------------


def test_rollback_restores_content_new_commit(tbl):
    v1 = tbl.latest_version()
    want = full_df(tbl, v1)
    delete_where(tbl, [("n_tok", ">", 200)])
    v2 = tbl.latest_version()
    update_where(tbl, [("n_tok", "<=", 200)], {"source": "x"})
    v4 = rollback(tbl, v1)
    assert v4 == tbl.latest_version() > v2
    pd.testing.assert_frame_equal(full_df(tbl), want)
    assert tbl.manifest().operation == "rollback"
    # intermediate version still scannable (history is linear, not erased)
    assert len(full_df(tbl, v2)) == len(want[want.n_tok <= 200])


def test_rollback_refused_after_expiry(tbl):
    v1 = tbl.latest_version()
    tbl.commit_overwrite(sequences_dataset(100, seed=7))
    expire_snapshots(tbl, keep_last=1, gc_grace_seconds=0.0)
    with pytest.raises(ValueError, match="missing version"):
        rollback(tbl, v1)


def test_rollback_refused_when_fragment_files_lost(tbl):
    v1 = tbl.latest_version()
    tbl.commit_overwrite(sequences_dataset(100, seed=7))
    os.unlink(os.path.join(tbl.table_dir, tbl.manifest(v1).fragments[0].path))
    with pytest.raises(ValueError, match="GC'd"):
        rollback(tbl, v1)


def test_rollback_preserves_field_id_allocator(tbl):
    v1 = tbl.latest_version()
    add_column(tbl, "quality", "double", default=0.5)
    next_id = tbl.manifest().next_column_id
    rollback(tbl, v1)
    assert tbl.manifest().next_column_id >= next_id  # ids never rewound
    add_column(tbl, "quality", "double", default=0.7)
    assert tbl.manifest().column_ids["quality"] >= next_id  # fresh id


# -- changelog (CDC) ----------------------------------------------------------


def test_changelog_append_only_inserts(tbl):
    v1 = tbl.latest_version()
    tbl.commit_append(sequences_dataset(150, seed=9, start=1_000_000))
    ch = changelog(tbl, v1, net=False).to_pandas()
    assert len(ch) == 150
    assert (ch.change_type == "insert").all()
    assert ch.doc_id.str.contains("1000").any()


def test_changelog_net_cancels_cow_carryover(tbl):
    before = full_df(tbl)
    v1 = tbl.latest_version()
    delete_where(tbl, [("n_tok", "between", (150, 350))])
    # raw diff contains every row of every rewritten fragment...
    raw = changelog(tbl, v1, net=False).to_pandas()
    deleted = before[before.n_tok.between(150, 350)]
    assert len(raw) > 2 * len(deleted)
    # ...netting cancels the copies: exactly the deleted rows remain
    ch = changelog(tbl, v1, net=True).to_pandas()
    assert (ch.change_type == "delete").all()
    assert sorted(ch.doc_id) == sorted(deleted.doc_id)


def test_changelog_net_update_is_delete_plus_insert(tbl):
    v1 = tbl.latest_version()
    update_where(tbl, [("n_tok", "<", 150)], {"source": "fixed"})
    n = int((full_df(tbl, v1).n_tok < 150).sum())
    ch = changelog(tbl, v1).to_pandas()
    ins = ch[ch.change_type == "insert"]
    del_ = ch[ch.change_type == "delete"]
    assert len(ins) == len(del_) == n
    assert (ins.source == "fixed").all()
    assert sorted(ins.doc_id) == sorted(del_.doc_id)


def test_changelog_same_version_empty(tbl):
    v = tbl.latest_version()
    ch = changelog(tbl, v, v)
    assert ch.count() == 0
    # ray to_pandas drops columns of an empty dataset; the Dataset
    # schema itself must still carry the full changelog contract
    assert "change_type" in ch.schema().names


# -- concurrent appends -------------------------------------------------------


def test_append_rebases_on_conflict(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 200, rows_per_fragment=100)
    v0 = t.latest_version()
    new = write_dataset_fragments(
        sequences_dataset(50, seed=1, start=10_000), t.table_dir, "ap"
    )
    t.commit_append(sequences_dataset(50, seed=2, start=20_000))  # racer wins
    # a commit built on the stale parent is refused...
    with pytest.raises(commit_mod.CommitError):
        t._commit("append", t.manifest(v0).fragments + new, v0)
    # ...and the rebasing path recovers it on the new latest
    v = t._commit_rebasing("append", lambda p: t.manifest(p).fragments + new)
    assert v == t.latest_version()
    assert t.scan().count() == 300


def test_concurrent_appends_all_succeed(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100)
    v0 = t.latest_version()

    def app(i):
        return t.commit_append(sequences_dataset(40, seed=i, start=(i + 1) * 50_000))

    with ThreadPoolExecutor(4) as ex:
        versions = list(ex.map(app, range(4)))
    assert sorted(versions) == list(range(v0 + 1, v0 + 5))
    assert t.scan().count() == 100 + 4 * 40


# -- apply_changelog (CDC consumer) -------------------------------------------


class TestApplyChangelog:
    def _replica(self, tmp_path):
        # identical logical content to `tbl` (same generator seed) but
        # a different physical layout — replication must not depend on
        # fragment boundaries
        return write_fragmented_table(
            str(tmp_path / "replica"), 2_000, rows_per_fragment=700, config=CFG
        )

    def test_replicates_window_with_token_equality(self, tmp_path, tbl):
        from fupi_ray.ops import apply_changelog

        dst = self._replica(tmp_path)
        v1 = tbl.latest_version()
        # a window with all three change kinds
        update_where(tbl, [("n_tok", "<", 40)], {"source": "tiny"})
        delete_where(tbl, [("n_tok", ">", 4000)])
        tbl.commit_append(sequences_dataset(100, start=10_000))

        v = apply_changelog(tbl, dst, from_version=v1)
        assert full_df(dst, v).equals(full_df(tbl))  # tokens included
        # atomic: the whole window landed as ONE dst commit
        assert dst.manifest(v).operation == "cdc_apply"
        assert dst.manifest(v).parent_version == v1
        # exactly-once: re-applying the same window is a no-op
        assert apply_changelog(tbl, dst, from_version=v1) == v
        assert dst.latest_version() == v

    def test_insert_only_window(self, tmp_path, tbl):
        from fupi_ray.ops import apply_changelog

        dst = self._replica(tmp_path)
        v1 = tbl.latest_version()
        tbl.commit_append(sequences_dataset(50, start=50_000))
        v = apply_changelog(tbl, dst, from_version=v1)
        assert full_df(dst, v).equals(full_df(tbl))
        assert dst.manifest(v).properties["cdc_inserts"] == 50

    def test_empty_window_records_watermark(self, tmp_path, tbl):
        from fupi_ray.ops import apply_changelog

        dst = self._replica(tmp_path)
        v1 = tbl.latest_version()
        before = full_df(dst)
        v = apply_changelog(tbl, dst, from_version=v1, to_version=v1)
        assert full_df(dst, v).equals(before)
        # the watermark commit still makes the retry a no-op
        assert apply_changelog(tbl, dst, from_version=v1, to_version=v1) == v


def test_changelog_netting_duplicate_content_rows(tmp_path):
    """Heavy-run netting: a row whose full content appears MULTIPLE
    times must net by multiset difference — |inserts - deletes| copies
    of the majority type survive."""
    import pyarrow as pa
    import ray.data

    from fupi_ray.ops.changelog import changelog

    def mk(n_dup: int):
        rows = {
            "doc_id": ["dup"] * n_dup + ["solo"],
            "tokens": [[1, 2, 3]] * n_dup + [[9]],
            "n_tok": [3] * n_dup + [1],
            "source": ["cc"] * (n_dup + 1),
        }
        return ray.data.from_arrow(pa.table(rows))

    t = Table.create(str(tmp_path / "t"), config=CFG)
    v1 = t.commit_append(mk(4))  # 4 identical 'dup' rows + 1 solo
    v2 = t.commit_overwrite(mk(1))  # 1 'dup' row + the same solo
    cl = changelog(t, v1, v2).to_pandas()
    counts = cl.groupby("change_type").size().to_dict()
    # solo cancels; dup nets 4 deletes vs 1 insert -> 3 deletes
    assert counts == {"delete": 3}, counts
    assert (cl.doc_id == "dup").all()
