"""Deletion-vector (merge-on-read) tests: DV delete/update golden
results vs the COW twin, stacking, mixed-fragment scans, maintenance
materialization (compact/cluster/merge), CDC semantics, snapshot
isolation + GC, and the write-amplification claim itself."""

import numpy as np
import pandas as pd
import pytest

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import merge_source_dataset, sequences_dataset, write_fragmented_table
from fupi_ray.ops import (
    changelog,
    cluster,
    compact,
    delete_where,
    expire_snapshots,
    merge_into,
    update_where,
)
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table

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


def dv_sidecars(t: Table) -> list[str]:
    return [n for n in _fs.ls_names(f"{t.table_dir}/data") if ".dv-" in n]


def test_dv_delete_matches_cow_golden(tbl):
    before = full_df(tbl)
    pred = [("n_tok", "between", (100, 400))]
    v = delete_where(tbl, pred, mode="dv")
    assert v == tbl.latest_version()
    m = tbl.manifest()
    assert m.operation == "delete-dv"
    assert m.properties["mode"] == "dv"
    # the Parquet files were NOT rewritten — same physical paths as parent
    parent_paths = {f.path for f in tbl.manifest(m.parent_version).fragments}
    assert {f.path for f in m.fragments} <= parent_paths
    assert any(f.dv_path for f in m.fragments)
    got = full_df(tbl)
    want = before[~before.n_tok.between(100, 400)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert m.properties["rows_matched"] == int(before.n_tok.between(100, 400).sum())
    # manifest-level logical stats agree with the data
    assert m.total_rows == len(want)
    assert m.total_tokens == int(want.n_tok.sum())


def test_dv_deletes_stack_and_snapshots_isolate(tbl):
    before = full_df(tbl)
    v0 = tbl.latest_version()
    v1 = delete_where(tbl, [("source", "=", "forums")], mode="dv")
    v2 = delete_where(tbl, [("n_tok", "<", 64)], mode="dv")
    want = before[(before.source != "forums") & (before.n_tok >= 64)]
    pd.testing.assert_frame_equal(full_df(tbl), want.reset_index(drop=True))
    # every snapshot still reads ITS dv state
    pd.testing.assert_frame_equal(full_df(tbl, v0), before)
    want1 = before[before.source != "forums"].reset_index(drop=True)
    pd.testing.assert_frame_equal(full_df(tbl, v1), want1)
    assert v2 == tbl.latest_version()


def test_dv_scan_predicate_over_mixed_fragments(tbl):
    # leave some fragments DV-free: delete a doc_id point (bloom/zone
    # prune keeps most fragments untouched)
    df = full_df(tbl)
    victim = df.doc_id.iloc[37]
    delete_where(tbl, [("doc_id", "=", victim)], mode="dv")
    m = tbl.manifest()
    assert sum(1 for f in m.fragments if f.dv_path) == 1  # point delete: 1 DV
    assert tbl.scan(predicate=[("doc_id", "=", victim)]).count() == 0
    # predicate + projection across the dv/non-dv union
    got = (
        tbl.scan(columns=["doc_id", "n_tok"], predicate=[("n_tok", ">", 500)])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        df[(df.n_tok > 500) & (df.doc_id != victim)][["doc_id", "n_tok"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_dv_update_golden_and_changelog(tbl):
    before = full_df(tbl)
    v0 = tbl.latest_version()
    n_match = int((before.source == "books").sum())
    v1 = update_where(tbl, [("source", "=", "books")], {"source": "press"}, mode="dv")
    got = full_df(tbl)
    want = before.copy()
    want.loc[want.source == "books", "source"] = "press"
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # CDC across a DV mutation: delete(old) + insert(new) per updated row
    counts = {
        r["change_type"]: r["count()"]
        for r in changelog(tbl, v0, v1).groupby("change_type").count().take_all()
    }
    assert counts == {"delete": n_match, "insert": n_match}


def test_dv_full_fragment_delete_drops_fragment(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 1_000, rows_per_fragment=250, config=CFG)
    n_frags = len(t.manifest().fragments)
    before = full_df(t)
    # delete EVERYTHING via dv: all fragments must be dropped, no DV left
    delete_where(t, [("n_tok", ">=", 0)], mode="dv")
    m = t.manifest()
    assert len(m.fragments) == 0 and m.total_rows == 0
    assert t.scan().count() == 0
    assert m.properties["fragments_dropped"] == n_frags
    # history intact
    assert len(full_df(t, m.parent_version)) == len(before)


def test_compact_materializes_dvs(tbl):
    delete_where(tbl, [("source", "=", "forums")], mode="dv")
    want = full_df(tbl)
    v = compact(tbl)
    assert v is not None
    m = tbl.manifest(v)
    assert not any(f.dv_path for f in m.fragments)
    pd.testing.assert_frame_equal(full_df(tbl), want)


def test_cluster_materializes_dvs(tbl):
    delete_where(tbl, [("n_tok", "<", 200)], mode="dv")
    want = full_df(tbl)
    v = cluster(tbl)
    m = tbl.manifest(v)
    assert not any(f.dv_path for f in m.fragments)
    pd.testing.assert_frame_equal(full_df(tbl), want)


def test_merge_into_does_not_resurrect_dv_deleted_rows(tmp_path):
    t = Table.create(str(tmp_path / "t"), config=CFG)
    t.commit_append(sequences_dataset(4_000))
    deleted = set(
        r["doc_id"]
        for r in t.scan(predicate=[("source", "=", "forums")], columns=["doc_id"]).take_all()
    )
    delete_where(t, [("source", "=", "forums")], mode="dv")
    src = merge_source_dataset(4_000)
    src_ids = set(r["doc_id"] for r in src.select_columns(["doc_id"]).take_all())
    merge_into(t, src)
    ids = [r["doc_id"] for r in t.scan(columns=["doc_id"]).take_all()]
    assert len(ids) == len(set(ids))
    assert not (set(ids) & deleted) - src_ids  # only source re-inserts return


def test_dv_write_amplification_is_sidecar_sized(tbl):
    """The point of MOR: a narrow delete writes a few KB of sidecar,
    not a rewrite of every hit fragment."""
    data_bytes_before = sum(f.bytes for f in tbl.manifest().fragments)
    paths_before = {f.path for f in tbl.manifest().fragments}
    df = full_df(tbl)
    victims = df.doc_id.iloc[:3].tolist()
    delete_where(tbl, [("doc_id", "in", victims)], mode="dv")
    m = tbl.manifest()
    assert {f.path for f in m.fragments} == paths_before  # zero rewrites
    sidecar_bytes = sum(
        _fs.size(_fs.join(tbl.table_dir, f.dv_path)) for f in m.fragments if f.dv_path
    )
    assert 0 < sidecar_bytes < 4096
    assert sum(f.bytes for f in m.fragments) == data_bytes_before


def test_dv_expiry_gc_keeps_referenced_sidecars(tbl):
    import time

    delete_where(tbl, [("source", "=", "forums")], mode="dv")
    want = full_df(tbl)
    dv_live = {f.dv_path for f in tbl.manifest().fragments if f.dv_path}
    # second delete supersedes the first DV on re-hit fragments
    delete_where(tbl, [("source", "=", "books")], mode="dv")
    time.sleep(1.1)
    expire_snapshots(tbl, keep_last=1, gc_grace_seconds=0.0, clear_stale_lineage_seconds=1.0)
    remaining = set(f"data/{n}" for n in dv_sidecars(tbl))
    live_now = {f.dv_path for f in tbl.manifest().fragments if f.dv_path}
    assert live_now <= remaining  # everything referenced survived
    assert not (remaining - live_now)  # everything unreferenced was GC'd
    assert remaining.isdisjoint(dv_live - live_now)
    got = full_df(tbl)
    assert (got.source != "books").all() and (got.source != "forums").all()
    assert len(got) == len(want[want.source != "books"])


def test_cow_mutation_on_dv_fragment_applies_mask_first(tbl):
    """A COW delete over a DV'd fragment must not resurrect the
    DV-deleted rows in its rewrite output."""
    before = full_df(tbl)
    delete_where(tbl, [("source", "=", "forums")], mode="dv")
    delete_where(tbl, [("n_tok", "<", 100)])  # COW over DV'd fragments
    got = full_df(tbl)
    want = before[(before.source != "forums") & (before.n_tok >= 100)]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # the rewrite materialized the DVs of every rewritten fragment
    m = tbl.manifest()
    rewritten = {f.path for f in m.fragments} - {
        f.path for f in tbl.manifest(m.parent_version).fragments
    }
    assert rewritten  # something was rewritten
    assert not any(f.dv_path for f in m.fragments if f.path in rewritten)


def test_mixed_scan_never_leaks_mask_columns(tbl):
    """Regression: with DV'd and plain fragments in one scan, a
    predicate on a non-projected column must not leak that column (or
    union mismatched schemas) out of the pushdown branch."""
    df = full_df(tbl)
    victim = df.doc_id.iloc[10]
    delete_where(tbl, [("doc_id", "=", victim)], mode="dv")
    out = tbl.scan(columns=["doc_id"], predicate=[("n_tok", ">", 500)]).to_pandas()
    assert list(out.columns) == ["doc_id"]
    assert len(out) == int(((df.n_tok > 500) & (df.doc_id != victim)).sum())


def test_expire_older_than_widens_retention(tbl):
    """Time-based retention: versions inside the window survive even
    past keep_last, so timestamp time travel stays answerable."""
    import time as _t

    from fupi_ray.ops import delete_where as _dw

    _dw(tbl, [("n_tok", "<", 100)], mode="dv")
    _dw(tbl, [("n_tok", ">", 900)], mode="dv")
    all_vs = tbl.versions()
    res = expire_snapshots(tbl, keep_last=1, older_than_seconds=3600.0)
    # everything was committed seconds ago → nothing expired
    assert res["expired_versions"] == []
    assert tbl.versions() == all_vs
    # without the window, keep_last=1 drops the old ones
    res = expire_snapshots(tbl, keep_last=1, older_than_seconds=0.0)
    assert res["expired_versions"] != []


def test_dv_changelog_fast_path_exact_rows(tbl):
    """A DV-only window (same Parquet paths, new DV) must take the
    position-diff fast path and return EXACTLY the deleted rows —
    content-correct, no COW carry-over, no netting artifacts."""
    before = full_df(tbl)
    v0 = tbl.latest_version()
    v1 = delete_where(tbl, [("n_tok", "between", (300, 350))], mode="dv")
    # precondition: pure DV window — every path survived
    p0 = {f.path for f in tbl.manifest(v0).fragments}
    p1 = {f.path for f in tbl.manifest(v1).fragments}
    assert p1 <= p0
    cdc = changelog(tbl, v0, v1).to_pandas()
    assert (cdc.change_type == "delete").all()
    cdc["tokens"] = cdc["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    got = (
        cdc.drop(columns=["change_type"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        before[before.n_tok.between(300, 350)]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_dv_changelog_rollback_restores_as_inserts(tbl):
    """Rolling back a DV delete shrinks the DV: the changelog across
    the rollback window must surface the restored rows as inserts."""
    from fupi_ray.ops import rollback

    before = full_df(tbl)
    v0 = tbl.latest_version()
    v1 = delete_where(tbl, [("source", "=", "books")], mode="dv")
    v2 = rollback(tbl, v0)
    n_books = int((before.source == "books").sum())
    cdc = changelog(tbl, v1, v2).to_pandas()
    assert (cdc.change_type == "insert").all()
    assert len(cdc) == n_books
    assert set(cdc.source) == {"books"}
    # and the full round trip nets to nothing
    assert changelog(tbl, v0, v2).count() == 0


# -- MERGE INTO mode="dv" ----------------------------------------------------


def _merge_oracle_df(base: pd.DataFrame, src) -> pd.DataFrame:
    """pandas oracle: keep-first dedup of source by _src_order, then
    last-write-wins upsert over the LIVE base rows."""
    s = src.to_pandas() if hasattr(src, "to_pandas") else src
    s = s.sort_values("_src_order").drop_duplicates("doc_id").drop(columns=["_src_order"])
    s["tokens"] = s["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    keep = base[~base.doc_id.isin(set(s.doc_id))]
    out = pd.concat([keep, s[base.columns.tolist()]], ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_merge_dv_matches_cow_golden(tbl, strategy):
    import pyarrow as pa
    import ray.data

    from fupi_ray.fixtures import generate_rows

    before = full_df(tbl)
    upd = generate_rows(100, 80, token_salt=7)
    ins = generate_rows(5_000_000, 40)
    src = pa.concat_tables([upd, ins])
    src = src.append_column(
        "_src_order", pa.array(np.arange(src.num_rows, dtype=np.int64))
    )
    parent_paths = {f.path for f in tbl.manifest().fragments}
    v = merge_into(tbl, ray.data.from_arrow(src), strategy=strategy, mode="dv")
    got = full_df(tbl, v)
    want = _merge_oracle_df(before, src)
    pd.testing.assert_frame_equal(got, want)
    m = tbl.manifest(v)
    props = m.properties
    assert props["mode"] == "dv" and props["strategy"] == strategy
    assert props["rows_matched"] == 80
    # merge-on-read: every surviving pre-merge path is UNREWRITTEN —
    # the only new Parquet is the source fragments
    old_side = {f.path for f in m.fragments if f.path in parent_paths}
    new_side = {f.path for f in m.fragments} - parent_paths
    assert old_side and new_side
    assert any(f.dv_path for f in m.fragments if f.path in parent_paths)
    # time travel: the parent still shows the pre-merge rows
    pd.testing.assert_frame_equal(full_df(tbl, m.parent_version), before)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_merge_dv_stacks_on_dv_delete(tbl, strategy):
    """A DV merge over fragments that already carry a DV unions the
    positions; rows deleted earlier never re-match, never resurrect,
    and the matched count covers only LIVE rows."""
    import pyarrow as pa
    import ray.data

    from fupi_ray.fixtures import generate_rows

    # doc ids are doc-%012d: delete docs 0..49 via DV first
    delete_where(tbl, [("doc_id", "<", "doc-000000000050")], mode="dv")
    before = full_df(tbl)
    assert len(before) == 2_000 - 50
    # source overlaps 30 deleted ids (0..29) and 40 live ids (100..139)
    src = pa.concat_tables(
        [generate_rows(0, 30, token_salt=3), generate_rows(100, 40, token_salt=3)]
    )
    src = src.append_column("_src_order", pa.array(np.arange(70, dtype=np.int64)))
    v = merge_into(tbl, ray.data.from_arrow(src), strategy=strategy, mode="dv")
    got = full_df(tbl, v)
    want = _merge_oracle_df(before, src)
    pd.testing.assert_frame_equal(got, want)
    # only the 40 live overlapping rows matched; the 30 dead ones were
    # already masked and must not double-count
    assert tbl.manifest(v).properties["rows_matched"] == 40


def test_merge_dv_write_amplification_is_source_sized(tmp_path):
    """The DV merge must not rewrite target Parquet: bytes of new
    .parquet under data/ ≈ source size, not hit-fragment size."""
    import pyarrow as pa
    import ray.data

    from fupi_ray.fixtures import generate_rows

    t = write_fragmented_table(str(tmp_path / "big"), 4_000, rows_per_fragment=500, config=CFG)
    pre = {n for n in _fs.ls_names(f"{t.table_dir}/data") if n.endswith(".parquet")}
    src = generate_rows(0, 4_000, token_salt=1).filter(
        pa.array([i % 400 == 0 for i in range(4_000)])
    )  # 10 updates spread across every fragment
    src = src.append_column("_src_order", pa.array(np.arange(src.num_rows, dtype=np.int64)))
    v = merge_into(t, ray.data.from_arrow(src), strategy="broadcast", mode="dv")
    post = {n for n in _fs.ls_names(f"{t.table_dir}/data") if n.endswith(".parquet")}
    new_parquet = post - pre
    m = t.manifest(v)
    live_new = {f.path.rsplit("/", 1)[-1] for f in m.fragments} - {
        p.rsplit("/", 1)[-1] for p in pre
    }
    # every REFERENCED new parquet is a source fragment (mg-*-src)
    assert live_new and all(n.startswith("mg-") and "-src" in n for n in live_new)
    # the 8 hit fragments each got a DV, none was rewritten
    assert sum(1 for f in m.fragments if f.dv_path) == m.properties["fragments_dv"]
    assert m.properties["rows_matched"] == 10
    # pure-update merge: row count is unchanged
    assert t.scan(v).count() == 4_000


# -- MERGE INTO when_matched="delete" (tombstone feed) ------------------------


@pytest.mark.parametrize("mode", ["cow", "dv"])
@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_merge_tombstone_feed(tbl, mode, strategy):
    """WHEN MATCHED THEN DELETE: a key-only source removes matched
    rows, inserts nothing, ignores unmatched keys — identical results
    through all four (mode x strategy) paths."""
    import pyarrow as pa
    import ray.data

    before = full_df(tbl)
    # 120 live keys + 30 keys that don't exist in the table
    ids = [f"doc-{i:012d}" for i in range(40, 160)] + [
        f"doc-{i:012d}" for i in range(9_000_000, 9_000_030)
    ]
    src = pa.table({"doc_id": pa.array(ids, pa.string())})
    v = merge_into(
        tbl, ray.data.from_arrow(src), strategy=strategy, mode=mode,
        when_matched="delete",
    )
    got = full_df(tbl, v)
    want = before[~before.doc_id.isin(set(ids))].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 2_000 - 120
    props = tbl.manifest(v).properties
    assert props["when_matched"] == "delete"
    if mode == "dv":
        assert props["mode"] == "dv"
        # no source fragment was written — pure sidecar bytes
        assert not any("-src" in f.path for f in tbl.manifest(v).fragments)
    # unmatched tombstones do not resurrect as rows anywhere
    assert not set(got.doc_id) & {f"doc-{i:012d}" for i in range(9_000_000, 9_000_030)}


def test_merge_tombstone_no_match_is_noop(tbl):
    import pyarrow as pa
    import ray.data

    v0 = tbl.latest_version()
    src = pa.table({"doc_id": pa.array(["doc-999999999999"], pa.string())})
    v = merge_into(
        tbl, ray.data.from_arrow(src), strategy="broadcast", mode="dv",
        when_matched="delete",
    )
    assert v == v0  # nothing matched: no commit at all


def test_merge_when_matched_validated(tbl):
    import pyarrow as pa
    import ray.data

    src = pa.table({"doc_id": pa.array(["doc-000000000001"], pa.string())})
    with pytest.raises(ValueError, match="when_matched"):
        merge_into(tbl, ray.data.from_arrow(src), when_matched="upsert")
