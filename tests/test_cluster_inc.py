"""Incremental reclustering (ops/cluster.py cluster(incremental=True)):
only fragments not carrying the layout's ``cluster_sig`` tag are
re-sorted — the scale path for clustered-table upkeep (a full
recluster of a 10^12-sequence table after every append is a
full-table rewrite; the incremental run is O(delta))."""

import pytest

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import cluster, compact, maintain

CFG = EngineConfig(target_fragment_bytes=256 * 1024, compact_min_fill=0.5)


def canonical(table, version=None):
    rows = table.scan(version).sort("doc_id").take_all()
    return [(r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"]) for r in rows]


def _sig(table, curve="zorder"):
    return f"{curve}@{table.config.cluster_bits}"


def test_incremental_cluster_touches_only_the_delta(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    cluster(t, curve="zorder")
    v_full = t.latest_version()
    clustered = {f.path for f in t.manifest().fragments}
    assert all(f.cluster_sig == _sig(t) for f in t.manifest().fragments)
    before = canonical(t)

    # a fully clustered table is a no-op: no commit, same version
    assert cluster(t, curve="zorder", incremental=True) == v_full
    assert t.latest_version() == v_full

    # append a delta, recluster incrementally
    t.commit_append(sequences_dataset(700, start=50_000, rows_per_partition=175))
    delta_rows = canonical(t, t.latest_version())
    v_inc = cluster(t, curve="zorder", incremental=True)
    m = t.manifest(v_inc)
    assert m.operation == "cluster-zorder-incremental"
    assert m.properties["incremental"] is True
    # every originally-clustered fragment survives byte-for-byte (same
    # path = same immutable file); only the delta was rewritten
    kept = {f.path for f in m.fragments} & clustered
    assert kept == clustered
    assert m.properties["fragments_kept"] == len(clustered)
    # the whole table now carries the tag, and content is preserved
    assert all(f.cluster_sig == _sig(t) for f in m.fragments)
    assert canonical(t, v_inc) == delta_rows
    assert len(delta_rows) == len(before) + 700

    # pruning works across old + delta fragments alike
    pred = [("source", "==", "wiki"), ("n_tok", "between", (8, 64))]
    assert len(t.fragment_paths(predicate=pred)) < len(m.fragments)
    got = t.scan(predicate=pred).count()
    exp = sum(1 for r in delta_rows if r[3] == "wiki" and 8 <= r[2] <= 64)
    assert got == exp


def test_compaction_drops_the_cluster_tag(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 1_200, rows_per_fragment=200, config=CFG)
    cluster(t, curve="hilbert")
    clustered = {f.path for f in t.manifest().fragments}
    # small-file append, then compact: packs are doc_id-ordered repacks,
    # not curve-ordered — their outputs must come out untagged while
    # untouched clustered fragments keep the tag
    t.commit_append(sequences_dataset(400, start=90_000, rows_per_partition=50))
    compact(t)
    m = t.manifest()
    for f in m.fragments:
        if f.path in clustered:
            assert f.cluster_sig == _sig(t, "hilbert")
        else:
            assert f.cluster_sig is None
    # and the incremental run re-sorts exactly the untagged ones
    untagged = {f.path for f in m.fragments if f.cluster_sig is None}
    v = cluster(t, curve="hilbert", incremental=True)
    m2 = t.manifest(v)
    assert {f.path for f in m2.fragments} & untagged == set()
    assert all(f.cluster_sig == _sig(t, "hilbert") for f in m2.fragments)
    assert t.scan().count() == 1_600


def test_different_layout_invalidates_the_tag(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 800, rows_per_fragment=200, config=CFG)
    cluster(t, curve="zorder")
    # an incremental run under a DIFFERENT curve sees every fragment as
    # drifted (the tag encodes the layout, not just "was clustered")
    v = cluster(t, curve="hilbert", incremental=True)
    m = t.manifest(v)
    assert m.properties["fragments_kept"] == 0
    assert all(f.cluster_sig == _sig(t, "hilbert") for f in m.fragments)


def test_maintain_reclusters_incrementally(tmp_path):
    t = write_fragmented_table(
        str(tmp_path / "t"), 1_000, rows_per_fragment=200, config=CFG
    )
    cluster(t, curve="zorder")
    clustered = {f.path for f in t.manifest().fragments}
    t.commit_append(sequences_dataset(600, start=60_000, rows_per_partition=200))
    out = maintain(t, keep_last=10)
    assert out["recluster"]["incremental"] is True
    assert out["recluster"]["version"] is not None
    # the bulk of the pre-drift clustered data was kept, not rewritten.
    # (Not ALL of it: maintain's compact arm may legitimately fold a
    # small clustered TAIL fragment into a repack with the appended
    # smalls — which renames it and drops its tag — so the exact
    # surviving set depends on bin-packing. A full re-sort would keep
    # ZERO pre-cluster paths; incremental keeps all but at most that
    # tail, so row-majority is the scheduling-independent invariant.)
    final = t.manifest()
    kept_rows = sum(f.live_rows for f in final.fragments if f.path in clustered)
    assert kept_rows >= 600, f"incremental recluster kept only {kept_rows} rows"
    assert t.scan().count() == 1_600
    # a second cycle sees no drift
    out2 = maintain(t, keep_last=10)
    assert out2["recluster"]["skipped"]
