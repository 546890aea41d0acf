"""dedup_documents (ops/dedupdocs.py): near-dup document removal as a
committing table op. Families must keep exactly the min doc_id; near
(not just exact) duplicates must land in one family; unrelated docs
must never be deleted; dv and cow modes must agree."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.ops import dedup_documents
from fupi_ray.ops.dedupdocs import _salts, token_signatures
from fupi_ray.table import Table


def _rng_tokens(seed: int, n: int) -> list[int]:
    return np.random.default_rng(seed).integers(0, 50_000, size=n).tolist()


def _table_of(rows: list[tuple[str, list[int]]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
            "source": pa.array(["s"] * len(rows), pa.string()),
        }
    )


def _build(table_dir, rows, frag_rows=5) -> Table:
    t = Table.create(table_dir)
    t.commit_append(
        ray.data.from_arrow(_table_of(rows)), target_fragment_rows=frag_rows
    )
    return t


def test_exact_duplicates_keep_min_id(tmp_table_dir):
    base = _rng_tokens(1, 300)
    rows = [(f"d-{i:03d}", base) for i in range(6)]  # one family of 6
    rows += [(f"u-{i:03d}", _rng_tokens(100 + i, 300)) for i in range(8)]
    t = _build(tmp_table_dir, rows)
    res = dedup_documents(t, threshold=0.8)
    assert res["rows_deleted"] == 5 and res["families"] == 1
    got = sorted(r["doc_id"] for r in t.scan().take_all())
    assert got == sorted(["d-000"] + [f"u-{i:03d}" for i in range(8)])
    assert res["version"] == t.latest_version()


def test_near_duplicates_one_family(tmp_table_dir):
    # perturb ~3% of tokens: token-8-gram Jaccard stays well above 0.5
    base = np.array(_rng_tokens(2, 1000), dtype=np.int64)
    rows = [("a-000", base.tolist())]
    for j in range(1, 4):
        mut = base.copy()
        idx = np.random.default_rng(j).choice(1000, size=4, replace=False)
        mut[idx] = mut[idx] + 1
        rows.append((f"a-{j:03d}", mut.tolist()))
    rows += [(f"u-{i:03d}", _rng_tokens(200 + i, 1000)) for i in range(5)]
    t = _build(tmp_table_dir, rows)
    res = dedup_documents(t, threshold=0.5)
    assert res["rows_deleted"] == 3, res
    survivors = {r["doc_id"] for r in t.scan().take_all()}
    assert "a-000" in survivors and not {"a-001", "a-002", "a-003"} & survivors
    assert {f"u-{i:03d}" for i in range(5)} <= survivors


def test_no_duplicates_no_commit(tmp_table_dir):
    rows = [(f"u-{i:03d}", _rng_tokens(300 + i, 400)) for i in range(10)]
    t = _build(tmp_table_dir, rows)
    v0 = t.latest_version()
    res = dedup_documents(t, threshold=0.5)
    assert res == {
        "version": v0,
        "rows_deleted": 0,
        "docs_in_families": 0,
        "families": 0,
        "pairs_verified": 0,
    }
    assert t.latest_version() == v0


def test_dv_and_cow_agree(tmp_table_dir):
    base = _rng_tokens(4, 500)
    rows = [(f"d-{i:03d}", base) for i in range(4)]
    rows += [(f"u-{i:03d}", _rng_tokens(400 + i, 500)) for i in range(4)]
    t1 = _build(str(tmp_table_dir) + "-dv", rows)
    t2 = _build(str(tmp_table_dir) + "-cow", rows)
    r1 = dedup_documents(t1, mode="dv")
    r2 = dedup_documents(t2, mode="cow")
    assert r1["rows_deleted"] == r2["rows_deleted"] == 3
    g1 = sorted(r["doc_id"] for r in t1.scan().take_all())
    g2 = sorted(r["doc_id"] for r in t2.scan().take_all())
    assert g1 == g2


def test_two_distinct_families(tmp_table_dir):
    b1, b2 = _rng_tokens(5, 400), _rng_tokens(6, 400)
    rows = [(f"x-{i}", b1) for i in range(3)] + [(f"y-{i}", b2) for i in range(3)]
    t = _build(tmp_table_dir, rows)
    res = dedup_documents(t)
    assert res["families"] == 2 and res["rows_deleted"] == 4
    got = sorted(r["doc_id"] for r in t.scan().take_all())
    assert got == ["x-0", "y-0"]


def test_signature_estimator_tracks_jaccard():
    # the in-bucket verifier uses mean(sig_a == sig_b); on disjoint
    # content the estimate must be ~0 (never passes threshold), on
    # identical content exactly 1
    salts = _salts(64, 42)
    a = pa.array([_rng_tokens(7, 800)], pa.list_(pa.int32()))
    b = pa.array([_rng_tokens(8, 800)], pa.list_(pa.int32()))
    sa, sb = token_signatures(a, salts, 8)[0], token_signatures(b, salts, 8)[0]
    assert (sa == sb).mean() < 0.2
    assert (sa == token_signatures(a, salts, 8)[0]).mean() == 1.0


def test_short_docs_do_not_crash(tmp_table_dir):
    rows = [("s-0", [1, 2]), ("s-1", [1, 2]), ("s-2", []), ("s-3", [9])]
    t = _build(tmp_table_dir, rows, frag_rows=2)
    res = dedup_documents(t)
    # s-0 and s-1 are identical (single-gram docs) -> one family;
    # the empty doc must never join a family with a non-empty doc of
    # different content by the gram=0 fallback alone unless signatures
    # fully agree
    assert res["rows_deleted"] >= 1
    survivors = {r["doc_id"] for r in t.scan().take_all()}
    assert "s-0" in survivors and "s-1" not in survivors
    assert "s-3" in survivors


def test_incremental_matches_full_and_reuses_sidecars(tmp_table_dir):
    import glob
    import os

    base = _rng_tokens(10, 400)
    rows = [(f"d-{i:03d}", base) for i in range(4)]
    rows += [(f"u-{i:03d}", _rng_tokens(500 + i, 400)) for i in range(6)]
    t1 = _build(str(tmp_table_dir) + "-inc", rows)
    t2 = _build(str(tmp_table_dir) + "-full", rows)
    r1 = dedup_documents(t1, incremental=True)
    r2 = dedup_documents(t2)
    assert r1["rows_deleted"] == r2["rows_deleted"] == 3
    assert sorted(r["doc_id"] for r in t1.scan().take_all()) == sorted(
        r["doc_id"] for r in t2.scan().take_all()
    )
    # sidecars persisted beside every live fragment
    sides = glob.glob(os.path.join(t1.table_dir, "data", "*.parquet.sigs"))
    live = [f.path for f in t1.manifest().fragments]
    assert len(sides) >= len(live) - 1  # dv-mode delete adds no fragments

    # append NEW unique rows: the re-sweep must not touch old sidecars
    extra = [(f"x-{i:03d}", _rng_tokens(900 + i, 400)) for i in range(3)]
    mtimes = {s: os.path.getmtime(s) for s in sides}
    t1.commit_append(ray.data.from_arrow(_table_of(extra)), target_fragment_rows=2)
    r3 = dedup_documents(t1, incremental=True)
    assert r3["rows_deleted"] == 0
    for s, mt in mtimes.items():
        assert os.path.getmtime(s) == mt, f"old sidecar rewritten: {s}"
    new_sides = glob.glob(os.path.join(t1.table_dir, "data", "*.parquet.sigs"))
    assert len(new_sides) > len(sides)  # new fragments got sidecars


def test_incremental_respects_deletion_vectors(tmp_table_dir):
    from fupi_ray.ops import delete_where

    base = _rng_tokens(11, 400)
    rows = [(f"d-{i}", base) for i in range(3)] + [("u-0", _rng_tokens(600, 400))]
    t = _build(tmp_table_dir, rows, frag_rows=2)
    r1 = dedup_documents(t, incremental=True)
    assert r1["rows_deleted"] == 2  # d-1, d-2 dropped; d-0 canonical
    # now DV-delete the canonical survivor and re-offer the family:
    # cached sidecars must be masked so the vanished rep never anchors
    delete_where(t, [("doc_id", "==", "d-0")], mode="dv")
    t.commit_append(
        ray.data.from_arrow(_table_of([("z-8", base), ("z-9", base)])),
        target_fragment_rows=2,
    )
    r2 = dedup_documents(t, incremental=True)
    assert r2["rows_deleted"] == 1  # z-9 drops, z-8 is the new min LIVE member
    got = sorted(r["doc_id"] for r in t.scan().take_all())
    assert got == ["u-0", "z-8"]


def test_incremental_param_mismatch_recomputes(tmp_table_dir):
    rows = [("a", _rng_tokens(1, 300)), ("b", _rng_tokens(1, 300))]
    t = _build(tmp_table_dir, rows)
    r1 = dedup_documents(t, incremental=True, num_perm=32, bands=8)
    assert r1["rows_deleted"] == 1
    # different parameters invalidate the cached sidecars (metadata
    # mismatch) — the sweep recomputes instead of trusting stale sigs
    r2 = dedup_documents(t, incremental=True, num_perm=64, bands=16)
    assert r2["rows_deleted"] == 0  # nothing left to dedup; no crash


def test_sig_sidecars_follow_fragment_gc(tmp_table_dir):
    import glob
    import os

    from fupi_ray.ops import compact, expire_snapshots

    rows = [(f"u-{i:02d}", _rng_tokens(700 + i, 300)) for i in range(8)]
    t = _build(tmp_table_dir, rows, frag_rows=2)
    dedup_documents(t, incremental=True)
    before = set(glob.glob(os.path.join(t.table_dir, "data", "*.sigs")))
    assert before
    # compaction supersedes the small fragments; expiry (grace 0) must
    # GC the dead fragments AND their sig sidecars, keep live ones
    compact(t)
    dedup_documents(t, incremental=True)  # sidecars for the new layout
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0.0)
    after = set(glob.glob(os.path.join(t.table_dir, "data", "*.sigs")))
    live = {
        os.path.join(t.table_dir, f.path + ".sigs")
        for f in t.manifest().fragments
    }
    assert after == live, (after, live)
    assert not (before & after)  # every pre-compaction sidecar is gone


def test_fused_hot_keys_match_generic_path(tmp_table_dir):
    """The fused sig-block hot-key shuffle (_hot_keys_fused) must
    return exactly the keys the generic band_rows + hot_band_keys
    path returns — on a corpus WITH duplicate families (non-empty
    hot set) spread across fragments."""
    from fupi_ray.ops.dedupdocs import _hot_keys_fused, band_rows, signature_dataset
    from fupi_ray.stages.dedup import hot_band_keys

    base = _rng_tokens(7, 400)
    rows = [(f"d-{i:03d}", base) for i in range(5)]
    base2 = _rng_tokens(8, 350)
    rows += [(f"e-{i:03d}", base2) for i in range(3)]
    rows += [(f"u-{i:03d}", _rng_tokens(300 + i, 300)) for i in range(20)]
    t = _build(tmp_table_dir, rows, frag_rows=4)
    sigs = signature_dataset(
        t.scan(columns=["doc_id", "tokens"]), num_perm=32, gram=8
    ).materialize()
    fused = _hot_keys_fused(sigs, 32, 8, num_buckets=16, cap=16_000_000)
    generic = hot_band_keys(band_rows(sigs, 32, 8), num_buckets=16)
    assert fused is not None and generic is not None
    assert len(fused) > 0, "duplicate families must produce hot keys"
    assert np.array_equal(fused, generic)
