"""Token-bloom needle index (ops/tokindex.py): incremental sidecar
build, all/any lookup semantics, pruning on misses, DV interaction,
and sidecar GC with the fragment lifecycle."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.ops import (
    compact,
    delete_where,
    ensure_token_blooms,
    expire_snapshots,
    keyword_lookup,
)
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=64 * 1024)

# tokens drawn from a narrow band so fragment blooms are NOT saturated
MOTIF_A = 9_000_001  # planted in doc_id < 20 only
MOTIF_B = 9_000_002  # planted in even doc_id < 20
ABSENT = 9_999_999


def _mk_table(tmp_path, n=400) -> Table:
    t = Table.create(str(tmp_path / "tok"), config=CFG)
    ids = np.arange(n, dtype=np.int64)

    def row_tokens(i):
        base = [int(100 + (i * 7 + j) % 50) for j in range(12)]
        if i < 20:
            base.append(MOTIF_A)
            if i % 2 == 0:
                base.append(MOTIF_B)
        return base

    tbl = pa.table(
        {
            "doc_id": [f"doc-{i:06d}" for i in ids],
            "tokens": pa.array([row_tokens(i) for i in ids], pa.list_(pa.int32())),
            "n_tok": pa.array([len(row_tokens(i)) for i in ids], pa.int32()),
            "source": ["s"] * n,
        }
    )
    # many small fragments so pruning is observable
    t.commit_append(ray.data.from_arrow(tbl), target_fragment_rows=50)
    return t


def test_build_is_incremental(tmp_path):
    t = _mk_table(tmp_path)
    r1 = ensure_token_blooms(t)
    assert r1["built"] > 0 and r1["cached"] == 0
    r2 = ensure_token_blooms(t)
    assert r2["built"] == 0 and r2["cached"] == r1["built"]


def test_lookup_all_exact_and_pruned(tmp_path):
    t = _mk_table(tmp_path)
    stats: dict = {}
    got = keyword_lookup(
        t, [MOTIF_A, MOTIF_B], mode="all", columns=["doc_id"], stats_out=stats
    ).take_all()
    ids = sorted(r["doc_id"] for r in got)
    assert ids == [f"doc-{i:06d}" for i in range(20) if i % 2 == 0]
    # motif rows live in the first fragments only: pruning must bite
    assert stats["fragments_scanned"] < stats["fragments_total"]


def test_lookup_any_union(tmp_path):
    t = _mk_table(tmp_path)
    got = keyword_lookup(t, [MOTIF_B, ABSENT], mode="any", columns=["doc_id"]).take_all()
    assert sorted(r["doc_id"] for r in got) == [
        f"doc-{i:06d}" for i in range(20) if i % 2 == 0
    ]


def test_lookup_miss_prunes_everything(tmp_path):
    t = _mk_table(tmp_path)
    stats: dict = {}
    got = keyword_lookup(t, [ABSENT], stats_out=stats).take_all()
    assert got == []
    # blooms are deterministic; an absent narrow-band token must prune
    # every fragment (no false positive at 10 bits/key on ~60 keys)
    assert stats["fragments_scanned"] == 0


def test_lookup_respects_deletion_vectors(tmp_path):
    t = _mk_table(tmp_path)
    keyword_lookup(t, [MOTIF_A])  # build sidecars pre-delete
    delete_where(t, [("doc_id", "<", "doc-000010")], mode="dv")
    got = keyword_lookup(t, [MOTIF_A], columns=["doc_id"]).take_all()
    # blooms over-approximate (physical rows) but the verify scan is
    # DV-masked: deleted motif rows must not come back
    assert sorted(r["doc_id"] for r in got) == [f"doc-{i:06d}" for i in range(10, 20)]


def test_sidecars_gcd_with_fragments(tmp_path):
    t = _mk_table(tmp_path)
    ensure_token_blooms(t)
    ddir = os.path.join(t.table_dir, "data")
    before = sum(n.endswith(".tokbloom") for n in os.listdir(ddir))
    assert before > 0
    compact(t)  # rewrites fragments; old ones become GC food
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0)
    names = os.listdir(ddir)
    live = {f.path.split("/", 1)[1] for f in t.manifest().fragments}
    for n in names:
        if n.endswith(".tokbloom"):
            assert n[: -len(".tokbloom")] in live, f"orphan sidecar {n}"
    # post-compaction lookup rebuilds only the new fragments' blooms
    stats: dict = {}
    got = keyword_lookup(t, [MOTIF_A], columns=["doc_id"], stats_out=stats).take_all()
    assert len(got) == 20


def test_lookup_input_validation(tmp_path):
    t = _mk_table(tmp_path, n=30)
    with pytest.raises(ValueError, match="mode"):
        keyword_lookup(t, [1], mode="xor")
    with pytest.raises(ValueError, match="probe token"):
        keyword_lookup(t, [])


def test_corrupt_sidecar_self_heals(tmp_path):
    t = _mk_table(tmp_path, n=120)
    ensure_token_blooms(t)
    ddir = os.path.join(t.table_dir, "data")
    victim = next(
        os.path.join(ddir, n) for n in sorted(os.listdir(ddir)) if n.endswith(".tokbloom")
    )
    with open(victim, "wb") as f:
        f.write(b"torn")
    # lookup must not crash (torn sidecar = cannot prune) ...
    got = keyword_lookup(t, [MOTIF_A], columns=["doc_id"], build=False).take_all()
    assert len(got) == 20
    # ... and ensure rebuilds exactly the torn one
    r = ensure_token_blooms(t)
    assert r["built"] == 1


def test_maintain_token_blooms_arm(tmp_path):
    from fupi_ray.ops import maintain

    t = _mk_table(tmp_path, n=200)
    ensure_token_blooms(t)
    # compaction inside maintain renames fragments; the arm must
    # rebuild exactly the new ones and a second call must no-op
    r1 = maintain(t, keep_last=2, token_blooms=True)
    assert r1["token_blooms"]["built"] > 0
    r2 = maintain(t, keep_last=2, token_blooms=True)
    assert r2["token_blooms"]["built"] == 0 and r2["token_blooms"]["cached"] > 0
    # and the index still answers
    got = keyword_lookup(t, [MOTIF_A], columns=["doc_id"], build=False).take_all()
    assert len(got) == 20
