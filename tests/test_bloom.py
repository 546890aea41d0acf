"""Per-fragment doc_id bloom sidecars: kernel contract (no false
negatives, bounded FPR), MERGE / DELETE fragment pruning beyond zone
maps on UNCLUSTERED tables, sidecar lifecycle (rewrite outputs get
blooms; expiry GCs orphans), and scan-content equality throughout."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import generate_rows
from fupi_ray.functions import bloom
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.ops import delete_where, expire_snapshots, merge_into
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024, expire_keep_last=1)


def _interleaved_table(table_dir: str, n: int = 2_000, frag_rows: int = 250) -> Table:
    """A table whose every fragment spans (almost) the FULL doc_id
    range — zone maps cannot prune a point lookup, only blooms can.
    Rows are the standard fixture rows, written in stride-7 permuted
    order so each 250-row fragment holds ids spread across [0, n)."""
    t = Table.create(table_dir, config=CFG)
    perm = (np.arange(n) * 7) % n  # 7 coprime with 2000 → a permutation
    base = generate_rows(0, n)
    ds = ray.data.from_arrow(base.take(pa.array(perm)))
    t.commit_append(ds, target_fragment_rows=frag_rows)
    return t


def _full(t: Table, version=None) -> pd.DataFrame:
    df = t.scan(version).to_pandas()
    df["tokens"] = df["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    return df.sort_values("doc_id").reset_index(drop=True)


# -- kernel -------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fpr():
    members = np.array([f"doc-{i:09d}" for i in range(5_000)], dtype=object)
    others = np.array([f"xyz-{i:09d}" for i in range(20_000)], dtype=object)
    blob = bloom.build(stable_hash(members), bits_per_key=10)
    assert bloom.contains_mask(blob, stable_hash(members)).all()  # never a false negative
    fpr = bloom.contains_mask(blob, stable_hash(others)).mean()
    assert fpr < 0.05, fpr  # 10 bits/key, k=7 → ~0.8% expected
    # any-probe agrees with the mask
    assert bloom.may_contain_any(blob, stable_hash(members[:1]))
    absent = others[~bloom.contains_mask(blob, stable_hash(others))]
    assert not bloom.may_contain_any(blob, stable_hash(absent[:100]))


def test_bloom_sidecar_written_on_append(tmp_path):
    t = _interleaved_table(str(tmp_path / "t"))
    for f in t.manifest().fragments:
        assert os.path.exists(os.path.join(t.table_dir, f.path + ".bloom"))


# -- MERGE pruning ------------------------------------------------------------


def test_merge_bloom_skips_unmatched_fragments(tmp_path):
    t = _interleaved_table(str(tmp_path / "t"))
    before = _full(t)
    # 3 updates + 2 inserts: zone maps can't prune (every fragment
    # spans the range) but at most 3 of 8 fragments hold a key
    src = pa.concat_tables(
        [generate_rows(11, 1, token_salt=9), generate_rows(702, 1, token_salt=9),
         generate_rows(1503, 1, token_salt=9), generate_rows(5001, 2)]
    )
    v = merge_into(t, ray.data.from_arrow(src), strategy="broadcast")
    props = t.manifest(v).properties
    assert props["fragments_bloom_skipped"] >= 4
    # 3 true-positive fragments + ≤1 deterministic false positive
    assert props["fragments_hit"] <= 4
    # content: upsert semantics, token-array equality
    got = _full(t, v)
    src_df = src.to_pandas()
    src_df["tokens"] = src_df["tokens"].map(lambda a: tuple(a.tolist()))
    want = pd.concat(
        [before[~before.doc_id.isin(src_df.doc_id)], src_df]
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_merge_correct_when_blooms_absent(tmp_path):
    # a table written with blooms disabled merges identically (sidecar
    # is an optimization, never a correctness dependency)
    cfg = EngineConfig(target_fragment_bytes=256 * 1024, bloom_bits_per_key=None)
    t = Table.create(str(tmp_path / "nb"), config=cfg)
    t.commit_append(ray.data.from_arrow(generate_rows(0, 600)), target_fragment_rows=100)
    assert not any(
        n.endswith(".bloom") for n in os.listdir(os.path.join(t.table_dir, "data"))
    )
    before = _full(t)
    src = generate_rows(5, 3, token_salt=4)
    v = merge_into(t, ray.data.from_arrow(src), strategy="broadcast")
    assert t.manifest(v).properties["fragments_bloom_skipped"] == 0
    got = _full(t, v)
    src_df = src.to_pandas()
    src_df["tokens"] = src_df["tokens"].map(lambda a: tuple(a.tolist()))
    want = pd.concat(
        [before[~before.doc_id.isin(src_df.doc_id)], src_df]
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


# -- DELETE / UPDATE point lookups ---------------------------------------------


def test_delete_point_lookup_bloom_prunes(tmp_path):
    t = _interleaved_table(str(tmp_path / "t"))
    before = _full(t)
    v = delete_where(t, [("doc_id", "==", "doc-000000000042")])
    props = t.manifest(v).properties
    assert props["fragments_rewritten"] == 1
    # of the zone-hit fragments, all but the true hit (± 1 FPR slack)
    # were skipped by the bloom probe without a Parquet read
    assert props["fragments_bloom_skipped"] >= props["fragments_hit"] - 2
    assert props["fragments_bloom_skipped"] >= 1
    want = before[before.doc_id != "doc-000000000042"].reset_index(drop=True)
    pd.testing.assert_frame_equal(_full(t, v), want)


def test_delete_in_list_bloom_prunes(tmp_path):
    t = _interleaved_table(str(tmp_path / "t"))
    before = _full(t)
    keys = ["doc-000000000007", "doc-000000000911"]
    v = delete_where(t, [("doc_id", "in", keys)])
    props = t.manifest(v).properties
    assert props["fragments_bloom_skipped"] >= 1
    want = before[~before.doc_id.isin(keys)].reset_index(drop=True)
    pd.testing.assert_frame_equal(_full(t, v), want)


def test_second_mutation_with_different_predicate_not_noop(tmp_path):
    """A no-match DELETE leaves lineage records behind without
    committing; a different DELETE at the same parent must not reuse
    them as silent no-ops (review finding: predicate-blind reuse)."""
    t = _interleaved_table(str(tmp_path / "t"))
    v0 = t.latest_version()
    assert delete_where(t, [("doc_id", "==", "doc-999999999999")]) == v0  # no match
    v1 = delete_where(t, [("doc_id", "==", "doc-000000000042")])
    assert v1 != v0
    assert t.scan(predicate=[("doc_id", "==", "doc-000000000042")]).count() == 0


def test_bloom_int_doc_id_no_false_negative(tmp_path):
    """Sidecars built from an INTEGER doc_id column hash through the
    uint64 path; the point-predicate probe must take the same path or
    it silently skips matching fragments (review finding)."""
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64()), ("n_tok", pa.int32())])
    t = Table.create(str(tmp_path / "ti"), schema=schema, config=CFG)
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1000)), pa.int64()),
            "n_tok": pa.array([7] * 1000, pa.int32()),
        }
    )
    t.commit_append(ray.data.from_arrow(tbl), target_fragment_rows=200)
    v = delete_where(t, [("doc_id", "==", 42)])
    props = t.manifest(v).properties
    assert props["rows_matched"] == 1, props
    assert t.scan(predicate=[("doc_id", "==", 42)]).count() == 0


def test_type_mismatched_point_key_never_silently_skips(tmp_path):
    """delete_where with an INT key on a STRING doc_id table must fail
    loudly on every fragment — a bloom probe hashing the key by its
    own type would silently report bloomed fragments unmatched while
    bloom-less ones raise (review finding)."""
    t = _interleaved_table(str(tmp_path / "t"), n=500, frag_rows=250)
    with pytest.raises(Exception):
        delete_where(t, [("doc_id", "==", 42)])
    # nothing was deleted by the failed op
    assert t.scan().count() == 500


def test_callable_update_runs_never_reuse_lineage(tmp_path):
    """Two callable-assignment updates at the same parent (first one
    matches nothing, so the version does not advance) must each apply
    their OWN closure — stale lineage reuse would mix deltas (review
    finding)."""
    import pyarrow.compute as _pc

    t = _interleaved_table(str(tmp_path / "t"), n=500, frag_rows=250)
    v0 = t.latest_version()
    from fupi_ray.ops import update_where

    r = update_where(
        t, [("doc_id", "==", "doc-999999999999")], {"n_tok": lambda b: _pc.add(b["n_tok"], 1)}
    )
    assert r == v0  # matched nothing, no commit — but lineage exists now
    before = _full(t)
    update_where(
        t, [("doc_id", "==", "doc-000000000005")], {"n_tok": lambda b: _pc.add(b["n_tok"], 2)}
    )
    got = _full(t)
    w5 = before[before.doc_id == "doc-000000000005"]["n_tok"].iloc[0]
    assert got[got.doc_id == "doc-000000000005"]["n_tok"].iloc[0] == w5 + 2


# -- lifecycle ----------------------------------------------------------------


def test_bloom_over_file_uri(tmp_path):
    """Sidecar write/read/probe routes through fsspec for scheme://
    tables (S8): point delete on a file:// table still bloom-skips."""
    uri = "file://" + str(tmp_path / "uri_tbl")
    t = Table.create(uri, config=CFG)
    n = 1000
    perm = (np.arange(n) * 7) % n
    t.commit_append(
        ray.data.from_arrow(generate_rows(0, n).take(pa.array(perm))),
        target_fragment_rows=250,
    )
    local_data = os.path.join(str(tmp_path / "uri_tbl"), "data")
    assert any(f.endswith(".bloom") for f in os.listdir(local_data))
    v = delete_where(t, [("doc_id", "==", "doc-000000000042")])
    props = t.manifest(v).properties
    assert props["fragments_rewritten"] == 1
    assert props["fragments_bloom_skipped"] >= 1
    assert t.scan().count() == n - 1


def test_rewrites_emit_blooms_and_expire_gcs_orphans(tmp_path):
    t = _interleaved_table(str(tmp_path / "t"))
    src = pa.concat_tables([generate_rows(3, 2, token_salt=1)])
    merge_into(t, ray.data.from_arrow(src), strategy="broadcast")
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0)
    ddir = os.path.join(t.table_dir, "data")
    names = set(os.listdir(ddir))
    # every live fragment has its bloom; a sidecar never outlives its
    # parquet (GC pairs them — lineage-retained non-manifest parquets
    # legitimately keep their sidecars too)
    for f in t.manifest().fragments:
        base = f.path.split("/", 1)[1]
        assert base + ".bloom" in names
    for n in names:
        if n.endswith(".bloom"):
            assert n[: -len(".bloom")] in names, n
