"""Timestamp time travel + write-audit-publish staged commits:
invisibility before publish, audit-view union, publish-as-append
(rebased), abort + GC, and snapshot isolation throughout."""

import os
import time

import pandas as pd
import pytest
import ray
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import generate_rows, write_fragmented_table
from fupi_ray.ops import (
    abort_stage,
    expire_snapshots,
    list_stages,
    publish_stage,
    stage_append,
    staged_scan,
)
from fupi_ray.ops.stage import read_stage
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024, expire_keep_last=1)


# -- time travel ---------------------------------------------------------------


def test_scan_as_of_timestamp(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 300, rows_per_fragment=100, config=CFG)
    ts_v1 = time.time()
    time.sleep(0.02)
    t.commit_append(ray.data.from_arrow(generate_rows(300, 100)))
    ts_v2 = time.time()

    assert t.scan(as_of_unix=ts_v1).count() == 300
    assert t.scan(as_of_unix=ts_v2).count() == 400
    assert t.version_at(ts_v1) < t.version_at(ts_v2)
    with pytest.raises(ValueError):
        t.version_at(0.0)  # before the table existed
    with pytest.raises(ValueError):
        t.scan(version=1, as_of_unix=ts_v1)  # mutually exclusive


# -- write-audit-publish --------------------------------------------------------


def test_stage_invisible_then_publish(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 200, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(200, 50)))

    # invisible to every normal reader
    assert t.scan().count() == 200
    assert len(list_stages(t)) == 1

    # audit view = table ∪ staged, with predicate pruning intact
    audit = staged_scan(t, sid)
    assert audit.count() == 250
    pred = [("doc_id", "between", ("doc-000000000220", "doc-000000000229"))]
    assert staged_scan(t, sid, predicate=pred).count() == 10

    v = publish_stage(t, sid)
    assert t.latest_version() == v
    assert t.scan().count() == 250
    assert t.manifest(v).properties["wap_stage"] == sid
    assert list_stages(t) == []
    # token-array equality for a staged row after publish
    row = t.scan(predicate=[("doc_id", "==", "doc-000000000234")]).take_all()[0]
    assert list(row["tokens"]) == generate_rows(234, 1)["tokens"][0].as_py()


def test_publish_rebases_over_concurrent_append(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(100, 20)))
    # another writer advances the table between stage and publish
    t.commit_append(ray.data.from_arrow(generate_rows(500, 30)))
    publish_stage(t, sid)
    assert t.scan().count() == 150  # both the append and the stage landed


def test_abort_stage_releases_fragments_to_gc(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(100, 20)))
    staged_rel = {d["path"] for d in read_stage(t, sid)["fragments"]}

    # while staged: expiry must NOT GC the fragments (auditor may read)
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0)
    for rel in staged_rel:
        assert os.path.exists(os.path.join(t.table_dir, rel))

    assert abort_stage(t, sid) == len(staged_rel)
    assert list_stages(t) == []
    # after abort: normal GC food
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0)
    for rel in staged_rel:
        assert not os.path.exists(os.path.join(t.table_dir, rel))
    assert t.scan().count() == 100


def test_publish_retry_after_crash_is_idempotent(tmp_path):
    """Crash between the publish commit and the staging-record removal:
    a retry must finish cleanup and return the SAME version, never
    append the fragments twice (review finding)."""
    import json

    from fupi_ray.ops.stage import _record_path, read_stage
    from fupi_ray.state import fs as _fs

    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(100, 20)), stage_id="s9")
    rec = read_stage(t, sid)
    v = publish_stage(t, sid)
    # simulate the crash: resurrect the staging record post-commit
    _fs.write_text(_record_path(t.table_dir, sid), json.dumps(rec, default=str))
    v2 = publish_stage(t, sid)
    assert v2 == v
    assert t.latest_version() == v
    assert t.scan().count() == 120  # no duplicated rows
    assert list_stages(t) == []
    # a RE-USED stage id (new record, new created_unix) still publishes
    sid2 = stage_append(t, ray.data.from_arrow(generate_rows(300, 10)), stage_id="s9")
    v3 = publish_stage(t, sid2)
    assert v3 > v and t.scan().count() == 130


def test_publish_retry_survives_expired_stamp(tmp_path):
    """Crash-retry after snapshot expiry erased the stamped version's
    manifest: the staged fragment paths in the LATEST manifest still
    prove the publish happened — the retry must not re-append (review
    finding)."""
    import json

    from fupi_ray.ops.stage import _record_path, read_stage
    from fupi_ray.state import fs as _fs

    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(100, 20)))
    rec = read_stage(t, sid)
    v = publish_stage(t, sid)
    # advance history, then expire the stamped version's manifest
    t.commit_append(ray.data.from_arrow(generate_rows(500, 10)))
    expire_snapshots(t, keep_last=1, gc_grace_seconds=3600)
    assert v not in t.versions()
    # resurrect the record (the crash left it behind) and retry
    _fs.write_text(_record_path(t.table_dir, sid), json.dumps(rec, default=str))
    v2 = publish_stage(t, sid)
    assert v2 == t.latest_version()
    assert t.scan().count() == 130  # 100 + 20 + 10, no duplicates


def test_staged_scan_pads_schema_evolution(tmp_path):
    """A stage written BEFORE add_column audits with the evolved
    column padded to its default — same as the post-publish scan
    (review finding: raw read crashed or schema-mismatched)."""
    from fupi_ray.ops import add_column

    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(100, 20)))
    add_column(t, "lang", "string", default="en")
    # the record carries the STAGING-TIME schema (what the writer saw),
    # so a WAP audit can diagnose evolution that happened under the
    # unpublished stage — the live manifest already has the new column
    rec = read_stage(t, sid)
    assert "lang" not in rec["schema_names"]
    assert "lang" in t.manifest().schema_names
    assert len(rec["schema_names"]) == len(rec["schema_types"])
    ds = staged_scan(t, sid, columns=["doc_id", "lang"])
    df = ds.to_pandas()
    assert len(df) == 120
    assert (df["lang"] == "en").all()
    # predicate on the evolved column works across base ∪ staged
    assert staged_scan(t, sid, predicate=[("lang", "==", "en")]).count() == 120
    publish_stage(t, sid)
    assert t.scan(predicate=[("lang", "==", "en")]).count() == 120


def test_stage_duplicate_id_refused(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    stage_append(t, ray.data.from_arrow(generate_rows(100, 10)), stage_id="s1")
    with pytest.raises(ValueError):
        stage_append(t, ray.data.from_arrow(generate_rows(110, 10)), stage_id="s1")


def test_concurrent_publish_commits_exactly_once(tmp_path):
    """Two live publishers of the SAME stage id racing through the
    commit actor (VERDICT r4 #2): the staged fragments must land in
    the manifest exactly once, and both publishers must return the
    version that actually published."""
    import threading

    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    sid = stage_append(t, ray.data.from_arrow(generate_rows(100, 40)))
    staged_rel = {d["path"] for d in read_stage(t, sid)["fragments"]}
    assert staged_rel

    results: dict[int, int | Exception] = {}
    barrier = threading.Barrier(2)

    def run(i: int):
        barrier.wait()
        try:
            results[i] = publish_stage(t, sid)
        except Exception as e:  # a loser must NOT error out
            results[i] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    vs = list(results.values())
    assert all(isinstance(v, int) for v in vs), vs
    assert vs[0] == vs[1], f"publishers disagree on published version: {vs}"
    frag_paths = [f.path for f in t.manifest().fragments]
    for rel in staged_rel:
        assert frag_paths.count(rel) == 1, f"{rel} appended {frag_paths.count(rel)}x"
    assert t.scan().count() == 140
    assert list_stages(t) == []
