"""Write–audit–publish (WAP): stage an append invisibly, audit it,
then publish or abort.

The reference ingests straight into the serving table — a bad crawl
batch is visible to every reader the moment ``table.add`` returns
(/root/reference/fupi/embedders.py:124-125). The staging flow writes
the new fragments and a staging record but does NOT advance
``_latest``: readers see nothing, auditors scan "table ∪ staged" via
:func:`staged_scan`, and :func:`publish_stage` turns the record into a
normal append commit (auto-rebased under concurrent writers, like any
append). Iceberg ships the same flow as the ``wap.id`` snapshot-stage
+ cherry-pick; Delta calls it a shadow/branch write.

Layout: ``manifest/staged/<stage_id>.json`` listing the staged
fragment metas + the schema they were written under. Staged fragments
live in ``data/`` like any other fragment; snapshot expiry treats
fragments referenced by a staging record as live, so an unpublished
stage is never GC'd out from under its auditor — ``abort_stage``
removes the record and the files become normal GC food after the
grace period.

Scale shape: staging is exactly an append's fragment write (streamed,
no driver data path); the record is O(new fragments) metadata; publish
is a metadata-only commit.
"""

from __future__ import annotations

import json
import time
import uuid

import ray.data

from fupi_ray import manifest as mf
from fupi_ray.manifest import FragmentMeta
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table, write_dataset_fragments


def staged_dir(table_dir: str) -> str:
    return _fs.join(mf.manifest_dir(table_dir), "staged")


def _record_path(table_dir: str, stage_id: str) -> str:
    return _fs.join(staged_dir(table_dir), f"{stage_id}.json")


def stage_append(
    table: Table, ds: ray.data.Dataset, stage_id: str | None = None
) -> str:
    """Write ``ds`` as staged fragments; returns the stage id. Readers
    of the table see NOTHING until :func:`publish_stage`."""
    stage_id = stage_id or f"wap-{uuid.uuid4().hex[:12]}"
    if _fs.exists(_record_path(table.table_dir, stage_id)):
        raise ValueError(f"stage {stage_id!r} already exists")
    frags = write_dataset_fragments(
        # staged rows are future table rows: invariants apply at the
        # stage write (an auditor shouldn't even see violating rows)
        table._constrained(ds),
        table.table_dir,
        f"st-{stage_id}",
        bloom_bits=table.config.bloom_bits_per_key,
        row_group_rows=table.config.row_group_rows,
    )
    m = table.manifest()
    rec = {
        "stage_id": stage_id,
        "base_version": table.latest_version(),
        "created_unix": time.time(),
        # staging-time declared schema: lets an auditor diagnose a
        # mismatch after the table evolved under the unpublished stage
        # (the scan itself pads from the LATEST manifest; this records
        # what the writer saw)
        "schema_names": list(m.schema_names),
        "schema_types": list(m.schema_types),
        "fragments": [f.to_dict() for f in frags],
    }
    _fs.write_text(
        _record_path(table.table_dir, stage_id), json.dumps(rec, indent=1, default=str)
    )
    return stage_id


def read_stage(table: Table, stage_id: str) -> dict:
    p = _record_path(table.table_dir, stage_id)
    if not _fs.exists(p):
        raise FileNotFoundError(f"no staged commit {stage_id!r}")
    return json.loads(_fs.read_text(p))


def list_stages(table: Table) -> list[dict]:
    out = []
    for name in _fs.ls_names(staged_dir(table.table_dir)):
        if not name.endswith(".json"):
            continue
        try:
            out.append(json.loads(_fs.read_text(_fs.join(staged_dir(table.table_dir), name))))
        except FileNotFoundError:
            # a concurrent publish_stage consumed this record between
            # our listing and the read. Publish commits the manifest
            # FIRST and removes the record SECOND, so the stage's
            # fragments are already reachable through the manifests any
            # later enumeration (e.g. expire's liveness scan) reads —
            # skipping the vanished record loses no liveness.
            continue
    return sorted(out, key=lambda r: r["created_unix"])


def staged_fragment_metas(table: Table, stage_id: str) -> list[FragmentMeta]:
    return [FragmentMeta.from_dict(d) for d in read_stage(table, stage_id)["fragments"]]


def staged_scan(
    table: Table, stage_id: str, columns=None, predicate=None, **read_kwargs
) -> ray.data.Dataset:
    """Audit view: the CURRENT table ∪ the staged fragments — exactly
    what a reader would see after publish. Staged fragments go through
    ``Table.scan_fragments``, so they get the same zone-map pruning,
    predicate pushdown-or-mask, and schema-evolution padding as
    committed ones (a stage written before an add_column audits with
    the column padded to its default, exactly like the post-publish
    scan would read it)."""
    base = table.scan(columns=columns, predicate=predicate, **read_kwargs)
    m = table.manifest()
    frags = staged_fragment_metas(table, stage_id)
    if predicate:
        frags = [
            f
            for f in frags
            if mf.fragment_may_match(
                f, [p for p in predicate if f.has_column(p[0], m.column_ids)]
            )
        ]
    if not frags:
        return base
    return base.union(
        table.scan_fragments(m, frags, columns=columns, predicate=predicate, **read_kwargs)
    )


class _AlreadyPublished(Exception):
    """Raised inside the publish rebase lambda when the parent chain
    already carries this stage's stamp — a concurrent publisher won."""

    def __init__(self, version: int):
        super().__init__(f"stage already published at v{version}")
        self.version = version


def _stamp_version(table: Table, rec: dict, stamp: str, upto: int | None = None):
    """Newest-first header scan for ``stamp``; None if no surviving
    header carries it. Only commits made AFTER the stage was created
    can carry the stamp — the early break on ``created_unix`` bounds
    the header reads to the commits since staging, not the whole
    history. ``upto`` restricts the scan to versions <= a given parent
    (the commit-time uniqueness re-check)."""
    for v in sorted(table.versions(), reverse=True):
        if upto is not None and v > upto:
            continue
        try:
            hdr = mf.read_manifest_header(table.table_dir, v)
        except FileNotFoundError:
            continue  # expired by a concurrent expire_snapshots mid-scan
        if hdr.properties.get("wap_stamp") == stamp:
            return v
        if hdr.created_unix < rec["created_unix"]:
            break
    return None


def _oldest_version_with_paths(table: Table, paths: set[str]) -> int:
    """Oldest surviving version whose manifest references any of
    ``paths`` — the version that actually published the stage (used
    only on the rare expired-stamp fallback, so the full-manifest
    reads are acceptable; surviving history is bounded by expiry)."""
    for v in sorted(table.versions()):
        try:
            if any(f.path in paths for f in table.manifest(v).fragments):
                return v
        except FileNotFoundError:
            continue  # expired by a concurrent expire_snapshots mid-scan
    return table.latest_version()


def publish_stage(table: Table, stage_id: str) -> int:
    """Promote the staged fragments to a normal append commit (rebased
    under concurrent writers) and drop the staging record.

    Idempotent under crash-retry AND concurrent publish: the commit
    stamps ``wap_stamp`` in its properties; a re-publish first checks
    surviving version headers for the stamp, and the rebase lambda
    re-checks the parent chain on EVERY optimistic attempt — two
    concurrent publishers serialize through the commit actor, the
    loser's rebase sees the winner's stamp and returns the winner's
    version instead of appending the fragments a second time."""
    rec = read_stage(table, stage_id)
    # the stamp pairs the id with the record's creation time, so a
    # RE-USED stage id (staged again after an earlier publish) is a
    # distinct stamp and still publishes.
    stamp = f"{stage_id}@{rec['created_unix']}"
    v = _stamp_version(table, rec, stamp)
    if v is not None:
        _fs.rm(_record_path(table.table_dir, stage_id))
        return v
    frags = [FragmentMeta.from_dict(d) for d in rec["fragments"]]
    staged_paths = {f.path for f in frags}
    # second line of defense when snapshot expiry erased the stamped
    # version's manifest: ANY staged fragment path in the latest
    # manifest proves the commit happened (paths are uuid-unique; only
    # this stage's publish could have introduced them). Residual gap:
    # a crash + expiry + a compaction that rewrote EVERY staged
    # fragment before the retry — at that point nothing on disk
    # distinguishes published from not; the stamp scan above covers
    # every un-expired history.
    latest_paths = {f.path for f in table.manifest().fragments}
    if frags and staged_paths & latest_paths:
        _fs.rm(_record_path(table.table_dir, stage_id))
        return _oldest_version_with_paths(table, staged_paths)

    def _build(parent: int):
        # commit-time uniqueness: by the time a losing publisher's
        # optimistic commit rebases, the winner's stamped commit is in
        # the parent chain — abort with its version rather than
        # double-appending (the first attempt checks too: a publisher
        # that raced past the top-of-function scan still sees the
        # stamp here once latest has advanced).
        pv = _stamp_version(table, rec, stamp, upto=parent)
        if pv is not None:
            raise _AlreadyPublished(pv)
        return table.manifest(parent).fragments + frags

    try:
        v = table._commit_rebasing(
            "append",
            _build,
            properties={
                "wap_stage": stage_id,
                "wap_stamp": stamp,
                "staged_fragments": len(frags),
            },
        )
    except _AlreadyPublished as e:
        v = e.version
    _fs.rm(_record_path(table.table_dir, stage_id))
    return v


def abort_stage(table: Table, stage_id: str) -> int:
    """Drop the staging record; its fragments become unreferenced files
    that snapshot expiry GCs after the grace period. Returns the number
    of fragments released."""
    n = len(staged_fragment_metas(table, stage_id))
    _fs.rm(_record_path(table.table_dir, stage_id))
    return n
