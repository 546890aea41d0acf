"""Snapshot expiry + fragment garbage collection.

The reference keeps every Lance version forever (nothing in fupi ever
expires old table versions; disk is bounded only by the 10 GB fly.io
volume, fly.toml:18-26). The north star requires explicit ref-counted
expiry: versions referenced by a pin (manifest/pins/*.json — the
engine's ref counts) or within the retention window stay; everything
else is dropped, then fragments unreachable from any surviving
manifest are deleted.

Expiring a still-pinned version is refused (SURVEY.md §5.3) — readers
pinned to v must keep scanning v unchanged forever.
"""

from __future__ import annotations

import time

from fupi_ray import manifest as mf
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table


class PinnedVersionError(RuntimeError):
    pass


DEFAULT_GC_GRACE_SECONDS = 6 * 3600.0


def _surviving_manifests(table: Table):
    """Iterate manifests of the versions that survive RIGHT NOW,
    tolerating a concurrent expirer: a manifest deleted between our
    ``versions()`` listing and the read was a dead version by the
    deleter's (equally valid) retention computation — readers can no
    longer pin it, so it contributes no liveness and is skipped."""
    for v in table.versions():
        try:
            yield table.manifest(v)
        except FileNotFoundError:
            continue


def expire_snapshots(
    table: Table,
    keep_last: int | None = None,
    gc_grace_seconds: float = DEFAULT_GC_GRACE_SECONDS,
    versions: list[int] | None = None,
    clear_stale_lineage_seconds: float | None = None,
    older_than_seconds: float | None = None,
) -> dict:
    """Drop old versions and GC unreferenced fragments.

    ``versions`` names explicit versions to expire (refused if pinned);
    otherwise all versions except the trailing ``keep_last`` and any
    pinned ones are expired. ``older_than_seconds`` adds the time-based
    retention tier (Iceberg's ``expire_snapshots(older_than=...)``):
    versions committed within the window are kept EVEN past keep_last —
    it only ever widens retention, so timestamp time travel
    (``scan(as_of_unix=)``) stays answerable across the window.
    Fragments recorded in lineage (awaiting a ``--job-id`` resume) are
    treated as live; pass ``clear_stale_lineage_seconds`` to first drop
    lineage namespaces whose newest record is older than that
    (abandoned jobs), letting their outputs be GC'd. Returns a summary
    dict.
    """
    keep_last = table.config.expire_keep_last if keep_last is None else keep_last
    all_versions = table.versions()
    latest = table.latest_version()
    pins = set(table.pins().values())

    if versions is not None:
        for v in versions:
            if v in pins:
                raise PinnedVersionError(
                    f"version v{v} is pinned by {[k for k, p in table.pins().items() if p == v]}; "
                    "refusing to expire a live snapshot"
                )
            if v == latest:
                raise PinnedVersionError("refusing to expire the latest version")
        dead = set(versions)
    else:
        keep = set(all_versions[-keep_last:]) if keep_last > 0 else set()
        keep.add(latest)
        keep |= pins
        if older_than_seconds is not None:
            cutoff = time.time() - older_than_seconds
            for v in all_versions:
                # header-only read: no shard member lists for retention
                try:
                    hdr = mf.read_manifest_header(table.table_dir, v)
                except FileNotFoundError:
                    continue  # expired concurrently: already dead
                if hdr.created_unix >= cutoff:
                    keep.add(v)
        dead = set(all_versions) - keep

    # drop dead manifests (fs helpers route scheme:// through fsspec,
    # plain local paths through os)
    for v in sorted(dead):
        p = mf.manifest_path(table.table_dir, v)
        if _fs.exists(p):
            _fs.rm(p)

    from fupi_ray.state import lineage as lin

    cleared_jobs: list[str] = []
    if clear_stale_lineage_seconds is not None:
        now0 = time.time()
        for job in lin.list_jobs(table.table_dir):
            jdir = lin._job_dir(table.table_dir, job)
            names = _fs.ls_names(jdir)
            mtimes = [_fs.mtime(_fs.join(jdir, n)) for n in names] or [
                _fs.mtime(jdir)
            ]
            if now0 - max(mtimes) > clear_stale_lineage_seconds:
                lin.clear_job(table.table_dir, job)
                cleared_jobs.append(job)

    # GC fragments unreachable from any surviving manifest.
    #
    # ORDER MATTERS: record-based liveness (staging records, lineage)
    # is gathered BEFORE manifest-based liveness. A concurrent
    # publish_stage commits first and removes its staging record
    # second, so reading records first makes the transition atomic for
    # us: either the record still exists (fragments live via the
    # record) or it was removed after the commit, which our LATER
    # manifest enumeration then sees (fragments live via the
    # manifest). The reverse order has a hole no grace period closes —
    # a stage older than the grace window, published mid-expiry, would
    # be invisible to both snapshots and its committed fragments GC'd.
    live_paths: set[str] = set()
    # deletion-vector sidecars are content-immutable per DV version:
    # one is live exactly while some surviving manifest / staging /
    # lineage record references it (an older snapshot keeps its older
    # DV; a superseded DV with no referents is garbage)
    live_dvs: set[str] = set()
    # fragments of staged (write-audit-publish) commits are live while
    # their staging record exists: an auditor may still be scanning
    # them, and publish must find them intact
    from fupi_ray.ops import stage as _stage

    for rec in _stage.list_stages(table):
        for d in rec.get("fragments", []):
            live_paths.add(d.get("path"))
            if d.get("dv_path"):
                live_dvs.add(d["dv_path"])
    # outputs recorded by lineage (an in-flight or crashed job awaiting
    # --job-id resume) are live too: deleting them would make a later
    # resume commit a manifest pointing at vanished files
    for job in lin.list_jobs(table.table_dir):
        try:
            recs = lin.completed_partitions(table.table_dir, job)
        except (OSError, ValueError):
            continue  # malformed record: keep the job's files (safe side)
        for rec in recs.values():
            for frag in rec.get("output_fragments", []):
                live_paths.add(frag.get("path"))
                if frag.get("dv_path"):
                    live_dvs.add(frag["dv_path"])
            if rec.get("metrics", {}).get("dv_path"):
                # a DV-mutation task's sidecar awaiting commit/resume
                live_dvs.add(rec["metrics"]["dv_path"])
    for m in _surviving_manifests(table):
        for f in m.fragments:
            live_paths.add(f.path)
            if f.dv_path:
                live_dvs.add(f.dv_path)
    removed_files = 0
    freed = 0
    ddir = mf.data_dir(table.table_dir)
    now = time.time()
    for name in _fs.ls_names(ddir):
        rel = f"data/{name}"
        if name.endswith(".bloom"):
            # a bloom sidecar lives and dies with its fragment: keep it
            # exactly while data/<stem>.parquet is live
            if rel[: -len(".bloom")] in live_paths:
                continue
        elif name.endswith(".sigs"):
            # signature sidecar (ops/dedupdocs.py incremental sweeps):
            # same fragment-liveness rule as blooms
            if rel[: -len(".sigs")] in live_paths:
                continue
        elif name.endswith(".tokbloom"):
            # token-bloom sidecar (ops/tokindex.py): lives and dies
            # with its fragment, like the doc_id blooms
            if rel[: -len(".tokbloom")] in live_paths:
                continue
        elif name.endswith(".ndv"):
            # NDV-sketch sidecar (ops/analyze.py): same fragment-
            # liveness rule as blooms
            if rel[: -len(".ndv")] in live_paths:
                continue
        elif name.endswith(".qsk"):
            # quantile-sketch sidecar (ops/analyze.py): same rule
            if rel[: -len(".qsk")] in live_paths:
                continue
        elif name.endswith(".hh"):
            # heavy-hitter-sketch sidecar (ops/analyze.py): same rule
            if rel[: -len(".hh")] in live_paths:
                continue
        elif ".dv-" in name and name.endswith(".bin"):
            # deletion-vector sidecar: referenced-by-manifest liveness
            if rel in live_dvs:
                continue
        elif rel in live_paths or not name.endswith(".parquet"):
            continue
        ap = _fs.join(ddir, name)
        # grace period protects fragments of in-flight (uncommitted) jobs
        if now - _fs.mtime(ap) < gc_grace_seconds:
            continue
        freed += _fs.size(ap)
        _fs.rm(ap)
        removed_files += 1

    # GC manifest shard files unreferenced by any surviving manifest
    # (orphans of failed commits + shards of expired versions); same
    # grace period protects in-flight commits
    live_shards: set[str] = set()
    for m in _surviving_manifests(table):
        for ref in m.fragment_shards or []:
            live_shards.add(ref["path"].rsplit("/", 1)[-1])
    removed_shards = 0
    sdir = mf.shards_dir(table.table_dir)
    for name in _fs.ls_names(sdir):
        if name in live_shards or not name.endswith(".json"):
            continue
        ap = _fs.join(sdir, name)
        if now - _fs.mtime(ap) < gc_grace_seconds:
            continue
        freed += _fs.size(ap)
        _fs.rm(ap)
        removed_shards += 1

    from fupi_ray.ops import ingest as _ingest

    gc_ingest = _ingest.gc_ingest_metadata(table, gc_grace_seconds)

    return {
        "expired_versions": sorted(dead),
        "surviving_versions": table.versions(),
        "gc_files": removed_files,
        "gc_shards": removed_shards,
        "gc_bytes": freed,
        "cleared_lineage_jobs": cleared_jobs,
        **gc_ingest,
    }
