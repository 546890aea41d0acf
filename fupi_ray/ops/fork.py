"""Zero-copy table forks: branch-style isolation without data copies.

The reference has exactly one isolation primitive — rebuild the whole
table under another name (``create_table(mode='overwrite')``,
/root/reference/fupi/utils.py:39-49). At 100 TB a physical copy per
experiment is a non-starter; the lakehouse answer is a NAMED REF whose
snapshots stay alive while the ref exists (Iceberg branches, Nessie).

A fork here is a full, independent :class:`~fupi_ray.table.Table`
whose first manifest references the source's fragments BY ABSOLUTE
PATH (``state/fs.join`` resolves absolute/URI fragment paths as-is, so
every read site — scans, compaction, clustering, COW rewrites, bloom
probes, DV masks — works on foreign fragments unchanged). Zero bytes
are copied at fork time:

- reads on the fork see the source's data at the forked version;
- writes/mutations land in the FORK's own directory (a COW rewrite of
  a foreign fragment materializes the survivors locally — divergence
  is copy-on-first-write, proportional to what actually changed);
- the forked source version is pinned (``fork-<name>``), so the
  source's snapshot expiry can never GC fragments the fork references;
  ``drop_fork`` releases the pin;
- merge-back is the existing CDC consumer:
  ``apply_changelog(fork, src, from_version=fork_base_version(fork))``
  replicates the fork's net changes onto the source exactly-once.

Constraint: source and fork must live on the same protocol (both
local paths or both the same ``scheme://``) — a fragment path must be
readable through one filesystem stack.
"""

from __future__ import annotations

import dataclasses
import os

from fupi_ray import manifest as mf
from fupi_ray.config import EngineConfig
from fupi_ray.manifest import Manifest
from fupi_ray.state import commit as commit_mod
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table


def _same_protocol(a: str, b: str) -> bool:
    ua, ub = _fs.is_uri(a), _fs.is_uri(b)
    if ua != ub:
        return False
    if not ua:
        return True
    return a.split("://", 1)[0] == b.split("://", 1)[0]


def _absolutize(src_dir: str, f: mf.FragmentMeta) -> mf.FragmentMeta:
    return dataclasses.replace(
        f,
        path=_fs.join(src_dir, f.path),
        dv_path=_fs.join(src_dir, f.dv_path) if f.dv_path else None,
    )


def fork_table(
    src: Table,
    dst_dir: str,
    version: int | None = None,
    name: str | None = None,
    config: EngineConfig | None = None,
) -> Table:
    """Fork ``src`` at ``version`` (default latest) into a new table at
    ``dst_dir`` without copying data. Returns the fork; its v1 manifest
    carries the source's schema, field ids, defaults and fragment list
    (absolutized), and the source gains a ``fork-<name>`` pin."""
    if not _same_protocol(src.table_dir, dst_dir):
        raise ValueError(
            "fork must live on the source's protocol (its manifests "
            f"reference the source's files): {src.table_dir!r} vs {dst_dir!r}"
        )
    version = src.latest_version() if version is None else version
    # the manifest stores the SOURCE's fragment paths verbatim; a
    # relative source dir would later resolve UNDER the fork dir and
    # make every read dangle — absolutize local paths up front
    src_dir = (
        src.table_dir if _fs.is_uri(src.table_dir) else os.path.abspath(src.table_dir)
    )
    name = name or dst_dir.rstrip("/").rsplit("/", 1)[-1]
    pin_name = f"fork-{name}"
    if pin_name in src.pins():
        raise ValueError(f"fork name {name!r} already pins {src.table_dir}")
    # pin FIRST: from this point the source's expiry cannot GC the
    # forked snapshot, so the fork's manifest can never dangle
    src.pin(pin_name, version)
    sm = src.manifest(version)
    fork = Table.create(dst_dir, schema=src.schema(version), config=config or src.config)
    m = Manifest(
        version=-1,
        parent_version=None,
        operation="fork",
        schema_names=list(sm.schema_names),
        schema_types=list(sm.schema_types),
        fragments=[_absolutize(src_dir, f) for f in sm.fragments],
        properties={
            "fork_of": src_dir,
            "fork_version": version,
            "fork_pin": pin_name,
        },
        column_defaults=dict(sm.column_defaults),
        # carry the source's field ids verbatim: evolution history up
        # to the fork point must resolve identically on both sides
        column_ids=dict(sm.column_ids),
        next_column_id=sm.next_column_id,
    )
    commit_mod.commit(fork.table_dir, m, expected_parent=fork.latest_version())
    return fork


def fork_base_version(fork: Table) -> int:
    """The fork's own version at which it diverged (the 'fork' commit)
    — the ``from_version`` for a merge-back ``apply_changelog``."""
    for h in reversed(fork.history()):  # oldest-first
        if h["operation"] == "fork":
            return h["version"]
    raise ValueError(f"{fork.table_dir} is not a fork (no 'fork' commit)")


def fork_source(fork: Table) -> tuple[str, int, str]:
    """(source table_dir, forked version, pin name) of a fork."""
    for h in reversed(fork.history()):
        p = h["properties"]
        if h["operation"] == "fork":
            return p["fork_of"], int(p["fork_version"]), p["fork_pin"]
    raise ValueError(f"{fork.table_dir} is not a fork (no 'fork' commit)")


def drop_fork(src: Table, fork: Table) -> None:
    """Release the fork's pin on the source. The fork's directory stays
    (caller deletes it); after the pin is gone the source may GC the
    forked snapshot, so the fork must not be read anymore."""
    _, _, pin_name = fork_source(fork)
    src.unpin(pin_name)


class ForkConflict(RuntimeError):
    """The source changed keys the fork also changed since the fork
    point; a default merge refuses rather than silently overwriting."""

    def __init__(self, keys):
        super().__init__(
            f"{len(keys)} key(s) changed on BOTH sides since the fork "
            f"point (first: {sorted(keys)[:3]}); pass "
            "on_conflict='fork' to let the fork win"
        )
        self.keys = keys


def merge_fork(
    fork: Table,
    *,
    key: str = "doc_id",
    on_conflict: str = "error",
    drop: bool = False,
    job_id: str | None = None,
) -> dict:
    """Merge a fork's divergence back into its source — the other half
    of the branch workflow (``fork_table`` is checkout, this is the
    merge commit): the fork's NETTED changelog since the fork point
    replays onto the source as one atomic keyed upsert
    (``ops/changelog.apply_changelog`` — exactly-once under retry via
    its ``cdc_apply`` stamp; O(changed keys), never O(table)).

    ``on_conflict='error'`` (default) first diffs the SOURCE since the
    fork point and refuses with :class:`ForkConflict` when any key
    changed on both sides — the data-table analogue of a non
    fast-forward refusal. ``on_conflict='fork'`` lets the fork's
    version of conflicting keys win. Keys only the source changed are
    always preserved; keys only the fork changed always merge.

    SEQUENTIAL merges work like repeated ``git merge``: each success
    records a sync point on the fork (a content-preserving
    ``fork_sync`` commit carrying the source+fork versions it
    synchronized), so the next merge replays only the divergence SINCE
    the last merge and diffs the source only past its own apply commit
    — neither the already-merged keys nor the merge's own ``cdc_apply``
    commit ever read as conflicts.

    ``drop=True`` releases the fork's pin on success (the fork
    directory itself stays; see :func:`drop_fork`).
    """
    if on_conflict not in ("error", "fork"):
        raise ValueError(f"on_conflict must be 'error' or 'fork', got {on_conflict!r}")
    from fupi_ray.ops.changelog import apply_changelog, applied_version, changelog

    src_dir, src_fork_v, _pin = fork_source(fork)
    src = Table.open(src_dir, fork.config)
    sync = _last_sync(fork)
    base_fork = sync[1] if sync else fork_base_version(fork)
    base_src = sync[0] if sync else src_fork_v
    to_fork = fork.latest_version()

    def report(version: int, merged: int, already: bool = False) -> dict:
        if drop:
            drop_fork(src, fork)
        out = {
            "version": version,
            "keys_merged": merged,
            "source": src_dir,
            "fork_base": base_fork,
            "dropped": drop,
        }
        if already:
            out["already_applied"] = True
        return out

    # retry of an already-applied window: answer from the watermark
    # BEFORE diffing (the apply commit would otherwise read as a
    # conflicting source-side change), and complete the sync record a
    # crash between apply and sync left missing
    done = applied_version(fork, src, base_fork, to_fork)
    if done is not None:
        _record_sync(fork, done, to_fork)
        return report(done, 0, already=True)

    fork_ch = changelog(fork, base_fork, to_fork).materialize()
    fork_keys = set(fork_ch.unique(key) or []) if fork_ch.count() else set()
    if not fork_keys:
        return report(src.latest_version(), 0)
    src_checked = src.latest_version()
    if on_conflict == "error":
        src_ch = changelog(src, base_src, src_checked).materialize()
        src_keys = set(src_ch.unique(key) or []) if src_ch.count() else set()
        conflicts = fork_keys & src_keys
        if conflicts:
            raise ForkConflict(conflicts)

    version = apply_changelog(
        fork,
        src,
        base_fork,
        to_fork,
        key=key,
        job_id=job_id,
        changelog_ds=fork_ch,
        # pin the apply to the version the conflict check (or, for
        # on_conflict='fork', the caller's decision point) saw: a
        # commit interleaving after it fails loudly instead of being
        # silently overwritten
        expected_parent=src_checked,
    )
    _record_sync(fork, version, to_fork)
    return report(version, len(fork_keys))


def _last_sync(fork: Table) -> tuple[int, int] | None:
    """(source version, fork version) of the newest ``fork_sync``
    commit, or None for a never-merged fork."""
    for h in fork.history():  # newest-first
        if h["operation"] == "fork_sync":
            p = h["properties"]
            return int(p["sync_src_version"]), int(p["sync_fork_version"])
    return None


def _record_sync(fork: Table, src_version: int, fork_version: int) -> None:
    """Content-preserving commit marking (src_version, fork_version) as
    merged — the base for the NEXT merge's diffs. Idempotent: skipped
    when the newest sync already covers this fork version."""
    last = _last_sync(fork)
    if last is not None and last[1] >= fork_version:
        return
    fork._commit_rebasing(
        "fork_sync",
        lambda parent: fork.manifest(parent).fragments,
        properties={
            "sync_src_version": src_version,
            "sync_fork_version": fork_version,
        },
    )
