"""Single-writer manifest commit actor.

The reference gets commit serialization for free from LanceDB's
versioning plus docker-compose ordering (fupi/embedders.py:124-128,
docker-compose.yml:38-72). Here a single named Ray actor per table
serializes commits; an optimistic parent-version check rejects commits
built against a stale snapshot (SURVEY.md §4 "Concurrency control").

The actor holds NO table data — only the tiny commit critical section —
so `num_cpus=0`: it never competes with dataflow stages for CPU slots.
"""

from __future__ import annotations

import hashlib
import time

import ray

from fupi_ray import manifest as mf
from fupi_ray.state import fs


class CommitError(RuntimeError):
    pass


class _Committer:
    """The commit critical section (also usable un-actored in tests)."""

    def commit(self, table_dir: str, m_json: str, expected_parent: int | None) -> int:
        import os

        m = mf.Manifest.from_json(m_json)
        latest = mf.read_latest_version(table_dir)
        if expected_parent is not None and latest != expected_parent:
            raise CommitError(
                f"optimistic commit failed: expected parent v{expected_parent}, "
                f"latest is v{latest} — rebase the job on the new snapshot"
            )
        new_version = (latest if latest is not None else -1) + 1
        # Filesystem-level duplicate-version guard: the named actor
        # serializes commits within ONE Ray job, but two `ray job
        # submit` invocations each get their own cluster and actor.
        # O_CREAT|O_EXCL on the version file makes the second
        # concurrent writer of v{N} fail loudly instead of clobbering.
        path = mf.manifest_path(table_dir, new_version)
        m.version = new_version
        m.parent_version = latest
        m.created_unix = time.time()
        if fs.is_uri(path):
            # Object stores have no link(2); exists-then-put is the
            # guard (the commit actor already serializes writers within
            # a cluster — this only weakens the cross-cluster race,
            # which conditional puts close on real object stores).
            if fs.exists(path):
                raise CommitError(
                    f"concurrent commit detected: v{new_version} manifest "
                    "already exists (another writer won the race) — rebase "
                    "and retry"
                )
            fs.write_text(path, m.to_json())
            mf.write_latest_version(table_dir, new_version)
            return new_version
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(m.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            # link(2) is atomic AND exclusive: the second concurrent
            # writer of v{N} fails instead of clobbering, and readers
            # never observe a partially-written manifest.
            os.link(tmp, path)
        except FileExistsError:
            raise CommitError(
                f"concurrent commit detected: v{new_version} manifest already "
                "exists (another writer won the race) — rebase and retry"
            )
        finally:
            os.unlink(tmp)
        mf.write_latest_version(table_dir, new_version)
        return new_version


CommitActor = ray.remote(num_cpus=0)(_Committer)


def get_commit_actor(table_dir: str):
    """One named DETACHED commit actor per table directory in a fixed
    namespace (idempotent): every Ray job that connects to the same
    cluster resolves the same serialization point, not a per-job
    private actor."""
    name = "fupi-commit-" + hashlib.md5(table_dir.encode()).hexdigest()[:12]
    return CommitActor.options(
        name=name, get_if_exists=True, lifetime="detached", namespace="fupi"
    ).remote()


def commit(table_dir: str, m: mf.Manifest, expected_parent: int | None) -> int:
    """Serialize a commit through the table's commit actor. A
    process-local protocol (memory://) is invisible to the actor's
    process, so its critical section runs inline instead.

    Big fragment lists are sharded to immutable side files first
    (mf.plan_shards): the JSON that crosses the actor boundary and
    lands in manifest/v{N}.json is O(changed shards), not O(table) —
    a failed optimistic commit leaves only orphan shard files, GC'd
    by snapshot expiry like orphan data fragments."""
    mf.plan_shards(table_dir, m)
    if fs.is_process_local(table_dir):
        return _Committer().commit(table_dir, m.to_json(), expected_parent)
    actor = get_commit_actor(table_dir)
    return ray.get(actor.commit.remote(table_dir, m.to_json(), expected_parent))
