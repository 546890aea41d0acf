"""Idempotent file-level ingestion — the COPY INTO / add_files shape.

The reference re-reads whatever files the driver hands it and appends
them unconditionally (/root/reference/fupi/data.py:52-66 feeds
embedders.py:124-125): re-running an ingest job after a crash
duplicates every row it had already loaded. At 100 TB the input is a
landing zone of many thousands of files arriving over weeks, and the
ingest job WILL be re-run — exactly-once loading has to live in the
engine, at file granularity, without a row-level probe.

:func:`ingest_files` appends only the input files the table has not
ingested yet. File identity is ``path|size|mtime_ns`` (``identity=
"stat"``, a changed file re-ingests as a new identity) or bare
``path`` (``identity="path"``). The set of ingested identities — the
*ledger* — is maintained with a crash ordering that can only ever
err toward re-ingesting (duplicates a later exact-dedup can remove),
never toward silently skipping unloaded data:

- BEFORE the commit, the batch's new identities are written to an
  inert sidecar ``manifest/ingest/batch-<uuid>.txt``. Unreferenced
  batch files claim nothing (only a committed header pointing at one
  counts) and are GC food.
- The append commit carries ``ingest_batch`` (the sidecar) and
  ``ingest_count`` in its properties; the rebase lambda re-checks the
  ledger as of every optimistic parent (same commit-time uniqueness
  shape as ``publish_stage``), so two racers loading the same file
  serialize and the loser re-plans without it.
- AFTER a successful commit, a carry-forward checkpoint
  ``ledger-v{version}.txt`` (= parent ledger ∪ batch) is written,
  best-effort. Reading the current ledger = newest checkpoint ∪ the
  batch sidecars of surviving newer headers, so the scan is O(commits
  since the last ingest), not O(history).

An explicit ``rollback()`` past an ingest commit removes the ROWS but
not the ledger memory (file tracking is table-lifetime, the Delta COPY
INTO semantic); ``ingest_files(..., force=True)`` is the post-rollback
reload path.

Scale shape: the checkpoint is one line per ingested file ever —
~200k files at 512 MB each for 100 TB ≈ a 20 MB text file, read and
written once per ingest COMMIT (not per file, not per batch of rows).
The data path is exactly an append: ``read_parquet`` / ``read_json`` /
``read_csv`` over only the new files, streamed through constraint
checks into fragments; no driver materialization.
"""

from __future__ import annotations

import time
import uuid
from typing import Sequence

from fupi_ray import manifest as mf
from fupi_ray.sources import readers
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table, write_dataset_fragments

_LEDGER_PREFIX = "ledger-v"
_BATCH_PREFIX = "batch-"


class IngestError(RuntimeError):
    pass


class _Overlap(Exception):
    """Raised inside the rebase lambda when a concurrent ingest already
    committed one of this batch's identities."""

    def __init__(self, idents: set[str]):
        super().__init__(f"{len(idents)} file(s) ingested concurrently")
        self.idents = idents


def ingest_dir(table_dir: str) -> str:
    return _fs.join(mf.manifest_dir(table_dir), "ingest")


def _ident(path: str, identity: str) -> str:
    if identity == "path":
        return path
    if identity == "stat":
        # size + mtime, not content: one stat per file, no read. A
        # rewritten file is a NEW identity and re-ingests — the safe
        # direction for a landing zone where partial uploads get
        # replaced. A protocol with no mtime must fail LOUDLY: baking
        # a fabricated timestamp into the identity would re-ingest the
        # whole zone on every run (unbounded silent duplication).
        m = _fs.mtime_strict(path)
        if m is None:
            raise ValueError(
                f"{path}: protocol exposes no modification time; use "
                "identity='path' for this landing zone"
            )
        return f"{path}|{_fs.size(path)}|{int(m * 1e9)}"
    raise ValueError(f"identity must be 'stat' or 'path', got {identity!r}")


def _checkpoints(table_dir: str) -> list[tuple[int, str]]:
    """(version, name) of every checkpoint file, oldest first."""
    out = []
    for name in _fs.ls_names(ingest_dir(table_dir)):
        if name.startswith(_LEDGER_PREFIX) and name.endswith(".txt"):
            try:
                out.append((int(name[len(_LEDGER_PREFIX):-4]), name))
            except ValueError:
                continue
    return sorted(out)


def _read_ident_file(path: str) -> set[str]:
    try:
        return {ln for ln in _fs.read_text(path).splitlines() if ln}
    except FileNotFoundError:
        return set()


def current_ledger(table: Table, upto: int | None = None) -> set[str]:
    """Ingested identities as of version ``upto`` (default: latest).

    Newest checkpoint with version <= upto, plus the batch sidecars of
    surviving headers in (checkpoint, upto]. A batch sidecar or header
    lost to expiry/GC only SHRINKS the set — re-ingest, never skip.
    """
    upto = table.latest_version() if upto is None else upto
    base_v, led = -1, set()
    for v, name in reversed(_checkpoints(table.table_dir)):
        if v <= upto:
            led = _read_ident_file(_fs.join(ingest_dir(table.table_dir), name))
            base_v = v
            break
    for v in sorted(table.versions(), reverse=True):
        if v <= base_v or v > upto:
            continue
        try:
            hdr = mf.read_manifest_header(table.table_dir, v)
        except FileNotFoundError:
            continue  # expired under us mid-scan
        batch = hdr.properties.get("ingest_batch")
        if batch:
            led |= _read_ident_file(_fs.join(table.table_dir, batch))
    return led


def _seen(path: str, ident: str, led: set[str]) -> bool:
    """Mode-aware membership: a bare-path ledger entry claims the path
    under EITHER mode (path-mode ingests are forever); a stat entry
    matches a path-mode probe on its path component. Identity strings
    use ``|`` as the field separator — a path containing ``|`` would
    alias, so refuse it at :func:`ingest_files`."""
    if ident in led:
        return True
    p = ident.split("|", 1)[0]
    if p in led:  # ingested earlier under identity="path"
        return True
    if ident == path:  # path-mode probe vs stat-mode history
        prefix = path + "|"
        return any(e.startswith(prefix) for e in led)
    return False


def _expand(paths: Sequence[str] | str) -> list[str]:
    """Files as given; a directory expands to its (non-hidden) files.
    Deterministic order so reports and fragment prefixes are stable."""
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if _fs.isdir(p):
            for n in sorted(_fs.ls_names(p)):
                child = _fs.join(p, n)
                # hidden/underscore names (locks, manifests) and nested
                # directories are not data files; one level only — a
                # partitioned landing zone passes its leaf dirs
                # explicitly so the ledger sees stable paths
                if n.startswith(("_", ".")) or _fs.isdir(child):
                    continue
                out.append(child)
        else:
            out.append(p)
    return out


def ingest_files(
    table: Table,
    paths: Sequence[str] | str,
    *,
    format: str = "parquet",
    identity: str = "stat",
    max_retries: int = 4,
    target_fragment_rows: int | None = None,
    force: bool = False,
) -> dict:
    """Append the not-yet-ingested files among ``paths``; skip the rest.

    Returns ``{"version", "files_ingested", "files_skipped",
    "rows_ingested", "retries"}``. Re-running with the same inputs is a
    no-op; a concurrent ingest of overlapping files makes exactly one
    copy win per file. ``format``: ``parquet``, ``jsonl`` or ``csv``.

    File tracking is TABLE-LIFETIME, like Delta's COPY INTO: a
    ``rollback()`` past an ingest commit removes the rows but the
    ledger still remembers the files, so a plain re-offer stays
    skipped. Pass ``force=True`` to reload files regardless of the
    ledger (the post-rollback recovery path) — forced loads are
    recorded too, so later plain runs skip them again.
    """
    # dedup the input list itself (a directory plus an explicit member,
    # or the same path twice, must not load a file twice in ONE commit)
    files = list(dict.fromkeys(_expand(paths)))
    bad = [f for f in files if any(c in f for c in "|\n\r")]
    if bad:
        raise ValueError(
            f"'|' or newline in source paths corrupts ledger identities: {bad[:3]}"
        )
    local = [f for f in files if _fs.is_process_local(f)]
    if local:
        raise ValueError(
            "ingest reads landing files from Ray worker processes; "
            f"memory:// is process-local — use a shared protocol: {local[:3]}"
        )
    idents = {f: _ident(f, identity) for f in files}
    retries = 0
    rm_frags: list = []
    while True:
        led = current_ledger(table)
        todo = [f for f in files if force or not _seen(f, idents[f], led)]
        if not todo:
            # a race loser can land here with abandoned-attempt
            # fragments still on disk: clean them before returning
            _gc_paths(rm_frags)
            return {
                "version": table.latest_version(),
                "files_ingested": 0,
                "files_skipped": len(files),
                "rows_ingested": 0,
                "retries": retries,
            }
        reader = {
            "parquet": readers.read_parquet_table,
            "jsonl": readers.read_jsonl,
            "csv": readers.read_csv,
        }.get(format)
        if reader is None:
            raise ValueError(
                f"format must be 'parquet', 'jsonl' or 'csv', got {format!r}"
            )
        # one read plan per PROTOCOL (a mixed plain/s3/gs batch is
        # legal): ray readers need one filesystem per plan and reject
        # raw URI strings — _fs.ray_read_paths does the translation
        groups: dict[str, list[str]] = {}
        for f in todo:
            proto = f.split("://", 1)[0] if _fs.is_uri(f) else ""
            groups.setdefault(proto, []).append(f)
        parts = []
        for grp in groups.values():
            read_paths, read_kwargs = _fs.ray_read_paths(grp)
            parts.append(reader(read_paths, **read_kwargs))
        ds = parts[0]
        for extra in parts[1:]:
            ds = ds.union(extra)
        frags = write_dataset_fragments(
            table._constrained(ds),
            table.table_dir,
            "ing",
            target_fragment_rows=target_fragment_rows,
            bloom_bits=table.config.bloom_bits_per_key,
            row_group_rows=table.config.row_group_rows,
        )
        new_idents = {idents[f] for f in todo}
        batch_rel = f"manifest/ingest/{_BATCH_PREFIX}{uuid.uuid4().hex}.txt"
        _fs.write_text(
            _fs.join(table.table_dir, batch_rel), "\n".join(sorted(new_idents)) + "\n"
        )

        def _build(parent: int):
            if not force:  # forced reloads are intentional duplicates
                led_p = current_ledger(table, upto=parent)
                clash = {idents[f] for f in todo if _seen(f, idents[f], led_p)}
                if clash:
                    raise _Overlap(clash)
            return table.manifest(parent).fragments + frags

        try:
            v = table._commit_rebasing(
                "ingest",
                _build,
                properties={
                    "ingest_batch": batch_rel,
                    "ingest_count": len(todo),
                    "ingest_identity": identity,
                },
            )
        except _Overlap:
            # a racer committed some of these files between our plan
            # and our commit: un-write this attempt (nothing references
            # it) and re-plan against the updated ledger. Absolute
            # paths: FragmentMeta.path is table-relative and _fs.rm
            # would resolve it against the process cwd.
            for f in frags:
                rm_frags.append(_fs.join(table.table_dir, f.path))
            _fs.rm(_fs.join(table.table_dir, batch_rel))
            retries += 1
            if retries > max_retries:
                _gc_paths(rm_frags)
                raise IngestError(
                    f"ingest lost the overlap race {retries} times"
                )
            continue
        _gc_paths(rm_frags)
        # post-commit checkpoint: parent ledger as the commit saw it,
        # plus this batch. Best-effort — a crash here only means the
        # next ingest unions one extra header sidecar.
        try:
            ck = current_ledger(table, upto=v)
            _fs.write_text(
                _fs.join(ingest_dir(table.table_dir), f"{_LEDGER_PREFIX}{v}.txt"),
                "\n".join(sorted(ck)) + "\n",
            )
        except Exception:
            pass
        return {
            "version": v,
            "files_ingested": len(todo),
            "files_skipped": len(files) - len(todo),
            "rows_ingested": sum(f.rows for f in frags),
            "retries": retries,
        }


def _gc_paths(paths: list) -> None:
    """Remove the fragments of abandoned attempts (plus bloom
    sidecars); best-effort — anything left is normal expiry GC food."""
    for p in paths:
        for t in (p, p + ".bloom", p + ".sigs"):
            try:
                _fs.rm(t)
            except FileNotFoundError:
                pass
    paths.clear()


def gc_ingest_metadata(
    table: Table, gc_grace_seconds: float, keep_checkpoints: int = 2
) -> dict:
    """Expiry arm: drop batch sidecars unreferenced by any surviving
    header and checkpoints beyond the newest ``keep_checkpoints``. An
    over-eager removal here can only cause a re-ingest, never a skip —
    the grace period exists to not yank a sidecar out from under an
    in-flight commit's rebase re-check."""
    idir = ingest_dir(table.table_dir)
    live_batches: set[str] = set()
    for v in table.versions():
        try:
            hdr = mf.read_manifest_header(table.table_dir, v)
        except FileNotFoundError:
            continue
        b = hdr.properties.get("ingest_batch")
        if b:
            live_batches.add(b.rsplit("/", 1)[-1])
    now = time.time()
    removed = 0
    keep_names = {name for _, name in _checkpoints(table.table_dir)[-keep_checkpoints:]}
    for name in _fs.ls_names(idir):
        if name.startswith(_BATCH_PREFIX) and name not in live_batches:
            pass  # unreferenced batch: dead
        elif name.startswith(_LEDGER_PREFIX) and name not in keep_names:
            pass  # superseded checkpoint: dead
        else:
            continue
        ap = _fs.join(idir, name)
        try:
            if now - _fs.mtime(ap) < gc_grace_seconds:
                continue
            _fs.rm(ap)
            removed += 1
        except FileNotFoundError:
            continue
    return {"gc_ingest_files": removed}
