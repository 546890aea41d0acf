"""Training-shard export: the last-mile op that turns a versioned
table into the N-way sharded Parquet layout a distributed dataloader
consumes.

The reference serves queries straight out of LanceDB and never exports
(/root/reference/searcher.py); a training pipeline instead needs
"give me this snapshot as N deterministic shards" — every rank reads
shard ``rank % N``, re-exports are reproducible, and shard assignment
is stable under compaction/clustering (it depends only on ``doc_id``,
never on physical layout).

Scale shape: one streaming pass — ``scan → map_batches(split by
shard, append one file per (block, shard))``; no exchange, no driver
data path. Each write task emits at most ``num_shards`` files per
block, named ``shard=KKKKK/part-<uuid>.parquet``; a ``_MANIFEST.json``
with per-shard row/token/file counts is written last (readers that see
the manifest see only complete data — the export is atomic at the
manifest level, like the table's own commits).

Assignment: ``assign="hash"`` (default) = ``stable_hash(doc_id) %
num_shards`` — uniform under skewed ids; or a callable
``(pa.Array of doc_id) -> np.ndarray[int]`` for externally mandated
layouts (the conformance oracle uses a modulo on the numeric id suffix
so DuckDB can reproduce the assignment).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fupi_ray.functions.hashing import stable_hash
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table


def _shard_writer(out_dir: str, num_shards: int, assign):
    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"stats_json": pa.array([], pa.string())})
        ids = batch["doc_id"]
        if assign == "hash":
            shard = (stable_hash(ids) % np.uint64(num_shards)).astype(np.int64)
        else:
            shard = np.asarray(assign(ids), dtype=np.int64) % num_shards
        order = np.argsort(shard, kind="stable")
        sorted_shard = shard[order]
        tbl = batch.take(pa.array(order))
        bounds = np.searchsorted(
            sorted_shard, np.arange(num_shards + 1, dtype=np.int64)
        )
        stats = []
        for s in range(num_shards):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            if lo == hi:
                continue
            part = tbl.slice(lo, hi - lo)
            rel = f"shard={s:05d}/part-{uuid.uuid4().hex}.parquet"
            _fs.write_parquet(part, _fs.join(out_dir, rel), row_group_size=32 * 1024)
            n_tok = (
                int(pc.sum(part["n_tok"]).as_py() or 0)
                if "n_tok" in part.column_names
                else 0
            )
            stats.append(
                {"shard": s, "rows": part.num_rows, "sum_n_tok": n_tok, "file": rel}
            )
        return pa.table({"stats_json": pa.array([json.dumps(x) for x in stats])})

    return write_batch


_LOCK_NAME = "_EXPORT_LOCK"


def _acquire_export_lock(out_dir: str, token: str) -> str:
    """Exclusive run sentinel: two concurrent exports to one directory
    would interleave part files and each run's orphan reconciliation
    would delete the other's. Local paths get a real O_CREAT|O_EXCL;
    object stores get exists-then-put (the same weakening as the
    commit guard — conditional puts close it on real object stores).
    The lock is removed only on SUCCESS: a crashed export leaves it
    (and a partial directory) behind, and the next run must pass
    ``overwrite=True`` to clear both."""
    lock = _fs.join(out_dir, _LOCK_NAME)
    if _fs.is_uri(lock):
        if _fs.exists(lock):
            raise ValueError(
                f"{lock} exists: another export is running (or a crashed one "
                "left a partial directory) — pass overwrite=True to clear it"
            )
        _fs.write_text(lock, token)
        return lock
    os.makedirs(out_dir, exist_ok=True)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ValueError(
            f"{lock} exists: another export is running (or a crashed one "
            "left a partial directory) — pass overwrite=True to clear it"
        ) from None
    with os.fdopen(fd, "w") as fh:
        fh.write(token)
    return lock


def export_training_shards(
    table: Table,
    out_dir: str,
    num_shards: int,
    version: int | None = None,
    columns=None,
    assign="hash",
    overwrite: bool = False,
) -> dict:
    """Export a snapshot as ``num_shards`` Parquet shard directories;
    returns the manifest dict (also written to ``_MANIFEST.json``).

    Safe against duplicate part files three ways: the target directory
    must be empty (or ``overwrite=True`` clears it first — a re-export
    into a used directory would otherwise leave the old run's parts
    for directory-glob readers to double-count); an exclusive
    ``_EXPORT_LOCK`` sentinel makes a concurrent export to the same
    directory fail instead of interleaving parts; and after the write
    pass any part file NOT in the manifest (the orphan of a retried
    Ray task) is deleted before the manifest lands, so directory reads
    and manifest reads agree."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    if columns is not None and "doc_id" not in columns:
        raise ValueError("columns must include 'doc_id' (the shard key)")
    existing = _fs.ls_names(out_dir)
    if existing:
        if not overwrite:
            raise ValueError(
                f"{out_dir} is not empty ({len(existing)} entries); a re-export "
                "would duplicate rows for directory readers — pass overwrite=True"
            )
        _fs.rm_dir(out_dir)
    run_token = uuid.uuid4().hex
    lock_path = _acquire_export_lock(out_dir, run_token)
    resolved_v = table.latest_version() if version is None else version
    ds = table.scan(version=resolved_v, columns=columns)
    stats_rows = ds.map_batches(
        _shard_writer(out_dir, num_shards, assign),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # 1 row per (block, shard): tiny

    per_shard: dict[int, dict] = {
        s: {"shard": s, "rows": 0, "sum_n_tok": 0, "files": []}
        for s in range(num_shards)
    }
    for r in stats_rows:
        d = json.loads(r["stats_json"])
        agg = per_shard[d["shard"]]
        agg["rows"] += d["rows"]
        agg["sum_n_tok"] += d["sum_n_tok"]
        agg["files"].append(d["file"])
    # reconcile: a retried write task leaves an extra part file with a
    # different uuid — delete anything the manifest doesn't claim so
    # directory-glob readers can't double-count rows
    claimed = {f for a in per_shard.values() for f in a["files"]}
    orphans = 0
    for name in _fs.ls_names(out_dir):
        if not name.startswith("shard="):
            continue
        sdir = _fs.join(out_dir, name)
        for part in _fs.ls_names(sdir):
            rel = f"{name}/{part}"
            if part.endswith(".parquet") and rel not in claimed:
                _fs.rm(_fs.join(sdir, part))
                orphans += 1

    manifest = {
        "table": table.table_dir,
        "version": resolved_v,
        "num_shards": num_shards,
        "created_unix": time.time(),
        "total_rows": sum(a["rows"] for a in per_shard.values()),
        "total_tokens": sum(a["sum_n_tok"] for a in per_shard.values()),
        "orphan_parts_removed": orphans,
        "shards": [per_shard[s] for s in range(num_shards)],
    }
    _fs.write_text(
        _fs.join(out_dir, "_MANIFEST.json"), json.dumps(manifest, indent=1)
    )
    _fs.rm(lock_path)  # success only; a crash leaves the lock as a tombstone
    return manifest


def read_export_manifest(out_dir: str) -> dict:
    return json.loads(_fs.read_text(_fs.join(out_dir, "_MANIFEST.json")))
